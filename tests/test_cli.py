"""The ``python -m news_crawler_ray`` job entrypoint (north-rule
``ray job submit`` surface): synth → crawl → resume → query, driven
in-process against the session Ray (``_ray_init`` guards on
``ray.is_initialized`` so the CLI never double-inits)."""

import json
import os

import pyarrow.parquet as pq

from news_crawler_ray.__main__ import main


def _json_lines(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]


def test_cli_synth_crawl_query(ray_session, sf_dir, tmp_path, capsys):
    fix = str(tmp_path / "fix")
    assert main(["synth", "--out", fix, "--pages", "200", "--frontier", "150"]) == 0
    (synth_row,) = _json_lines(capsys)
    # frontier carries ~10% planted dup/noise rows on top of n
    assert synth_row["pages"] == 200 and synth_row["frontier"] >= 150
    for f in ("pagestore.parquet", "frontier.parquet", "robots.parquet"):
        assert os.path.exists(os.path.join(fix, f))

    out = str(tmp_path / "run")
    args = [
        "crawl",
        "--frontier", os.path.join(fix, "frontier.parquet"),
        "--store", os.path.join(fix, "pagestore.parquet"),
        "--robots", os.path.join(fix, "robots.parquet"),
        "--out", out, "--max-waves", "2", "--seen-shards", "2",
        "--dedup-partitions", "4",
    ]
    assert main(args) == 0
    rows = _json_lines(capsys)
    waves = [r["wave_metrics"] for r in rows if "wave_metrics" in r]
    summary = rows[-1]
    assert len(waves) == 2 and summary["waves"] == 2
    assert summary["total_fetched"] == sum(w["fetched_ok"] for w in waves) > 0
    # lineage row carries the full funnel per wave
    assert {"wave", "candidates", "scheduled", "fetched_ok", "missing",
            "outlinks", "elapsed_s", "urls_per_sec"} <= set(waves[0])
    fetched = pq.read_table(os.path.join(out, "fetched"))
    assert fetched.num_rows == summary["total_fetched"]

    # resume over a finished run is a no-op that still reports the layout
    assert main(args + ["--resume"]) == 0
    resumed = _json_lines(capsys)[-1]
    assert resumed["out_dir"] == out

    assert main(["query", "events_day", "--sf-dir", sf_dir]) == 0
    q = _json_lines(capsys)[-1]
    assert q["rows"] > 0 and q["columns"] == ["event_id"]

    assert main(["query", "definitely_not_a_query"]) == 2


def test_cli_export_resumable(ray_session, tmp_path, capsys):
    import json

    from news_crawler_ray.__main__ import main

    fix = str(tmp_path / "fix")
    assert main(["synth", "--out", fix, "--pages", "150", "--frontier", "50"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "shards")
    store = os.path.join(fix, "pagestore.parquet")
    assert main(["export", "--store", store, "--out", out, "--shards", "4"]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["complete"] and m1["rows"] > 0 and len(m1["per_shard"]) <= 4
    # rerun: complete manifest short-circuits, identical output
    assert main(["export", "--store", store, "--out", out, "--shards", "4"]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2 == m1


def test_cron_next_delay_pure():
    """Clock math for the cron launcher: next HH:MM today, else the
    earliest listed time tomorrow."""
    import datetime as dt

    from news_crawler_ray.__main__ import cron_next_delay

    base = dt.datetime(2026, 8, 20, 10, 0, 0).timestamp()  # 10:00 local
    assert cron_next_delay(base, ["16:00"]) == 6 * 3600
    assert cron_next_delay(base, ["06:00"]) == 20 * 3600  # tomorrow
    assert cron_next_delay(base, ["06:00", "16:00"]) == 6 * 3600
    # exactly-now rolls to tomorrow (strict inequality)
    assert cron_next_delay(base, ["10:00"]) == 24 * 3600


def test_cli_crawl_cron_mode(ray_session, tmp_path, capsys):
    """--cron-interval mode: two day-scoped firings; the second resumes
    the same window idempotently (drained — no duplicate fetches)."""
    import datetime as dt
    import json as js
    import os

    from news_crawler_ray.__main__ import main

    fix = str(tmp_path / "fix")
    assert main(["synth", "--out", fix, "--pages", "120", "--frontier", "60"]) == 0
    out = str(tmp_path / "cronout")
    assert (
        main(
            [
                "crawl",
                "--frontier", os.path.join(fix, "frontier.parquet"),
                "--store", os.path.join(fix, "pagestore.parquet"),
                "--robots", os.path.join(fix, "robots.parquet"),
                "--out", out,
                "--max-waves", "2",
                "--cron-interval", "0",
                "--cron-runs", "2",
            ]
        )
        == 0
    )
    lines = [js.loads(L) for L in capsys.readouterr().out.strip().splitlines() if L.startswith("{")]
    summaries = [d for d in lines if "out_dir" in d]
    assert len(summaries) == 2
    scope = dt.date.today().isoformat()
    win = os.path.join(out, f"window-{scope}")
    assert os.path.isdir(win)  # day-scoped layout
    assert summaries[0]["waves"] == 2 and summaries[0]["total_fetched"] > 0
    # second firing resumed a drained window: nothing re-fetched
    assert summaries[1]["total_fetched"] == summaries[0]["total_fetched"]


def test_env_config_coercion_and_typo_guard(monkeypatch):
    """NC_* env overrides coerce by CrawlConfig field annotation; a
    typo'd NC_ name raises loudly instead of being silently ignored."""
    import pytest

    from news_crawler_ray.settings import (
        crawl_config_env_overrides,
        env_default,
    )

    env = {
        "NC_MAX_WAVES": "7",
        "NC_POOL_ACTOR_CPUS": "0.25",
        "NC_VERIFY_PAYLOADS": "yes",
        "NC_COMPUTE_CRAWL_RANK": "off",
        "NC_FETCH_CONCURRENCY": "1,8",
        "NC_ROBOTS_CONCURRENCY": "4",
        "NC_SCHEDULE_CONCURRENCY": "auto",
        "NC_SCHEDULE_PARTITIONS": "16",
        "NC_SEEN_EPOCH_SCOPE": "2026-08-20",
        "PATH": "/usr/bin",  # non-NC vars pass through untouched
    }
    got = crawl_config_env_overrides(env)
    assert got == {
        "max_waves": 7,
        "pool_actor_cpus": 0.25,
        "verify_payloads": True,
        "compute_crawl_rank": False,
        "fetch_concurrency": (1, 8),
        "robots_concurrency": 4,
        "schedule_concurrency": "auto",
        "schedule_partitions": 16,
        "seen_epoch_scope": "2026-08-20",
    }
    # empty string clears an optional field back to None
    assert crawl_config_env_overrides({"NC_SEEN_EPOCH_SCOPE": ""}) == {
        "seen_epoch_scope": None
    }
    with pytest.raises(ValueError, match="NC_MAX_WAVS"):
        crawl_config_env_overrides({"NC_MAX_WAVS": "7"})
    with pytest.raises(ValueError, match="boolean"):
        crawl_config_env_overrides({"NC_VERIFY_PAYLOADS": "maybe"})

    # env_default: env wins over fallback, coerced; absent -> fallback
    assert env_default("max_waves", 3, {"NC_MAX_WAVES": "9"}) == 9
    assert env_default("max_waves", 3, {}) == 3
    assert env_default("compute_crawl_rank", True, {"NC_COMPUTE_CRAWL_RANK": "0"}) is False


def test_env_config_precedence_cli_over_env(ray_session, tmp_path, capsys, monkeypatch):
    """Precedence CLI > NC_* env > default, observed end-to-end through
    the crawl CLI: NC_MAX_WAVES bounds the run when no flag is passed,
    an explicit --max-waves beats the env var, and a pure-env field
    with no CLI flag (NC_SEEN_CAPACITY_PER_SHARD) reaches CrawlConfig."""
    import news_crawler_ray.pipelines.crawl as crawl_mod

    fix = str(tmp_path / "fix")
    assert main(["synth", "--out", fix, "--pages", "120", "--frontier", "100"]) == 0
    capsys.readouterr()

    seen_cfgs = []
    real_run = crawl_mod.run_crawl

    def spy_run(*a, **kw):
        seen_cfgs.append(kw["config"])
        return real_run(*a, **kw)

    monkeypatch.setattr(crawl_mod, "run_crawl", spy_run)
    monkeypatch.setenv("NC_MAX_WAVES", "1")
    monkeypatch.setenv("NC_SEEN_CAPACITY_PER_SHARD", "4096")
    monkeypatch.setenv("NC_DEDUP_PARTITIONS", "2")

    base = [
        "crawl",
        "--frontier", os.path.join(fix, "frontier.parquet"),
        "--store", os.path.join(fix, "pagestore.parquet"),
        "--robots", os.path.join(fix, "robots.parquet"),
    ]
    # env only: max_waves=1 from NC_MAX_WAVES (default is 3)
    assert main(base + ["--out", str(tmp_path / "r1")]) == 0
    rows = _json_lines(capsys)
    assert rows[-1]["waves"] == 1
    cfg = seen_cfgs[-1]
    assert cfg.max_waves == 1
    assert cfg.seen_capacity_per_shard == 4096  # env-only field landed
    assert cfg.dedup_partitions == 2

    # CLI beats env: --max-waves 2 over NC_MAX_WAVES=1
    assert main(base + ["--out", str(tmp_path / "r2"), "--max-waves", "2",
                        "--dedup-partitions", "4"]) == 0
    rows = _json_lines(capsys)
    assert rows[-1]["waves"] == 2
    cfg = seen_cfgs[-1]
    assert cfg.max_waves == 2
    assert cfg.dedup_partitions == 4


def test_env_overrides_cover_round5_fields():
    """The env layer derives from the dataclass, so every round-5
    CrawlConfig addition (http transport, recrawl, compaction) is
    NC_-overridable with correct coercion the moment it's declared."""
    from news_crawler_ray.settings import crawl_config_env_overrides

    got = crawl_config_env_overrides({
        "NC_FETCH_MODE": "http",
        "NC_HTTP_BASE_URL": "http://127.0.0.1:9",
        "NC_HTTP_TIMEOUT_S": "2.5",
        "NC_HTTP_ATTEMPTS": "4",
        "NC_HTTP_EMIT_ETAG": "yes",
        "NC_HTTP_PRIOR_ETAGS_PATH": "/tmp/prior",
        "NC_SEEN_COMPACT_EVERY": "4",
    })
    assert got == {
        "fetch_mode": "http",
        "http_base_url": "http://127.0.0.1:9",
        "http_timeout_s": 2.5,
        "http_attempts": 4,
        "http_emit_etag": True,
        "http_prior_etags_path": "/tmp/prior",
        "seen_compact_every": 4,
    }
