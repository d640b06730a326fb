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
