"""End-to-end crawl pipeline conformance vs the pure-Python oracle.

North-rule checks: identical crawl order (as data: wave + crawl_rank),
identical final URL-seen set, kill-and-resume reproduces both exactly.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.fixtures import synth
from news_crawler_ray.testing.oracle import crawl_oracle


@pytest.fixture(scope="module")
def fixture_tables():
    ps = synth.make_pagestore(120, seed=42)
    fr = synth.make_frontier(60, seed=42)
    robots = synth.make_robots(seed=42)
    return ps, fr, robots


def _engine_order(result):
    """Crawl order from the engine output: (wave, crawl_rank) asc."""
    rows = result.fetched_dataset().select_columns(
        ["url", "wave", "crawl_rank", "fetch_status"]
    ).take_all()
    rows.sort(key=lambda r: (r["wave"], r["crawl_rank"]))
    return [r["url"] for r in rows]


def _run(tmp_path, fixture_tables, max_waves=3, resume=False, out="crawl"):
    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    cfg = cp.CrawlConfig(max_waves=max_waves, num_seen_shards=2, dedup_partitions=4)
    return cp.run_crawl(fr, ps, robots, str(tmp_path / out), config=cfg, resume=resume)


def test_crawl_matches_oracle(ray_session, tmp_path, fixture_tables):
    ps, fr, robots = fixture_tables
    result = _run(tmp_path, fixture_tables)
    oracle = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=3
    )
    assert _engine_order(result) == oracle.flat_order
    assert result.seen.all_keys() == oracle.seen_keys
    # per-wave metrics recorded with lineage
    assert len(result.waves) >= 1
    for w in result.waves:
        assert w.scheduled == w.fetched_ok + w.missing
        assert w.urls_per_sec >= 0


def test_crawl_resume_identical(ray_session, tmp_path, fixture_tables):
    full = _run(tmp_path, fixture_tables, max_waves=3, out="full")
    # simulate a kill after wave 0: run only wave 0, then resume to 3
    part = _run(tmp_path, fixture_tables, max_waves=1, out="partial")
    assert len(part.waves) == 1
    resumed = _run(tmp_path, fixture_tables, max_waves=3, resume=True, out="partial")
    assert _engine_order(resumed) == _engine_order(full)
    assert resumed.seen.all_keys() == full.seen.all_keys()
    assert [w.wave for w in resumed.waves] == [w.wave for w in full.waves]


def test_crawl_caption_byte_exact(ray_session, tmp_path, fixture_tables):
    """input_hint per-row invariant: byte-exact caption equality."""
    ps, fr, robots = fixture_tables
    result = _run(tmp_path, fixture_tables, out="cap")
    cap_by_id = dict(zip(ps["image_id"].to_pylist(), ps["caption"].to_pylist()))
    rows = result.fetched_dataset().filter(expr="fetch_status == 'ok'").take_all()
    assert rows
    for r in rows:
        assert r["caption"] == cap_by_id[r["image_id"]]


def test_crawl_two_sort_strategy_matches_oracle(ray_session, tmp_path, fixture_tables):
    """The two-sort chain (URL-keyed dedup sort → seen/robots pools →
    host-rank sort) must produce the identical crawl order and seen-set."""
    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    cfg = cp.CrawlConfig(
        max_waves=3, num_seen_shards=2, dedup_partitions=4,
        schedule_strategy="two_sort",
    )
    result = cp.run_crawl(fr, ps, robots, str(tmp_path / "two_sort"), config=cfg)
    oracle = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=3
    )
    assert _engine_order(result) == oracle.flat_order
    assert result.seen.all_keys() == oracle.seen_keys


def test_donation_plan_boundary_runs():
    """Host runs straddling sorted-block boundaries are donated to the
    block where the run starts — including whole-block donation chains."""
    from news_crawler_ray.stages.index import _donation_plan

    #         b0: A..B   b1: all B   b2: B..C   b3: empty   b4: C..D
    metas = [("a", "b", 5), ("b", "b", 3), ("b", "c", 4), (None, None, 0), ("c", "d", 2)]
    strip, whole, donations = _donation_plan(metas)
    assert whole == [False, True, False, False, False]
    assert strip == [False, False, True, False, True]
    assert donations == {0: [1, 2], 2: [4]}


def test_schedule_sorted_fused_host_complete(ray_session):
    """Every host's rows land in exactly one kernel task: host_rank is
    dense 0..n-1 per host even when the sort splits a host across
    blocks."""
    import ray.data

    from news_crawler_ray.stages.politeness import schedule_sorted_fused

    n = 300
    tbl = pa.table(
        {
            "url": [f"http://h{i % 3}.test/p{i}" for i in range(n)],
            "host": [f"h{i % 3}.test" for i in range(n)],
            "priority": [float(i % 7) for i in range(n)],
            "discovered_at": pa.array([0] * n, pa.timestamp("us")),
            "depth": pa.array([0] * n, pa.int32()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)  # force multi-block sort
    ref = __import__("ray").put({})
    out = schedule_sorted_fused(ds, ref, None, default_delay_ms=10, rank_split=2)
    rows = out.take_all()
    assert len(rows) == n
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["host_rank"])
    for host, ranks in by_host.items():
        assert sorted(ranks) == list(range(100)), host


def test_crawl_fused_strategy_matches_oracle(ray_session, tmp_path, fixture_tables):
    """The one-shuffle fused schedule (non-default; the amortized path
    for long waves / real clusters) must produce the identical crawl
    order and seen-set."""
    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    cfg = cp.CrawlConfig(
        max_waves=3, num_seen_shards=2, dedup_partitions=4,
        schedule_strategy="fused", schedule_partitions=4,
    )
    result = cp.run_crawl(fr, ps, robots, str(tmp_path / "fused"), config=cfg)
    oracle = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=3
    )
    assert _engine_order(result) == oracle.flat_order
    assert result.seen.all_keys() == oracle.seen_keys


def test_resume_discards_partial_wave_output(ray_session, tmp_path, fixture_tables):
    """A run killed mid-wave leaves partial part files under
    fetched/wave-N; the resumed re-run must atomically REPLACE them, not
    append — otherwise fetched/ grows duplicate rows."""
    full = _run(tmp_path, fixture_tables, max_waves=3, out="full2")
    part = _run(tmp_path, fixture_tables, max_waves=1, out="part2")
    # forge a crashed wave-1 attempt: stale partial output + orphan tmp
    stale = tmp_path / "part2" / "fetched" / "wave-1" / "fetch_status=ok"
    stale.mkdir(parents=True)
    ok0 = tmp_path / "part2" / "fetched" / "wave-0"
    import glob as g
    import shutil

    src = g.glob(str(ok0 / "fetch_status=ok" / "*.parquet"))[0]
    shutil.copy(src, stale / "stale-part.parquet")
    resumed = _run(tmp_path, fixture_tables, max_waves=3, resume=True, out="part2")
    assert _engine_order(resumed) == _engine_order(full)
    assert resumed.fetched_dataset().count() == full.fetched_dataset().count()


def test_fully_filtered_wave_publishes_empty_dir(ray_session, tmp_path):
    """A wave whose every candidate is robots-blocked schedules zero
    rows; the wave output must still publish (empty) and metrics record
    zeros instead of crashing the atomic rename."""
    import news_crawler_ray.pipelines.crawl as cp

    ps = synth.make_pagestore(20, seed=42)
    robots = pa.table(
        {
            "host": pa.array(["h0.test"], pa.string()),
            "disallow_prefixes": pa.array([["/"]], pa.list_(pa.string())),
            "crawl_delay_ms": pa.array([100], pa.int32()),
        }
    )
    seeds = pa.table(
        {
            "url": pa.array([f"http://h0.test/p/{i}" for i in range(5)], pa.string()),
            "host": pa.array(["h0.test"] * 5, pa.string()),
            "depth": pa.array([0] * 5, pa.int32()),
            "discovered_at": pa.array([0] * 5, pa.timestamp("us")),
            "priority": pa.array([1.0] * 5, pa.float64()),
        }
    )
    cfg = cp.CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=2)
    res = cp.run_crawl(seeds, ps, robots, str(tmp_path / "blocked"), config=cfg)
    assert res.waves[0].scheduled == 0 and res.waves[0].fetched_ok == 0
    assert (tmp_path / "blocked" / "fetched" / "wave-0").is_dir()


def test_crawl_skewed_hot_host_matches_oracle(ray_session, tmp_path):
    """North-rule skew clause: one host owning ~80% of the frontier must
    still reproduce the sequential oracle's crawl order and seen set
    (the hot host's run is donated into one owner task on the
    key-complete exchange — same result, no wrong-shard routing)."""
    import numpy as np

    import news_crawler_ray.pipelines.crawl as cp

    n = 120
    ps = synth.make_pagestore(150, seed=5)
    urls = [
        f"https://hot.example.com/p/{synth.image_id(k)}"
        if k % 5 != 0
        else synth.url_for(k, seed=5)
        for k in range(n)
    ]
    hosts = [u.split("/")[2] for u in urls]
    seq = np.arange(n, dtype=np.int64)
    fr = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(np.zeros(n, np.int32)),
            "discovered_at": pa.array(
                synth.EPOCH_US + seq * 1_000_000, pa.timestamp("us")
            ),
            "priority": pa.array(1.0 - seq / n, pa.float64()),
        }
    )
    robots = synth.make_robots(seed=5)
    cfg = cp.CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=4)
    result = cp.run_crawl(fr, ps, robots, str(tmp_path / "skew"), config=cfg)
    oracle = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=2
    )
    assert _engine_order(result) == oracle.flat_order
    assert result.seen.all_keys() == oracle.seen_keys


def test_seeds_path_reference_mode_identical_and_resumable(
    ray_session, tmp_path, fixture_tables
):
    """seeds_path references the durable frontier file as wave 0 (no
    copy under out_dir): crawl order and seen set must equal the
    copy-mode run, and a wave-0 resume must re-read the SOURCE path
    via the manifest's seed_source record."""
    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    src = str(tmp_path / "frontier_src.parquet")
    pq.write_table(fr.select([f.name for f in cp.FRONTIER_SCHEMA]), src)

    copy_mode = _run(tmp_path, fixture_tables, max_waves=3, out="copymode")
    cfg = cp.CrawlConfig(max_waves=3, num_seen_shards=2, dedup_partitions=4)
    ref_mode = cp.run_crawl(
        None, ps, robots, str(tmp_path / "refmode"), config=cfg, seeds_path=src
    )
    assert _engine_order(ref_mode) == _engine_order(copy_mode)
    assert ref_mode.seen.all_keys() == copy_mode.seen.all_keys()
    # no wave-0 candidates copy landed in the reference-mode layout
    import os

    assert not os.path.exists(str(tmp_path / "refmode" / "candidates" / "wave-0"))

    # kill-after-nothing resume: wave 0 must re-read the source path
    cfg1 = cp.CrawlConfig(max_waves=1, num_seen_shards=2, dedup_partitions=4)
    part = cp.run_crawl(
        None, ps, robots, str(tmp_path / "refresume"), config=cfg1, seeds_path=src
    )
    assert len(part.waves) == 1
    cfg3 = cp.CrawlConfig(max_waves=3, num_seen_shards=2, dedup_partitions=4)
    resumed = cp.run_crawl(
        None, ps, robots, str(tmp_path / "refresume"), config=cfg3, resume=True
    )
    assert _engine_order(resumed) == _engine_order(copy_mode)

    # schema drift is rejected loudly, not silently cast
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(fr.select(["url", "host"]), bad)
    with pytest.raises(TypeError, match="frontier"):
        cp.run_crawl(
            None, ps, robots, str(tmp_path / "bad_out"), config=cfg1, seeds_path=bad
        )


def test_seen_shard_death_mid_wave_resume_exact(
    ray_session, tmp_path, fixture_tables
):
    """Chaos case: seen-shard actors die MID-WAVE, after some of them
    already flushed an orphan delta checkpoint for the in-flight wave.
    The resume must (a) skip the orphan epoch (that wave re-runs), and
    (b) reproduce the exact crawl order and final seen-set of an
    uninterrupted run — the delta-replay contract at actor-death
    granularity, not just between-wave kills."""
    import os

    import ray as _ray

    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    full = _run(tmp_path, fixture_tables, max_waves=3, out="chaos_full")

    part = _run(tmp_path, fixture_tables, max_waves=2, out="chaos")
    assert len(part.waves) == 2  # completed_through == 1, epochs 1..2 on disk
    seen_dir = os.path.join(str(tmp_path / "chaos"), "seen")

    # Mid-wave-3 crash simulation: shard 0 has absorbed some wave-2 keys
    # and even flushed its epoch-3 delta; the manifest never advanced.
    fake_keys = [bytes([i]) * 20 for i in range(5)]
    _ray.get(part.seen.shards[0].add.remote(fake_keys))
    _ray.get(part.seen.shards[0].checkpoint.remote(seen_dir, 3))
    # ... then every shard actor dies (node loss)
    for s in part.seen.shards:
        _ray.kill(s)

    resumed = _run(tmp_path, fixture_tables, max_waves=3, resume=True, out="chaos")
    assert _engine_order(resumed) == _engine_order(full)
    final_keys = resumed.seen.all_keys()
    assert final_keys == full.seen.all_keys()
    # the orphan epoch's keys were NOT replayed
    assert not (set(fake_keys) & final_keys)


def test_resume_before_wave0_rereads_seed_source(
    ray_session, tmp_path, fixture_tables
):
    """A seeds_path run killed BEFORE wave 0 completed (manifest has
    seed_source, completed_through == -1, no candidates/wave-0 copy)
    must re-read the recorded source on resume — not crash in the
    seeding branch with seeds=None."""
    import json
    import os

    import news_crawler_ray.pipelines.crawl as cp

    ps, fr, robots = fixture_tables
    src = str(tmp_path / "frontier_src0.parquet")
    pq.write_table(fr.select([f.name for f in cp.FRONTIER_SCHEMA]), src)
    out = str(tmp_path / "crash0")
    os.makedirs(os.path.join(out, "candidates"), exist_ok=True)
    os.makedirs(os.path.join(out, "fetched"), exist_ok=True)
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(
            {"completed_through": -1, "waves": [], "seed_source": src}, f
        )
    cfg = cp.CrawlConfig(max_waves=3, num_seen_shards=2, dedup_partitions=4)
    resumed = cp.run_crawl(None, ps, robots, out, config=cfg, resume=True)
    full = _run(tmp_path, fixture_tables, max_waves=3, out="full_w0")
    assert _engine_order(resumed) == _engine_order(full)
    assert resumed.seen.all_keys() == full.seen.all_keys()

    # nothing checkpointed AND no source recorded → loud error, not a
    # seeds=None crash
    out2 = str(tmp_path / "crash0b")
    os.makedirs(os.path.join(out2, "candidates"), exist_ok=True)
    with open(os.path.join(out2, "manifest.json"), "w") as f:
        json.dump({"completed_through": -1, "waves": []}, f)
    with pytest.raises(RuntimeError, match="seed_source"):
        cp.run_crawl(None, ps, robots, out2, config=cfg, resume=True)


def test_resume_with_lagging_manifest_reruns_idempotently(
    ray_session, tmp_path, fixture_tables
):
    """Deferred-finalize crash window: a wave's artifacts (fetched dir,
    candidates, epoch delta) are all durable but its manifest entry
    never landed. Resume must re-run that wave idempotently (atomic
    overwrites) and converge to the uninterrupted run's crawl order and
    seen-set."""
    import json
    import os

    full = _run(tmp_path, fixture_tables, max_waves=3, out="lag_full")
    _run(tmp_path, fixture_tables, max_waves=2, out="lag")
    mpath = os.path.join(str(tmp_path / "lag"), "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    assert m["completed_through"] == 1
    # rewind the manifest one wave: wave 1's entry "never landed"
    m["completed_through"] = 0
    m["waves"] = m["waves"][:1]
    with open(mpath, "w") as f:
        json.dump(m, f)
    resumed = _run(tmp_path, fixture_tables, max_waves=3, resume=True, out="lag")
    assert _engine_order(resumed) == _engine_order(full)
    assert resumed.seen.all_keys() == full.seen.all_keys()
    assert [w.wave for w in resumed.waves] == [w.wave for w in full.waves]


def test_seen_compaction_bounded_files_and_resume(ray_session, tmp_path):
    """VERDICT r4 #4: the wave loop compacts seen-set delta checkpoints
    (retention seen_compact_every finalized epochs, manifest-recorded),
    so a long run keeps a BOUNDED per-shard file count — and a restore
    over the compacted layout reproduces the exact seen-set."""
    import glob as _glob
    import os

    import pyarrow as pa

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from news_crawler_ray.stages.seen import SeenSet

    # chain store: page i's caption links to page i+1 → exactly one
    # candidate per wave, so the crawl sustains max_waves waves
    n = 12
    host = "news0.example.com"
    store = synth.make_pagestore(n, seed=13)
    ids = store["image_id"].to_pylist()
    caps = [
        "scene detail"
        + (f" link:https://{host}/p/{ids[i + 1]}" if i + 1 < n else "")
        for i in range(n)
    ]
    store = store.set_column(
        store.column_names.index("caption"), "caption",
        pa.array(caps, pa.string()),
    )
    frontier = pa.table(
        {
            "url": pa.array([f"https://{host}/p/{ids[0]}"], pa.string()),
            "host": pa.array([host], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "discovered_at": pa.array([0], pa.timestamp("us")),
            "priority": pa.array([1.0], pa.float64()),
        }
    )
    robots = synth.make_robots(seed=42)

    out = str(tmp_path / "run")
    cfg = CrawlConfig(
        max_waves=10, num_seen_shards=2, dedup_partitions=2,
        seen_compact_every=3,
    )
    res = run_crawl(frontier, store, robots, out, config=cfg)
    assert len(res.waves) == 10
    assert all(w.fetched_ok == 1 for w in res.waves)

    # folds landed at finalized epochs 3, 6, 9 → per shard exactly
    # {epoch-9 consolidated, epoch-10 tail} — bounded, not 10 files
    seen_dir = os.path.join(out, "seen")
    for s in range(cfg.num_seen_shards):
        files = sorted(
            _glob.glob(os.path.join(seen_dir, f"part={s}", "epoch-*.parquet"))
        )
        assert len(files) == 2, files
        assert files[-1].endswith("epoch-00000010.parquet")
    import json

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["seen_compacted_through"] == 9

    # identical resume semantics over the compacted layout: a fresh
    # restore reproduces the run's exact seen-set...
    s2 = SeenSet(cfg.num_seen_shards, 1 << 12)
    s2.restore(seen_dir, max_epoch=10)
    assert s2.all_keys() == res.seen.all_keys()
    # ...and a resumed run restores the same state through run_crawl
    res2 = run_crawl(None, store, robots, out, config=cfg, resume=True)
    assert res2.seen.all_keys() == res.seen.all_keys()
    assert len(res2.waves) == 10


def test_crawl_budget_caps(ray_session, tmp_path):
    """Crawl budgets: max_url_depth drops over-deep candidates BEFORE
    the seen mark (the chain stops discovering past the cap), and
    max_pages stops starting new waves once cumulative scheduled URLs
    reach the budget — both against the 12-page chain fixture that
    otherwise sustains 10 single-URL waves."""
    import os

    import pyarrow as pa

    from news_crawler_ray.fixtures import synth
    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    n = 12
    host = "news0.example.com"
    store = synth.make_pagestore(n, seed=13)
    ids = store["image_id"].to_pylist()
    caps = [
        "scene detail"
        + (f" link:https://{host}/p/{ids[i + 1]}" if i + 1 < n else "")
        for i in range(n)
    ]
    store = store.set_column(
        store.column_names.index("caption"), "caption",
        pa.array(caps, pa.string()),
    )
    frontier = pa.table(
        {
            "url": pa.array([f"https://{host}/p/{ids[0]}"], pa.string()),
            "host": pa.array([host], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "discovered_at": pa.array([0], pa.timestamp("us")),
            "priority": pa.array([1.0], pa.float64()),
        }
    )
    robots = synth.make_robots(seed=42)
    common = dict(num_seen_shards=2, dedup_partitions=2)

    # depth cap: seeds at depth 0, children 1, 2, ... → cap 3 admits
    # exactly 4 pages (depths 0-3); wave 5's depth-4 candidate is
    # filtered and the crawl drains
    res_d = run_crawl(
        frontier, store, robots, str(tmp_path / "depth"),
        config=CrawlConfig(**common, max_waves=10, max_url_depth=3),
    )
    assert sum(w.fetched_ok for w in res_d.waves) == 4
    assert len(res_d.waves) <= 5

    # page budget: 1 URL scheduled per wave → budget 3 stops after 3
    res_p = run_crawl(
        frontier, store, robots, str(tmp_path / "pages"),
        config=CrawlConfig(**common, max_waves=10, max_pages=3),
    )
    assert sum(w.scheduled for w in res_p.waves) == 3
    assert len(res_p.waves) == 3
