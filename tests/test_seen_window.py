"""Day-window seen-set scoping + expiry (§2.8 tumbling-window semantics)."""

import hashlib

import pytest

from news_crawler_ray.fixtures import synth


def test_seen_remove_expiry(ray_session):
    from news_crawler_ray.stages.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=1024)
    keys = [hashlib.sha1(f"e{i}".encode()).digest() for i in range(200)]
    seen.add(keys)
    assert seen.size() == 200
    # expire half: bloom counters decrement, cuckoo deletes, exact drops
    removed = seen.remove(keys[:100])
    assert removed == 100 and seen.size() == 100
    back = seen.check_and_add(keys[:100])
    assert back.all()  # expired keys are crawlable again
    still = seen.check_and_add(keys[100:])
    assert not still.any()  # unexpired keys remain seen
    # duplicated keys in one remove batch are deduped (a double-delete
    # could evict another live key's prefilter entry)
    assert seen.remove([keys[150], keys[150], keys[150]]) == 1


def test_crawl_window_scoping(ray_session, tmp_path):
    """Same out_dir: a window scopes the WHOLE run layout. Re-running the
    same window resumes (no re-crawl); a new window re-crawls fresh."""
    import os

    import news_crawler_ray.pipelines.crawl as cp

    ps = synth.make_pagestore(60, seed=42)
    fr = synth.make_frontier(40, seed=42)
    robots = synth.make_robots(seed=42)
    out = str(tmp_path / "w")

    day1 = cp.CrawlConfig(
        max_waves=1, num_seen_shards=2, dedup_partitions=4, seen_epoch_scope="2025-06-20"
    )
    r1 = cp.run_crawl(fr, ps, robots, out, config=day1)
    n1 = r1.waves[0].scheduled
    assert n1 > 0
    assert r1.out_dir == os.path.join(out, "window-2025-06-20")

    # same window, same out_dir, resume: the completed manifest stops the
    # run — nothing is re-fetched, metrics replayed from the manifest
    r1b = cp.run_crawl(fr, ps, robots, out, config=day1, resume=True)
    assert [w.wave for w in r1b.waves] == [0]
    assert r1b.waves[0].scheduled == n1
    assert not os.path.exists(os.path.join(r1b.out_dir, "fetched", "wave-1"))

    # NEW window, same out_dir: a sibling window dir, empty seen-set —
    # the same URLs are crawlable again (tumbling-window semantics)
    day2 = cp.CrawlConfig(
        max_waves=1, num_seen_shards=2, dedup_partitions=4, seen_epoch_scope="2025-06-21"
    )
    r2 = cp.run_crawl(fr, ps, robots, out, config=day2)
    assert r2.out_dir == os.path.join(out, "window-2025-06-21")
    assert r2.waves[0].scheduled == n1
    assert os.path.isdir(os.path.join(out, "window-2025-06-20"))  # day 1 intact


def test_resume_raises_on_missing_seen_checkpoint(ray_session, tmp_path):
    import shutil

    import news_crawler_ray.pipelines.crawl as cp

    ps = synth.make_pagestore(60, seed=42)
    fr = synth.make_frontier(40, seed=42)
    robots = synth.make_robots(seed=42)
    out = str(tmp_path / "x")
    cfg = cp.CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=4)
    cp.run_crawl(fr, ps, robots, out, config=cfg)
    # simulate a layout mismatch: checkpoints vanish but the manifest
    # survives — resume must fail loudly, not re-crawl with empty state
    shutil.rmtree(str(tmp_path / "x" / "seen"))
    with pytest.raises(RuntimeError, match="no seen-set checkpoint"):
        cp.run_crawl(
            fr, ps, robots, out,
            config=cp.CrawlConfig(max_waves=3, num_seen_shards=2, dedup_partitions=4),
            resume=True,
        )


def test_delta_checkpoint_replay_with_removes(ray_session, tmp_path):
    """Checkpoints are per-epoch DELTAS: restore replays adds and
    removes in epoch order and reproduces the exact final set."""
    from news_crawler_ray.stages.seen import SeenSet

    d = str(tmp_path / "seen")
    keys = [bytes([i]) * 20 for i in range(120)]
    seen = SeenSet(2, capacity_per_shard=1 << 12)
    seen.add(keys[:80])
    seen.checkpoint(d, epoch=1)
    seen.remove(keys[:30])
    seen.add(keys[80:])
    seen.checkpoint(d, epoch=2)

    fresh = SeenSet(2, capacity_per_shard=1 << 12)
    fresh.restore(d)
    assert fresh.all_keys() == set(keys[30:])
    # prefilters replayed too: re-checking an expired key reports NEW
    assert fresh.contains([keys[0]])[0] == False  # noqa: E712


def test_restore_skips_orphan_epochs(ray_session, tmp_path):
    """A checkpoint written by a crashed run AFTER the manifest's last
    completed wave must not poison the re-run: restore(max_epoch=k)
    ignores later deltas."""
    from news_crawler_ray.stages.seen import SeenSet

    d = str(tmp_path / "seen")
    keys = [bytes([i]) * 20 for i in range(40)]
    seen = SeenSet(2, capacity_per_shard=1 << 12)
    seen.add(keys[:20])
    seen.checkpoint(d, epoch=1)
    seen.add(keys[20:])  # wave 1 ran its checkpoint...
    seen.checkpoint(d, epoch=2)  # ...but the manifest write never landed

    fresh = SeenSet(2, capacity_per_shard=1 << 12)
    assert fresh.restore(d, max_epoch=1) == 20
    assert fresh.all_keys() == set(keys[:20])


def test_restore_reads_legacy_full_snapshot(ray_session, tmp_path):
    """Pre-delta checkpoints (url_sha1 only, no op column, unpadded
    epoch names) restore as all-adds in numeric epoch order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_crawler_ray.stages.seen import SeenSet

    d = tmp_path / "seen" / "part=0"
    d.mkdir(parents=True)
    keys = [bytes([i]) * 20 for i in range(30)]
    pq.write_table(
        pa.table({"url_sha1": pa.array(keys[:10], pa.binary())}), str(d / "epoch-2.parquet")
    )
    pq.write_table(
        pa.table({"url_sha1": pa.array(keys[10:], pa.binary())}), str(d / "epoch-10.parquet")
    )
    seen = SeenSet(1, capacity_per_shard=1 << 12)
    assert seen.restore(str(tmp_path / "seen")) == 30
    assert seen.all_keys() == set(keys)
    # numeric bound: max_epoch=2 skips the later legacy file
    fresh = SeenSet(1, capacity_per_shard=1 << 12)
    assert fresh.restore(str(tmp_path / "seen"), max_epoch=2) == 10


def test_hopping_window_fanout(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import hopping_window_agg

    # one event at 10:45 must land in the 10:00 and 10:30 windows
    ts = pa.array(
        np.array(["2024-01-01T10:45:00"], dtype="datetime64[us]")
    )
    t = pa.table({"ts": ts, "event_type": pa.array(["a"]), "value": pa.array([7.0])})
    out = hopping_window_agg(
        rd.from_arrow(t), "ts", ["event_type"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
        size_minutes=60, hop_minutes=30,
    )
    rows = sorted(
        (r["window_start"].isoformat(), r["n_events"], r["max_value"])
        for r in out.to_pylist()
    )
    assert rows == [
        ("2024-01-01T10:00:00", 1, 7.0),
        ("2024-01-01T10:30:00", 1, 7.0),
    ]


def test_running_sum_per_key(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import running_sum

    n = 900
    t = pa.table(
        {
            "user_id": pa.array(np.arange(n) % 3, pa.int64()),
            "ts": pa.array(np.arange(n), pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "v_int": pa.array(np.ones(n, np.int64()), pa.int64()),
        }
    )
    ds = rd.from_arrow([t.slice(i, 100) for i in range(0, n, 100)])
    out = {r["event_id"]: r["running"] for r in running_sum(ds, ts_col="ts").take_all()}
    assert len(out) == n
    # event k is the (k//3 + 1)-th event of its user
    for k in (0, 1, 2, 3, 299, 897, 898, 899):
        assert out[k] == k // 3 + 1


def test_decayed_sum(ray_session):
    """Events one/two half-lives old halve/quarter; the newest event
    passes whole; shifts cap at 62."""
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import decayed_sum

    H = 10
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([0, 10, 20, 100_000], pa.timestamp("us")),
            "cents": pa.array([400, 400, 400, 800], pa.int64()),
        }
    )
    out = {r["user_id"]: r for r in decayed_sum(
        rd.from_arrow(t).repartition(2), half_life_us=H
    ).take_all()}
    assert out[1]["decayed_cents"] == 400 + 200 + 100  # ages 20,10,0
    assert out[1]["last_us"] == 20
    assert out[2]["decayed_cents"] == 800


def test_recrawl_schedule(ray_session):
    """Unchanged revisits double the interval (capped); any change
    resets the stability count used for the shift."""
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import recrawl_schedule

    us = 1_000_000
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([10 * us, 20 * us, 30 * us, 10 * us, 40 * us, 5 * us],
                           pa.timestamp("us")),
            # user 1: same value 3x → 2 unchanged revisits → shift 2
            # user 2: two versions → shift 0; user 3: single fetch → shift 0
            "value": pa.array([7.0, 7.0, 7.0, 1.0, 2.0, 9.0]),
        }
    )
    out = {r["user_id"]: r for r in recrawl_schedule(
        rd.from_arrow(t).repartition(3), base_us=3_600_000_000
    ).take_all()}
    assert out[1]["n_versions"] == 1 and out[1]["n_fetches"] == 3
    assert out[1]["next_fetch_us"] == 30 * us + (3_600_000_000 << 2)
    assert out[2]["next_fetch_us"] == 40 * us + 3_600_000_000
    assert out[3]["next_fetch_us"] == 5 * us + 3_600_000_000


def test_global_scan_sum_layout_proof(ray_session):
    """Exclusive prefix sum over the total order is exact and identical
    at every block layout, including zero-valued rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import global_scan_sum

    n = 500
    vals = (np.arange(n) * 7) % 13  # includes zeros
    t = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "n_tokens": pa.array(vals, pa.int64())}
    )
    exp = np.concatenate([[0], np.cumsum(vals)[:-1]])

    for layout in ([t], [t.slice(i, 37) for i in range(0, n, 37)]):
        out = global_scan_sum(
            rd.from_arrow(layout), ["doc_id"], [False], "n_tokens", "tok_start"
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        assert (out["tok_start"].to_numpy() == exp).all()


def test_watermark_window_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.window import watermark_window_counts

    H = 3_600_000_000  # one hour in us
    # arrival order (event_id) vs event time (us since epoch):
    #  id 1: ts 10h     -> no watermark yet, kept
    #  id 2: ts 10.5h   -> wm 10h, kept
    #  id 3: ts 8h      -> wm 10.5h, 8h < 10.5h-1h  => LATE (window 8h)
    #  id 4: ts 10.2h   -> wm 10.5h, >= 9.5h        => kept (window 10h)
    #  id 5: ts 11h     -> kept
    ts_us = [10 * H, 10 * H + H // 2, 8 * H, 10 * H + H // 5, 11 * H]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    for blocks in (1, 4):
        ds = rd.from_arrow(tbl).repartition(blocks)
        out = watermark_window_counts(ds, "ts", "event_id")
        rows = {
            r["window_start"].hour: (r["n_kept"], r["n_late"])
            for r in out.to_pylist()
        }
        assert rows == {8: (0, 1), 10: (3, 0), 11: (1, 0)}
