"""Sharded-store fetch: partition prep + crawl conformance in that mode."""

import pytest

from news_crawler_ray.fixtures import synth
from news_crawler_ray.testing.oracle import crawl_oracle


@pytest.fixture(scope="module")
def sharded_store(ray_session, tmp_path_factory):
    import ray.data

    from news_crawler_ray.stages.fetch import partition_pagestore

    ps = synth.make_pagestore(150, seed=42)
    d = str(tmp_path_factory.mktemp("store") / "sharded")
    partition_pagestore(ray.data.from_arrow(ps), d, num_shards=4)
    return ps, d


def test_partition_covers_all_rows(ray_session, sharded_store):
    import glob

    import pyarrow.parquet as pq

    ps, d = sharded_store
    got = []
    for path in glob.glob(d + "/shard-*/*.parquet"):
        got.extend(pq.read_table(path)["image_id"].to_pylist())
    assert sorted(got) == sorted(ps["image_id"].to_pylist())


def test_fetch_sharded_matches_broadcast(ray_session, sharded_store):
    import ray
    import ray.data as rd

    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.fetch import broadcast_pagestore, fetch_broadcast, fetch_sharded

    ps, d = sharded_store
    wave = canonicalize(rd.from_arrow(synth.make_frontier(100, seed=42)))
    via_b = fetch_broadcast(wave, broadcast_pagestore(ps), concurrency=1).take_all()
    via_s = fetch_sharded(wave, d, num_shards=4, concurrency=1).take_all()
    key = lambda r: r["url"]
    b_map = {key(r): (r["fetch_status"], r["caption"]) for r in via_b}
    s_map = {key(r): (r["fetch_status"], r["caption"]) for r in via_s}
    assert b_map == s_map and len(via_b) == len(via_s)


def test_crawl_sharded_mode_matches_oracle(ray_session, sharded_store, tmp_path):
    import news_crawler_ray.pipelines.crawl as cp

    ps, d = sharded_store
    fr = synth.make_frontier(80, seed=42)
    robots = synth.make_robots(seed=42)
    cfg = cp.CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=4)
    res = cp.run_crawl(fr, d, robots, str(tmp_path / "c"), config=cfg)
    oracle = crawl_oracle(
        fr.to_pylist(), ps.to_pylist(), robots.to_pylist(), max_waves=2
    )
    rows = res.fetched_dataset().select_columns(["url", "wave", "crawl_rank"]).take_all()
    rows.sort(key=lambda r: (r["wave"], r["crawl_rank"]))
    assert [r["url"] for r in rows] == oracle.flat_order
    assert res.seen.all_keys() == oracle.seen_keys


def test_crawl_verify_payloads(ray_session, sharded_store, tmp_path):
    import news_crawler_ray.pipelines.crawl as cp
    from news_crawler_ray.fixtures import codec

    ps, d = sharded_store
    fr = synth.make_frontier(60, seed=42)
    robots = synth.make_robots(seed=42)
    cfg = cp.CrawlConfig(
        max_waves=1, num_seen_shards=2, dedup_partitions=4, verify_payloads=True
    )
    res = cp.run_crawl(fr, ps, robots, str(tmp_path / "v"), config=cfg)
    rows = res.fetched_dataset().take_all()
    assert rows and all("bytes" not in r for r in rows)
    stored = dict(zip(ps["image_id"].to_pylist(), ps["phash"].to_pylist()))
    fmts = dict(zip(ps["image_id"].to_pylist(), ps["fmt"].to_pylist()))
    for r in rows:
        if r["fetch_status"] != "ok":
            continue
        assert r["decode_ok"]
        dist = bin(r["phash_check"] ^ stored[r["image_id"]]).count("1")
        assert dist == 0 if fmts[r["image_id"]] == "png" else dist <= 4


def test_fused_fetch_decode_matches_split_chain(ray_session, sharded_store):
    """fetch_decode_sharded ≡ fetch_sharded → decode_features_batch, row
    for row (same columns, same values, missing rows included)."""
    import ray.data as rd

    from news_crawler_ray.ops.multimodal import decode_features_batch
    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.fetch import fetch_decode_sharded, fetch_sharded

    ps, d = sharded_store
    wave = canonicalize(rd.from_arrow(synth.make_frontier(120, seed=7)))
    split = (
        fetch_sharded(wave, d, num_shards=4, concurrency=1)
        .map_batches(decode_features_batch, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    fused = fetch_decode_sharded(wave, d, num_shards=4, batch_size=32).take_all()
    assert split and len(split) == len(fused)
    assert set(split[0].keys()) == set(fused[0].keys())
    key = lambda r: (r["url"], r["priority"], r["discovered_at"])
    assert sorted(split, key=key) == sorted(fused, key=key)


def test_crawl_fused_decode_matches_unfused(ray_session, sharded_store, tmp_path):
    """Whole-pipeline equivalence: run_crawl with fuse_fetch_decode on/off
    over the sharded store produces identical fetched tables."""
    import news_crawler_ray.pipelines.crawl as cp

    ps, d = sharded_store
    fr = synth.make_frontier(80, seed=42)
    robots = synth.make_robots(seed=42)
    outs = []
    for fused in (True, False):
        cfg = cp.CrawlConfig(
            max_waves=2, num_seen_shards=2, dedup_partitions=4,
            verify_payloads=True, fuse_fetch_decode=fused,
        )
        res = cp.run_crawl(fr, d, robots, str(tmp_path / f"f{fused}"), config=cfg)
        rows = res.fetched_dataset().take_all()
        rows.sort(key=lambda r: (r["wave"], r["crawl_rank"]))
        outs.append(rows)
    assert outs[0] == outs[1] and outs[0]


def test_empty_shards_routed_correctly(ray_session, tmp_path):
    """A store whose rows hash into only SOME shards must still fetch
    correctly: the modulus comes from the manifest (not the dir count),
    empty shards exist on disk, and lookups into them yield 'missing'."""
    import ray.data as rd

    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.fetch import (
        fetch_sharded,
        partition_pagestore,
        read_store_manifest,
    )

    ps = synth.make_pagestore(3, seed=42)  # 3 rows over 16 shards → most empty
    d = str(tmp_path / "tiny-store")
    partition_pagestore(rd.from_arrow(ps), d, num_shards=16)
    assert read_store_manifest(d) == 16
    import os

    assert len([x for x in os.listdir(d) if x.startswith("shard-")]) == 16

    wave = canonicalize(rd.from_arrow(synth.make_frontier(40, seed=42)))
    got = {r["url"]: r["fetch_status"] for r in
           fetch_sharded(wave, d, num_shards=16, concurrency=1).take_all()}
    present = set(ps["image_id"].to_pylist())
    for url, status in got.items():
        iid = url.rsplit("/p/", 1)[-1]
        assert status == ("ok" if iid in present else "missing"), url
