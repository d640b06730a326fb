import hashlib

import numpy as np
import pyarrow as pa
import pytest

from news_crawler_ray.fixtures import synth
from news_crawler_ray.functions import urlnorm


@pytest.fixture(scope="module")
def frontier_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(synth.make_frontier(300, seed=42))


def test_canonicalize_stage(ray_session, frontier_ds):
    from news_crawler_ray.stages.canonicalize import canonicalize

    out = canonicalize(frontier_ds).take_all()
    for row in out:
        assert "[.]" not in row["url"] and ":443" not in row["url"]
        assert not row["url"].endswith("?")
        assert row["url_sha1"] == hashlib.sha1(row["url"].encode()).digest()
        assert row["host"] in row["url"]


def test_dedup_frontier_exact(ray_session, frontier_ds):
    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.dedup import dedup_frontier

    canon = canonicalize(frontier_ds)
    rows = canon.take_all()
    # oracle: best row per key = max priority, then min discovered_at, min url
    best = {}
    for r in rows:
        k = r["url_sha1"]
        cand = (-r["priority"], r["discovered_at"], r["url"])
        if k not in best or cand < best[k][0]:
            best[k] = (cand, r["url"])
    out = dedup_frontier(canon, num_partitions=4).take_all()
    assert len(out) == len(best)
    got = {r["url_sha1"]: r["url"] for r in out}
    for k, (_, url) in best.items():
        assert got[k] == url


def test_seen_set_shards(ray_session):
    from news_crawler_ray.stages.seen import SeenSet

    seen = SeenSet(num_shards=4, capacity_per_shard=1024)
    keys = [hashlib.sha1(f"u{i}".encode()).digest() for i in range(500)]
    first = seen.check_and_add(keys)
    assert first.all()
    second = seen.check_and_add(keys)
    assert not second.any()
    mixed = keys[:100] + [hashlib.sha1(f"v{i}".encode()).digest() for i in range(50)]
    res = seen.check_and_add(mixed)
    assert not res[:100].any() and res[100:].all()
    assert seen.size() == 550
    st = seen.stats()
    assert sum(s["size"] for s in st) == 550


def test_seen_checkpoint_restore(ray_session, tmp_path):
    from news_crawler_ray.stages.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=256)
    keys = [hashlib.sha1(f"c{i}".encode()).digest() for i in range(100)]
    seen.check_and_add(keys)
    seen.checkpoint(str(tmp_path), epoch=0)
    fresh = SeenSet(num_shards=2, capacity_per_shard=256)
    assert fresh.restore(str(tmp_path)) == 100
    assert not fresh.check_and_add(keys[:10]).any()


def test_seen_filter_stage(ray_session):
    import ray.data as rd

    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.seen import SeenFilterStage, SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=4096)
    urls = [f"https://h{i % 5}.example.com/p/x{i}" for i in range(200)]
    pre_seen = urls[:50]
    seen.add([hashlib.sha1(u.encode()).digest() for u in pre_seen])
    ds = canonicalize(rd.from_items([{"url": u} for u in urls]))
    out = ds.map_batches(
        SeenFilterStage,
        fn_constructor_kwargs={"shards": seen.shards},
        batch_format="pyarrow",
        concurrency=1,
        batch_size=64,
    ).take_all()
    got = {r["url"] for r in out}
    assert got == set(urls[50:])
    assert seen.size() == 200


def test_with_group_rank_and_zip(ray_session):
    import ray.data as rd

    from news_crawler_ray.stages.index import with_group_rank, zip_with_index

    rows = [
        {"g": f"g{i % 7}", "v": float((i * 37) % 100), "u": f"u{i:03d}"}
        for i in range(500)
    ]
    ds = rd.from_items(rows)
    ranked = with_group_rank(ds, "g", ["v", "u"], [True, False], rank_col="rk").take_all()
    by_g = {}
    for r in sorted(rows, key=lambda r: (r["g"], -r["v"], r["u"])):
        by_g.setdefault(r["g"], []).append(r["u"])
    for r in ranked:
        assert by_g[r["g"]][r["rk"]] == r["u"]
    idx = zip_with_index(ds, ["v", "u"], [False, False], rank_col="pos").take_all()
    want = [r["u"] for r in sorted(rows, key=lambda r: (r["v"], r["u"]))]
    for r in idx:
        assert want[r["pos"]] == r["u"]
    # split_output slices ranked blocks (fine downstream tasks) without
    # changing any rank
    split = with_group_rank(
        ds, "g", ["v", "u"], [True, False], rank_col="rk", split_output=3
    ).take_all()
    assert sorted((r["g"], r["rk"], r["u"]) for r in split) == sorted(
        (r["g"], r["rk"], r["u"]) for r in ranked
    )


def test_assign_stable_ids(ray_session):
    import ray.data as rd

    from news_crawler_ray.stages.index import assign_stable_ids

    ds = rd.from_items([{"value": v} for v in ["b", "a", "c", "a", "b", "b"]])
    out = sorted(assign_stable_ids(ds, "value", base=7000000).take_all(), key=lambda r: r["sid"])
    assert [(r["value"], r["sid"]) for r in out] == [
        ("a", 7000000),
        ("b", 7000001),
        ("c", 7000002),
    ]


def test_politeness_schedule(ray_session):
    import ray

    from news_crawler_ray.stages.politeness import robots_table_to_config, schedule

    import ray.data as rd

    robots = synth.make_robots(seed=42)
    cfg = robots_table_to_config(robots)
    ref = ray.put(cfg)
    fr = synth.make_frontier(120, seed=42)
    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.dedup import dedup_frontier

    ds = dedup_frontier(canonicalize(rd.from_arrow(fr)), num_partitions=2)
    out = schedule(ds, ref, concurrency=1).take_all()
    assert out, "schedule must emit rows"
    # crawl_rank is a permutation of 0..n-1 in (fetch_at, -priority, url) order
    out_sorted = sorted(out, key=lambda r: r["crawl_rank"])
    assert [r["crawl_rank"] for r in out_sorted] == list(range(len(out)))
    keys = [(r["fetch_at_us"], -r["priority"], r["url"]) for r in out_sorted]
    assert keys == sorted(keys)
    # per-host spacing honours crawl delay on the virtual clock
    per_host = {}
    for r in out_sorted:
        per_host.setdefault(r["host"], []).append(r)
    for h, rows in per_host.items():
        rows.sort(key=lambda r: r["host_rank"])
        delay = cfg[h][1] if h in cfg else 1000
        for k, r in enumerate(rows):
            assert r["host_rank"] == k
            assert r["fetch_at_us"] == k * delay * 1000
    # robots disallow enforced
    for r in out_sorted:
        if r["host"] in cfg:
            prefixes = cfg[r["host"]][0]
            path = r["url"].split(r["host"], 1)[1]
            assert not any(path.startswith(p) for p in prefixes)


def test_fetch_broadcast_and_join(ray_session):
    import ray
    import ray.data as rd

    from news_crawler_ray.stages.canonicalize import canonicalize
    from news_crawler_ray.stages.fetch import fetch_broadcast, fetch_join

    ps = synth.make_pagestore(80, seed=42)
    fr = synth.make_frontier(80, seed=42)
    wave = canonicalize(rd.from_arrow(fr)).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    # add one URL that misses the store
    import pyarrow as pa

    miss = rd.from_items(
        [{"url": "https://news0.example.com/p/img99999999", "host": "news0.example.com",
          "depth": 0, "discovered_at": 0, "priority": 0.5}]
    )
    out_b = fetch_broadcast(wave, ray.put(ps), concurrency=1).take_all()
    ok = [r for r in out_b if r["fetch_status"] == "ok"]
    assert len(ok) == len(out_b)  # every frontier URL resolves
    cap_by_id = dict(zip(ps["image_id"].to_pylist(), ps["caption"].to_pylist()))
    for r in ok[:20]:
        assert r["caption"] == cap_by_id[r["image_id"]]  # byte-exact caption invariant
    out_j = fetch_join(wave, rd.from_arrow(ps), num_partitions=2).take_all()
    assert len(out_j) == len(out_b)
    assert all(r["fetch_status"] == "ok" for r in out_j)


def test_parse_outlinks_and_filters(ray_session):
    import ray.data as rd
    import pyarrow.compute as pc

    from news_crawler_ray.stages.parse import (
        date_cutoff,
        exclusion_filter,
        extract_outlinks,
        keyword_any_match,
        merged_distinct_iocs,
    )

    ps = synth.make_pagestore(60, seed=42)
    pages = rd.from_arrow(ps.append_column("priority", pa.array([1.0] * 60)))
    links = extract_outlinks(pages).take_all()
    want = sum(1 for c in ps["caption"].to_pylist() for t in c.split() if t.startswith("link:"))
    assert len(links) == want
    for r in links[:10]:
        assert r["url"].startswith("https://") and r["depth"] == 1 and r["priority"] == 0.5

    ioc = synth.make_ioc_pages(30, seed=42)
    ioc_ds = rd.from_arrow(ioc)
    merged = merged_distinct_iocs(ioc_ds).take_all()
    kinds = {r["kind"] for r in merged}
    assert kinds == {"ip", "hash", "url"}
    vals = [(r["kind"], r["value"]) for r in merged]
    assert vals == sorted(vals)
    assert not any("999.1.1.1" == v for _, v in vals)
    assert not any("[.]" in v or "[:]" in v for _, v in vals)
    assert not any(len(v) == 72 for k, v in vals if k == "hash")

    kw = keyword_any_match(ioc_ds, synth.keywords(), col="title").take_all()
    assert 0 < len(kw) < 30
    for r in kw:
        assert any(k in r["title"].lower() for k in synth.keywords())

    today = date_cutoff(ioc_ds, "published", "2025-06-20").take_all()
    assert 0 < len(today) < 30

    url_rows = [r for r in merged if r["kind"] == "url"]
    ex = exclusion_filter(
        rd.from_items(url_rows), set(), exclude_substring="ahnlab.com", col="value"
    ).take_all()
    assert all("ahnlab.com" not in r["value"] for r in ex)
    assert len(ex) < len(url_rows)


def test_seen_checkpoint_compaction(ray_session, tmp_path):
    import glob as _glob
    import os as _os

    import ray as _ray

    from news_crawler_ray.stages.seen import SeenShard, compact_checkpoints

    d = str(tmp_path)
    sh = SeenShard.remote(0, capacity=256)
    k = [hashlib.sha1(f"z{i}".encode()).digest() for i in range(30)]
    _ray.get(sh.add.remote(k[:20]))
    _ray.get(sh.checkpoint.remote(d, 0))
    _ray.get(sh.remove.remote(k[:5]))          # net-absent keys
    _ray.get(sh.add.remote(k[20:]))
    _ray.get(sh.checkpoint.remote(d, 1))
    _ray.get(sh.add.remote(k[:3]))             # re-add some removed
    _ray.get(sh.checkpoint.remote(d, 2))

    expect = set(k[20:]) | set(k[5:20]) | set(k[:3])
    assert compact_checkpoints(d, 0) == 3
    files = _glob.glob(_os.path.join(d, "part=0", "epoch-*.parquet"))
    assert len(files) == 1  # folded into the highest epoch

    fresh = SeenShard.remote(0, capacity=256)
    _ray.get(fresh.restore.remote(d))
    assert set(_ray.get(fresh.keys.remote())) == expect

    # crash window: consolidated written but old deltas NOT yet deleted
    sh2 = SeenShard.remote(1, capacity=256)
    _ray.get(sh2.add.remote(k[:10]))
    _ray.get(sh2.checkpoint.remote(d, 0))
    _ray.get(sh2.remove.remote(k[:10]))
    _ray.get(sh2.checkpoint.remote(d, 1))
    import pyarrow.parquet as _pq

    part = _os.path.join(d, "part=1")
    # the consolidated file must carry explicit 'r' rows so a crash
    # between publish and unlink still replays to the right state
    n = compact_checkpoints(d, 1)
    assert n == 2
    t = _pq.read_table(_os.path.join(part, "epoch-00000001.parquet"))
    assert set(t["op"].to_pylist()) == {"r"}  # all ten net-absent
    fresh2 = SeenShard.remote(1, capacity=256)
    _ray.get(fresh2.restore.remote(d))
    assert _ray.get(fresh2.keys.remote()) == []


def test_sitemap_extract(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.stages.rss import (
        extract_sitemap_urls_batch,
        parse_sitemaps,
    )

    t = pa.table(
        {
            "sitemap_id": ["a", "b", "c"],
            "xml": [
                "<urlset><url><loc>http://x/1</loc><lastmod>2025-01-02</lastmod>"
                "</url><url><loc>http://x/2</loc></url></urlset>",
                "<urlset></urlset>",  # empty sitemap: zero rows out
                "<url><loc>http://y/1</loc></url>",
            ],
        }
    )
    out = extract_sitemap_urls_batch(t)
    assert out.to_pylist() == [
        {"sitemap_id": "a", "url": "http://x/1", "lastmod": "2025-01-02"},
        {"sitemap_id": "a", "url": "http://x/2", "lastmod": ""},
        {"sitemap_id": "c", "url": "http://y/1", "lastmod": ""},
    ]
    ds_out = parse_sitemaps(rd.from_arrow(t).repartition(3)).take_all()
    assert len(ds_out) == 3


def test_ipc_source_roundtrip(ray_session, tmp_path):
    import pyarrow as pa

    from news_crawler_ray.sources.ipc import read_ipc, write_ipc_shards

    t = pa.table(
        {
            "k": pa.array(list(range(97)), pa.int64()),
            "s": pa.array([f"v{i}" for i in range(97)], pa.string()),
            "b": pa.array([bytes([i])*3 for i in range(97)], pa.binary()),
        }
    )
    paths = write_ipc_shards(t, str(tmp_path), num_shards=5)
    assert len(paths) == 5
    got = read_ipc(str(tmp_path)).take_all()
    assert len(got) == 97
    by_k = {r["k"]: r for r in got}
    assert by_k[42]["s"] == "v42" and by_k[42]["b"] == bytes([42]) * 3
    # re-write is idempotent (atomic replace), re-read identical
    write_ipc_shards(t, str(tmp_path), num_shards=5)
    assert len(read_ipc(str(tmp_path)).take_all()) == 97


def test_wet_source_roundtrip_adversarial_payloads(ray_session, tmp_path):
    """Content-Length framing must round-trip payloads that LOOK like
    record boundaries: embedded WARC/1.0 header lines, CRLFCRLF runs,
    multibyte UTF-8, and empty text."""
    import pyarrow as pa

    from news_crawler_ray.sources.wet import read_wet, write_wet_shards

    texts = [
        "plain text",
        "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake inner record",
        "tail\r\n\r\n\r\n\r\nmore",
        "한국어 텍스트 · ümlaut — 🙂",
        "",
    ]
    t = pa.table(
        {
            "rec_id": pa.array(list(range(len(texts))), pa.int64()),
            "url": pa.array(
                [f"https://h{i}.example/p{i}" for i in range(len(texts))],
                pa.string(),
            ),
            "text": pa.array(texts, pa.string()),
        }
    )
    write_wet_shards(t, str(tmp_path), num_shards=2)
    got = {r["rec_id"]: r for r in read_wet(str(tmp_path)).take_all()}
    assert len(got) == len(texts)
    for i, text in enumerate(texts):
        assert got[i]["text"] == text
        assert got[i]["url"] == f"https://h{i}.example/p{i}"
        assert got[i]["n_bytes"] == len(text.encode("utf-8"))
    # idempotent re-write, identical re-read
    write_wet_shards(t, str(tmp_path), num_shards=2)
    assert len(read_wet(str(tmp_path)).take_all()) == len(texts)


def test_orc_source_roundtrip_and_pruning(ray_session, tmp_path):
    import pyarrow as pa

    from news_crawler_ray.sources.orcsrc import read_orc, write_orc_shards

    t = pa.table(
        {
            "k": pa.array(list(range(83)), pa.int64()),
            "s": pa.array([f"v{i}" for i in range(83)], pa.string()),
            "x": pa.array([i * 1.5 for i in range(83)], pa.float64()),
        }
    )
    paths = write_orc_shards(t, str(tmp_path), num_shards=4)
    assert len(paths) == 4
    got = read_orc(str(tmp_path)).take_all()
    assert len(got) == 83
    by_k = {r["k"]: r for r in got}
    assert by_k[17]["s"] == "v17" and by_k[17]["x"] == 25.5
    # column pruning: unselected columns never surface
    pruned = read_orc(str(tmp_path), columns=["k"]).take_all()
    assert set(pruned[0].keys()) == {"k"}
    # idempotent re-write (atomic replace), identical re-read
    write_orc_shards(t, str(tmp_path), num_shards=4)
    assert len(read_orc(str(tmp_path)).take_all()) == 83


def test_union_by_name_source(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from news_crawler_ray.sources.evolving import (
        read_union_by_name,
        union_schema,
    )

    g0 = pa.table(
        {
            "id": pa.array([0, 1], pa.int64()),
            "a": pa.array(["x", "y"], pa.string()),
        }
    )
    g1 = pa.table(
        {
            "id": pa.array([2, 3], pa.int64()),
            "b": pa.array([7, 8], pa.int64()),
        }
    )
    pq.write_table(g0, str(tmp_path / "gen-0.parquet"))
    pq.write_table(g1, str(tmp_path / "gen-1.parquet"))
    got = sorted(read_union_by_name(str(tmp_path)).take_all(), key=lambda r: r["id"])
    assert [set(r.keys()) for r in got] == [{"id", "a", "b"}] * 4
    assert got[0]["a"] == "x" and got[0]["b"] is None
    assert got[3]["a"] is None and got[3]["b"] == 8
    # type drift raises loudly, naming the column
    bad = pa.table({"id": pa.array([4], pa.int64()), "a": pa.array([1.5], pa.float64())})
    pq.write_table(bad, str(tmp_path / "gen-2.parquet"))
    with _pytest.raises(TypeError, match="'a' drifted"):
        union_schema([str(tmp_path / f"gen-{i}.parquet") for i in range(3)])


def test_extract_anchor_texts_batch():
    """Paired (href, anchor) recovery: multi-anchor pages explode one
    row per anchor with the right host; pages without anchors emit
    nothing; body text containing quotes doesn't confuse the pairing."""
    import pyarrow as pa

    from news_crawler_ray.stages.parse import extract_anchor_texts_batch

    html = (
        '<p>pre "quoted" text</p>'
        '<a href="https://a.example/x">first link</a>mid'
        '<a href="http://b.example/y?q=1">second</a>'
    )
    real_world = (
        # attributes before href, single quotes, nested inline elements
        '<a class="nav" rel="nofollow" href="https://c.example/z">has <b>bold</b> text</a>'
        "<a href='https://d.example/sq' target='_blank'>single quoted</a>"
        # '">…</a>' appearing in plain text after a quote-free prefix
        # must NOT produce a false anchor row
        '<p>not a tag "> fake</a></p>'
        # an <a> with no href (named anchor) emits nothing
        '<a name="top">no href</a>'
    )
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [html, "<p>no anchors here</p>", real_world],
        }
    )
    out = extract_anchor_texts_batch(t).to_pylist()
    assert out == [
        {"doc_id": 1, "host": "a.example", "href": "https://a.example/x", "anchor": "first link"},
        {"doc_id": 1, "host": "b.example", "href": "http://b.example/y?q=1", "anchor": "second"},
        {"doc_id": 3, "host": "c.example", "href": "https://c.example/z", "anchor": "has bold text"},
        {"doc_id": 3, "host": "d.example", "href": "https://d.example/sq", "anchor": "single quoted"},
    ]


def test_read_pagestore_lance_branch_by_mock(monkeypatch, tmp_path):
    """The read_lance branch (BASELINE.json input_hint names Lance
    tables; the sandbox lacks the package) stays exercised: a mock
    lance module + read_lance spy assert the Lance path routes with
    pruned columns, and a missing package raises the documented error
    instead of silently reading parquet."""
    import sys
    import types

    import ray.data as rd

    from news_crawler_ray.sources import pagestore

    calls = []

    def fake_read_lance(path, columns=None):
        calls.append((path, tuple(columns or [])))
        return "LANCE_DS"

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    out = pagestore.read_pagestore(
        str(tmp_path / "store.lance"), columns=["image_id", "phash"]
    )
    assert out == "LANCE_DS"
    assert calls == [(str(tmp_path / "store.lance"), ("image_id", "phash"))]

    # the _versions-dir layout detection routes to Lance too
    vdir = tmp_path / "pages"
    (vdir / "_versions").mkdir(parents=True)
    assert pagestore.read_pagestore(str(vdir)) == "LANCE_DS"

    # without the package the Lance path is a loud error, not a fallback
    monkeypatch.delitem(sys.modules, "lance")
    import builtins

    real_import = builtins.__import__

    def no_lance(name, *a, **k):
        if name == "lance":
            raise ImportError("No module named 'lance'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_lance)
    import pytest as _pytest

    with _pytest.raises(ImportError, match="Lance"):
        pagestore.read_pagestore(str(tmp_path / "store.lance"))
