import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from news_crawler_ray.fixtures import codec, synth


def test_pagestore_schema_and_determinism():
    a = synth.make_pagestore(50, seed=42)
    b = synth.make_pagestore(50, seed=42)
    assert a.equals(b)
    assert a.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert a.num_rows == 50
    assert set(pc.unique(a["fmt"]).to_pylist()) <= {"png", "jpeg"}


def test_pagestore_bytes_decode_invariants():
    t = synth.make_pagestore(30, seed=42)
    for i in range(t.num_rows):
        fmt = t["fmt"][i].as_py()
        px = codec.decode(t["bytes"][i].as_py(), fmt)
        assert px.shape == (t["h"][i].as_py(), t["w"][i].as_py(), 3)
        assert codec.phash64(px) == t["phash"][i].as_py() or fmt == "jpeg"


def test_pagestore_pool_mode():
    t = synth.make_pagestore(40, seed=42, image_pool=5)
    assert len(set(t["bytes"].to_pylist())) == 5
    assert len(set(t["image_id"].to_pylist())) == 40


def test_frontier_has_dups_and_noise():
    t = synth.make_frontier(200, seed=42)
    assert t.num_rows == 220  # 200 + 5% verbatim + 5% noise
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)  # verbatim dups exist
    assert any("[.]" in u or ":443" in u or u.endswith("?") for u in urls)


def test_outlinks_resolve_to_frontier_urls():
    ps = synth.make_pagestore(100, seed=42)
    fr = synth.make_frontier(100, seed=42)
    frontier_urls = set(fr["url"].to_pylist())
    linked = []
    for cap in ps["caption"].to_pylist():
        for tok in cap.split():
            if tok.startswith("link:"):
                linked.append(tok[len("link:") :])
    assert linked, "captions must embed outlinks"
    assert all(u in frontier_urls for u in linked)


def test_robots_and_ioc_pages():
    r = synth.make_robots(seed=42)
    assert r.num_rows == synth.N_HOSTS
    assert set(pc.unique(r["crawl_delay_ms"]).to_pylist()) <= {100, 500, 1000}
    p = synth.make_ioc_pages(24, seed=42)
    assert p.num_rows == 24
    assert all("999.1.1.1" in t for t in p["text"].to_pylist())
    assert len(synth.keywords()) == 28


def test_jsonl_fixture_deterministic_and_readable(ray_session, tmp_path):
    from news_crawler_ray.fixtures.synth import make_jsonl_docs, write_jsonl_gz
    from news_crawler_ray.sources.jsonl import read_jsonl

    a = make_jsonl_docs(50, seed=7)
    b = make_jsonl_docs(50, seed=7)
    assert a == b  # regeneration-stable
    assert a != make_jsonl_docs(50, seed=8)
    p = str(tmp_path / "docs.jsonl.gz")
    write_jsonl_gz(a, p)
    got = read_jsonl(p).to_pandas().sort_values("rec_id", ignore_index=True)
    assert len(got) == 50
    assert got["rec_id"].tolist() == list(range(50))
    assert got.loc[0, "kind"] == a[0]["kind"]


def test_hive_partition_prune_reads_only_selected(ray_session, tmp_path):
    import pyarrow.compute as pc

    from news_crawler_ray.sources.partitioned import (
        list_partitions,
        read_hive_partitioned,
        write_hive_partitioned,
    )

    tbl = pa.table(
        {
            "kind": ["a", "a", "b", "c"],
            "x": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    base = str(tmp_path / "part")
    write_hive_partitioned(tbl, base, "kind")
    write_hive_partitioned(tbl, base, "kind")  # idempotent rerun
    assert list_partitions(base, "kind") == ["a", "b", "c"]
    got = (
        read_hive_partitioned(base, "kind", lambda v: v != "b")
        .to_pandas()
        .sort_values("x", ignore_index=True)
    )
    assert got["x"].tolist() == [1, 2, 4]  # partition b never read
    assert set(got["kind"]) == {"a", "c"}
    import pytest as _pt

    with _pt.raises(ValueError, match="no partition"):
        read_hive_partitioned(base, "kind", lambda v: False)
