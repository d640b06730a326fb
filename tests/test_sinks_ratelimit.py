"""Tests: merge-stable-output sink, token-bucket rate limiting, HTML parse."""

import time

import pyarrow as pa
import pytest

from news_crawler_ray.fixtures import synth


def test_merge_stable_output(ray_session, tmp_path):
    import ray.data as rd

    from news_crawler_ray.stages.sinks import merge_stable_output

    out = str(tmp_path / "rules")
    first = rd.from_items([{"value": v} for v in ["b", "a", "c", "a"]])
    m1 = {r["value"]: r["sid"] for r in merge_stable_output(first, out).take_all()}
    assert m1 == {"a": 7000000, "b": 7000001, "c": 7000002}

    # second run: prior SIDs preserved verbatim, only new values appended
    second = rd.from_items([{"value": v} for v in ["c", "d", "a", "e"]])
    m2 = {r["value"]: r["sid"] for r in merge_stable_output(second, out).take_all()}
    assert m2 == {"a": 7000000, "b": 7000001, "c": 7000002, "d": 7000003, "e": 7000004}

    # idempotent re-run: no changes
    m3 = {r["value"]: r["sid"] for r in merge_stable_output(second, out).take_all()}
    assert m3 == m2

    # past the broadcast bound the merge auto-switches to the sort-merge
    # anti-join — identical rows/sids, no driver materialization
    third = rd.from_items([{"value": v} for v in ["e", "f", "b"]])
    m4 = {
        r["value"]: r["sid"]
        for r in merge_stable_output(
            third, out, broadcast_limit_rows=2
        ).take_all()
    }
    assert m4 == {**m2, "f": 7000005}


def test_token_bucket_pacing(ray_session):
    from news_crawler_ray.stages.ratelimit import RateLimiter

    lim = RateLimiter(num_shards=2, rate_per_s=50.0, burst=5.0)
    lim.reserve("h0.example.com")  # warm up the shard actors (startup RPC)
    lim.reserve("h1.example.com", n=0)
    # burst drains without pacing delays (wall time here is RPC cost only)
    assert sum(lim.wait_turn("h1.example.com") for _ in range(5)) == 0.0
    slept = lim.wait_turn("h1.example.com", n=10)
    assert slept > 0.1  # 10 tokens at 50/s ≈ 0.2s wait
    # independent host unaffected
    assert lim.reserve("h2.example.com") == 0.0
    # salted variants draw from the SAME true-host bucket
    slept_salted = lim.reserve("h1.example.com#3", n=10)
    assert slept_salted > 0.1


def test_salt_hosts_deterministic(ray_session):
    from news_crawler_ray.stages.ratelimit import salt_hosts, true_host

    hosts = ["hot.com"] * 5 + ["cold.com"]
    out = salt_hosts(hosts, num_salts=2, hot={"hot.com"})
    assert out == ["hot.com#0", "hot.com#1", "hot.com#0", "hot.com#1", "hot.com#0", "cold.com"]
    assert all(true_host(h) in ("hot.com", "cold.com") for h in out)


def test_extract_news_items(ray_session):
    import ray.data as rd

    from news_crawler_ray.functions.dates import parse_korean_dates
    from news_crawler_ray.stages.parse import extract_news_items, keyword_any_match

    pages = synth.make_html_listing(n_pages=3, items_per_page=6, seed=42)
    items = extract_news_items(rd.from_arrow(pages))
    rows = items.take_all()
    assert len(rows) == 18
    for r in rows:
        assert r["link"].startswith("https://news") and "/view?idx=" in r["link"]
        assert r["title"] and "기자 |" in r["writer_line"]
    # M3: dates parse out of the byline
    dates = parse_korean_dates(pa.array([r["writer_line"] for r in rows])).to_pylist()
    assert all(d is not None and d.year == 2025 for d in dates)
    # M7: keyword filter keeps exactly the keyword-bearing half
    kept = keyword_any_match(items, synth.keywords(), col="title").take_all()
    assert len(kept) == 9


def test_daily_digest_ordered(ray_session):
    import numpy as np
    import ray.data as rd

    from news_crawler_ray.stages.sinks import daily_digest

    ts = pa.array(
        np.array(
            ["2024-01-01T09:05:00", "2024-01-01T08:00:00", "2024-01-02T10:30:00"],
            dtype="datetime64[us]",
        )
    )
    t = pa.table(
        {
            "event_id": pa.array([2, 1, 3], pa.int64()),
            "event_type": pa.array(["b", "a", "c"], pa.string()),
            "ts": ts,
        }
    )
    out = {r["day"].isoformat(): r for r in daily_digest(rd.from_arrow(t)).take_all()}
    assert out["2024-01-01"]["n_items"] == 2
    assert out["2024-01-01"]["digest"] == (
        "# digest 2024-01-01\n- 08:00 [a] #1\n- 09:05 [b] #2"
    )
    assert out["2024-01-02"]["digest"] == "# digest 2024-01-02\n- 10:30 [c] #3"


@pytest.mark.usefixtures("ray_session")
def test_write_training_shards_resumable(tmp_path):
    """Shard assignment is content-stable (same rows per shard across
    reruns and block layouts), the manifest counts every row exactly
    once, and a rerun over a complete manifest writes nothing."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from news_crawler_ray.stages.sinks import write_training_shards

    tbl = pa.table(
        {
            "image_id": pa.array([f"img{i:06d}" for i in range(500)]),
            "payload": pa.array(np.arange(500), pa.int64()),
        }
    )
    out1 = str(tmp_path / "a")
    m1 = write_training_shards(rd.from_arrow(tbl).repartition(7), out1, num_shards=8)
    assert m1["complete"] and m1["rows"] == 500
    assert sum(m1["per_shard"].values()) == 500

    out2 = str(tmp_path / "b")
    m2 = write_training_shards(rd.from_arrow(tbl).repartition(2), out2, num_shards=8)
    assert m1["per_shard"] == m2["per_shard"]
    for s, n in m1["per_shard"].items():
        d1 = sorted(
            pq.read_table(os.path.join(out1, f"shard-{int(s):05d}"))["image_id"].to_pylist()
        )
        d2 = sorted(
            pq.read_table(os.path.join(out2, f"shard-{int(s):05d}"))["image_id"].to_pylist()
        )
        assert d1 == d2 and len(d1) == n

    # rerun skip: mutate nothing, manifest short-circuits
    before = sorted(os.listdir(out1))
    m3 = write_training_shards(rd.from_arrow(tbl), out1, num_shards=8)
    assert m3 == m1 and sorted(os.listdir(out1)) == before


@pytest.mark.usefixtures("ray_session")
def test_write_training_shards_interrupted_rerun(tmp_path):
    """A rerun after a kill (parts on disk, no manifest) must not
    double rows: stale parts are cleared, the fresh export equals a
    clean one."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from news_crawler_ray.stages.sinks import write_training_shards

    tbl = pa.table(
        {
            "image_id": pa.array([f"img{i:06d}" for i in range(200)]),
            "payload": pa.array(np.arange(200), pa.int64()),
        }
    )
    out = str(tmp_path / "x")
    # simulate a killed first attempt: parts written, manifest missing
    write_training_shards(rd.from_arrow(tbl), out, num_shards=4)
    os.remove(os.path.join(out, "_manifest.json"))
    m = write_training_shards(rd.from_arrow(tbl).repartition(5), out, num_shards=4)
    assert m["rows"] == 200
    total = 0
    for s in m["per_shard"]:
        d = pq.read_table(os.path.join(out, f"shard-{int(s):05d}"))
        assert d["image_id"].to_pandas().is_unique  # no duplicated rows
        total += d.num_rows
    assert total == 200


@pytest.mark.usefixtures("ray_session")
def test_write_training_shards_jsonl_roundtrip(tmp_path):
    """jsonl shards round-trip exactly: every row comes back once,
    binary columns base64-decode to the original bytes."""
    import base64
    import glob
    import gzip
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.stages.sinks import write_training_shards

    tbl = pa.table(
        {
            "image_id": pa.array([f"img{i}" for i in range(60)]),
            "bytes": pa.array([f"payload-{i}".encode() for i in range(60)], pa.binary()),
            "caption": pa.array([f"cap {i}" for i in range(60)]),
        }
    )
    out = str(tmp_path / "j")
    m = write_training_shards(
        rd.from_arrow(tbl).repartition(5), out, num_shards=4, fmt="jsonl"
    )
    assert m["fmt"] == "jsonl" and m["rows"] == 60
    rows = []
    for p in glob.glob(os.path.join(out, "shard-*", "part-*.jsonl.gz")):
        with gzip.open(p, "rt") as f:
            rows.extend(json.loads(line) for line in f)
    assert len(rows) == 60
    got = {r["image_id"]: r for r in rows}
    assert base64.b64decode(got["img7"]["bytes"]) == b"payload-7"
    assert got["img7"]["caption"] == "cap 7"
    with pytest.raises(ValueError):
        write_training_shards(rd.from_arrow(tbl), str(tmp_path / "x"), fmt="csvx")


def test_compact_parquet_dir(ray_session, tmp_path):
    """Many small parts → few balanced files; rows preserved exactly;
    rerun over a complete manifest is a no-op (mtimes untouched)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_crawler_ray.stages.sinks import compact_parquet_dir

    src = tmp_path / "small"
    src.mkdir()
    n = 0
    for k in range(20):  # 20 tiny files
        t = pa.table({"x": pa.array(range(k * 50, k * 50 + 50), pa.int64())})
        pq.write_table(t, src / f"part-{k:03d}.parquet")
        n += 50
    out = tmp_path / "compact"
    m = compact_parquet_dir(str(src), str(out), target_rows_per_file=400)
    assert m["complete"] and m["rows"] == n
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4  # 1000 rows / 400 target
    got = pq.read_table(str(out))
    assert sorted(got["x"].to_pylist()) == list(range(n))
    mtimes = {f: os.path.getmtime(out / f) for f in files}
    m2 = compact_parquet_dir(str(src), str(out), target_rows_per_file=400)
    assert m2 == m
    assert {f: os.path.getmtime(out / f) for f in files} == mtimes
