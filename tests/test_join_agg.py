"""Unit tests for the sort-exchange operators: ops/agg.sorted_group_agg
and ops/join.sort_merge_{anti,semi}_join.

Both replace hash shuffles with a range-partition sort plus per-block
vectorized kernels; the subtle part is keys straddling block
boundaries, so every test forces many small input blocks with heavily
duplicated keys and compares against an exact in-memory reference.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from news_crawler_ray.ops.agg import sorted_group_agg
from news_crawler_ray.ops.join import sort_merge_anti_join, sort_merge_semi_join


def _blocks(tbl: pa.Table, n: int):
    """Split a table into n blocks (shuffled row order) so the sort
    exchange has real work and boundary keys straddle blocks."""
    rng = np.random.default_rng(7)
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm))
    step = max(1, tbl.num_rows // n)
    return [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]


def _ds(tbl: pa.Table, n_blocks: int = 8):
    import ray.data as rd

    return rd.from_arrow(_blocks(tbl, n_blocks))


# --------------------------------------------------------------------------
# sorted_group_agg
# --------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_matches_exact_reference():
    rng = np.random.default_rng(11)
    n = 5000
    # few distinct keys over many blocks → every boundary straddles
    keys = rng.integers(0, 40, n)
    vals = rng.normal(size=n)
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals)})

    out = sorted_group_agg(
        _ds(tbl, 12),
        ["k"],
        [
            ("n", "count_all", None),
            ("s", "sum", "v"),
            ("mx", "max", "v"),
            ("mn", "min", "v"),
        ],
    )
    got = {r["k"]: r for r in out.take_all()}

    ref = tbl.group_by("k").aggregate(
        [([], "count_all"), ("v", "sum"), ("v", "max"), ("v", "min")]
    )
    assert len(got) == ref.num_rows
    for i in range(ref.num_rows):
        k = ref["k"][i].as_py()
        assert got[k]["n"] == ref["count_all"][i].as_py()
        assert got[k]["s"] == pytest.approx(ref["v_sum"][i].as_py())
        assert got[k]["mx"] == ref["v_max"][i].as_py()
        assert got[k]["mn"] == ref["v_min"][i].as_py()


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_multi_key_and_single_hot_key():
    # one single hot key spanning every block + a tail of singletons
    n_hot, n_tail = 3000, 37
    keys = ["hot"] * n_hot + [f"t{i}" for i in range(n_tail)]
    days = [i % 3 for i in range(n_hot)] + [0] * n_tail
    vals = list(range(n_hot + n_tail))
    tbl = pa.table(
        {
            "k": pa.array(keys),
            "d": pa.array(days, pa.int32()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = sorted_group_agg(
        _ds(tbl, 10), ["k", "d"], [("n", "count_all", None), ("s", "sum", "v")]
    )
    got = {(r["k"], r["d"]): r for r in out.take_all()}
    assert len(got) == 3 + n_tail
    assert got[("hot", 0)]["n"] == n_hot // 3
    hot_total = sum(got[("hot", d)]["s"] for d in range(3))
    assert hot_total == sum(range(n_hot))
    assert got[("t5", 0)] ["n"] == 1


@pytest.mark.usefixtures("ray_session")
def test_sorted_distinct_matches_set_reference():
    from news_crawler_ray.ops.agg import sorted_distinct

    rng = np.random.default_rng(23)
    ks = rng.integers(0, 60, 4000)
    vs = rng.integers(0, 3, 4000)
    tbl = pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.int32())})
    got = {(r["k"], r["v"]) for r in sorted_distinct(_ds(tbl, 10), ["k", "v"]).take_all()}
    assert got == set(zip(ks.tolist(), vs.tolist()))


@pytest.mark.usefixtures("ray_session")
def test_partial_group_agg_empty_specs_is_distinct():
    from news_crawler_ray.ops.agg import partial_group_agg

    tbl = pa.table({"t": pa.array(["b", "a", "b", "c", "a"] * 50)})
    out = partial_group_agg(_ds(tbl, 4), ["t"], [])
    assert out["t"].to_pylist() == ["a", "b", "c"]


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_agg_empty_input():
    tbl = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
    out = sorted_group_agg(_ds(tbl, 1), ["k"], [("n", "count_all", None)])
    assert out.take_all() == []


# --------------------------------------------------------------------------
# sort_merge_anti_join / sort_merge_semi_join
# --------------------------------------------------------------------------


def _random_case(seed: int, n_left: int, n_right: int, domain: int):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, domain, n_left)
    rk = rng.integers(0, domain, n_right)
    left = pa.table(
        {
            "c_custkey": pa.array(lk, pa.int64()),
            "payload": pa.array(rng.integers(0, 1000, n_left), pa.int64()),
        }
    )
    right = pa.table({"c_custkey": pa.array(rk, pa.int64())})
    return left, right, set(lk.tolist()), set(rk.tolist())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,domain", [(3, 30), (4, 2000)])
def test_sort_merge_anti_semi_match_set_reference(seed, domain):
    left, right, lset, rset = _random_case(seed, 4000, 1500, domain)
    lds, rds = _ds(left, 9), _ds(right, 5)

    anti = sort_merge_anti_join(lds, rds, "c_custkey").take_all()
    semi = sort_merge_semi_join(_ds(left, 9), _ds(right, 5), "c_custkey").take_all()

    lk = left["c_custkey"].to_pylist()
    expect_anti = sum(1 for k in lk if k not in rset)
    expect_semi = len(lk) - expect_anti
    assert len(anti) == expect_anti
    assert len(semi) == expect_semi
    assert all(r["c_custkey"] not in rset for r in anti)
    assert all(r["c_custkey"] in rset for r in semi)
    # left payload columns survive untouched
    assert all("payload" in r and r["payload"] is not None for r in anti)

    # anti + semi partition the left rows exactly (multiset of payloads)
    def multiset(rows):
        return sorted((r["c_custkey"], r["payload"]) for r in rows)

    all_left = multiset([{"c_custkey": k, "payload": p} for k, p in
                         zip(lk, left["payload"].to_pylist())])
    assert sorted(multiset(anti) + multiset(semi)) == all_left


@pytest.mark.usefixtures("ray_session")
def test_sort_merge_join_hot_key_and_empty_sides():
    # hot key present on both sides, spanning many blocks
    left = pa.table(
        {
            "c_custkey": pa.array([1] * 2000 + [2] * 5 + [3] * 5, pa.int64()),
            "payload": pa.array(range(2010), pa.int64()),
        }
    )
    right = pa.table({"c_custkey": pa.array([1] * 700 + [3], pa.int64())})
    anti = sort_merge_anti_join(_ds(left, 8), _ds(right, 4), "c_custkey").take_all()
    assert sorted(r["c_custkey"] for r in anti) == [2] * 5
    semi = sort_merge_semi_join(_ds(left, 8), _ds(right, 4), "c_custkey").take_all()
    assert len(semi) == 2005 and {r["c_custkey"] for r in semi} == {1, 3}

    # empty right: anti keeps everything, semi keeps nothing
    import ray.data as rd

    empty_r = rd.from_arrow(right.slice(0, 0))
    assert len(sort_merge_anti_join(_ds(left, 4), empty_r, "c_custkey").take_all()) == 2010
    assert sort_merge_semi_join(_ds(left, 4), empty_r, "c_custkey").take_all() == []

    # empty left
    empty_l = rd.from_arrow(left.slice(0, 0))
    assert sort_merge_anti_join(empty_l, _ds(right, 2), "c_custkey").take_all() == []


def test_sort_merge_asof_join(ray_session):
    """Backward-inclusive as-of join matches a brute-force scan,
    including keys straddling sort blocks and no-match lefts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.join import sort_merge_asof_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 5, 400)
    lt = rng.integers(0, 10_000, 400)
    left = pa.table(
        {
            "lid": pa.array(range(400), pa.int64()),
            "k": pa.array(lk, pa.int64()),
            "ts": pa.array(lt, pa.int64()),
        }
    )
    rk = rng.integers(0, 5, 150)
    rt_raw = rng.integers(0, 10_000, 150)
    # unique (k, ts) on the right for a deterministic survivor
    seen, rows = set(), []
    for i, (k, t) in enumerate(zip(rk, rt_raw)):
        if (k, t) not in seen:
            seen.add((k, t))
            rows.append((int(k), int(t), i))
    right = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "rid": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = sort_merge_asof_join(
        rd.from_arrow(left).repartition(7),
        rd.from_arrow(right).repartition(3),
        key="k", ts_col="ts", right_cols=["rid"],
    ).take_all()
    got = {r["lid"]: r["rid"] for r in out}
    assert len(got) == 400
    by_key: dict = {}
    for k, t, i in rows:
        by_key.setdefault(k, []).append((t, i))
    for lid, (k, t) in enumerate(zip(lk, lt)):
        cands = [(rt, ri) for rt, ri in by_key.get(int(k), []) if rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, t)


def test_sort_merge_range_join(ray_session):
    """Window-bounded range join equals the brute-force pair scan."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.join import sort_merge_range_join

    rng = np.random.default_rng(13)
    lk, lt = rng.integers(0, 4, 200), rng.integers(0, 1000, 200)
    rk, rt = rng.integers(0, 4, 300), rng.integers(0, 1000, 300)
    left = pa.table(
        {"lid": pa.array(range(200), pa.int64()), "k": pa.array(lk, pa.int64()),
         "ts": pa.array(lt, pa.int64())}
    )
    right = pa.table(
        {"k": pa.array(rk, pa.int64()), "ts": pa.array(rt, pa.int64()),
         "rid": pa.array(range(300), pa.int64())}
    )
    out = sort_merge_range_join(
        rd.from_arrow(left).repartition(6), rd.from_arrow(right).repartition(4),
        key="k", ts_col="ts", right_cols=["rid"], low=-50, high=10,
    ).take_all()
    got = sorted((r["lid"], r["rid"]) for r in out)
    want = sorted(
        (int(li), int(ri))
        for li, (k1, t1) in enumerate(zip(lk, lt))
        for ri, (k2, t2) in enumerate(zip(rk, rt))
        if k1 == k2 and t1 - 50 <= t2 <= t1 + 10
    )
    assert got == want and len(want) > 100


def test_connected_components(ray_session):
    """Hash-min label propagation equals the exact closure on a graph
    with a long chain (multi-round convergence), a clique, and a pair."""
    import pyarrow as pa
    import ray.data as rd

    from news_crawler_ray.ops.graph import connected_components

    edges = [(i, i + 1) for i in range(10, 20)]          # chain 10..20
    edges += [(a, b) for a in (30, 31, 32) for b in (31, 32, 33) if a < b]
    edges += [(50, 51)]
    tbl = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    want = {n: 10 for n in range(10, 21)}
    want.update({n: 30 for n in (30, 31, 32, 33)})
    want.update({50: 50, 51: 50})
    # iterative hash-min path (small_input_rows=0 disables the fast path)
    out = connected_components(
        rd.from_arrow(tbl).repartition(5), small_input_rows=0
    ).take_all()
    assert {r["node"]: r["component"] for r in out} == want
    # single-task union-find fast path (default for small edge lists)
    fast = connected_components(rd.from_arrow(tbl).repartition(5)).take_all()
    assert {r["node"]: r["component"] for r in fast} == want


def test_hll_distinct_error_bound_and_determinism(ray_session):
    import numpy as np
    import ray.data as rd

    from news_crawler_ray.ops.agg import hll_distinct, hll_estimate, hll_registers_batch

    n = 60_000
    vals = pa.table({"v": pa.array(np.arange(n, dtype=np.int64))})
    step = -(-n // 16)
    ds = rd.from_arrow([vals.slice(i, step) for i in range(0, n, step)])
    est = hll_distinct(ds, "v", p=12)["n_distinct_est"][0].as_py()
    assert abs(est - n) / n < 0.05  # ~1.6% sigma at p=12
    # distributed merge == single-batch registers (order independence)
    single = hll_estimate(hll_registers_batch(vals["v"], p=12))
    assert est == single
    # duplicate-heavy input: estimate tracks DISTINCT, not rows
    dup = pa.table({"v": pa.array(np.arange(n, dtype=np.int64) % 500)})
    est_dup = hll_distinct(rd.from_arrow(dup), "v", p=12)["n_distinct_est"][0].as_py()
    assert abs(est_dup - 500) / 500 < 0.05


def test_rollup_levels_and_null_grouping(ray_session):
    """The grouper workaround must merge rolled-up groups exactly: this
    pyarrow's multi-key hash group_by splits identical NULL fixed-width
    keys when a var-width key is present (hashes behind the validity
    bitmap), which rollup_agg dodges with a string surrogate key."""
    import numpy as np
    import ray.data as rd

    from news_crawler_ray.ops.agg import rollup_agg

    n = 3000  # large enough to trigger the row-table grouper path
    t = pa.table(
        {
            "a": pa.array(["x", "y", "z"] * (n // 3)),
            "b": pa.array(np.arange(n) % 4, pa.int64()),
            "v": pa.array(np.arange(n, dtype=np.float64)),
        }
    )
    out = rollup_agg(
        rd.from_arrow([t.slice(i, 500) for i in range(0, n, 500)]),
        ["a", "b"],
        [("cnt", "count_all", None), ("mx", "max", "v")],
    )
    rows = {(r["a"], r["b"]): (r["cnt"], r["mx"]) for r in out.to_pylist()}
    assert len(rows) == 1 + 3 + 12  # (), (a), (a,b) — exactly rollup's levels
    assert rows[(None, None)][0] == n
    assert rows[("x", None)][0] == n // 3
    assert rows[("x", 0)] == (n // 12, float(n - 12))


@pytest.mark.usefixtures("ray_session")
def test_group_top_k_matches_sequential_rank():
    """Top-3 per key vs a sequential rank reference; one hot key spans
    many blocks (the skew case the key-complete exchange must handle)
    and a unique key exercises the k > group-size edge."""
    from news_crawler_ray.ops.agg import group_top_k

    rng = np.random.default_rng(7)
    keys = ["hot"] * 400 + [f"k{i % 37}" for i in range(300)] + ["solo"]
    vals = rng.integers(0, 10_000, size=len(keys))
    ids = np.arange(len(keys), dtype=np.int64)
    tbl = pa.table(
        {"k": pa.array(keys), "v": pa.array(vals, pa.int64()), "id": pa.array(ids)}
    )
    out = (
        group_top_k(_ds(tbl, 16), "k", ["v", "id"], [True, False], k=3)
        .to_pandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )

    # sequential reference: sort by (k, -v, id), first 3 per key
    import pandas as pd

    df = tbl.to_pandas().sort_values(
        ["k", "v", "id"], ascending=[True, False, True]
    )
    df["rn"] = df.groupby("k").cumcount() + 1
    ref = df[df["rn"] <= 3][["k", "v", "id", "rn"]].reset_index(drop=True)
    got = out[["k", "v", "id", "rn"]]
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))
    assert (out[out["k"] == "solo"]["rn"] == [1]).all()


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_exact_vs_reference():
    """bloom prefilter + exact verify == plain semi join (bloom false
    positives must not leak), including string keys and an empty right."""
    from news_crawler_ray.ops.join import (
        _bloom_positions,
        bloom_semi_join,
        sort_merge_semi_join,
    )

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 5000, size=6000)
    left = pa.table(
        {"k": pa.array(lk, pa.int64()), "payload": pa.array(np.arange(6000))}
    )
    right = pa.table({"k": pa.array(rng.choice(5000, 80, replace=False), pa.int64())})
    got = (
        bloom_semi_join(_ds(left, 8), _ds(right, 3), "k")
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    ref = (
        sort_merge_semi_join(_ds(left, 8), _ds(right, 3), "k")
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)
    member = set(right["k"].to_pylist())
    assert set(got["k"]) <= member and len(got) == int(
        np.isin(lk, list(member)).sum()
    )
    # empty right → empty result, same schema
    empty = pa.table({"k": pa.array([], pa.int64())})
    assert bloom_semi_join(_ds(left, 4), _ds(empty, 1), "k").count() == 0
    # double-hash probe positions stay in range and use all k slots
    pos = _bloom_positions(rng.integers(0, 2**63, 100, dtype=np.uint64), 1 << 12, 7)
    assert pos.shape == (100, 7) and pos.min() >= 0 and pos.max() < (1 << 12)


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_verdicts():
    """added / removed / changed / unchanged verdicts are exact across
    block layouts; duplicate keys within one snapshot raise loudly."""
    from news_crawler_ray.ops.join import snapshot_diff

    a = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "fp": pa.array(["x", "y", "z", "w"]),
        }
    )
    b = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
            "fp": pa.array(["y", "ZZ", "w", "n"]),
        }
    )
    out = (
        snapshot_diff(_ds(a, 3), _ds(b, 2), "doc_id", "fp")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(zip(out["doc_id"], out["status"])) == [
        (1, "removed"),
        (3, "changed"),
        (5, "added"),
    ]
    dup = pa.table(
        {"doc_id": pa.array([1, 1], pa.int64()), "fp": pa.array(["x", "x"])}
    )
    with pytest.raises(Exception, match="duplicate|appeared"):
        snapshot_diff(_ds(dup, 1), _ds(b, 1), "doc_id", "fp").take_all()


@pytest.mark.usefixtures("ray_session")
def test_sort_merge_inner_join_cartesian_and_guard():
    """Many-to-many keys produce the full per-key cartesian, unmatched
    keys drop, results are block-layout invariant, and the hot-key
    guard raises instead of exploding."""
    import pandas as pd

    from news_crawler_ray.ops.join import sort_merge_inner_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, 3, 3, 9], pa.int64()),
            "lv": pa.array([10, 11, 20, 30, 31, 32, 90], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([1, 1, 2, 4], pa.int64()),
            "rv": pa.array(["a", "b", "c", "d"]),
        }
    )
    got = (
        sort_merge_inner_join(
            _ds(left, 4), _ds(right, 2), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk",
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    ref = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")[["k", "lv", "rv"]]
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))
    assert len(got) == 5  # 2x2 for k=1 + 1x1 for k=2; k=3,9,4 unmatched
    with pytest.raises(Exception, match="max_pairs_per_key|exceeds"):
        sort_merge_inner_join(
            _ds(left, 2), _ds(right, 2), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk",
            max_pairs_per_key=3,
        ).take_all()


@pytest.mark.usefixtures("ray_session")
def test_sort_merge_left_join_null_padding():
    import pandas as pd

    from news_crawler_ray.ops.join import sort_merge_inner_join

    left = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()), "lv": pa.array([10, 20, 30])}
    )
    right = pa.table(
        {"rk": pa.array([1, 1], pa.int64()), "rv": pa.array(["a", "b"])}
    )
    got = (
        sort_merge_inner_join(
            _ds(left, 2), _ds(right, 1), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk", how="left",
        )
        .to_pandas()
        .sort_values(["k", "rv"])
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 1, 2, 3]
    assert got["rv"].tolist()[:2] == ["a", "b"]
    assert pd.isna(got["rv"][2]) and pd.isna(got["rv"][3])


@pytest.mark.usefixtures("ray_session")
def test_cube_agg_all_subsets():
    """CUBE(a, b) emits all four grouping sets with exact counts."""
    from news_crawler_ray.ops.agg import cube_agg

    n = 24
    tbl = pa.table(
        {
            "a": pa.array([f"a{i % 2}" for i in range(n)]),
            "b": pa.array([f"b{i % 3}" for i in range(n)]),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = cube_agg(
        _ds(tbl, 4), ["a", "b"], [("n", "count_all", None), ("mx", "max", "v")]
    ).to_pandas()
    rows = {
        (r["a"], r["b"]): (r["n"], r["mx"]) for _, r in out.iterrows()
    }
    assert len(out) == 2 * 3 + 2 + 3 + 1  # (a,b) + (a) + (b) + ()
    assert rows[(None, None)] == (n, n - 1)
    assert rows[("a0", None)][0] == n // 2
    assert rows[(None, "b1")][0] == n // 3
    assert rows[("a1", "b2")][0] == n // 6


@pytest.mark.usefixtures("ray_session")
def test_rank_window_matches_pandas():
    """rn / pct_rank / ntile against a pandas reference, including the
    uneven-bucket ntile convention and a partition smaller than the
    tile count."""
    import pandas as pd

    from news_crawler_ray.ops.window import rank_window

    rng = np.random.default_rng(3)
    n = 230
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array([f"t{i % 3}" for i in range(n - 2)] + ["solo", "solo"]),
            "v": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )
    out = (
        rank_window(_ds(tbl, 6), "k", "v", "event_id", n_tiles=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["k", "v", "event_id"]).reset_index(drop=True)
    df["rn"] = df.groupby("k").cumcount() + 1
    size = df.groupby("k")["rn"].transform("max")
    df["pct_rank"] = np.where(size > 1, (df["rn"] - 1) / np.maximum(size - 1, 1), 0.0)
    ref = df.sort_values("event_id").reset_index(drop=True)
    assert (out["rn"] == ref["rn"]).all()
    assert np.allclose(out["pct_rank"], ref["pct_rank"], rtol=0, atol=0)
    # ntile: bucket sizes differ by at most 1, first buckets larger
    merged = out.merge(tbl.to_pandas(), on="event_id")
    for k, g in merged.groupby("k"):
        counts = g["tile"].value_counts().sort_index()
        assert counts.max() - counts.min() <= 1
        assert (counts.index == np.arange(1, len(counts) + 1)).all()
        assert counts.is_monotonic_decreasing
    assert set(merged[merged["k"] == "solo"]["tile"]) == {1, 2}


@pytest.mark.usefixtures("ray_session")
def test_lag_lead_partition_edges():
    import pandas as pd

    from news_crawler_ray.ops.window import lag_lead

    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "u": pa.array(["a", "a", "a", "b", "b"]),
            "ts": pa.array([10, 20, 30, 5, 6], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 9.0, 8.0]),
        }
    )
    out = (
        lag_lead(_ds(tbl, 3), "u", ["ts", "event_id"], "event_id", "v")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert pd.isna(out["prev_value"][0]) and out["prev_value"].tolist()[1:3] == [1.0, 2.0]
    assert out["next_value"].tolist()[:2] == [2.0, 3.0] and pd.isna(out["next_value"][2])
    assert pd.isna(out["prev_value"][3]) and out["next_value"][3] == 8.0
    assert out["prev_value"][4] == 9.0 and pd.isna(out["next_value"][4])


@pytest.mark.usefixtures("ray_session")
def test_empty_input_schemas_survive():
    """Empty inputs return the same schema (names AND types) as
    non-empty runs for every key-complete kernel — unions/selects that
    work on data must work on none."""
    import ray.data as rd

    from news_crawler_ray.ops.agg import group_top_k
    from news_crawler_ray.ops.join import snapshot_diff, sort_merge_inner_join
    from news_crawler_ray.ops.window import group_gap_stats, lag_lead

    empty = pa.table(
        {
            "k": pa.array([], pa.string()),
            "v": pa.array([], pa.int64()),
            "id": pa.array([], pa.int64()),
        }
    )
    ds = rd.from_arrow(empty)
    tk = group_top_k(ds, "k", ["v", "id"], [True, False], 3)
    assert tk.schema().names == ["k", "v", "id", "rn"]
    assert [str(t) for t in tk.schema().types] == ["string", "int64", "int64", "int64"]

    jn = sort_merge_inner_join(
        ds, rd.from_arrow(pa.table({"rk": pa.array([], pa.string()),
                                    "rv": pa.array([], pa.float64())})),
        "k", left_cols=["v"], right_cols=["rv"], right_key="rk",
    )
    assert jn.schema().names == ["k", "v", "rv"]
    assert [str(t) for t in jn.schema().types] == ["string", "int64", "double"]

    sd = snapshot_diff(
        rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                "fp": pa.array([], pa.string())})),
        rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                "fp": pa.array([], pa.string())})),
        "url", "fp",
    )
    assert [str(t) for t in sd.schema().types] == ["string", "string"]

    ll = lag_lead(ds, "k", ["v", "id"], "id", "v")
    assert [str(t) for t in ll.schema().types] == ["int64", "int64", "int64"]

    gg = group_gap_stats(ds, "k", "v", ("id",))
    assert gg.schema().names == ["k", "id", "n_events", "min_gap"]
    assert [str(t) for t in gg.schema().types] == ["string", "int64", "int64", "int64"]


@pytest.mark.usefixtures("ray_session")
def test_session_assign_consistent_with_sessionize():
    """Per-event assignment and per-session summaries derive from the
    same break kernel: event counts per (user, session) must equal the
    summaries' n_events; carry_cols ride through; lag_lead keep_value
    emits the row's own value."""
    import pandas as pd

    from news_crawler_ray.ops.window import lag_lead, session_assign, sessionize

    rng = np.random.default_rng(13)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**10, n)).astype("datetime64[us]")
            ),
            "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        }
    )
    ds = _ds(tbl, 6)
    assign = session_assign(
        ds, gap_minutes=30.0, carry_cols=("user_id", "event_type")
    ).to_pandas()
    summary = sessionize(ds, gap_minutes=30.0).to_pandas()
    got = (
        assign.groupby(["user_id", "session_num"])
        .size()
        .reset_index(name="n_events")
        .sort_values(["user_id", "session_num"])
        .reset_index(drop=True)
    )
    ref = summary[["user_id", "session_num", "n_events"]].sort_values(
        ["user_id", "session_num"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(ref.dtypes.to_dict()), ref)
    assert set(assign.columns) == {"event_id", "session_num", "user_id", "event_type"}

    kv = lag_lead(
        ds, "user_id", ["ts", "event_id"], "event_id", "event_type", keep_value=True
    ).to_pandas()
    merged = kv.merge(tbl.to_pandas()[["event_id", "event_type"]], on="event_id")
    assert (merged["value"] == merged["event_type"]).all()


@pytest.mark.usefixtures("ray_session")
def test_sort_merge_full_outer_join():
    import pandas as pd

    from news_crawler_ray.ops.join import sort_merge_inner_join

    left = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "lv": pa.array([10, 20], pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([2, 3], pa.int64()), "rv": pa.array(["b", "c"])}
    )
    got = (
        sort_merge_inner_join(
            _ds(left, 2), _ds(right, 2), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk", how="outer",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3]  # key present even for right-only
    assert got["lv"].tolist()[:2] == [10, 20] and pd.isna(got["lv"][2])
    assert pd.isna(got["rv"][0]) and got["rv"].tolist()[1:] == ["b", "c"]

    # right mode: unmatched RIGHT rows survive null-padded, unmatched
    # left rows (k=1) are dropped
    got_r = (
        sort_merge_inner_join(
            _ds(left, 2), _ds(right, 2), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk", how="right",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got_r["k"].tolist() == [2, 3]
    assert got_r["lv"].tolist()[:1] == [20] and pd.isna(got_r["lv"][1])
    assert got_r["rv"].tolist() == ["b", "c"]


@pytest.mark.usefixtures("ray_session")
def test_group_var_stats_bit_exact_and_layout_proof():
    import duckdb

    from news_crawler_ray.ops.agg import group_var_stats

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 7, n), pa.int64()),
            "v": pa.array(rng.integers(-50000, 50000, n), pa.int64()),
        }
    )
    sql = (
        "WITH m AS (SELECT k, COUNT(*) n, SUM(v) s, SUM(v*v) ss FROM t GROUP BY k) "
        "SELECT k, n AS n_values, CAST(s AS BIGINT) AS sum_v, "
        "CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mean_v, "
        "CAST(ss*n - s*s AS DOUBLE)/CAST(n*n AS DOUBLE) AS var_v, "
        "sqrt(CAST(ss*n - s*s AS DOUBLE)/CAST(n*n AS DOUBLE)) AS std_v "
        "FROM m ORDER BY k"
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(sql).df()
    outs = []
    for blocks in (1, 13):  # layout-proof: single block vs many ragged blocks
        got = group_var_stats(_ds(tbl, blocks), ["k"], "v").to_pandas()
        # BIT-exact float comparison: the whole point of the integer-moment path
        assert got["mean_v"].tolist() == exp["mean_v"].tolist()
        assert got["var_v"].tolist() == exp["var_v"].tolist()
        assert got["std_v"].tolist() == exp["std_v"].tolist()
        assert got["n_values"].tolist() == exp["n_values"].tolist()
        assert got["sum_v"].tolist() == exp["sum_v"].tolist()
        outs.append(got)
    assert outs[0].equals(outs[1])

    # loud overflow guard
    big = pa.table({"k": pa.array([0, 0], pa.int64()),
                    "v": pa.array([1 << 31, 1 << 31], pa.int64())})
    with pytest.raises(Exception, match="overflow"):
        group_var_stats(_ds(big, 1), ["k"], "v").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_rolling_window_bit_exact_vs_duckdb():
    import duckdb

    from news_crawler_ray.ops.window import rolling_window

    rng = np.random.default_rng(5)
    n = 4000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
            "v_int": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        "SELECT event_id, COUNT(*) OVER w AS rolling_n, "
        "CAST(SUM(v_int) OVER w AS BIGINT) AS rolling_sum, "
        "CAST(SUM(v_int) OVER w AS DOUBLE)/CAST(COUNT(*) OVER w AS DOUBLE) AS rolling_avg "
        "FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id"
    ).df()
    for blocks in (1, 11):
        got = (
            rolling_window(_ds(tbl, blocks), "user_id", "ts", "event_id", "v_int", 3)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert got["rolling_n"].tolist() == exp["rolling_n"].tolist()
        assert got["rolling_sum"].tolist() == exp["rolling_sum"].tolist()
        # bit-exact floats: single int/int cast on both sides
        assert got["rolling_avg"].tolist() == exp["rolling_avg"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_stats_planted():
    from news_crawler_ray.ops.text import dup_ngram_stats

    phrase = "the quick brown fox jumps"  # exactly one 5-gram
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta {phrase} gamma delta",   # shares the phrase
                    f"start {phrase} end of line",        # shares the phrase
                    "tiny doc",                            # < 5 tokens → 0 grams
                    "u v w x y z",                         # unique grams only
                ]
            ),
        }
    )
    for blocks in (1, 4):
        got = (
            dup_ngram_stats(_ds(docs, blocks), n=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc0/doc1: 9 tokens → 5 grams each; only the shared full
        # phrase gram is duplicated
        assert got["n_grams"].tolist() == [5, 5, 0, 2]
        assert got["n_dup_grams"].tolist() == [1, 1, 0, 0]
        assert got.loc[2, "dup_gram_ratio"] == 0.0
        assert got.loc[0, "dup_gram_ratio"] == 1.0 / 5.0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_matches_plain_join(how):
    import duckdb

    from news_crawler_ray.ops.join import skew_join

    rng = np.random.default_rng(17)
    # one monster key (2000 rows), a warm key (300), a cold tail, plus
    # a hot key ABSENT from the right side (pad/drop path)
    lk = np.concatenate(
        [np.full(2000, 7), np.full(300, 13), np.full(250, 99),
         rng.integers(0, 60, 500)]
    )
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(np.arange(len(lk)), pa.int64()),
        }
    )
    rk = np.concatenate([[7, 7, 13], np.arange(0, 60, 2)])
    right = pa.table(
        {
            "rk": pa.array(rk, pa.int64()),
            "rv": pa.array(np.arange(len(rk)) * 10, pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    exp = con.sql(
        f"SELECT k, lv, rv FROM l {join_kw} r ON k = rk ORDER BY k, lv, rv"
    ).df()
    got = (
        skew_join(
            _ds(left, 7), _ds(right, 3), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk",
            hot_threshold=200, how=how,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_skew_join_salted_both_sides_hot(how):
    """A key hot on BOTH sides (left count > hot_threshold AND right
    rows over the broadcast budget) takes the salted exchange and the
    result stays row-identical to the plain join — alongside a
    broadcast-path hot key, a right-absent hot key, and a cold tail."""
    import duckdb

    from news_crawler_ray.ops.join import skew_join

    rng = np.random.default_rng(23)
    # key 7: hot both sides (500 left x 300 right > broadcast budget);
    # key 13: hot left, tiny right (broadcast path); key 99: hot left,
    # absent right (pad/drop); cold tail
    lk = np.concatenate(
        [np.full(500, 7), np.full(250, 13), np.full(260, 99),
         rng.integers(0, 60, 400)]
    )
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(np.arange(len(lk)), pa.int64()),
        }
    )
    rk_vals = np.concatenate([np.full(300, 7), [13, 13], np.arange(0, 60, 2)])
    right = pa.table(
        {
            "rk": pa.array(rk_vals, pa.int64()),
            "rv": pa.array(np.arange(len(rk_vals)) * 10, pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    join_kw = {"inner": "JOIN", "left": "LEFT JOIN", "outer": "FULL JOIN"}[how]
    exp = con.sql(
        f"SELECT coalesce(k, rk) AS k, lv, rv FROM l {join_kw} r ON k = rk "
        "ORDER BY k, lv, rv"
    ).df()
    got = (
        skew_join(
            _ds(left, 7), _ds(right, 3), "k",
            left_cols=["lv"], right_cols=["rv"], right_key="rk",
            hot_threshold=200, max_broadcast_rows=100, how=how,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].fillna(-1).tolist() == exp["lv"].fillna(-1).tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


@pytest.mark.usefixtures("ray_session")
def test_cm_sketch_one_sided_and_layout_proof():
    from collections import Counter

    from news_crawler_ray.ops.agg import cm_sketch_counts

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    docs = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(60)
    ]
    true = Counter(tok for d in docs for tok in d.split())
    tbl = pa.table({"text": pa.array(docs)})
    probes = ["w0", "w1", "w42", "w199", "never-seen"]
    outs = []
    for blocks in (1, 9):
        got = cm_sketch_counts(_ds(tbl, blocks), probes, w=256, d=3)
        est = dict(zip(got["term"].to_pylist(), got["cm_count"].to_pylist()))
        for t in probes:
            assert est[t] >= true.get(t, 0)  # CM never underestimates
        outs.append(got)
    assert outs[0].equals(outs[1])  # sketch merge is layout-invariant


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_known_graphs():
    from news_crawler_ray.ops.graph import triangle_count

    # K4 on {0,1,2,3}: 4 triangles
    k4 = pa.table(
        {
            "a": pa.array([0, 0, 0, 1, 1, 2], pa.int64()),
            "b": pa.array([1, 2, 3, 2, 3, 3], pa.int64()),
        }
    )
    # square 4-5-6-7 with one diagonal 4-6: 2 triangles
    sq = pa.table(
        {
            "a": pa.array([4, 4, 5, 6, 4], pa.int64()),
            "b": pa.array([5, 7, 6, 7, 6], pa.int64()),
        }
    )
    both = pa.concat_tables([k4, sq])
    for blocks in (1, 5):
        out = triangle_count(_ds(both, blocks), node_cap=8)
        assert out["n_triangles"].to_pylist() == [6]

    # hub guard fires loudly
    hub = pa.table(
        {
            "a": pa.array(np.zeros(50, np.int64)),
            "b": pa.array(np.arange(1, 51), pa.int64()),
        }
    )
    with pytest.raises(Exception, match="max_adjacency"):
        triangle_count(_ds(hub, 2), node_cap=64, max_adjacency=10)

    # degree-ordered relabel: a hub graph passes with the SAME tiny
    # max_adjacency (the hub relabels to the highest rank and is never
    # a wedge pivot) and the count is exact. Edges (all distinct,
    # canonical): hub 0-(1..50), triangle edges among {1,2,3}, and the
    # diagonal square {4..7} whose nodes the hub already reaches.
    hub_tris = pa.concat_tables(
        [
            hub,
            pa.table(
                {
                    "a": pa.array([1, 1, 2, 4, 4, 5, 6, 4], pa.int64()),
                    "b": pa.array([2, 3, 3, 5, 7, 6, 7, 6], pa.int64()),
                }
            ),
        ]
    )
    import duckdb

    con = duckdb.connect()
    con.register("e", hub_tris)
    exp = con.sql(
        "SELECT count(*) FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"
    ).fetchone()[0]
    assert exp == 11  # 4 in K4{0,1,2,3}, 5 hub+sq-edge, 2 sq-internal
    # plain path at the same tiny cap raises (hub pivot = 50 neighbors)
    with pytest.raises(Exception, match="max_adjacency"):
        triangle_count(_ds(hub_tris, 3), node_cap=64, max_adjacency=10)
    out = triangle_count(
        _ds(hub_tris, 3), node_cap=64, max_adjacency=10, degree_ordered=True
    )
    assert out["n_triangles"].to_pylist() == [exp]
    # and agrees with the plain path when the cap is not binding
    out_plain = triangle_count(_ds(hub_tris, 3), node_cap=64)
    assert out_plain["n_triangles"].to_pylist() == [exp]


@pytest.mark.usefixtures("ray_session")
def test_profile_table_with_planted_nulls():
    from news_crawler_ray.ops.agg import profile_table

    tbl = pa.table(
        {
            "a": pa.array([1, 1, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "x", "y"]),
        }
    )
    for blocks in (1, 3):
        got = profile_table(_ds(tbl, blocks), ["a", "b"]).to_pandas()
        got = got.set_index("col")
        assert got.loc["a"].tolist() == [5, 1, 3]
        assert got.loc["b"].tolist() == [5, 2, 2]


@pytest.mark.usefixtures("ray_session")
def test_rank_with_ties_known_values():
    from news_crawler_ray.ops.window import rank_with_ties

    # key a: order values [5, 5, 7] -> rank [1,1,3], dense [1,1,2]
    # key b: order values [2, 2, 2] -> rank [1,1,1], dense [1,1,1]
    tbl = pa.table(
        {
            "k": ["a", "a", "a", "b", "b", "b"],
            "o": pa.array([5, 7, 5, 2, 2, 2], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    for blocks in (1, 4):
        got = (
            rank_with_ties(_ds(tbl, blocks), "k", "o", "id")
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        assert got["rn"].tolist() == [1, 3, 2, 1, 2, 3]
        assert got["rank"].tolist() == [1, 3, 1, 1, 1, 1]
        assert got["dense_rank"].tolist() == [1, 2, 1, 1, 1, 1]
        # cume_dist: key a orders [5,5,7] -> [2/3, 1, 2/3]; key b all ties -> 1
        assert got["cume_dist"].tolist() == [2 / 3, 1.0, 2 / 3, 1.0, 1.0, 1.0]


@pytest.mark.usefixtures("ray_session")
def test_group_first_last_and_fill_forward():
    from news_crawler_ray.ops.window import fill_forward, group_first_last

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "ts": pa.array([10, 20, 30, 5, 6], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([None, 1.5, None, None, 2.0], pa.float64()),
            "lbl": ["x", "y", "z", "p", "q"],
        }
    )
    for blocks in (1, 3):
        fl = (
            group_first_last(_ds(tbl, blocks), "k", ["ts", "id"], "lbl")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert fl["first_value"].tolist() == ["x", "p"]
        assert fl["last_value"].tolist() == ["z", "q"]
        assert fl["n_rows"].tolist() == [3, 2]

        ff = (
            fill_forward(_ds(tbl, blocks), "k", ["ts", "id"], "id", "v")
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        # leading null stays null; fills never cross the key boundary
        got = ff["filled"].tolist()
        assert got[0] != got[0]  # NaN (leading null in key a)
        assert got[1] == 1.5 and got[2] == 1.5
        assert got[3] != got[3]  # leading null in key b, not 1.5 from a
        assert got[4] == 2.0


@pytest.mark.usefixtures("ray_session")
def test_group_count_distinct_excludes_nulls():
    from news_crawler_ray.ops.agg import group_count_distinct

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "v": pa.array([1, 1, 2, None, None, None], pa.int64()),
        }
    )
    for blocks in (1, 3):
        got = group_count_distinct(_ds(tbl, blocks), "k", "v").to_pandas()
        got = got.set_index("k")["n_distinct"]
        assert got["a"] == 2
        assert got["b"] == 0


@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_cont_matches_formula():
    import numpy as np

    from news_crawler_ray.ops.agg import group_quantiles_cont

    rng = np.random.default_rng(11)
    ka = rng.uniform(0, 100, 37)
    kb = rng.uniform(-5, 5, 8)
    tbl = pa.table(
        {
            "k": ["a"] * 37 + ["b"] * 8,
            "v": pa.array(np.concatenate([ka, kb]), pa.float64()),
        }
    )

    def expect(vals, p):
        s = np.sort(vals)
        rn = (p / 100) * (len(s) - 1)
        frn, crn = int(np.floor(rn)), int(np.ceil(rn))
        if crn == frn:
            return s[frn]
        return s[frn] * (crn - rn) + s[crn] * (rn - frn)

    for blocks in (1, 5):
        got = group_quantiles_cont(
            _ds(tbl, blocks), "k", "v", percents=(25, 50, 90)
        ).to_pandas()
        for _, row in got.iterrows():
            vals = ka if row["k"] == "a" else kb
            assert row["v"] == expect(vals, row["pct"])  # bit-exact


@pytest.mark.usefixtures("ray_session")
def test_hourly_dense_zero_fills_gaps(tmp_path):
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_events_hourly_dense

    # two types, 4-hour span, with holes: type a misses hours 1-2,
    # type b only has hour 2
    ts = pa.array(
        [
            np.datetime64("2024-01-01T00:10", "us"),
            np.datetime64("2024-01-01T03:20", "us"),
            np.datetime64("2024-01-01T02:30", "us"),
        ],
        pa.timestamp("us"),
    )
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": ["a", "a", "b"],
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": ["{}", "{}", "{}"],
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_hourly_dense(str(tmp_path)).to_pandas()
    assert len(got) == 8  # 2 types x 4 hours, gaps included
    assert got["n_events"].sum() == 3
    a = got[got["event_type"] == "a"].sort_values("hour_start")
    assert a["n_events"].tolist() == [1, 0, 0, 1]
    b = got[got["event_type"] == "b"].sort_values("hour_start")
    assert b["n_events"].tolist() == [0, 0, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_set_ops_distinct_semantics():
    from news_crawler_ray.ops.join import set_except, set_intersect

    left = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3], pa.int64())})
    right = pa.table({"k": pa.array([2, 2, 3, 4], pa.int64())})
    for blocks in (1, 3):
        inter = sorted(
            set_intersect(_ds(left, blocks), _ds(right, blocks), ["k"])
            .to_pandas()["k"]
            .tolist()
        )
        assert inter == [2, 3]  # distinct, both sides
        exc = sorted(
            set_except(_ds(left, blocks), _ds(right, blocks), ["k"])
            .to_pandas()["k"]
            .tolist()
        )
        assert exc == [1]  # distinct, left only
        with pytest.raises(ValueError, match="intersect"):
            from news_crawler_ray.ops.join import set_op

            set_op(_ds(left, 1), _ds(right, 1), ["k"], "union")


@pytest.mark.usefixtures("ray_session")
def test_weighted_group_median(ray_session):
    """Lower weighted median (2·cum >= total) with ties, zero weights,
    and exact-half boundaries; layout-invariant."""
    import ray.data as rd

    from news_crawler_ray.ops.agg import weighted_group_median

    rows = (
        # key a: weights 1,1,1,1 over 10,20,30,40 → total 4, cum@20=2 → 20
        [{"k": "a", "v": 10 * m, "w": 1} for m in (1, 2, 3, 4)]
        # key b: heavy tail — 5@100 crosses half of 8 at value 100
        + [{"k": "b", "v": 1, "w": 3}, {"k": "b", "v": 100, "w": 5}]
        # key c: zero-weight rows never selected; crossing at 7
        + [{"k": "c", "v": 5, "w": 0}, {"k": "c", "v": 7, "w": 2},
           {"k": "c", "v": 9, "w": 0}]
    )
    tbl = pa.Table.from_pylist(rows).cast(
        pa.schema([("k", pa.string()), ("v", pa.int64()), ("w", pa.int64())])
    )
    for nblocks in (1, 4):
        out = {
            r["k"]: r["m"]
            for r in weighted_group_median(
                rd.from_arrow(tbl).repartition(nblocks), "k", "v", "w", out_col="m"
            ).take_all()
        }
        assert out == {"a": 20, "b": 100, "c": 7}


def test_weighted_group_quantiles(ray_session):
    """Histogram quantiles match quantile_disc on the expanded data,
    across layouts and with multi-block keys."""
    import duckdb
    import ray.data as rd

    from news_crawler_ray.ops.agg import weighted_group_quantiles

    rng = np.random.default_rng(5)
    rows = [
        {"k": k, "v": int(v), "n": int(n)}
        for k in ("a", "b")
        for v, n in zip(rng.integers(0, 50, 40), rng.integers(1, 9, 40))
    ]
    tbl = pa.Table.from_pylist(rows).cast(
        pa.schema([("k", pa.string()), ("v", pa.int64()), ("n", pa.int64())])
    )
    expanded = duckdb.sql(
        "SELECT k, CAST(unnest([25,50,75]) AS BIGINT) AS pct, "
        "unnest(quantile_disc(v, [0.25,0.5,0.75])) AS value FROM ("
        "  SELECT k, v FROM tbl, LATERAL (SELECT unnest(generate_series(1, n)))"
        ") GROUP BY k ORDER BY k, pct"
    ).df()
    for nblocks in (1, 5):
        got = (
            weighted_group_quantiles(
                rd.from_arrow(tbl).repartition(nblocks), "k", "v", "n"
            )
            .to_pandas()
            .sort_values(["k", "pct"], ignore_index=True)
        )
        assert list(got["value"]) == list(expanded["value"])


def test_group_corr_bit_exact():
    import math

    from news_crawler_ray.ops.agg import group_corr

    rng = np.random.default_rng(3)
    x = rng.integers(1, 50, 500)
    y = 3 * x + rng.integers(-20, 20, 500)  # strongly correlated
    tbl = pa.table(
        {
            "k": ["g"] * 500,
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )

    def expect():
        n = 500
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x.astype(object) * x).sum())
        syy = int((y.astype(object) * y).sum())
        sxy = int((x.astype(object) * y).sum())
        return float(n * sxy - sx * sy) / (
            math.sqrt(float(n * sxx - sx * sx))
            * math.sqrt(float(n * syy - sy * sy))
        )

    want = expect()
    got1 = group_corr(_ds(tbl, 1), ["k"], "x", "y")["corr_xy"][0].as_py()
    got5 = group_corr(_ds(tbl, 5), ["k"], "x", "y")["corr_xy"][0].as_py()
    assert got1 == want and got5 == want  # bit-exact at any layout
    assert got1 > 0.95

    # zero-variance group -> null
    flat = pa.table(
        {
            "k": ["z"] * 4,
            "x": pa.array([7, 7, 7, 7], pa.int64()),
            "y": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = group_corr(_ds(flat, 2), ["k"], "x", "y")
    assert out["corr_xy"][0].as_py() is None


@pytest.mark.usefixtures("ray_session")
def test_group_linreg_bit_exact():
    from news_crawler_ray.ops.agg import group_linreg

    rng = np.random.default_rng(11)
    x = rng.integers(0, 100, 600)
    y = 5 * x + rng.integers(-30, 30, 600)
    tbl = pa.table(
        {
            "k": ["g"] * 600,
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )

    def expect():
        n = 600
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x.astype(object) * x).sum())
        syy = int((y.astype(object) * y).sum())
        sxy = int((x.astype(object) * y).sum())
        num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        slope = float(num) / float(dx)
        inter = (float(sy) - slope * float(sx)) / float(n)
        r2 = (float(num) * float(num)) / (float(dx) * float(dy))
        return slope, inter, r2

    ws, wi, wr = expect()
    for nblocks in (1, 7):
        row = group_linreg(_ds(tbl, nblocks), ["k"], "x", "y").to_pylist()[0]
        # bit-exact at any layout, and ~= the planted line y = 5x + noise
        assert (row["slope"], row["intercept"], row["r2"]) == (ws, wi, wr)
    assert abs(ws - 5.0) < 0.1 and wr > 0.95

    # zero x-variance -> all null; zero y-variance -> slope 0, r2 null
    edge = pa.table(
        {
            "k": ["flatx"] * 3 + ["flaty"] * 3,
            "x": pa.array([7, 7, 7, 1, 2, 3], pa.int64()),
            "y": pa.array([1, 2, 3, 9, 9, 9], pa.int64()),
        }
    )
    rows = {r["k"]: r for r in group_linreg(_ds(edge, 2), ["k"], "x", "y").to_pylist()}
    assert rows["flatx"]["slope"] is None and rows["flatx"]["r2"] is None
    assert rows["flaty"]["slope"] == 0.0 and rows["flaty"]["intercept"] == 9.0
    assert rows["flaty"]["r2"] is None


@pytest.mark.usefixtures("ray_session")
def test_group_entropy_layouts_and_values():
    from news_crawler_ray.ops.agg import group_entropy

    # counts {a:1, b:1, c:2} -> H = log2(4) - (2*1*2^20/2^20)/4 = 1.5 exact
    tbl = pa.table(
        {
            "k": ["g"] * 4 + ["solo"] * 5,
            "v": ["a", "b", "c", "c", "x", "x", "x", "x", "x"],
        }
    )
    for nblocks in (1, 4):
        rows = {
            r["k"]: r
            for r in group_entropy(_ds(tbl, nblocks), ["k"], "v").to_pylist()
        }
        assert rows["g"]["entropy_bits"] == 1.5
        assert rows["g"]["n_events"] == 4 and rows["g"]["n_values"] == 3
        # single-value group: log2(5) - (5 log2 5)/5 == 0 exactly
        assert rows["solo"]["entropy_bits"] == 0.0

    # uniform over 8 values ~ 3 bits; layout invariance bit-exact
    rng = np.random.default_rng(5)
    vals = rng.permutation(np.repeat(np.arange(8), 25))
    big = pa.table({"k": ["u"] * 200, "v": pa.array(vals, pa.int64())})
    h1 = group_entropy(_ds(big, 1), ["k"], "v")["entropy_bits"][0].as_py()
    h7 = group_entropy(_ds(big, 7), ["k"], "v")["entropy_bits"][0].as_py()
    assert h1 == h7
    assert abs(h1 - 3.0) < 1e-6  # fixed-point quantization ~1e-8


@pytest.mark.usefixtures("ray_session")
def test_budget_allocate_largest_remainder():
    from news_crawler_ray.ops.sampling import budget_allocate

    tbl = pa.table(
        {
            "host": ["a", "a", "b", "c"],
            "w": pa.array([3, 4, 7, 2], pa.int64()),  # a=7, b=7, c=2
        }
    )
    for blocks in (1, 2):
        got = budget_allocate(_ds(tbl, blocks), "host", "w", 10).to_pandas()
        got = got.set_index("host")
        # W=16: floors = 70/16=4, 70/16=4, 20/16=1 (sum 9); remainders
        # a=6/16, b=6/16, c=4/16 -> leftover 1 goes to 'a' (tie, key asc)
        assert got.loc["a", "quota"] == 5
        assert got.loc["b", "quota"] == 4
        assert got.loc["c", "quota"] == 1
        assert got["quota"].sum() == 10
    # degenerate: all-zero weights, zero budget
    z = pa.table({"host": ["x", "y"], "w": pa.array([0, 0], pa.int64())})
    got = budget_allocate(_ds(z, 1), "host", "w", 10).to_pandas()
    assert got["quota"].sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_range_window_sum_with_ts_peers():
    from news_crawler_ray.ops.window import range_window_sum

    # key a: ts [0, 5, 5, 12], vals [1, 10, 100, 1000], interval 6
    #   row@0   -> [max(-6,..0)]      = 1
    #   rows@5  -> ts in [-1, 5]: BOTH peers in frame = 1+10+100 = 111
    #   row@12  -> ts in [6, 12]: only itself         = 1000
    tbl = pa.table(
        {
            "k": ["a", "a", "a", "a", "b"],
            "ts": pa.array([0, 5, 5, 12, 3], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([1, 10, 100, 1000, 7], pa.int64()),
        }
    )
    for blocks in (1, 3):
        got = (
            range_window_sum(_ds(tbl, blocks), "k", "ts", "id", "v", 6)
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        assert got["range_sum"].tolist() == [1, 111, 111, 1000, 7]


@pytest.mark.usefixtures("ray_session")
def test_group_collect_list_ordered():
    from news_crawler_ray.ops.window import group_collect_list

    tbl = pa.table(
        {
            "k": ["b", "a", "a", "b", "a"],
            "o": pa.array([1, 3, 1, 0, 2], pa.int64()),
            "v": ["b1", "a3", "a1", "b0", "a2"],
        }
    )
    for blocks in (1, 3):
        got = (
            group_collect_list(_ds(tbl, blocks), "k", ["o"], "v")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert list(got.loc[0, "values"]) == ["a1", "a2", "a3"]
        assert list(got.loc[1, "values"]) == ["b0", "b1"]


@pytest.mark.usefixtures("ray_session")
def test_funnel_counts_strict_ordering():
    from news_crawler_ray.ops.window import funnel_counts

    # user 1 session A: view@0 click@10 purchase@20   -> full funnel
    # user 1 session B (gap): click@10000 view@10010  -> view only (click
    #   precedes the first view, so stage 2 is NOT reached)
    # user 2: view@5 purchase@6 (no click)            -> view only
    us = 60_000_000  # 1 min in us
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                np.array(
                    [0, 10, 20, 100 * 60, 100 * 60 + 10, 5, 6], np.int64
                )
                * us,
                pa.timestamp("us"),
            ),
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "event_type": [
                "view", "click", "purchase", "click", "view", "view",
                "purchase",
            ],
        }
    )
    for blocks in (1, 3):
        got = funnel_counts(
            _ds(tbl, blocks), ["view", "click", "purchase"], gap_minutes=30
        ).to_pandas()
        assert got["n_sessions"].tolist() == [3, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_upsert_latest_wins_and_ties():
    from news_crawler_ray.ops.join import upsert

    base = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([1, 1, 5], pa.int64()),  # key 3 base at v5
            "val": ["b1", "b2", "b3"],
        }
    )
    ch = pa.table(
        {
            "k": pa.array([2, 3, 4], pa.int64()),
            "v": pa.array([2, 5, 1], pa.int64()),  # key 3 SAME version
            "val": ["c2", "c3", "c4"],
        }
    )
    for blocks in (1, 2):
        got = (
            upsert(_ds(base, blocks), _ds(ch, blocks), "k", "v", ["val"])
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        # 1: base only; 2: change wins (higher v); 3: change wins the
        # version TIE; 4: new key appended
        assert got["val"].tolist() == ["b1", "c2", "c3", "c4"]


@pytest.mark.usefixtures("ray_session")
def test_key_skew_report_hot_key():
    from news_crawler_ray.ops.agg import key_skew_report

    ks = ["hot"] * 90 + [f"k{i}" for i in range(10)]
    tbl = pa.table({"k": pa.array(ks, pa.string())})
    for blocks in (1, 4):
        got = key_skew_report(_ds(tbl, blocks), "k").to_pandas().iloc[0]
        assert got["n_rows"] == 100
        assert got["n_keys"] == 11
        assert got["max_count"] == 90
        assert got["p50_count"] == 1  # the hot key dwarfs the median


@pytest.mark.usefixtures("ray_session")
def test_group_size_window():
    from news_crawler_ray.ops.window import group_size_window

    tbl = pa.table(
        {
            "k": pa.array([7, 7, 7, 9, 9], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    for blocks in (1, 3):
        got = (
            group_size_window(_ds(tbl, blocks), "k", "id")
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        assert got["n_in_group"].tolist() == [3, 3, 3, 2, 2]


@pytest.mark.usefixtures("ray_session")
def test_group_string_agg_ordered():
    from news_crawler_ray.ops.window import group_string_agg

    tbl = pa.table(
        {
            "k": pa.array(["a", "a", "b", "a", "b"], pa.string()),
            "o": pa.array([3, 1, 2, 2, 1], pa.int64()),
            "v": pa.array(["z", "x", "q", "y", "p"], pa.string()),
        }
    )
    for blocks in (1, 3):
        got = (
            group_string_agg(_ds(tbl, blocks), "k", ["o"], "v", sep="|", out_col="s")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got["s"].tolist() == ["x|y|z", "p|q"]


@pytest.mark.usefixtures("ray_session")
def test_group_pair_counts_matches_bruteforce():
    import itertools

    from news_crawler_ray.ops.agg import group_pair_counts

    rng = __import__("random").Random(7)
    keys, vals = [], []
    for k in range(20):
        for v in rng.sample("abcdefg", rng.randint(1, 6)):
            # duplicates of (key, val) must not inflate counts
            for _ in range(rng.randint(1, 2)):
                keys.append(f"k{k}")
                vals.append(v)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    expect: dict = {}
    per_key: dict = {}
    for k, v in zip(keys, vals):
        per_key.setdefault(k, set()).add(v)
    for s in per_key.values():
        for a, b in itertools.combinations(sorted(s), 2):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    for blocks in (1, 4):
        out = group_pair_counts(_ds(tbl, blocks), "k", "v")
        got = {
            (r["val_a"], r["val_b"]): r["n_keys"] for r in out.to_pylist()
        }
        assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_group_pair_counts_quadratic_guard():
    from news_crawler_ray.ops.agg import group_pair_counts

    tbl = pa.table(
        {
            "k": pa.array(["hot"] * 10, pa.string()),
            "v": pa.array([f"v{i}" for i in range(10)], pa.string()),
        }
    )
    with pytest.raises((ValueError, Exception)) as ei:
        group_pair_counts(_ds(tbl, 2), "k", "v", max_vals=4)
    assert "max_vals" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_vocab_build_stable_ids():
    from news_crawler_ray.ops.text import vocab_build

    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)], pa.string()),
            "text": pa.array(
                [
                    "apple banana apple",
                    "banana cherry",
                    "apple  banana",   # double space: empty token dropped
                    "date",
                    "cherry banana",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    # counts: banana 4, apple 3, cherry 2, date 1
    for blocks in (1, 4):
        got = (
            vocab_build(_ds(docs, blocks), min_count=2)
            .to_pandas()
            .sort_values("token_id", ignore_index=True)
        )
        assert got["term"].tolist() == ["banana", "apple", "cherry"]
        assert got["n"].tolist() == [4, 3, 2]
        assert got["token_id"].tolist() == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_doc_rarity_exact():
    from news_crawler_ray.ops.text import doc_rarity

    docs = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"], pa.string()),
            "text": pa.array(
                [
                    "x x y",     # x global 3, y global 2
                    "x y zz",    # zz global 1 (rare)
                    "",          # tokenless: absent from output
                ],
                pa.string(),
            ),
        }
    )
    for blocks in (1, 3):
        got = {
            r["doc_id"]: r
            for r in doc_rarity(_ds(docs, blocks), rare_max=1).take_all()
        }
        assert set(got) == {"a", "b"}
        assert got["a"]["n_tokens"] == 3 and got["a"]["n_rare"] == 0
        assert got["a"]["sum_term_freq"] == 3 + 3 + 2
        assert got["b"]["n_tokens"] == 3 and got["b"]["n_rare"] == 1
        assert got["b"]["sum_term_freq"] == 3 + 2 + 1


@pytest.mark.usefixtures("ray_session")
def test_resolve_redirects_chains_and_loops():
    from news_crawler_ray.ops.graph import resolve_redirects

    # chain a0->a1->a2->T (3 hops), single b0->T2 (1 hop), loop c0<->c1
    src = ["a0", "a1", "a2", "b0", "c0", "c1"]
    dst = ["a1", "a2", "T", "T2", "c1", "c0"]
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    for blocks in (1, 3):
        got = {
            r["src_url"]: r
            for r in resolve_redirects(_ds(tbl, blocks), max_hops=8).take_all()
        }
        assert got["a0"]["final_url"] == "T" and got["a0"]["n_hops"] == 3
        assert got["a1"]["final_url"] == "T" and got["a1"]["n_hops"] == 2
        assert got["a2"]["final_url"] == "T" and got["a2"]["n_hops"] == 1
        assert got["b0"]["final_url"] == "T2" and got["b0"]["n_hops"] == 1
        for c in ("c0", "c1"):
            assert got[c]["is_loop"] and got[c]["final_url"] == ""
            assert got[c]["n_hops"] == 0
        assert not got["a0"]["is_loop"]


@pytest.mark.usefixtures("ray_session")
def test_value_zscore_bit_exact_vs_numpy():
    import numpy as np
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_value_zscore

    sf = "/root/testdata/sf0.001"
    got = {r["event_id"]: r["z"] for r in q_value_zscore(sf).take_all()}
    ev = pq.read_table(sf + "/events.parquet", columns=["event_id", "event_type", "value"])
    c = np.rint(np.asarray(ev["value"], np.float64) * 100).astype(np.int64)
    types = np.asarray(ev["event_type"].to_pylist())
    ids = np.asarray(ev["event_id"])
    import math

    n_match = 0
    for ty in set(types.tolist()):
        m = types == ty
        cv = c[m]
        n, s, ss = len(cv), int(cv.sum()), int((cv.astype(object) ** 2).sum())
        var = float(ss * n - s * s) / float(n * n)
        if var <= 0:
            continue
        std = math.sqrt(var)
        for i, v in zip(ids[m], cv):
            expect = float(int(v) * n - s) / (float(n) * std)
            assert got[int(i)] == expect  # exact, not approx
            n_match += 1
    assert n_match == len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_revenue_vs_duckdb(sf_dir):
    import duckdb

    from news_crawler_ray.pipelines.queries import (
        build_oracle_sql,
        q_local_supplier_revenue,
    )

    got = q_local_supplier_revenue(sf_dir).to_pylist()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    sql = build_oracle_sql(sf_dir)["local_supplier_revenue"]
    want = con.execute(sql).arrow().to_pylist()
    assert got == want
    assert len(got) >= 1 and all(r["revenue_cents"] > 0 for r in got)
    # descending revenue order
    revs = [r["revenue_cents"] for r in got]
    assert revs == sorted(revs, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_avg_brute_force():
    from news_crawler_ray.ops.window import time_weighted_avg

    # hand case: user 1 holds 100 cents for 3 s then 400 for 1 s
    # twap = (100*3 + 400*1)/4 = 175; user 2 single sample -> null
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([0, 3_000_000, 4_000_000, 5], pa.timestamp("us")),
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            "c": pa.array([100, 400, 999, 7], pa.int64()),
        }
    )
    for nblocks in (1, 3):
        rows = {r["user_id"]: r for r in time_weighted_avg(
            _ds(tbl, nblocks), "user_id", "ts", "event_id", "c"
        ).to_pylist()}
        assert rows[1]["twap"] == 175.0 and rows[1]["n_events"] == 3
        assert rows[2]["twap"] is None

    # random multi-user case vs brute force, layout invariant
    rng = np.random.default_rng(17)
    n = 400
    users = rng.integers(0, 20, n)
    ts = rng.integers(0, 10**9, n)
    c = rng.integers(-500, 500, n)
    big = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "c": pa.array(c, pa.int64()),
        }
    )

    def brute(u):
        m = users == u
        order = np.lexsort((np.arange(n)[m], ts[m]))
        t_s, c_s = ts[m][order], c[m][order]
        if len(t_s) < 2 or t_s[-1] == t_s[0]:
            return None
        num = int(np.sum(c_s[:-1].astype(object) * np.diff(t_s).astype(object)))
        return float(num) / float(int(t_s[-1] - t_s[0]))

    out1 = {r["user_id"]: r["twap"] for r in time_weighted_avg(
        _ds(big, 1), "user_id", "ts", "event_id", "c").to_pylist()}
    out7 = {r["user_id"]: r["twap"] for r in time_weighted_avg(
        _ds(big, 7), "user_id", "ts", "event_id", "c").to_pylist()}
    assert out1 == out7
    for u in set(users.tolist()):
        assert out1[u] == brute(u)


@pytest.mark.usefixtures("ray_session")
def test_type_drift_terms(sf_dir):
    from news_crawler_ray.pipelines.expected import expected_type_drift
    from news_crawler_ray.pipelines.queries import q_type_drift

    got = q_type_drift(sf_dir).to_pylist()
    want = expected_type_drift(sf_dir).to_pylist()
    assert got == want  # bit-exact vs the sequential Counter oracle
    # shares sum to 1 on each side, KL terms are finite where defined
    assert abs(sum(r["share_first"] for r in got) - 1.0) < 1e-12
    assert abs(sum(r["share_second"] for r in got) - 1.0) < 1e-12
    for r in got:
        if r["kl_term"] is not None:
            assert np.isfinite(r["kl_term"])


@pytest.mark.usefixtures("ray_session")
def test_value_gini_properties(sf_dir):
    from news_crawler_ray.pipelines.queries import q_value_gini

    row = q_value_gini(sf_dir).to_pylist()[0]
    assert 0.0 <= row["gini"] < 1.0 and row["n_users"] > 0

    # hand case via the same kernel: perfectly equal totals -> gini 0
    import numpy as np

    c = np.array([5, 5, 5, 5], dtype=np.int64)
    i = np.arange(1, 5)
    n, s, w = 4, int(c.sum()), int(((2 * i - 1) * c).sum())
    assert (w - n * s) == 0


@pytest.mark.usefixtures("ray_session")
def test_shuffle_positions_deterministic(sf_dir):
    import hashlib

    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_shuffle_positions

    a = {r["doc_id"]: r["shuffle_pos"] for r in q_shuffle_positions(sf_dir).take_all()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in q_shuffle_positions(sf_dir).take_all()}
    assert a == b  # rerun-reproducible
    ids = pq.read_table(sf_dir + "/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    order = sorted(ids, key=lambda i: (hashlib.md5(f"{i}-ep0".encode()).hexdigest(), i))
    assert a == {i: p for p, i in enumerate(order)}
    # positions are a permutation
    assert sorted(a.values()) == list(range(len(ids)))


@pytest.mark.usefixtures("ray_session")
def test_cumulative_users_hand_case(monkeypatch, tmp_path):
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_cumulative_users

    day = 86_400_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 3, 1, 4], pa.int64()),
            "ts": pa.array(
                [0, day, day, day, 2 * day, 2 * day + 5], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_cumulative_users(str(tmp_path)).to_pylist()
    assert got == [
        {"day": 0, "n_new_users": 1, "cum_users": 1},
        {"day": 1, "n_new_users": 2, "cum_users": 3},
        {"day": 2, "n_new_users": 1, "cum_users": 4},
    ]


@pytest.mark.usefixtures("ray_session")
def test_interval_overlap_join_brute_force():
    import ray.data as rd

    from news_crawler_ray.ops.join import interval_overlap_join

    rng = np.random.default_rng(23)
    def mk(n, base):
        s = rng.integers(0, 1000, n)
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 5, n), pa.int64()),
                "_s": pa.array(s, pa.int64()),
                "_e": pa.array(s + rng.integers(1, 50, n), pa.int64()),
                "_id": pa.array(np.arange(n) + base, pa.int64()),
            }
        )

    L, R = mk(120, 0), mk(150, 10_000)

    def brute():
        out = set()
        for i in range(120):
            for j in range(150):
                if (
                    L["k"][i].as_py() == R["k"][j].as_py()
                    and L["_s"][i].as_py() < R["_e"][j].as_py()
                    and R["_s"][j].as_py() < L["_e"][i].as_py()
                ):
                    out.add((L["k"][i].as_py(), i, 10_000 + j))
        return out

    want = brute()
    for nblocks in (1, 4):
        got = {
            (r["k"], r["left_id"], r["right_id"])
            for r in interval_overlap_join(
                rd.from_arrow(L).repartition(nblocks),
                rd.from_arrow(R).repartition(max(1, nblocks - 1)),
                "k",
            ).take_all()
        }
        assert got == want
    assert len(want) > 50  # fixture actually exercises overlaps

    # pair cap raises loudly
    big_s = pa.table(
        {
            "k": pa.array([1] * 40, pa.int64()),
            "_s": pa.array([0] * 40, pa.int64()),
            "_e": pa.array([100] * 40, pa.int64()),
            "_id": pa.array(np.arange(40), pa.int64()),
        }
    )
    with pytest.raises(Exception, match="exceeds"):
        interval_overlap_join(
            rd.from_arrow(big_s), rd.from_arrow(big_s), "k", max_pairs_per_key=100
        ).take_all()


@pytest.mark.usefixtures("ray_session")
def test_skyline2d_brute_force():
    from news_crawler_ray.ops.agg import skyline2d

    rng = np.random.default_rng(29)
    n = 500
    x = rng.integers(0, 60, n)
    y = rng.integers(0, 60, n)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )

    def dominated(i):
        return bool(
            np.any(
                (x >= x[i]) & (y <= y[i]) & ((x > x[i]) | (y < y[i]))
            )
        )

    want = {i for i in range(n) if not dominated(i)}
    for nblocks in (1, 5):
        got = {r["id"] for r in skyline2d(_ds(tbl, nblocks), "x", "y").to_pylist()}
        assert got == want
    assert 0 < len(want) < n
    # equal-vector duplicates on the frontier are all kept
    dup = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int64()),
            "x": pa.array([9, 9, 1], pa.int64()),
            "y": pa.array([1, 1, 0], pa.int64()),
        }
    )
    got = {r["id"] for r in skyline2d(_ds(dup, 1), "x", "y").to_pylist()}
    assert got == {0, 1, 2}


@pytest.mark.usefixtures("ray_session")
def test_group_bitmap_distinct():
    from news_crawler_ray.ops.agg import group_bitmap_distinct

    rng = np.random.default_rng(31)
    k = rng.choice(["a", "b"], 500)
    v = rng.integers(0, 300, 500)
    tbl = pa.table({"k": pa.array(k), "v": pa.array(v, pa.int64())})
    want = {
        "a": len(set(v[k == "a"].tolist())),
        "b": len(set(v[k == "b"].tolist())),
    }
    for nblocks in (1, 6):
        got = {
            r["k"]: r["n_distinct"]
            for r in group_bitmap_distinct(
                _ds(tbl, nblocks), "k", "v", domain_size=300
            ).to_pylist()
        }
        assert got == want
    # out-of-domain raises loudly
    bad = pa.table({"k": ["a"], "v": pa.array([300], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        group_bitmap_distinct(_ds(bad, 1), "k", "v", domain_size=300)


@pytest.mark.usefixtures("ray_session")
def test_kmv_sketch_estimates():
    from news_crawler_ray.ops.agg import kmv_estimate_intersections, kmv_sketches

    rng = np.random.default_rng(37)
    # two segments sharing exactly 200 of 500 members each
    a_vals = np.arange(0, 500)
    b_vals = np.arange(300, 800)
    tbl = pa.table(
        {
            "k": pa.array(["a"] * 500 + ["b"] * 500),
            "v": pa.array(np.concatenate([a_vals, b_vals]), pa.int64()),
        }
    )
    for nblocks in (1, 5):
        sk = kmv_sketches(_ds(tbl, nblocks), "k", "v", k=128)
        est = kmv_estimate_intersections(sk, k=128).to_pylist()
        assert len(est) == 1
        # true intersection 200; KMV k=128 of 500 -> ~25% rel error band
        assert 100 <= est[0]["est_intersection"] <= 320
    # layout invariance: the sketch itself is identical at any layout
    s1 = kmv_sketches(_ds(tbl, 1), "k", "v", k=128)
    s5 = kmv_sketches(_ds(tbl, 5), "k", "v", k=128)
    assert all(np.array_equal(s1[g], s5[g]) for g in s1)
    # under-full sketch (n < k) is EXACT
    small = pa.table(
        {"k": pa.array(["x"] * 30 + ["y"] * 30),
         "v": pa.array(list(range(30)) + list(range(20, 50)), pa.int64())}
    )
    sk = kmv_sketches(_ds(small, 2), "k", "v", k=128)
    est = kmv_estimate_intersections(sk, k=128).to_pylist()[0]
    assert est["est_intersection"] == 10.0 and est["n_common_hashes"] == 10


@pytest.mark.usefixtures("ray_session")
def test_ab_lift_hand_case(tmp_path):
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_ab_lift

    # group A (even uid): users 0,2 -> 1 converts; group B (odd): 1,3 -> both
    rows = []
    for uid, types in [(0, ["view", "purchase"]), (2, ["view"]),
                       (1, ["purchase"]), (3, ["click", "purchase"])]:
        rows += [{"user_id": uid, "event_type": t} for t in types]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    r = q_ab_lift(str(tmp_path)).to_pylist()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (2, 2, 1, 2)
    assert r["rate_a"] == 0.5 and r["rate_b"] == 1.0 and r["lift"] == 0.5
    import math

    p = 3 / 4
    want_z = 0.5 / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 2))
    assert abs(r["z_score"] - want_z) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_value_ranksum_vs_scipy_formula(tmp_path):
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_value_ranksum

    # cohort A (even uid) systematically LOWER than B (odd uid)
    rng = np.random.default_rng(41)
    rows = []
    for uid in range(40):
        base = 10.0 if uid % 2 == 0 else 20.0
        for _ in range(5):
            rows.append(
                {"user_id": uid, "value": base + float(rng.integers(0, 5))}
            )
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    r = q_value_ranksum(str(tmp_path)).to_pylist()[0]
    assert r["n_a"] == r["n_b"] == 100
    # A lower than B in every pair -> U_a == 0, strongly negative z
    assert r["u_a"] == 0.0
    assert r["z_score"] < -10

    # identical distributions -> U_a == n_a*n_b/2 exactly, z == 0
    rows = [
        {"user_id": uid, "value": float(v)}
        for uid in range(10)
        for v in (1, 2, 3)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    r = q_value_ranksum(str(tmp_path)).to_pylist()[0]
    assert r["u_a"] == r["n_a"] * r["n_b"] / 2 and r["z_score"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_poisson_bootstrap_mean():
    from news_crawler_ray.ops.agg import poisson_bootstrap_mean

    rng = np.random.default_rng(43)
    c = rng.integers(900, 1100, 2000)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(2000), pa.int64()),
            "c": pa.array(c, pa.int64()),
        }
    )
    r1 = poisson_bootstrap_mean(_ds(tbl, 1), "id", "c", reps=40).to_pylist()[0]
    r6 = poisson_bootstrap_mean(_ds(tbl, 6), "id", "c", reps=40).to_pylist()[0]
    assert r1 == r6  # replicate weights are content-stable: layout-proof
    true_mean = c.mean()
    assert r1["ci_lo"] < true_mean < r1["ci_hi"]
    # CI width ~ 2*1.96*sd*sqrt(2/n) for Poisson bootstrap; sanity band
    assert (r1["ci_hi"] - r1["ci_lo"]) < 20
    assert r1["mean_cents"] == float(c.sum()) / 2000


@pytest.mark.usefixtures("ray_session")
def test_value_trimmed_mean_hand_case(tmp_path):
    import pyarrow.parquet as pq

    from news_crawler_ray.pipelines.queries import q_value_trimmed_mean

    # 100 values 1..100 cents (0.01..1.00 dollars); 5% trim drops 5 each
    # side -> mean of 6..95 == 50.5 cents exactly
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(100), pa.int64()),
            "value": pa.array((np.arange(100) + 1) / 100.0, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    r = q_value_trimmed_mean(str(tmp_path)).to_pylist()[0]
    assert r["n_total"] == 100 and r["n_kept"] == 90
    assert r["trimmed_mean_cents"] == 50.5


@pytest.mark.usefixtures("ray_session")
def test_ks_two_sample_exact_and_layout_proof():
    """KS statistic equals scipy-free sequential ECDF math, is
    identical at 1 vs 9 blocks (integer scan), handles ties exactly,
    and raises loudly on an empty cohort."""
    from news_crawler_ray.ops.agg import ks_two_sample

    rng = np.random.default_rng(11)
    v0 = rng.integers(0, 50, 400)          # cohort 0
    v1 = rng.integers(5, 60, 300)          # cohort 1, shifted
    vals = np.concatenate([v0, v1])
    coh = np.concatenate([np.zeros(400, np.int64), np.ones(300, np.int64)])
    t = pa.table({"v": pa.array(vals, pa.int64()), "g": pa.array(coh)})

    # sequential replica: ECDF after each distinct value's tie group
    uniq = np.unique(vals)
    c1 = np.array([(v0 <= u).sum() for u in uniq], np.int64)
    c2 = np.array([(v1 <= u).sum() for u in uniq], np.int64)
    d_num = int(np.max(np.abs(c1 * 300 - c2 * 400)))

    for blocks in (1, 9):
        out = ks_two_sample(_ds(t, blocks), "v", "g").to_pylist()[0]
        assert (out["n1"], out["n2"]) == (400, 300)
        assert out["d_num"] == d_num
        assert out["d_den"] == 400 * 300
        assert out["d"] == d_num / (400 * 300)

    with pytest.raises(ValueError, match="non-empty"):
        ks_two_sample(
            _ds(pa.table({"v": pa.array([1, 2], pa.int64()),
                          "g": pa.array([0, 0], pa.int64())}), 1),
            "v", "g",
        )
