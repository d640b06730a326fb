"""Text/LM family: bigrams/PMI, KN LM, BM25, CCNet, quantiles, TPC-H compositions.

Split from pipelines/queries.py (registry unchanged — see
queries.build_queries); mechanical move, no semantic change.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..ops import dedup as dd
from ..ops import multimodal as mm
from ..ops import sampling as sp
from ..ops import similarity as sim
from ..ops import text as tx
from ..stages.index import assign_stable_ids
from ..stages.parse import merged_distinct_iocs

from .queries_corpus import (
    SEARCH_TERMS,
    TOP_TERMS_K,
)
from .queries_rel import (
    BROADCAST_DIM_BYTES,
    ORACLE_SQL,
    _TOK_SQL,
    _read,
)

def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 analog — per-nation revenue where customer and supplier
    share the nation, region-filtered, one-year order window. The
    6-table join matrix in ONE composition, each side handled at its
    honest scale: nation⋈region resolved driver-side (config-scale
    dims), the two data-scale joins (orders⋈customer on custkey,
    lineitem⋈on orderkey) on the task-based key-complete exchange, the
    supplier→nation probe BROADCAST once (pool-scale dim; vectorized
    searchsorted per block, no third exchange), revenue in exact
    integer cents via a zero-exchange combiner."""
    from ..ops.agg import partial_group_agg
    from ..ops.join import sort_merge_inner_join

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    asia = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == "ASIA"
    }
    nkey_to_name = {
        r["n_nationkey"]: r["n_name"]
        for r in nat.to_pylist()
        if r["n_regionkey"] in asia
    }
    asia_keys = pa.array(sorted(nkey_to_name), pa.int64())

    # customer is a DIMENSION (TPC-H: SF·150k rows of two ints) —
    # broadcast the custkey→nationkey probe once instead of a third
    # key-complete exchange, with the engine's standard ≤1 GiB bound;
    # past the bound fall back to sort_merge_inner_join(ord_f, cust).
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    if cust_tbl.nbytes > (1 << 30):
        raise ValueError(
            "q_local_supplier_revenue: customer dim exceeds the 1 GiB "
            "broadcast bound — route through sort_merge_inner_join"
        )
    c_order = np.argsort(np.asarray(cust_tbl["c_custkey"], dtype=np.int64))
    c_keys = ray.put(np.asarray(cust_tbl["c_custkey"], dtype=np.int64)[c_order])
    c_nats = ray.put(
        np.asarray(cust_tbl["c_nationkey"], dtype=np.int64)[c_order]
    )
    asia_np = np.asarray(asia_keys)
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def orders_probe(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo),
                pc.less(t["o_orderdate"], hi),
            )
        )
        keys, nats = ray.get(c_keys), ray.get(c_nats)
        ck = np.asarray(f["o_custkey"], dtype=np.int64)
        ix = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        nat = np.where(keys[ix] == ck, nats[ix], -1)
        keep = np.isin(nat, asia_np)
        return pa.table(
            {
                "l_orderkey": f["o_orderkey"].combine_chunks().filter(
                    pa.array(keep)
                ),
                "c_nationkey": pa.array(nat[keep], pa.int64()),
            }
        )

    oc = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_probe, batch_format="pyarrow", zero_copy_batch=True)

    def li_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        d = np.asarray(t["l_discount"], dtype=np.float64)
        cents = np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_cents, batch_format="pyarrow", zero_copy_batch=True)
    lioc = sort_merge_inner_join(
        li, oc, "l_orderkey", ["l_suppkey", "cents"], ["c_nationkey"]
    )

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    s_order = np.argsort(np.asarray(sup["s_suppkey"], dtype=np.int64))
    s_keys = ray.put(np.asarray(sup["s_suppkey"], dtype=np.int64)[s_order])
    s_nats = ray.put(np.asarray(sup["s_nationkey"], dtype=np.int64)[s_order])

    def local_only(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(s_keys), ray.get(s_nats)
        sk = np.asarray(t["l_suppkey"], dtype=np.int64)
        ix = np.searchsorted(keys, sk)
        ix = np.clip(ix, 0, len(keys) - 1)
        s_nat = np.where(keys[ix] == sk, nats[ix], -1)
        keep = s_nat == np.asarray(t["c_nationkey"], dtype=np.int64)
        return pa.table(
            {
                "n_nationkey": pa.array(s_nat[keep], pa.int64()),
                "cents": t["cents"].combine_chunks().filter(pa.array(keep)),
            }
        )

    local = lioc.map_batches(
        local_only, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial_group_agg(
        local, ["n_nationkey"], [("revenue_cents", "sum", "cents")]
    )
    rows = sorted(
        (
            {"n_name": nkey_to_name[r["n_nationkey"]],
             "revenue_cents": r["revenue_cents"]}
            for r in agg.to_pylist()
        ),
        key=lambda r: (-r["revenue_cents"], r["n_name"]),
    )
    if not rows:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows)


def q_max_value_event_per_type(sf_dir: str):
    """MAX_BY / ARG_MAX: per event_type the event carrying the maximum
    value (event_id tiebreak) — group_top_k with k=1, one key-complete
    exchange."""
    from ..ops.agg import group_top_k

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    top = group_top_k(ev, "event_type", ["value", "event_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: t.select(["event_type", "event_id", "value"]),
        batch_format="pyarrow",
    )


FUZZY_PREFIX = 32
FUZZY_MAX_DIST = 10


def q_fuzzy_search(sf_dir: str):
    """Typo-tolerant snippet lookup: the 32-byte prefixes of docs 0 and
    1, each with chars 3/4 transposed (a planted typo), searched
    against every document's prefix by bit-parallel Myers Levenshtein
    (ops/text.edit_distance_search — one vectorized uint64 pass per
    pattern per block, no per-row DP). Hits within distance 10."""
    from ..ops.text import edit_distance_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    seed_rows = {
        r["doc_id"]: (r["text"] or "")[:FUZZY_PREFIX]
        for r in docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    }
    patterns = [
        p[:2] + p[3] + p[2] + p[4:] if len(p) >= 4 else p
        for p in (seed_rows[0], seed_rows[1])
    ]
    return edit_distance_search(
        docs,
        patterns,
        prefix_len=FUZZY_PREFIX,
        max_dist=FUZZY_MAX_DIST,
    )


def q_events_hourly_dense(sf_dir: str):
    """Gap-filled hourly series: per-(type, hour) counts zero-filled
    over the FULL dense grid (every type × every hour between the
    global min and max) — the densify step a charting/forecasting
    consumer needs. Counts are the zero-exchange combiner
    (partial_group_agg); the grid is metadata-scale (types × hours),
    built driver-side from two tiny min/max partials and left-joined
    in one vectorized pandas merge. No shuffle anywhere."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def with_hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour_start": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    hourly = ev.map_batches(with_hour, batch_format="pyarrow", zero_copy_batch=True)
    counts = partial_group_agg(
        hourly,
        ["event_type", "hour_start"],
        [("n_events", "count_all", None)],
    )
    bounds = partial_group_agg(
        hourly.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        ),
        ["one"],
        [("h0", "min", "hour_start"), ("h1", "max", "hour_start")],
    )
    h0 = bounds["h0"][0].as_py()
    h1 = bounds["h1"][0].as_py()
    hours = np.arange(
        np.datetime64(h0, "us"),
        np.datetime64(h1, "us") + np.timedelta64(1, "h"),
        np.timedelta64(1, "h"),
    )
    types = sorted(set(counts["event_type"].to_pylist()))
    grid = pa.table(
        {
            "event_type": pa.array(np.repeat(types, len(hours)), pa.string()),
            "hour_start": pa.array(
                np.tile(hours, len(types)), pa.timestamp("us")
            ),
        }
    )
    merged = grid.join(
        counts, keys=["event_type", "hour_start"], join_type="left outer"
    ).sort_by([("event_type", "ascending"), ("hour_start", "ascending")])
    return merged.set_column(
        merged.column_names.index("n_events"),
        "n_events",
        pc.fill_null(merged["n_events"], 0).cast(pa.int64()),
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-15"


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 analog (shipping priority) in ONE exchange: the
    segment-filtered custkey set broadcasts once (ray.put +
    searchsorted membership inside map_batches — the star-schema
    broadcast pattern of q_orders_per_nation, with the sort-merge semi
    join as the over-budget fallback), date-filtered lineitems
    equi-join the surviving orders on the key-complete exchange, and
    because that exchange leaves every orderkey whole in one block,
    the per-(order, date) revenue aggregate and the top-10 partials
    are BLOCK-LOCAL — only ≤10 rows per block reach the driver.
    Revenue rounds per line like the oracle (round(price·(1−disc)·100),
    half away from zero) so the cents sums are merge-order-proof."""
    from ..ops.join import sort_merge_inner_join, sort_merge_semi_join

    cut = np.datetime64(Q3_CUTOFF + "T00:00:00", "us")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    if cust_tbl.nbytes <= BROADCAST_DIM_BYTES:
        keep = pc.equal(cust_tbl["c_mktsegment"], Q3_SEGMENT)
        keys_ref = ray.put(
            np.sort(
                np.asarray(cust_tbl.filter(keep)["c_custkey"], dtype=np.int64)
            )
        )

        def order_filter(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
            ks = ray.get(keys_ref)  # plasma-local after first batch
            oc = np.asarray(t["o_custkey"], dtype=np.int64)
            pos = np.minimum(np.searchsorted(ks, oc), len(ks) - 1)
            return t.select(["o_orderkey", "o_orderdate"]).filter(
                pa.array(ks[pos] == oc)
            )

        orders = orders.map_batches(
            order_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    else:  # data-scale dimension: fall back to the sort-merge semi join
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        keys = cust.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t.filter(
                        pc.equal(t["c_mktsegment"], Q3_SEGMENT)
                    )["c_custkey"]
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        orders = sort_merge_semi_join(
            orders.map_batches(
                lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cut))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            keys,
            "o_custkey",
        ).map_batches(
            lambda t: t.select(["o_orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def line_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        d = np.asarray(t["l_discount"], dtype=np.float64)
        rev = np.floor(p * (1 - d) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": pa.array(rev, pa.int64())}
        )

    joined = sort_merge_inner_join(
        li.map_batches(line_cents, batch_format="pyarrow", zero_copy_batch=True),
        orders,
        "l_orderkey",
        ["rev"],
        ["o_orderdate"],
        right_key="o_orderkey",
    )

    def block_top10(t: pa.Table) -> pa.Table:
        # the join exchange is key-complete on l_orderkey, so the
        # group-by and the top-k partial are exact block-local
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["l_orderkey", "o_orderdate"]).aggregate([("rev", "sum")])
        g = pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "o_orderdate": g["o_orderdate"],
                "revenue_cents": g["rev_sum"],
            }
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
        )
        return g.take(idx.slice(0, 10))

    partials = joined.map_batches(
        block_top10, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    top = pa.Table.from_pylist(
        partials,
        schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )
    idx = pc.sort_indices(
        top,
        sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
    )
    return top.take(idx.slice(0, 10))


def q_value_outliers(sf_dir: str):
    """Per-group IQR outlier fence (Tukey 1.5·IQR) — the robust-stats
    admission filter: exact q25/q75 per event_type on the quantile
    exchange (10 rows), fences computed driver-side with the oracle's
    exact float op order (t = q3−q1; lo = q1 − 1.5·t; hi = q3 + 1.5·t),
    broadcast into a block-local vectorized filter (index_in code
    lookup, no per-row Python). Two-phase like
    quality_percentile_filter, but per-key."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    q = group_quantiles(ev, "event_type", "value", percents=(25, 75)).take_all()
    qs: dict[str, dict[int, float]] = {}
    for row in q:
        qs.setdefault(row["event_type"], {})[row["pct"]] = row["value"]
    types = sorted(qs)
    lo_v, hi_v = [], []
    for t in types:
        q1, q3 = qs[t][25], qs[t][75]
        iqr = q3 - q1
        lo_v.append(q1 - 1.5 * iqr)
        hi_v.append(q3 + 1.5 * iqr)
    type_arr = pa.array(types, pa.string())
    lo_arr = np.asarray(lo_v, dtype=np.float64)
    hi_arr = np.asarray(hi_v, dtype=np.float64)

    def keep(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        mask = (v < lo_arr[codes]) | (v > hi_arr[codes])
        return t.select(["event_id", "event_type", "value"]).filter(
            pa.array(mask)
        )

    return ev.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def q_event_lag_lead(sf_dir: str):
    """LAG/LEAD(value) OVER (PARTITION BY user ORDER BY ts, id) — the
    neighbor-value window pair (null at partition edges) as null-masked
    take-indices on the key-complete exchange (ops/window.lag_lead)."""
    from ..ops.window import lag_lead

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return lag_lead(ev, "user_id", ["ts", "event_id"], "event_id", "value")


def q_event_rank_ties(sf_dir: str):
    """RANK / DENSE_RANK OVER (PARTITION BY event_type ORDER BY
    user_id) — the tie-aware rank half (ops/window.rank_with_ties);
    user_id repeats within a type so tie runs are real. Only rn uses
    the event_id tiebreak."""
    from ..ops.window import rank_with_ties

    ev = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    return rank_with_ties(ev, "event_type", "user_id", "event_id")


def q_user_first_last(sf_dir: str):
    """First/last-touch attribution: per user the first and last
    event_type by (ts, event_id) plus the row count, one row per user
    (ops/window.group_first_last on the key-complete exchange)."""
    from ..ops.window import group_first_last

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return group_first_last(ev, "user_id", ["ts", "event_id"], "event_type")


def q_value_fill_forward(sf_dir: str):
    """LOCF gap repair: values nulled on a deterministic mask
    (event_id % 7 == 3), then forward-filled per user in (ts, id)
    order (ops/window.fill_forward); leading nulls stay null. The mask
    is shared with the SQL oracle so both sides repair the same gaps."""
    from ..ops.window import fill_forward

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"], dtype=np.int64)
        mask = (ids % 7) == 3
        vals = np.asarray(t["value"], dtype=np.float64)
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pa.array(vals, pa.float64(), mask=mask),
        )

    return fill_forward(
        ev.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        ["ts", "event_id"],
        "event_id",
        "value",
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (ops/agg.group_count_distinct): one sorted-distinct exchange over
    the (type, user) pairs, then the zero-exchange combiner count —
    the hard-count twin of hll_users_by_type."""
    from ..ops.agg import group_count_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return group_count_distinct(ev, "event_type", "user_id")


def q_user_modal_type(sf_dir: str):
    """Per-user modal event_type (most frequent; ties broken by the
    lexicographically smallest type) — the categorical mode aggregate,
    composed as per-(user, type) counts on the sorted group-aggregate
    chained into the per-group rank (k=1). Two exchanges, both
    key-complete."""
    from ..ops.agg import group_top_k, sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = sorted_group_agg(
        ev, ["user_id", "event_type"], [("n_events", "count_all", None)]
    )
    top = group_top_k(
        counts, "user_id", ["n_events", "event_type"], [True, False], k=1
    )
    return top.map_batches(
        lambda t: t.select(["user_id", "event_type", "n_events"]),
        batch_format="pyarrow",
    )


def q_top_users_per_type(sf_dir: str):
    """Two chained exchanges — per-(type, user) counts on the sorted
    group-aggregate, then per-type top-3 users on the key-complete
    rank — the heavy-hitters-per-segment composition (who dominates
    each event type). Tiebreak (count desc, user asc) is total."""
    from ..ops.agg import group_top_k, sorted_group_agg

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    counts = sorted_group_agg(
        ev, ["event_type", "user_id"], [("n_events", "count_all", None)]
    )
    top = group_top_k(
        counts, "event_type", ["n_events", "user_id"], [True, False], k=3
    )
    return top.map_batches(
        lambda t: t.select(["event_type", "user_id", "n_events", "rn"]),
        batch_format="pyarrow",
    )


def q_event_ranks(sf_dir: str):
    """The rank window-function family — ROW_NUMBER / PERCENT_RANK /
    NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) —
    on the key-complete exchange (ops/window.rank_window). The
    tiebreak makes the order total, so even the float percent_rank is
    an exact ratio reproducible at any parallelism."""
    from ..ops.window import rank_window

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return rank_window(ev, "event_type", "value", "event_id", n_tiles=4)


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets in one
    streaming pass (ops/agg.cube_agg — in-task set fan-out, zero
    exchange)."""
    from ..ops.agg import cube_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def with_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.strftime(t["ts"], format="%Y-%m-%d"))

    return cube_agg(
        ev.map_batches(with_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of event values (vectorized binning +
    zero-exchange combiner; edge bins clip out-of-range)."""
    from ..ops.agg import value_histogram

    return value_histogram(
        _read(sf_dir, "events", ["value"]), "value", lo=0.0, hi=500.0, nbins=20
    )


def q_events_sliding(sf_dir: str):
    """Hopping-window aggregate: 60-min windows every 30 min × type —
    each event fans out to its 2 containing windows inside the map task;
    only (window, type) partials leave it (ops/window
    .hopping_window_agg)."""
    from ..ops.window import hopping_window_agg

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    return hopping_window_agg(
        ev,
        "ts",
        ["event_type"],
        [
            ("n_events", "count_all", None),
            ("max_value", "max", "value"),
        ],
        size_minutes=60,
        hop_minutes=30,
    )


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: hourly event windows × type, counts +
    exact min/max — the window derive is a vectorized floor_temporal and
    the aggregate is the zero-exchange combiner (ops/window
    .tumbling_window_agg; windows are just another group key)."""
    from ..ops.window import tumbling_window_agg

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    return tumbling_window_agg(
        ev,
        "ts",
        ["event_type"],
        [
            ("n_events", "count_all", None),
            ("min_value", "min", "value"),
            ("max_value", "max", "value"),
        ],
        unit="hour",
    )


def q_top_bigrams(sf_dir: str):
    """LM-style n-gram statistics: exact global top-K word bigrams —
    same combiner→sort-exchange→top-K shape as top_terms; bigrams never
    cross documents (ops/text.top_ngrams)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.top_ngrams(ds, n=2, k=TOP_TERMS_K)


PMI_MIN_COUNT = 5
PMI_TOP_K = 30


def q_bigram_pmi(sf_dir: str):
    """Collocation mining: top bigrams by pointwise mutual information
    (PMI) with a support floor — the phrase detector a tokenizer/
    vocab pipeline runs before merging multiword units. Exact integer
    counts end to end (bigram + unigram counts on the sorted exchange,
    unigram counts joined BACK per side via sort-merge — no broadcast-
    vocab assumption), PMI = log2 of ONE exact-int ratio per surviving
    bigram (DuckDB log2 verified bit-equal to np.log2 on this host)."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join
    from ..ops.text import _doc_term_freqs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        # vectorized adjacency (ops/text.top_ngrams kernel shape):
        # a bigram starts at i iff token rows i, i+1 share one doc;
        # per-block (w1,w2) partial counts cut the exchange from
        # token-bigram rows to block-distinct rows (combiner pattern)
        empty = pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = pa.array(r[1:] == r[:-1])
        pairs = pa.table(
            {
                "w1": f.slice(0, m - 1).filter(same),
                "w2": f.slice(1, m - 1).filter(same),
            }
        )
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "cnt": g["count_all"]})

    def term_rows(t: pa.Table) -> pa.Table:
        # (term, tf) partials straight from the per-doc freq kernel —
        # no row repetition; the exchange sums partials
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, "text", "doc_id")
        g = pa.table({"term": tf["term"], "cnt": tf["tf"]}).group_by(
            ["term"]
        ).aggregate([("cnt", "sum")])
        return pa.table({"term": g["term"], "cnt": g["cnt_sum"]})

    pair_ds = ds.map_batches(
        bigram_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    big = sorted_group_agg(
        pair_ds, ["w1", "w2"], [("c_xy", "sum", "cnt")]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_xy"], PMI_MIN_COUNT)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    uni = sorted_group_agg(
        ds.map_batches(term_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        [("c", "sum", "cnt")],
    )
    j1 = sort_merge_inner_join(
        big.map_batches(
            lambda t: pa.table(
                {"term": t["w1"], "w2": t["w2"], "c_xy": t["c_xy"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        uni,
        "term",
        ["w2", "c_xy"],
        ["c"],
    ).map_batches(
        lambda t: pa.table(
            {"term": t["w2"], "w1_c": t["c"], "c_xy": t["c_xy"], "w1": t["term"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j2 = sort_merge_inner_join(j1, uni, "term", ["w1", "w1_c", "c_xy"], ["c"])
    rows = j2.take_all()  # post-floor collocation set: config-scale
    n_uni = sum(
        r["c"] for r in uni.map_batches(
            lambda t: pa.table({"c": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    n_bi = sum(
        r["n"] for r in pair_ds.map_batches(
            # pair_ds rows are (w1,w2,cnt) partials: total bigram tokens
            # is the cnt sum, not the row count
            lambda t: pa.table(
                {"n": pa.array([pc.sum(t["cnt"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    out = []
    for r in rows:
        num = r["c_xy"] * n_uni * n_uni
        den = n_bi * r["w1_c"] * r["c"]
        # math.log2 (libm) is bit-identical to DuckDB log2; numpy's
        # SIMD np.log2 drifts a ulp on ~5% of inputs (measured). The
        # float(int) casts mirror the oracle's CAST(... AS DOUBLE) pair.
        pmi = math.log2(float(num) / float(den))
        out.append(
            {
                "bigram": f"{r['w1']} {r['term']}",
                "c_xy": r["c_xy"],
                "pmi": pmi,
            }
        )
    out.sort(key=lambda x: (-x["pmi"], x["bigram"]))
    return pa.Table.from_pylist(out[:PMI_TOP_K])


KN_DISCOUNT = 0.75


def q_kn_bigram_lm(sf_dir: str):
    """Distributed n-gram LM training: interpolated Kneser-Ney bigram
    probabilities — p(w2|w1) = (max(c−d,0) + d·N1+(w1·)·pcont(w2)) / c(w1·)
    with pcont(w2) = N1+(·w2)/N1+(··), d = 0.75. ALL counts are exact
    integers off ONE (w1,w2) sorted exchange (the bigram table), its
    by-w1 / by-w2 marginals are two narrow re-aggregations joined back
    by sort-merge, and the probability is a single shared float
    expression — bit-identical to the REAL SQL oracle (same op order:
    ((d·n1f)·n1b)/B, then +max-term, then /c1)."""
    from ..ops.agg import sorted_group_agg
    from ..ops.window import attach_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = pa.array(r[1:] == r[:-1])
        pairs = pa.table(
            {"w1": f.slice(0, m - 1).filter(same), "w2": f.slice(1, m - 1).filter(same)}
        )
        # combiner-before-exchange: per-block (w1,w2) partial counts cut
        # the exchange from token-bigram rows to block-distinct rows
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "c": g["count_all"]})

    cb = sorted_group_agg(
        ds.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"],
        [("n", "sum", "c")],
    )
    n_bigrams = sum(
        r["b"]
        for r in cb.map_batches(
            lambda t: pa.table({"b": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    # marginals ATTACHED on two key-complete exchanges
    # (ops/window.attach_group_agg) — the aggregate-then-join-back plan
    # paid five exchanges (two marginal aggs + two joins on top of cb)
    w1s = attach_group_agg(
        cb, "w1", [("c1", "sum", "n"), ("n1f", "count_all", None)]
    )
    full = attach_group_agg(w1s, "w2", [("n1b", "count_all", None)])
    d = KN_DISCOUNT
    B = float(n_bigrams)

    def prob(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()), "p_kn": pa.array([], pa.float64())}
            )
        n = np.asarray(t["n"], dtype=np.float64)
        c1 = np.asarray(t["c1"], dtype=np.float64)
        n1f = np.asarray(t["n1f"], dtype=np.float64)
        n1b = np.asarray(t["n1b"], dtype=np.float64)
        p = (np.maximum(n - d, 0.0) + ((d * n1f) * n1b) / B) / c1
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"],
             "n": pc.cast(t["n"], pa.int64()), "p_kn": pa.array(p, pa.float64())}
        )

    return full.map_batches(prob, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_length_histogram(sf_dir: str):
    """Per-(lang, log2-length-bucket) doc histogram — the length-
    distribution panel of a corpus report (spot truncation spikes and
    boilerplate walls before training). The bucket is the BIT LENGTH of
    n_chars+1 (np.frexp exponent == DuckDB length(bin(x)) — exact
    integer, no float log anywhere); ONE zero-exchange combiner pass."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        n = np.asarray(
            pc.coalesce(t["n_chars"], 0), dtype=np.int64
        )
        bucket = np.frexp((n + 1).astype(np.float64))[1].astype(np.int64)
        return pa.table(
            {
                "lang": t["lang"],
                "len_bucket": pa.array(bucket, pa.int64()),
                "n_chars": pa.array(n, pa.int64()),
            }
        )

    return partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "len_bucket"],
        [("n_docs", "count_all", None), ("sum_chars", "sum", "n_chars")],
    )


ORACLE_SQL["doc_length_histogram"] = (
    "WITH d AS (SELECT lang, "
    "  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_chars, "
    "  CAST(length(bin(CAST(coalesce(n_chars, 0) AS BIGINT) + 1)) AS BIGINT) "
    "    AS len_bucket FROM documents) "
    "SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS n_docs, "
    "  CAST(sum(n_chars) AS BIGINT) AS sum_chars "
    "FROM d GROUP BY lang, len_bucket"
)


def q_lexical_diversity(sf_dir: str):
    """Per-language lexical-diversity report: vocabulary size, hapax-
    legomenon count/fraction, and corpus type-token ratio — the vocab-
    growth health check a tokenizer/corpus build runs next to Zipf
    (zipf_slope) and fertility (tokenizer_fertility). Per-batch partial
    (lang, term) counts ride ONE term-colocating exchange; the per-lang
    rollup is a second, vocabulary-sized exchange; the two ratios are
    single IEEE divisions of exact ints — bit-equal to the SQL CASTs."""
    from ..ops.agg import sorted_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"lang": pa.array([], pa.string()),
             "term": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        langs = t["lang"].combine_chunks().take(pa.array(doc_of[keep]))
        g = (
            pa.table({"lang": langs, "term": flat.filter(pa.array(keep))})
            .group_by(["lang", "term"])
            .aggregate([("term", "count")])
        )
        return pa.table(
            {"lang": g["lang"], "term": g["term"],
             "c": pc.cast(g["term_count"], pa.int64())}
        )

    tf = sorted_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "term"],
        [("c", "sum", "c")],
    )

    def mark(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"], dtype=np.int64)
        return pa.table(
            {"lang": t["lang"],
             "h": pa.array((c == 1).astype(np.int64), pa.int64()),
             "c": t["c"]}
        )

    per = sorted_group_agg(
        tf.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        [("vocab", "count_all", None), ("hapax", "sum", "h"),
         ("n_tokens", "sum", "c")],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "vocab": pa.array([], pa.int64()),
                 "hapax": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "hapax_frac": pa.array([], pa.float64()),
                 "ttr": pa.array([], pa.float64())}
            )
        v = np.asarray(t["vocab"], dtype=np.int64).astype(np.float64)
        h = np.asarray(t["hapax"], dtype=np.int64).astype(np.float64)
        n = np.asarray(t["n_tokens"], dtype=np.int64).astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "vocab": t["vocab"],
                "hapax": t["hapax"],
                "n_tokens": t["n_tokens"],
                "hapax_frac": pa.array(h / v, pa.float64()),
                "ttr": pa.array(v / n, pa.float64()),
            }
        )

    return per.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["lexical_diversity"] = (
    r"WITH tok AS (SELECT lang, unnest(regexp_split_to_array("
    r"coalesce(text, ''), '\s+')) AS term FROM documents), "
    "tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c FROM tok "
    "  WHERE term <> '' GROUP BY 1, 2), "
    "per AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab, "
    "  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax, "
    "  CAST(sum(c) AS BIGINT) AS n_tokens FROM tf GROUP BY lang) "
    "SELECT lang, vocab, hapax, n_tokens, "
    "  CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_frac, "
    "  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr "
    "FROM per"
)


def q_pld_rollup(sf_dir: str):
    """Per-registrable-domain (PLD) rollup over deterministically
    derived hosts (functions/urlnorm.registrable_domain): URL count +
    distinct-host count per ownership unit — the aggregation level web
    crawl politeness/reputation keys on (news.bbc.co.uk and
    www.bbc.co.uk are ONE budget). Hosts are built from doc_id on both
    sides (subdomain·site·suffix mix incl. co.uk/com.au multi-label
    suffixes); two narrow exchanges: (pld, host) distinct then per-pld
    merge."""
    from ..functions.urlnorm import registrable_domain
    from ..ops.agg import sorted_group_agg

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        sub = np.array(["www", "m", "blog", "news"])[ids % 4]
        suf = np.array(["co.uk", "com.au", "com"])[ids % 3]
        site = np.char.add("site", (ids % 50).astype(str))
        host = pa.array(
            [f"{a}.{b}.{c}" for a, b, c in zip(sub, site, suf)], pa.string()
        )
        return pa.table({"host": host, "pld": registrable_domain(host)})

    rows = ds.map_batches(hosts, batch_format="pyarrow", zero_copy_batch=True)
    per_host = sorted_group_agg(
        rows, ["pld", "host"], [("n", "count_all", None)]
    )
    return sorted_group_agg(
        per_host, ["pld"], [("n_urls", "sum", "n"), ("n_hosts", "count_all", None)]
    )


def _pld_oracle_sql() -> str:
    from ..functions.urlnorm import PLD_SECOND_LEVEL

    alt = "|".join(s.replace(".", r"\.") for s in PLD_SECOND_LEVEL)
    ml = rf"([^.]+\.(?:{alt}))$"
    two = r"([^.]+\.[^.]+)$"
    return (
        "WITH h AS (SELECT doc_id, "
        "  (CASE doc_id % 4 WHEN 0 THEN 'www' WHEN 1 THEN 'm' "
        "     WHEN 2 THEN 'blog' ELSE 'news' END) "
        "  || '.site' || CAST(doc_id % 50 AS VARCHAR) || '.' || "
        "  (CASE doc_id % 3 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com.au' "
        "     ELSE 'com' END) AS host FROM documents), "
        "p AS (SELECT host, "
        f"  CASE WHEN regexp_matches(host, '{ml}') "
        f"       THEN regexp_extract(host, '{ml}', 1) "
        f"       WHEN regexp_matches(host, '{two}') "
        f"       THEN regexp_extract(host, '{two}', 1) "
        "       ELSE host END AS pld FROM h) "
        "SELECT pld, CAST(count(*) AS BIGINT) AS n_urls, "
        "  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts "
        "FROM p GROUP BY pld"
    )


ORACLE_SQL["pld_rollup"] = _pld_oracle_sql()


BM25_TOP_K = 50


def q_bm25_search(sf_dir: str):
    """BM25 top-k retrieval over documents for the fixed SEARCH_TERMS
    query set (ops/text.bm25_search): Lucene-style idf (log2 variant),
    k1=1.2, b=0.75, per-(doc,term) contributions quantized to int64 so
    per-doc totals sum exactly in any merge order. Ranked score_q DESC,
    doc_id; REAL SQL oracle evaluates the identical float expression
    with identical parenthesization (constants written as the same
    runtime sums, e.g. (1.2 + 1.0), never pre-folded literals)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.bm25_search(ds, list(SEARCH_TERMS), k=BM25_TOP_K)


def _bm25_oracle_sql() -> str:
    in_list = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return (
        f"WITH tok AS (SELECT doc_id, term FROM ({_TOK_SQL}) WHERE term <> ''), "
        "stats AS (SELECT "
        "  (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs, "
        "  (SELECT CAST(count(*) AS DOUBLE) FROM tok) AS n_tok), "
        f"tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        f"  FROM tok WHERE term IN ({in_list}) GROUP BY 1, 2), "
        "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl "
        "  FROM tok GROUP BY 1), "
        "df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf "
        "  GROUP BY term), "
        "sc AS (SELECT tf.doc_id, tf.tf, "
        "  CAST(floor((log2((n_docs - df + 0.5) / (df + 0.5) + 1.0) * "
        "    (CAST(tf AS DOUBLE) * (1.2 + 1.0))) / "
        "    (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + "
        "      (0.75 * CAST(dl AS DOUBLE)) / (n_tok / n_docs))) "
        "    * 1048576.0 + 0.5) AS BIGINT) AS tq "
        "  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) "
        "  CROSS JOIN stats), "
        "per AS (SELECT doc_id, CAST(sum(tq) AS BIGINT) AS score_q, "
        "  CAST(sum(tf) AS BIGINT) AS n_hits FROM sc GROUP BY doc_id) "
        "SELECT doc_id, n_hits, score_q, "
        "  CAST(score_q AS DOUBLE) / 1048576.0 AS score "
        f"FROM per ORDER BY score_q DESC, doc_id LIMIT {BM25_TOP_K}"
    )


ORACLE_SQL["bm25_search"] = _bm25_oracle_sql()


PPL_QUANT = 1 << 20
PPL_BUCKETS = 3


def q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet-style LM-perplexity corpus bucketing (Wenzek et al. 2020):
    score every doc under the corpus-trained Kneser-Ney bigram LM
    (q_kn_bigram_lm) and NTILE the corpus into head/middle/tail thirds
    by bits-per-bigram. Each bigram's surprisal −log2 p is QUANTIZED to
    int64 (the shared _nb_lq convention), so per-doc totals are exact
    integer sums — merge-order-free; the only floats are one final
    division per doc and the (deterministic) sort key.

    Shape: LM table (one bigram exchange, from q_kn_bigram_lm) → doc
    bigram counts pre-aggregated per block (zero exchange — a doc lives
    in one row) → ONE bg-keyed sort-merge join → ONE doc-keyed sum
    exchange → global sort + zip_with_index for the NTILE (rank·k//n
    reproduces DuckDB NTILE exactly: bigger buckets first). At corpus
    scale the final sort ranks one narrow row per doc; sampled bucket
    THRESHOLDS (group_quantiles machinery) replace the exact NTILE when
    even that is too wide. Docs with <2 tokens have no bigrams and drop
    out, matching the SQL inner join."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join
    from ..ops.text import _nb_lq
    from ..stages.index import zip_with_index

    lm = q_kn_bigram_lm(sf_dir)

    def lm_q(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bg": pa.array([], pa.string()),
                 "nll_q": pa.array([], pa.int64())}
            )
        nll = -_nb_lq(np.asarray(t["p_kn"], dtype=np.float64))
        return pa.table(
            {
                "bg": pc.binary_join_element_wise(t["w1"], t["w2"], " "),
                "nll_q": pa.array(nll, pa.int64()),
            }
        )

    lmq = lm.map_batches(lm_q, batch_format="pyarrow", zero_copy_batch=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_bigrams(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bg": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = r[1:] == r[:-1]
        bg = pc.binary_join_element_wise(
            f.slice(0, m - 1).filter(pa.array(same)),
            f.slice(1, m - 1).filter(pa.array(same)),
            " ",
        )
        ids = np.asarray(t["doc_id"], dtype=np.int64)[r[:-1][same]]
        g = (
            pa.table({"doc_id": pa.array(ids, pa.int64()), "bg": bg})
            .group_by(["doc_id", "bg"])
            .aggregate([("bg", "count")])
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "bg": g["bg"],
                "cnt": pc.cast(g["bg_count"], pa.int64()),
            }
        )

    occ = docs.map_batches(doc_bigrams, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        occ, lmq, key="bg", left_cols=["doc_id", "cnt"], right_cols=["nll_q"]
    )

    def terms(t: pa.Table) -> pa.Table:
        cnt = np.asarray(t["cnt"], dtype=np.int64)
        nll = np.asarray(t["nll_q"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(cnt * nll, pa.int64()),
                "cnt": t["cnt"],
            }
        )

    per_doc = sorted_group_agg(
        joined.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"],
        [("bits_q", "sum", "bits"), ("n_bigrams", "sum", "cnt")],
    )

    def score(t: pa.Table) -> pa.Table:
        bq = np.asarray(t["bits_q"], dtype=np.int64)
        nb = np.asarray(t["n_bigrams"], dtype=np.int64)
        avg = bq.astype(np.float64) / nb.astype(np.float64) / float(PPL_QUANT)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "bits_q": t["bits_q"],
                "avg_bits": pa.array(avg, pa.float64()),
            }
        )

    scored = per_doc.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = scored.count()
    ranked = zip_with_index(scored, ["avg_bits", "doc_id"], [False, False])

    def bucketize(t: pa.Table) -> pa.Table:
        rk = np.asarray(t["rank"], dtype=np.int64)
        b = rk * PPL_BUCKETS // max(n, 1) + 1
        return t.drop_columns(["rank"]).append_column(
            "bucket", pa.array(b, pa.int64())
        )

    return ranked.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["ccnet_ppl_buckets"] = (
    r"WITH l AS (SELECT doc_id, list_filter(regexp_split_to_array("
    r"coalesce(text, ''), '\s+'), x -> x <> '') AS toks FROM documents), "
    "b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
    "i -> toks[i] || ' ' || toks[i + 1])) AS term FROM l), "
    "cb AS (SELECT term, count(*) AS n FROM b GROUP BY term), "
    "s1 AS (SELECT split_part(term, ' ', 1) AS w1, sum(n) AS c1, "
    "count(*) AS n1f FROM cb GROUP BY 1), "
    "s2 AS (SELECT split_part(term, ' ', 2) AS w2, count(*) AS n1b "
    "FROM cb GROUP BY 1), "
    "tot AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM cb), "
    "lm AS (SELECT term, "
    "  (greatest(CAST(n AS DOUBLE) - 0.75, 0) + "
    "   0.75 * CAST(n1f AS DOUBLE) * CAST(n1b AS DOUBLE) / b) "
    "  / CAST(c1 AS DOUBLE) AS p_kn "
    "  FROM cb CROSS JOIN tot "
    "  JOIN s1 ON s1.w1 = split_part(term, ' ', 1) "
    "  JOIN s2 ON s2.w2 = split_part(term, ' ', 2)), "
    "lmq AS (SELECT term, CAST(-floor(log2(p_kn) * 1048576 + 0.5) AS BIGINT) "
    "  AS nll_q FROM lm), "
    "occ AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt "
    "  FROM b GROUP BY 1, 2), "
    "per AS (SELECT doc_id, CAST(sum(cnt * nll_q) AS BIGINT) AS bits_q, "
    "  CAST(sum(cnt) AS BIGINT) AS n_bigrams "
    "  FROM occ JOIN lmq USING (term) GROUP BY doc_id) "
    "SELECT doc_id, n_bigrams, bits_q, "
    "  CAST(bits_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1048576.0 "
    "    AS avg_bits, "
    "  CAST(NTILE(3) OVER (ORDER BY "
    "    CAST(bits_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1048576.0, "
    "    doc_id) AS BIGINT) AS bucket "
    "FROM per"
)


def q_normalize_text(sf_dir: str):
    """C4-style cleaning: NFC → lowercase → collapse whitespace → trim,
    dialect-identical pyarrow/DuckDB kernels (ops/text.normalize_text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.normalize_text(ds)


def q_value_quantiles(sf_dir: str):
    """Exact per-type value quantiles (25/50/75): one sort exchange +
    per-block rank-target selection — no group ever materializes in one
    task (ops/agg.group_quantiles; DuckDB quantile_disc convention)."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return group_quantiles(ev, "event_type", "value", percents=(25, 50, 75))


def q_value_quantiles_cont(sf_dir: str):
    """Exact per-type INTERPOLATED quantiles (percentile_cont
    25/50/90): same sort exchange as the discrete form, floor+ceil rank
    picks per target, DuckDB's own lo·(crn−rn)+hi·(rn−frn) combination
    so the float output is bit-identical to quantile_cont
    (ops/agg.group_quantiles_cont)."""
    from ..ops.agg import group_quantiles_cont

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return group_quantiles_cont(ev, "event_type", "value", percents=(25, 50, 90))


