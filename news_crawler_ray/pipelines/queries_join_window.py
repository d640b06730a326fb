"""Join matrix + window/rank/rollup family over events and TPC-H tables.

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
    CLIP_SCORE_N,
    OUTLINK_DEG_N,
)
from .queries_rel import (
    _read,
)

def q_lineitem_orders_join(sf_dir: str):
    """General inner equi-join of two DATA-SCALE fact tables
    (lineitem ⋈ orders on orderkey) on the key-complete exchange —
    both sides ship once, per-key outputs assemble by offset
    arithmetic, hot keys raise loudly instead of exploding
    (ops/join.sort_merge_inner_join)."""
    from ..ops.join import sort_merge_inner_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    return sort_merge_inner_join(
        li,
        orders,
        "l_orderkey",
        left_cols=["l_linenumber", "l_quantity"],
        right_cols=["o_orderdate", "o_totalprice"],
        right_key="o_orderkey",
    )


def q_customer_orders_left_join(sf_dir: str):
    """Left-outer variant of the data-scale equi-join: every customer
    row survives, the ~2% with no orders carry nulled order columns
    (the unmatched path of ops/join.sort_merge_inner_join how='left')."""
    from ..ops.join import sort_merge_inner_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return sort_merge_inner_join(
        cust,
        orders,
        "c_custkey",
        left_cols=[],
        right_cols=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
        how="left",
    )


PSNR_AUDIT_N = 120


def q_payload_psnr(sf_dir: str):
    """The input_hint's per-row payload invariant (decoded-pixel
    fidelity vs the TRUE reference pixels; PSNR ≥ 40 dB for lossy
    formats) as a queryable audit over the page-store
    (ops/multimodal.payload_psnr_audit)."""
    from ..fixtures import synth

    tab = synth.make_pagestore(PSNR_AUDIT_N, seed=42).select(
        ["image_id", "bytes", "fmt", "w", "h"]
    )
    refs = [
        synth.reference_pixels(k, seed=42).tobytes() for k in range(PSNR_AUDIT_N)
    ]
    tab = tab.append_column("ref_px", pa.array(refs, pa.large_binary()))
    return mm.payload_psnr_audit(ray.data.from_arrow(tab))


def q_customer_orders_full_join(sf_dir: str):
    """Full-outer equi-join (both unmatched directions null-padded,
    key from whichever side is present): even customers × orders of
    third customers — the filters guarantee unmatched rows on BOTH
    sides, exercising the complete join matrix."""
    from ..ops.join import sort_merge_inner_join

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["c_custkey"], 1), 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def third(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["o_custkey"],
                pc.multiply(pc.divide(t["o_custkey"], 3), pa.scalar(3, pa.int64())),
            ),
            0,
        )
        return t.filter(keep)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return sort_merge_inner_join(
        cust,
        orders.map_batches(third, batch_format="pyarrow", zero_copy_batch=True),
        "c_custkey",
        left_cols=[],
        right_cols=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
        how="outer",
    )


PROFILE_COLS = ["event_type", "props", "user_id", "value"]


def q_profile_events(sf_dir: str):
    """Per-column ingest profile of the events table
    (ops/agg.profile_table): null/row counts as one zero-exchange
    combiner, exact distinct per column on the sort exchange."""
    from ..ops.agg import profile_table

    ev = _read(sf_dir, "events", PROFILE_COLS)
    return profile_table(ev, PROFILE_COLS)


TRIANGLE_MOD = 97


def q_triangles(sf_dir: str):
    """Exact triangle count (ops/graph.triangle_count) over a
    deterministic graph derived from lineitem (orderkey/partkey folded
    mod 97, canonical a<b, distinct): wedge generation on the
    a-complete exchange + semi join of packed wedge keys against the
    edge set."""
    from ..ops.agg import sorted_distinct
    from ..ops.graph import triangle_count

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    m = pa.scalar(TRIANGLE_MOD, pa.int64())

    def fold(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_orderkey"], pa.int64())
        y = pc.cast(t["l_partkey"], pa.int64())
        u = pc.subtract(x, pc.multiply(pc.divide(x, m), m))
        v = pc.subtract(y, pc.multiply(pc.divide(y, m), m))
        a = pc.min_element_wise(u, v)
        b = pc.max_element_wise(u, v)
        keep = pc.not_equal(a, b)
        return pa.table({"a": a.filter(keep), "b": b.filter(keep)})

    edges = sorted_distinct(
        li.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    )
    return triangle_count(edges, node_cap=TRIANGLE_MOD)


GROUP_SAMPLE_K = 20


def q_event_type_sample(sf_dir: str):
    """Deterministic per-group sample — the scale-safe 'reservoir':
    keep the K rows per event_type with the smallest md5(event_id)
    prefix (content-stable, so reruns and any partitioning agree;
    uniform because md5 is key-equidistributed). Just a hash-derive +
    ops/agg.group_top_k — no new exchange machinery."""
    import hashlib

    from ..ops.agg import group_top_k

    ev = _read(sf_dir, "events", ["event_id", "event_type"])

    def hk(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(str(v).encode()).hexdigest()[:8]
            for v in t["event_id"].to_pylist()
        ]
        return t.append_column("hk", pa.array(h, pa.string()))

    top = group_top_k(
        ev.map_batches(hk, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        ["hk", "event_id"],
        [False, False],
        GROUP_SAMPLE_K,
    )
    return top.map_batches(
        lambda t: t.select(["event_type", "event_id", "rn"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


CM_PROBES = ["batch", "hash", "join", "row", "scan", "zz-absent-term"]
CM_W, CM_D = 1024, 3


def q_cm_counts(sf_dir: str):
    """Count-min sketch term estimates (ops/agg.cm_sketch_counts):
    counters are sums, so the sketch merges exactly at any block
    layout — a zero-exchange combiner where exact top_terms needs the
    full term exchange. The SQL oracle rebuilds the identical sketch
    (same md5 bucket convention) in DuckDB."""
    from ..ops.agg import cm_sketch_counts

    docs = _read(sf_dir, "documents", ["text"])
    return cm_sketch_counts(docs, CM_PROBES, text_col="text", w=CM_W, d=CM_D)


def q_event_customer_skew_join(sf_dir: str):
    """Skew-aware equi-join (ops/join.skew_join): power users past the
    hot threshold bypass the exchange — their customer rows broadcast
    once via ray.put and join map-side; the cold tail takes the normal
    sort-merge exchange. Row-identical to the plain JOIN (the oracle);
    threshold 80 makes BOTH paths real at sf0.01."""
    from ..ops.join import skew_join

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return skew_join(
        ev,
        cust,
        "user_id",
        left_cols=["event_id"],
        right_cols=["c_nationkey"],
        right_key="c_custkey",
        hot_threshold=80,
    )


def q_dup_ngrams(sf_dir: str):
    """Exact duplicate-5-gram span stats per document (the substring-
    dedup signal of Lee et al. 2022): explode grams → gram-complete
    exchange → per-doc dup partials → doc sum + left join
    (ops/text.dup_ngram_stats)."""
    from ..ops.text import dup_ngram_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_ngram_stats(docs, text_col="text", id_col="doc_id", n=5)


def q_event_rolling(sf_dir: str):
    """Bounded row-window aggregate — SUM/COUNT/AVG OVER (PARTITION BY
    user ORDER BY ts, id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) in
    integer cents on the key-complete exchange
    (ops/window.rolling_window)."""
    from ..ops.window import rolling_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return t.drop_columns(["value"]).append_column(
            "v_int", pa.array(v, pa.int64())
        )

    return rolling_window(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        val_col="v_int",
        k_preceding=3,
    )


def q_event_value_stats(sf_dir: str):
    """Exact per-type mean / population variance / stddev of event
    value in integer cents (ops/agg.group_var_stats): integer moment
    partials per block, arbitrary-precision driver merge, one
    correctly-rounded cast per output float — bit-identical to the SQL
    exact-integer formula at any parallelism."""
    from ..ops.agg import group_var_stats

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"], "v": pa.array(v, pa.int64())}
        )

    tab = group_var_stats(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        "v",
    )
    return tab.rename_columns(
        ["event_type", "n_values", "sum_cents", "mean_cents", "var_cents", "std_cents"]
    )


def q_orders_customer_right_join(sf_dir: str):
    """Right-outer mode completing the data-scale join matrix
    (inner/left/right/full on one kernel): orders ⋈ customer keyed on
    custkey with orders as the LEFT side, so the ~2% of customers with
    no orders exercise the unmatched-right null-padding branch of
    ops/join.sort_merge_inner_join how='right'."""
    from ..ops.join import sort_merge_inner_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return sort_merge_inner_join(
        orders,
        cust,
        "o_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=[],
        right_key="c_custkey",
        how="right",
    )


def q_corpus_diff(sf_dir: str):
    """Snapshot diff between crawl epochs (incremental-ingest
    primitive): snapshot B derives from documents by a deterministic
    rule — every 7th doc removed, every 10th mutated, every 13th gains
    a new doc — and ops/join.snapshot_diff reports added / removed /
    changed by md5 fingerprint over ONE narrow-row key-complete
    exchange. The SQL oracle applies the same rule with a FULL OUTER
    JOIN."""
    from ..ops.join import snapshot_diff

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp_a(t: pa.Table) -> pa.Table:
        from ..ops.text import fingerprint_batch

        f = fingerprint_batch(t)
        return pa.table({"doc_id": f["doc_id"], "fp": f["md5"]})

    def make_b(t: pa.Table) -> pa.Table:
        import hashlib

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        texts = t["text"].to_pylist()
        out_ids, out_fps = [], []
        for i, txt in zip(ids.tolist(), texts):
            if i % 7 != 0:
                s = (txt or "") + " v2" if i % 10 == 0 else (txt or "")
                out_ids.append(i)
                out_fps.append(hashlib.md5(s.encode()).hexdigest())
            if i % 13 == 0:
                out_ids.append(i + 1_000_000)
                out_fps.append(hashlib.md5(f"new doc {i}".encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "fp": pa.array(out_fps, pa.string()),
            }
        )

    a = docs.map_batches(fp_a, batch_format="pyarrow", zero_copy_batch=True)
    b = docs.map_batches(make_b, batch_format="pyarrow", zero_copy_batch=True)
    return snapshot_diff(a, b, "doc_id", "fp")


def q_caption_consistency(sf_dir: str):
    """Caption↔image consistency scoring over the page-store (the
    CLIP-filter slot, deterministic-fake embeddings per the contract):
    real decode → cell embedding vs signed-feature-hashed caption,
    cosine per row. Sequential oracle shares the embed kernels."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(CLIP_SCORE_N, seed=42).select(
            ["image_id", "bytes", "fmt", "caption"]
        )
    )
    return mm.caption_image_consistency(ps)


def q_outlink_degrees(sf_dir: str):
    """In-degree per host of the outlink graph embedded in captions:
    flat_map link harvest (S3/M9 semantics) → combiner count by host —
    zero exchange at host-registry cardinality. Real-SQL oracle
    re-parses the same inlined captions with regexps."""
    from ..fixtures import synth
    from ..ops.agg import partial_group_agg
    from ..stages.parse import extract_outlinks

    ps = ray.data.from_arrow(
        synth.make_pagestore(OUTLINK_DEG_N, seed=42).select(["caption"])
    )
    return partial_group_agg(
        extract_outlinks(ps), ["host"], [("n_links", "count_all", None)]
    )


def q_reciprocal_links(sf_dir: str):
    """Link-farm signal: reciprocal host-pair link counts over the
    outlink graph (pages exchanging links both ways rank as farms in a
    crawl-quality pass). One narrow (lo,hi,dir) combiner + sorted
    exchange; edges never leave their block unaggregated. REAL SQL
    oracle: same regexp harvest + least/greatest conditional sums."""
    from ..fixtures import synth
    from ..ops.agg import sorted_group_agg

    ps = synth.make_pagestore(OUTLINK_DEG_N, seed=42).select(["caption"])
    src = pa.array(
        [synth.host_of(k) for k in range(OUTLINK_DEG_N)], pa.string()
    )
    ds = ray.data.from_arrow(ps.append_column("src_host", src))

    def edges(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"host_a": pa.array([], pa.string()),
             "host_b": pa.array([], pa.string()),
             "fwd": pa.array([], pa.int64()),
             "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        caps = pc.coalesce(t["caption"], "")
        lst = pc.split_pattern_regex(caps, r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        flat = pc.list_flatten(lst)
        offs = np.asarray(lst.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offs))
        is_link = pc.starts_with(flat, "link:").to_numpy(zero_copy_only=False)
        urls = pc.utf8_slice_codeunits(flat.filter(pa.array(is_link)), start=5)
        dst = pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)")
        dvals = pc.struct_field(dst, "h")
        svals = t["src_host"].take(pa.array(row_of[is_link]))
        sv = np.asarray(svals, dtype=object)
        dv = np.asarray(dvals, dtype=object)
        ok = np.array([d is not None for d in dv])
        sv, dv = sv[ok], dv[ok]
        ne = sv != dv
        sv, dv = sv[ne], dv[ne]
        lo = np.minimum(sv, dv)
        hi = np.maximum(sv, dv)
        fwd = (sv < dv).astype(np.int64)
        g = (
            pa.table(
                {"host_a": pa.array(lo, pa.string()),
                 "host_b": pa.array(hi, pa.string()),
                 "fwd": pa.array(fwd, pa.int64()),
                 "rev": pa.array(1 - fwd, pa.int64())}
            )
            .group_by(["host_a", "host_b"])
            .aggregate([("fwd", "sum"), ("rev", "sum")])
        )
        return pa.table(
            {"host_a": g["host_a"], "host_b": g["host_b"],
             "fwd": pc.cast(g["fwd_sum"], pa.int64()),
             "rev": pc.cast(g["rev_sum"], pa.int64())}
        )

    agg = sorted_group_agg(
        ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True),
        ["host_a", "host_b"],
        [("n_ab", "sum", "fwd"), ("n_ba", "sum", "rev")],
    )

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_ab" not in t.column_names:
            return pa.table(
                {"host_a": pa.array([], pa.string()),
                 "host_b": pa.array([], pa.string()),
                 "n_ab": pa.array([], pa.int64()),
                 "n_ba": pa.array([], pa.int64()),
                 "reciprocal": pa.array([], pa.bool_())}
            )
        return t.append_column(
            "reciprocal",
            pc.and_(pc.greater(t["n_ab"], 0), pc.greater(t["n_ba"], 0)),
        )

    return agg.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


PHASH_DUP_N, PHASH_DUP_POOL = 200, 60


def q_curate_image_corpus(sf_dir: str):
    """End-to-end image-corpus curation, the on-axis flagship
    composition: admission predicates gate the decode, caption↔image
    scoring + aspect bucketing run fused in ONE payload pass, then
    exact phash dedup keeps the min admitted id per hash over the
    narrow manifest (ops/multimodal.curate_image_corpus). The pool-
    cycled fixture plants real exact dups."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL)
    )
    return mm.curate_image_corpus(ps)


def q_caption_pixel_corr(sf_dir: str):
    """Image-store metadata analytics: per-format Pearson correlation
    between caption length and pixel count (do bigger images carry
    longer captions?) — ops/agg.group_corr's integer cross-moment
    combiner over the store's METADATA columns only (bytes never
    load). Bit-identical to the sequential big-int oracle."""
    from ..fixtures import synth
    from ..ops.agg import group_corr

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL).select(
            ["fmt", "w", "h", "caption"]
        )
    )

    def xy(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fmt": t["fmt"],
                "cap_len": pc.cast(pc.utf8_length(t["caption"]), pa.int64()),
                "pixels": pc.multiply(
                    pc.cast(t["w"], pa.int64()), pc.cast(t["h"], pa.int64())
                ),
            }
        )

    return group_corr(
        ps.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True),
        ["fmt"],
        "cap_len",
        "pixels",
    )


def q_exact_phash_dups(sf_dir: str):
    """Exact perceptual-hash dup groups over STORE METADATA: the
    input_hint schema ships phash as a column, so byte-identical
    re-posts group without any decode — combiner partials per block
    (phash cardinality is pool-sized, not corpus-sized), keep groups
    with >1 copy, canonical = min image_id. The decode-free complement
    of phash_near_dup."""
    from ..fixtures import synth
    from ..ops.agg import partial_group_agg

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL).select(
            ["image_id", "phash"]
        )
    )
    g = partial_group_agg(
        ps,
        ["phash"],
        [("n_copies", "count_all", None), ("canonical_id", "min", "image_id")],
    )
    return g.filter(pc.greater(g["n_copies"], 1))


def q_lineitems_of_large_parts(sf_dir: str):
    """Bloom-prefilter semi join (ops/join.bloom_semi_join): lineitems
    whose part is size > 40. The bloom bitmap over the small right side
    broadcasts once; the big left side is prefiltered block-local so the
    exact sort-merge verify sees ~|matches| rows instead of |lineitem|
    — the 100 TB shape for mid-sized right sides."""
    from ..ops.join import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"])

    def large_part_keys(t: pa.Table) -> pa.Table:
        big = t.filter(pc.greater(t["p_size"], 40))
        return pa.table({"l_partkey": big["p_partkey"]})

    right = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        large_part_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    return bloom_semi_join(li, right, "l_partkey")


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split (10% val, 10% test) by
    content-stable md5 — disjoint + exhaustive, identical on any rerun
    or cluster shape (ops/sampling.dataset_split). Streams block-local;
    no shuffle, no RNG state."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    return sp.dataset_split(ds, "doc_id", val_fraction=0.1, test_fraction=0.1)


def q_top_orders_per_cust(sf_dir: str):
    """Per-group top-k (QUALIFY row_number() <= 3): each customer's 3
    priciest orders, on the key-complete sort exchange
    (ops/agg.group_top_k) — the ref's newest-first-truncate (news.py:
    152-162) generalized to per-key. Tiebreak on o_orderkey makes the
    kept rows and ranks total-order deterministic."""
    from ..ops.agg import group_top_k

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = group_top_k(
        ds, "o_custkey", ["o_totalprice", "o_orderkey"], [True, False], k=3
    )
    return out.map_batches(
        lambda t: t.select(["o_custkey", "o_orderkey", "o_totalprice", "rn"]),
        batch_format="pyarrow",
    )


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day): all three grouping levels in
    one streaming pass (in-task level fan-out + zero-exchange combiner,
    ops/agg.rollup_agg). Counts/max only — exact at any merge order."""
    from ..ops.agg import rollup_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    # day as an ISO string, not date32: a nullable DATE column renders
    # asymmetrically in the driver's pandas compare (NaT vs None)
    def with_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.strftime(t["ts"], format="%Y-%m-%d"))

    return rollup_agg(
        ev.map_batches(with_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_sessions(sf_dir: str):
    """Per-EVENT session assignment (the enrichment form of
    sessionize): each event tagged with its 1-based session number —
    ops/window.session_assign, 30-minute gap, same break logic the
    session-summary query uses."""
    from ..ops.window import session_assign

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return session_assign(ev, gap_minutes=30.0)


def q_event_type_transitions(sf_dir: str):
    """Within-session event-type transition counts (sequence-mining
    prep), composed from engine primitives: session assignment (with
    carry columns — the kernel already co-locates and sorts every row,
    so no join back) → LAG of the type within each (user, session) →
    zero-exchange combiner count of (prev_type, event_type) pairs.
    Session boundaries break chains (a session's first event has no
    prev)."""
    from ..ops.agg import partial_group_agg
    from ..ops.window import lag_lead, session_assign

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    enriched = session_assign(
        ev, gap_minutes=30.0, carry_cols=("user_id", "ts", "event_type")
    )

    def with_us_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()),
            pc.cast(t["session_num"], pa.string()),
            "#",
        )
        return t.append_column("us", k)

    keyed = enriched.map_batches(
        with_us_key, batch_format="pyarrow", zero_copy_batch=True
    )
    lagged = lag_lead(
        keyed, "us", ["ts", "event_id"], "event_id", "event_type", keep_value=True
    )

    def drop_null_prev(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_valid(t["prev_value"]))
        return pa.table(
            {"prev_type": out["prev_value"], "event_type": out["value"]}
        )

    long = lagged.map_batches(
        drop_null_prev, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial_group_agg(
        long, ["prev_type", "event_type"], [("n", "count_all", None)]
    )


def q_user_type_pivot(sf_dir: str):
    """Pivot (long → wide reshape): per-user counts of each event type
    as columns. One vectorized conditional-count pass per block (an
    int64 equality-mask column per type — the pivot never becomes a
    per-type shuffle), then the single sorted group-aggregate by user
    sums the wide partials. Unknown types are counted nowhere by
    design; the column set is the broadcast-small config, like the
    keyword list."""
    from ..ops.agg import sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def widen(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    wide = ev.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_group_agg(
        wide, ["user_id"], [(f"n_{ty}", "sum", f"n_{ty}") for ty in PIVOT_TYPES]
    )


def q_user_type_melt(sf_dir: str):
    """Unpivot (wide → long reshape), proven as the pivot's inverse:
    melt the per-user wide counts back to (user_id, event_type, n) and
    drop the zero cells — the result must equal a direct GROUP BY, so
    the round trip is the oracle. The melt is an in-block column
    fan-out (one take per type), no exchange at all."""
    wide = q_user_type_pivot(sf_dir)
    if isinstance(wide, pa.Table):
        wide = ray.data.from_arrow(wide)

    def melt(t: pa.Table) -> pa.Table:
        outs = []
        for ty in PIVOT_TYPES:
            n = t[f"n_{ty}"]
            part = pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": pa.array([ty] * t.num_rows, pa.string()),
                    "n": pc.cast(n, pa.int64()),
                }
            )
            outs.append(part.filter(pc.greater(part["n"], 0)))
        return pa.concat_tables(outs)

    return wide.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def q_token_freq_spectrum(sf_dir: str):
    """Zipf frequency-of-frequencies over the corpus vocabulary
    (ops/text.token_freq_spectrum): term-count exchange, then a
    zero-exchange combiner over the tiny spectrum domain."""
    from ..ops.text import token_freq_spectrum

    return token_freq_spectrum(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_quality_percentile_filter(sf_dir: str):
    """Adaptive-threshold corpus filter (two-phase): the exact global
    75th-percentile token count is computed distributed (one
    group-quantile exchange over a constant key), broadcast as a plain
    value, then the keep-filter streams block-local — the shape of any
    data-dependent cutoff (quality floors, length caps) at corpus
    scale. Integer threshold → no float drift."""
    from ..ops.agg import group_quantiles
    from ..ops.text import token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stats = token_stats(docs).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "k": pa.array(["all"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    q = group_quantiles(stats, "k", "n_tokens", (75,)).take_all()
    threshold = int(q[0]["n_tokens"])
    return stats.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_tokens": t["n_tokens"]}
        ).filter(pc.greater_equal(t["n_tokens"], threshold)),
        batch_format="pyarrow",
    )


def q_event_range_window(sf_dir: str):
    """Time-based rolling sum: per user, the exact cents-sum of values
    in the trailing 1-hour RANGE window (ops/window.range_window_sum).
    Peers at the same ts are in-frame per SQL RANGE semantics, so the
    result needs no tiebreak to be deterministic; integer cents make
    the sums merge-order-proof."""
    from ..ops.window import range_window_sum

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        c = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(c, pa.int64()),
            }
        )

    return range_window_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        "ts",
        "event_id",
        "cents",
        interval_us=3_600_000_000,
    )


def q_value_quartile_buckets(sf_dir: str):
    """Quantile feature binning: each event labeled with its
    event_type's quartile bucket (1–4) — exact per-type q25/q50/q75 on
    the quantile exchange (15 rows), thresholds broadcast, the binning
    one vectorized comparison-sum per block (bucket = 1 + Σ v > qᵢ,
    the exact form the oracle uses)."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    q = group_quantiles(ev, "event_type", "value", percents=(25, 50, 75)).take_all()
    th: dict[str, dict[int, float]] = {}
    for row in q:
        th.setdefault(row["event_type"], {})[row["pct"]] = row["value"]
    types = sorted(th)
    th_mat = np.array(
        [[th[t][25], th[t][50], th[t][75]] for t in types], dtype=np.float64
    )
    type_arr = pa.array(types, pa.string())

    def bucket(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        b = 1 + (v[:, None] > th_mat[codes]).sum(axis=1)
        return pa.table(
            {
                "event_id": t["event_id"],
                "bucket": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    return ev.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)


def q_value_share(sf_dir: str):
    """Percent-of-group-total (ratio_to_report): each event's share of
    its type's total value — totals in exact integer cents via the
    zero-exchange combiner, the share ONE IEEE division of two exact
    ints per row (bit-identical to the SQL CAST/CAST division)."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": pa.array(
                    np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    cts = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    totals = partial_group_agg(
        cts, ["event_type"], [("tot", "sum", "cents")]
    )
    types = totals["event_type"].to_pylist()
    tot = np.asarray(totals["tot"], dtype=np.float64)
    type_arr = pa.array(types, pa.string())

    def share(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        c = np.asarray(t["cents"], dtype=np.int64).astype(np.float64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "share": pa.array(c / tot[codes], pa.float64()),
            }
        )

    return cts.map_batches(share, batch_format="pyarrow", zero_copy_batch=True)


def q_value_mad(sf_dir: str):
    """Median absolute deviation per event_type — the robust spread
    statistic curation filters prefer over stddev: two chained exact
    quantile exchanges (median of values → broadcast → median of
    |v − med|), every float either a quantile_disc element pick or one
    IEEE abs/subtract, so the result is bit-identical to the SQL
    two-CTE oracle."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    med_rows = group_quantiles(ev, "event_type", "value", percents=(50,)).take_all()
    types = sorted(r["event_type"] for r in med_rows)
    med = {r["event_type"]: r["value"] for r in med_rows}
    type_arr = pa.array(types, pa.string())
    med_arr = np.asarray([med[t] for t in types], dtype=np.float64)

    def absdev(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "dev": pa.array(np.abs(v - med_arr[codes]), pa.float64()),
            }
        )

    devs = ev.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True)
    out = group_quantiles(devs, "event_type", "dev", percents=(50,))
    return out.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "mad": t["dev"]}),
        batch_format="pyarrow",
    )


def q_integrity_report(sf_dir: str):
    """Cross-table data-quality audit — the constraint checks an
    ingest pipeline runs before admitting a snapshot, as ONE report
    table (check_name, n_violations): referential integrity both ways
    (sort-merge anti joins), key uniqueness (sorted group-agg count >
    1), and cross-table consistency (per-order lineitem cents sum vs
    the order header, integer-exact). Each check is a distributed
    count; only the 4-row report materializes."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    ev = _read(sf_dir, "events", ["event_id"])

    dup = sorted_group_agg(ev, ["event_id"], [("n", "count_all", None)])
    n_dup = dup.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    ).count()

    def line_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents": pa.array(
                    np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    sums = sorted_group_agg(
        li.map_batches(line_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        [("line_cents", "sum", "cents"), ("n_lines", "count_all", None)],
    )

    def order_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["o_totalprice"], dtype=np.float64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_cents": pa.array(
                    np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    # ONE full-outer join carries all three referential checks:
    # left-only rows = childless orders, right-only rows = orphan
    # lineitem keys (their n_lines sum = orphan ROWS), matched rows
    # compare cents — per-block int partials, 3 ints/block to driver
    joined = sort_merge_inner_join(
        orders.map_batches(
            order_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        sums,
        "o_orderkey",
        ["total_cents"],
        ["line_cents", "n_lines"],
        right_key="l_orderkey",
        how="outer",
    )

    def check_partial(t: pa.Table) -> pa.Table:
        have_total = pc.is_valid(t["total_cents"]).to_numpy(zero_copy_only=False)
        have_lines = pc.is_valid(t["line_cents"]).to_numpy(zero_copy_only=False)
        childless = int((have_total & ~have_lines).sum())
        orphan_mask = ~have_total & have_lines
        nl = np.asarray(
            pc.fill_null(t["n_lines"], 0).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        orphans = int(nl[orphan_mask].sum())
        both = have_total & have_lines
        tc = pc.fill_null(t["total_cents"], 0).to_numpy(zero_copy_only=False)
        lc = pc.fill_null(t["line_cents"], 0).to_numpy(zero_copy_only=False)
        mismatch = int((both & (tc != lc)).sum())
        return pa.table(
            {
                "childless": pa.array([childless], pa.int64()),
                "orphans": pa.array([orphans], pa.int64()),
                "mismatch": pa.array([mismatch], pa.int64()),
            }
        )

    parts = joined.map_batches(
        check_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n_childless = sum(p["childless"] for p in parts)
    n_orphans = sum(p["orphans"] for p in parts)
    n_mismatch = sum(p["mismatch"] for p in parts)

    return pa.table(
        {
            "check_name": pa.array(
                [
                    "duplicate_event_ids",
                    "order_total_mismatch",
                    "orders_without_lineitems",
                    "orphan_lineitems",
                ],
                pa.string(),
            ),
            "n_violations": pa.array(
                [n_dup, n_mismatch, n_childless, n_orphans], pa.int64()
            ),
        }
    )


