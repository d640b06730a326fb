"""Embedding/similarity + graph + sampling family: asof/session, components, PQ/PCA/kNN, samples.

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

from .queries_ingest import (
    SESSION_GAP_MIN,
)
from .queries_rel import (
    CONTRAST_K,
    CONTRAST_Q,
    KMEANS_BLOCKS,
    KMEANS_ITERS,
    KMEANS_K,
    ORACLE_SQL,
    SAMPLE_DEFAULT,
    SAMPLE_FRACTIONS,
    _drop_word3,
    _ds_from_table,
    _planted_docs_tbl,
    _read,
)

def q_clicks_prior_view(sf_dir: str):
    """As-of join (backward, inclusive): each click event gets the
    user's latest view event at-or-before it. Right side is made unique
    per (user, ts) first (max event_id) so the survivor is
    deterministic — mirrored in the DuckDB ASOF JOIN oracle."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda t: t.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = sorted_group_agg(
        ev.filter(expr="event_type == 'view'"),
        ["user_id", "ts"],
        [("prior_view_id", "max", "event_id")],
    )
    joined = sort_merge_asof_join(
        clicks, views, key="user_id", ts_col="ts", right_cols=["prior_view_id"]
    )
    return joined.map_batches(
        lambda t: t.select(["event_id", "prior_view_id"]), batch_format="pyarrow"
    )


def q_sessionize(sf_dir: str):
    """Gap-based sessionization of the events stream (the streaming-
    window custom operator): per-user sessions split at >30-minute gaps,
    one row per session with exact bounds. One task-based sort exchange
    (ops/window.sessionize), no hash shuffle."""
    from ..ops import window as win

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return win.sessionize(ds, gap_minutes=SESSION_GAP_MIN)


def q_views_before_click(sf_dir: str):
    """Bounded range join: every (click, view) pair of the same user
    with the view inside the 30 minutes before the click (inclusive)."""
    from ..ops.join import sort_merge_range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda t: t.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = ev.filter(expr="event_type == 'view'").map_batches(
        lambda t: t.select(["ts", "user_id"]).append_column("view_id", t["event_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = sort_merge_range_join(
        clicks, views, key="user_id", ts_col="ts", right_cols=["view_id"],
        low=-30 * 60_000_000, high=0,
    )
    return joined.map_batches(
        lambda t: t.select(["event_id", "view_id"]), batch_format="pyarrow"
    )


def q_canonical_docs(sf_dir: str):
    """Near-dup cluster resolution by QUALITY (the SemDeDup/near-dup
    policy a curation pass actually applies — keep the best member, not
    the smallest id): MinHash components LEFT-joined onto every planted
    doc (singletons are their own cluster), then one key-complete
    group_top_k picks the member with most tokens (ties → min id).
    Oracle: recursive-CTE closure + the same window rank."""
    from ..ops.agg import group_top_k
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join

    planted_tbl = _planted_docs_tbl(sf_dir, _drop_word3)
    planted = _ds_from_table(planted_tbl)
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def quality(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(pc.coalesce(t["text"], ""), r"\S+"), pa.int64()
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n_tok})

    q = planted.map_batches(quality, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        q, comp, "doc_id", ["n_tokens"], ["component"], how="left"
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "component": pc.coalesce(t["component"], t["doc_id"]),
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
            }
        )

    full = joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    top = group_top_k(full, "component", ["n_tokens", "doc_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: pa.table(
            {"component": t["component"], "canonical_id": t["doc_id"],
             "n_tokens": t["n_tokens"]}
        ),
        batch_format="pyarrow",
    )


def q_leakage_safe_split(sf_dir: str):
    """Near-dup-leakage-safe train/val/test split: the split key is the
    near-dup COMPONENT, not the doc, so a cluster of near-duplicates can
    never straddle train and eval (the split-leakage failure a plain
    per-doc hash split has). MinHash components LEFT-joined onto every
    planted doc (singletons self-key via coalesce), then the SAME shared
    md5 split thresholds as dataset_split applied to the component id.
    Oracle: recursive-CTE closure + split_case_sql('component')."""
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join
    from ..ops.sampling import split_column_batch

    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = planted.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(ids, comp, "doc_id", [], ["component"], how="left")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "component": pa.array([], pa.int64()),
                 "split": pa.array([], pa.string())}
            )
        base = pa.table(
            {"doc_id": t["doc_id"],
             "component": pc.coalesce(t["component"], t["doc_id"])}
        )
        return split_column_batch(base, "component", 0.1, 0.1)

    return joined.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_components(sf_dir: str):
    """Near-dup CLUSTERS: exact connected components (iterative hash-min
    label propagation, ops/graph) over the MinHash+LSH candidate pairs —
    every doc mapped to its cluster's minimum doc_id."""
    from ..ops.graph import connected_components

    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    return connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )


def q_dedup_corpus(sf_dir: str):
    """END-TO-END near-dup removal: MinHash+LSH pairs → exact connected
    components → keep each cluster's min doc_id → sort-merge ANTI join
    drops the other members. Output: the surviving corpus ids. The full
    composition a 100 TB pretraining-dedup run executes, as one
    streaming plan (pairs/components as in dup_components; the anti
    join is ops/join.sort_merge_anti_join — task-based, no hash
    shuffle)."""
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_anti_join

    planted_tbl = _planted_docs_tbl(sf_dir, _drop_word3)
    planted = _ds_from_table(planted_tbl)
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )
    losers = comp.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = _ds_from_table(planted_tbl.select(["doc_id"]))
    return sort_merge_anti_join(ids, losers, key="doc_id")


def q_pq_codes(sf_dir: str):
    """Product-quantization encoding of the embeddings table: 8
    subspaces x 16 spherical centroids, codes packed into one int64 —
    256B/vec to 8B/vec (ops/similarity.pq_encode; deterministic
    kmeans block plan). Sequential oracle expected_pq_codes replays the
    same kernels over the same plan, bit-for-bit."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:16], dtype=np.float64)
    return sim.pq_encode(ds, init=init, m=8, k=16, iters=2)


def q_knn_pq(sf_dir: str):
    """PQ-ADC approximate top-10 neighbors for the first 5 vectors:
    the scan reads 8-byte packed codes, scores via broadcast lookup
    tables (ops/similarity.pq_knn), partial top-k + combiner merge.
    Sequential oracle expected_pq_knn replays identical kernels."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:16], dtype=np.float64)
    cb = sim.pq_fit(ds, init, m=8, k=16, iters=2)
    codes = sim.pq_encode(ds, codebooks=cb)
    qm = np.array(tbl["embedding"].to_pylist()[:5], dtype=np.float64)
    out = sim.pq_knn(codes, cb, np.arange(5), qm, k=10)
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


def q_kmeans_clusters(sf_dir: str):
    """Distributed spherical k-means over the embeddings table: per-block
    partial sums + driver reduce per iteration (one streaming pass, no
    shuffle), then a broadcast-centroid assignment pass. Deterministic
    at any parallelism — verified bit-for-bit against the sequential
    oracle (expected.expected_kmeans)."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:KMEANS_K], dtype=np.float64)
    C = sim.kmeans_fit(ds, init=init, iters=KMEANS_ITERS)
    return sim.kmeans_assign(ds, C).map_batches(
        lambda t: t.select(["vec_id", "cluster"]), batch_format="pyarrow"
    )


PCA_K = 4


def q_embedding_pca(sf_dir: str):
    """Exact distributed PCA over the embeddings table
    (ops/similarity.pca_fit): per-block integer partials (n, ΣQ, QᵀQ)
    of the 2²⁰-quantized vectors — an order-invariant combiner, one
    streaming pass, no shuffle — then the covariance eigendecomposition
    driver-side on the d×d matrix. Output: one row per
    (component, dim) loading plus the component's eigenvalue and
    explained-variance ratio; bit-identical to the sequential oracle
    (expected.expected_embedding_pca)."""
    from ..ops.similarity import pca_fit

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    vals, comps, ratio, _n = pca_fit(ds, "embedding", k=PCA_K)
    k, d = comps.shape
    return pa.table(
        {
            "component": pa.array(np.repeat(np.arange(k), d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d), k), pa.int64()),
            "loading": pa.array(comps.ravel(), pa.float64()),
            "eigval": pa.array(np.repeat(vals, d), pa.float64()),
            "var_ratio": pa.array(np.repeat(ratio, d), pa.float64()),
        }
    )


def q_knn_recall(sf_dir: str):
    """ANN quality evaluation — recall@10 of the IVF scale path against
    the exact brute-force scan, SAME queries/centroids as knn_ivf: both
    sides run distributed (broadcast queries, per-block partial top-k),
    the Q×k result tables land driver-side (config-scale), recall is
    one integer intersection per query + one float division. The eval
    harness an ANN deployment gates on before swapping in a pruned
    index."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    head_schema = pa.schema(
        [pf.schema_arrow.field("vec_id"), pf.schema_arrow.field("embedding")]
    )
    batches, need = [], 2000
    for b in pf.iter_batches(batch_size=2048, columns=["vec_id", "embedding"]):
        batches.append(b)
        need -= b.num_rows
        if need <= 0:
            break
    tbl = pa.Table.from_batches(batches, schema=head_schema).slice(0, 2000)
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    C = sim.train_centroids(E, nlist=16)
    q_ids = np.asarray(tbl["vec_id"], dtype=np.int64)[:5]
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    approx = sim.knn_ivf(ds, q_ids, E[:5], C, k=10, nprobe=8).take_all()
    exact = sim.knn_brute_force(ds, q_ids, E[:5], k=10).take_all()
    ap: dict[int, set] = {}
    ex: dict[int, set] = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = []
    for qid in sorted(ex):
        hits = len(ex[qid] & ap.get(qid, set()))
        k = len(ex[qid])
        rows.append(
            {
                "query_id": qid,
                "n_hits": hits,
                "recall": float(hits) / float(k),
            }
        )
    return pa.Table.from_pylist(rows)


def q_embedding_pca_proj(sf_dir: str):
    """PCA fit→transform pipeline (ops/similarity.pca_fit +
    pca_transform): fit the top-4 components from integer Gram partials,
    then project EVERY vector via broadcast quantized components and an
    exact integer matmul (BLAS float dgemm is not row-slice
    deterministic; the int matmul is bitwise layout-proof). Output one
    row per (vec_id, component) coordinate."""
    from ..ops.similarity import pca_fit, pca_transform

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    _vals, comps, _ratio, _n = pca_fit(ds, "embedding", k=PCA_K)
    proj = pca_transform(ds, comps)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                    "coord": pa.array([], pa.float64()),
                }
            )
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        P = np.asarray(
            t["proj"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(ids), -1)
        k = P.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
                "component": pa.array(
                    np.tile(np.arange(k), len(ids)), pa.int64()
                ),
                "coord": pa.array(P.ravel(), pa.float64()),
            }
        )

    return proj.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_sample_docs(sf_dir: str):
    """Deterministic stratified sampling: content-stable Bernoulli by
    md5(doc_id) with per-language fractions (downsample dominant
    languages, keep rare ones whole). One streaming filter, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return sp.hash_sample(
        ds, "doc_id", strata_col="lang",
        fractions=SAMPLE_FRACTIONS, default_fraction=SAMPLE_DEFAULT,
    )


def q_value_weighted_sample(sf_dir: str):
    """Per-row IMPORTANCE sampling: each event kept with probability
    ∝ its value (p = cents/20000, clamped) — the upweight-the-rare
    selection a curation pass uses for high-signal rows. Content-stable
    md5 decision per row (ops/sampling.weight_sample_batch), one
    streaming filter, no shuffle; the oracle reproduces the exact
    sample via the shared quantized-cutoff predicate."""
    from ..ops.sampling import weight_sample_batch

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def keep(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100)
        p = np.minimum(c / 20000.0, 1.0)
        return weight_sample_batch(t, "event_id", p)

    return ev.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


_URL_PLANT_SQL = (
    "'https://s' || CAST(doc_id % 10 AS VARCHAR) || '.example/p/' || "
    "CAST(doc_id % 25 AS VARCHAR) || "
    "CASE WHEN doc_id % 2 = 0 "
    "THEN '?a=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_source=t' || "
    "  CAST(doc_id AS VARCHAR) "
    "ELSE '?utm_campaign=z&b=2&a=' || CAST(doc_id % 50 AS VARCHAR) END"
)


@ray.remote
def _canon_rollup_block(*parts: pa.Table) -> pa.Table:
    """Per-canon rollup over one key-complete (canon, url, doc_id)-sorted
    group set: n_urls = run length, n_raw = distinct-url boundaries in
    the run, first_doc = min doc_id — all via reduceat, no per-run
    Python."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {
                "canonical_url": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "n_raw": pa.array([], pa.int64()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(tables).combine_chunks()
    canon = t["canon"].combine_chunks()
    url = t["url"].combine_chunks()
    doc = np.asarray(t["doc_id"], dtype=np.int64)
    m = t.num_rows
    new_canon = np.ones(m, dtype=bool)
    new_url = np.ones(m, dtype=bool)
    if m > 1:
        new_canon[1:] = pc.not_equal(canon.slice(1), canon.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        new_url[1:] = new_canon[1:] | pc.not_equal(
            url.slice(1), url.slice(0, m - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(new_canon)
    ends = np.concatenate([starts[1:], [m]])
    n_urls = ends - starts
    n_raw = np.add.reduceat(new_url.astype(np.int64), starts)
    first_doc = np.minimum.reduceat(doc, starts)
    return pa.table(
        {
            "canonical_url": canon.take(pa.array(starts, pa.int64())),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_raw": pa.array(n_raw, pa.int64()),
            "first_doc": pa.array(first_doc, pa.int64()),
        }
    )


def q_url_canonical_dups(sf_dir: str):
    """Canonical-URL dup groups — the frontier-hygiene pass that stops a
    crawler re-fetching utm-tagged / param-permuted copies of one page
    (the reference dedups on the RAW string, scheduler.py:52-53, and
    would re-fetch every tagged variant). Planted URLs scramble param
    order and attach tracking params; functions/urlnorm.
    dedup_canonical_batch strips + sorts block-locally (zero exchange),
    then ONE canon-complete exchange's rollup kernel gives per-canonical
    n_urls / distinct raw forms / first doc together (reduceat over the
    (canon, url, doc_id) sort — the previous plan paid four exchanges).
    REAL SQL oracle: list_filter + list_sort over the same split, same
    TRACKING_PARAM_RE."""
    from ..functions.urlnorm import dedup_canonical_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        did = pc.cast(t["doc_id"], pa.string())
        a = pc.cast(pa.array(ids % 50, pa.int64()), pa.string())
        even = pc.binary_join_element_wise(
            "?a=", a, "&utm_source=t", did, ""
        )
        odd = pc.binary_join_element_wise("?utm_campaign=z&b=2&a=", a, "")
        url = pc.binary_join_element_wise(
            "https://s",
            pc.cast(pa.array(ids % 10, pa.int64()), pa.string()),
            ".example/p/",
            pc.cast(pa.array(ids % 25, pa.int64()), pa.string()),
            pc.if_else(pa.array(ids % 2 == 0), even, odd),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "url": url})

    c_ds = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        dedup_canonical_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # ONE canon-complete exchange computes all three aggregates per run
    # (row count, distinct-url boundary count, min doc) — the previous
    # plan paid four exchanges (group agg + distinct + agg + join)
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(c_ds, "canon", order=["url", "doc_id"])
    if not groups:
        return pa.table(
            {
                "canonical_url": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "n_raw": pa.array([], pa.int64()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
    return ray.data.from_arrow_refs(
        [_canon_rollup_block.remote(*parts) for parts in groups]
    )


def _url_canonical_dups_oracle_sql() -> str:
    from ..functions.urlnorm import TRACKING_PARAM_RE

    return (
        f"WITH u AS (SELECT doc_id, {_URL_PLANT_SQL} AS url FROM documents), "
        "p AS (SELECT doc_id, url, regexp_extract(url, '^[^?#]*') AS base, "
        r"  string_split(coalesce(regexp_extract(url, '^[^?#]*\?([^#]*)', 1), ''), '&') "
        "    AS params FROM u), "
        "k AS (SELECT doc_id, url, base, list_sort(list_filter(params, "
        f"  x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))) "
        "  AS kept FROM p), "
        "c AS (SELECT doc_id, url, base || CASE WHEN len(kept) > 0 "
        "  THEN '?' || array_to_string(kept, '&') ELSE '' END AS canon FROM k) "
        "SELECT canon AS canonical_url, count(*) AS n_urls, "
        "  count(DISTINCT url) AS n_raw, min(doc_id) AS first_doc "
        "FROM c GROUP BY canon"
    )


ORACLE_SQL["url_canonical_dups"] = _url_canonical_dups_oracle_sql()


def q_nb_classify(sf_dir: str):
    """Multinomial naive-Bayes language classifier, train on even-id
    docs → classify odd-id docs (ops/text.naive_bayes_classify) — the
    fastText/CCNet classifier slot of a curation pipeline with
    exact-integer quantized-log scoring, so the distributed argmax is
    bit-identical to the SQL oracle's at any layout."""
    from ..ops.text import naive_bayes_classify

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def half(train: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            want = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(0 if train else 1, pa.int64()),
            )
            return t.filter(want)

        return fn

    return naive_bayes_classify(
        docs.map_batches(half(True), batch_format="pyarrow", zero_copy_batch=True),
        docs.map_batches(half(False), batch_format="pyarrow", zero_copy_batch=True),
    )


_NB_LQ = "CAST(floor(log2(CAST({x} AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)"

ORACLE_SQL["nb_classify"] = (
    "WITH tok AS (SELECT doc_id, lang, "
    r"    unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term "
    "  FROM documents), "
    "tr AS (SELECT * FROM tok WHERE doc_id % 2 = 0), "
    "c AS (SELECT lang, term, count(*) AS c FROM tr GROUP BY lang, term), "
    "ls AS (SELECT lang, count(*) AS n_lang FROM tr GROUP BY lang), "
    "dl AS (SELECT lang, count(*) AS d_lang FROM documents "
    "  WHERE doc_id % 2 = 0 GROUP BY lang), "
    "vv AS (SELECT count(DISTINCT term) AS v FROM tr), "
    "dd AS (SELECT count(*) AS d FROM documents WHERE doc_id % 2 = 0), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
    "  WHERE doc_id % 2 = 1 GROUP BY doc_id, term), "
    "nt AS (SELECT doc_id, sum(tf) AS n_tok FROM tf GROUP BY doc_id), "
    "part AS (SELECT tf.doc_id, c.lang, "
    "    SUM(tf.tf * " + _NB_LQ.format(x="c.c + 1") + ") AS pq "
    "  FROM tf JOIN c USING (term) GROUP BY tf.doc_id, c.lang), "
    "score AS (SELECT nt.doc_id, ls.lang, "
    "    " + _NB_LQ.format(x="dl.d_lang") + " - " + _NB_LQ.format(x="dd.d")
    + " - nt.n_tok * " + _NB_LQ.format(x="ls.n_lang + vv.v")
    + " + coalesce(part.pq, 0) AS score_q "
    "  FROM nt CROSS JOIN ls JOIN dl USING (lang) CROSS JOIN vv CROSS JOIN dd "
    "  LEFT JOIN part ON part.doc_id = nt.doc_id AND part.lang = ls.lang) "
    "SELECT doc_id, lang AS pred_label, CAST(score_q AS BIGINT) AS score_q FROM score "
    "QUALIFY row_number() OVER (PARTITION BY doc_id "
    "  ORDER BY score_q DESC, lang) = 1"
)


def q_tokenizer_fertility(sf_dir: str):
    """Tokenizer-fertility report per language: chars/token and
    bytes/token over the whitespace pre-tokenization — the eval a
    multilingual tokenizer build runs to spot languages the vocab
    under-serves (high bytes-per-token = more splits at train time).
    ONE zero-exchange combiner pass (exact integer sums per lang);
    each ratio is a single IEEE division of exact ints, bit-identical
    to the SQL CAST division."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(t["text"], "")
        return pa.table(
            {
                "lang": t["lang"],
                "n_tok": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(txt), pa.int64()),
            }
        )

    per = partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        [
            ("n_docs", "count_all", None),
            ("n_tokens", "sum", "n_tok"),
            ("n_chars", "sum", "n_chars"),
            ("n_bytes", "sum", "n_bytes"),
        ],
    )
    toks = np.maximum(np.asarray(per["n_tokens"], np.int64), 1).astype(np.float64)
    return pa.table(
        {
            "lang": per["lang"],
            "n_docs": per["n_docs"],
            "n_tokens": per["n_tokens"],
            "n_chars": per["n_chars"],
            "n_bytes": per["n_bytes"],
            "chars_per_token": pa.array(
                np.asarray(per["n_chars"], np.int64).astype(np.float64) / toks,
                pa.float64(),
            ),
            "bytes_per_token": pa.array(
                np.asarray(per["n_bytes"], np.int64).astype(np.float64) / toks,
                pa.float64(),
            ),
        }
    )


ORACLE_SQL["tokenizer_fertility"] = (
    r"WITH d AS (SELECT lang, "
    r"  CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT) AS n_tok, "
    "  CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars, "
    "  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes "
    "  FROM documents) "
    "SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
    "  CAST(sum(n_chars) AS BIGINT) AS n_chars, "
    "  CAST(sum(n_bytes) AS BIGINT) AS n_bytes, "
    "  CAST(sum(n_chars) AS DOUBLE) / "
    "    CAST(greatest(sum(n_tok), 1) AS DOUBLE) AS chars_per_token, "
    "  CAST(sum(n_bytes) AS DOUBLE) / "
    "    CAST(greatest(sum(n_tok), 1) AS DOUBLE) AS bytes_per_token "
    "FROM d GROUP BY lang"
)


def q_dsir_weights(sf_dir: str):
    """DSIR data-selection importance weights (ops/text.dsir_importance):
    target domain = lang='en' docs, raw pool = the whole corpus; every
    doc scored by the quantized-integer unigram log-ratio
    log2 p_target − log2 p_raw. Resampling by these weights is the
    standard pretraining-corpus domain-shift step (Xie et al. 2023)."""
    from ..ops.text import dsir_importance

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "is_target": pc.equal(pc.coalesce(t["lang"], ""), "en"),
            }
        )

    return dsir_importance(
        docs.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    )


ORACLE_SQL["dsir_weights"] = (
    "WITH tok AS (SELECT doc_id, lang, "
    r"    unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term "
    "  FROM documents), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term), "
    "tt AS (SELECT term, count(*) AS cr, "
    "    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct "
    "  FROM tok GROUP BY term), "
    "s AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM tt), "
    "j AS (SELECT tf.doc_id, SUM(tf.tf) AS n_tokens, "
    "    SUM(tf.tf * (" + _NB_LQ.format(x="tt.ct + 1") + " - "
    + _NB_LQ.format(x="tt.cr + 1") + ")) AS sv "
    "  FROM tf JOIN tt USING (term) GROUP BY tf.doc_id) "
    "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
    "CAST(sv + n_tokens * ("
    + _NB_LQ.format(x="nr + v") + " - " + _NB_LQ.format(x="nt + v")
    + ") AS BIGINT) AS logratio_q FROM j CROSS JOIN s"
)


ES_SAMPLE_K = 5


def q_weighted_type_sample(sf_dir: str):
    """Weighted sample WITHOUT replacement, k per group — the
    'pick K docs per stratum proportional to quality' selection
    (Efraimidis–Spirakis keys, ops/sampling.es_weighted_keys): rank =
    log2(u)/w desc with a content-stable md5 uniform, so the sample is
    exact-weighted, rerun-stable, and parallelism-proof. Weight =
    value-cents + 1. One hash-derive map + the group_top_k
    key-complete exchange; the oracle recomputes the identical key
    (bit-exact incl. the log2 float) and ranks in SQL."""
    from ..ops.agg import group_top_k
    from ..ops.sampling import es_weighted_keys

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        # floor(x+0.5) = DuckDB round() (half-away-from-zero) for the
        # non-negative cents here; np.rint is half-to-even and diverges
        # on exact .5 boundaries (value=0.125 -> 13 vs 14). Negative
        # values would round half-UP here (floor(-12.5+0.5) = -12 vs
        # DuckDB -13) and violate the es w >= 1 contract — fail loudly
        # if the fixture ever drifts.
        v = np.asarray(t["value"], dtype=np.float64)
        if v.size and v.min() < 0:
            raise ValueError(
                "weighted_type_sample: negative event values break the "
                "half-away-from-zero rounding match and the ES w>=1 "
                "contract"
            )
        w = np.floor(v * 100 + 0.5) + 1.0
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "es_key": pa.array(es_weighted_keys(t["event_id"], w), pa.float64()),
            }
        )

    return group_top_k(
        ev.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        ["es_key", "event_id"],
        [True, False],
        ES_SAMPLE_K,
    )


def _weighted_type_sample_oracle_sql() -> str:
    from ..ops.sampling import es_key_sql

    key = es_key_sql("event_id", "CAST(round(value * 100) AS BIGINT) + 1")
    return (
        f"WITH k AS (SELECT event_type, event_id, {key} AS es_key FROM events) "
        "SELECT event_type, event_id, es_key, "
        "  CAST(row_number() OVER (PARTITION BY event_type "
        "    ORDER BY es_key DESC, event_id) AS BIGINT) AS rn "
        f"FROM k QUALIFY rn <= {ES_SAMPLE_K}"
    )


ORACLE_SQL["weighted_type_sample"] = _weighted_type_sample_oracle_sql()


SAMPLED_Q_FRACTION = 0.25


def q_sampled_quantiles(sf_dir: str):
    """Sketch-by-sampling quantiles: exact per-group quantiles of a
    content-stable 25% hash sample — order-insensitive and
    parallelism-proof where mergeable quantile sketches (KLL/t-digest)
    are merge-order-sensitive, so the SQL oracle can share the exact
    subset via the same md5 threshold. The scale path when the full
    sort exchange of group_quantiles is too wide."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    sampled = sp.hash_sample(ev, "event_id", fraction=SAMPLED_Q_FRACTION)
    return group_quantiles(sampled, "event_type", "value", (25, 50, 75))


MIXTURE_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.1, "fr": 0.1, "es": 0.1}
MIXTURE_BUDGET = 300


def q_mixture_sample(sf_dir: str):
    """Target-mixture corpus assembly: rebalance languages to a recipe
    (50/20/10/10/10) within a ~300-row budget — one combiner counting
    pass, driver-side fractions (ops/sampling.mixture_fractions), then
    the content-stable stratified filter streams block-local."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return sp.mixture_sample(ds, "doc_id", "lang", MIXTURE_WEIGHTS, MIXTURE_BUDGET)


def _benchmark_needles(sf_dir: str) -> list[str]:
    """Deterministic 8-gram 'benchmark' needles: the opening 8 words of
    every 50th document — tiny by construction (real decontamination
    needle sets are small external benchmark files)."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    mask = (np.asarray(t["doc_id"]) % 50) == 0
    return [
        " ".join((t["text"][int(i)].as_py() or "").split(" ")[:8])
        for i in np.flatnonzero(mask)
    ]


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag docs containing any benchmark
    8-gram (broadcast needle scan; shingle-hash semi-join at needle
    scale — see ops/text.flag_contaminated_batch)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.flag_contaminated(ds, _benchmark_needles(sf_dir))


def q_pii_redact(sf_dir: str):
    """PII redaction: plant deterministic e-mail/phone/IP literals per
    doc, then strip them with the ordered RE2 pass (ops/text.redact_pii).
    Planting happens identically in the oracle SQL so both sides see the
    same input."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        dmod = pc.cast(pa.array(np.asarray(t["doc_id"]) % 255), pa.string())
        planted = pc.binary_join_element_wise(
            pc.coalesce(t["text"], ""),
            " reach user", did,
            "@mail.example.com tel 555-0142 ip 10.0.0.", dmod,
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": planted})

    return tx.redact_pii(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


LETTERBOX_N = 120


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining (the pair-quality upgrade every contrastive
    run applies): among each anchor's sampled negatives, keep the one
    with the highest exact integer-quantized similarity — the sampled
    pool from ops/similarity.contrastive_negatives ranked per anchor by
    ops/agg.group_top_k on the key-complete exchange."""
    from ..ops.agg import group_top_k
    from ..ops.similarity import contrastive_negatives

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = contrastive_negatives(
        ds, n_total=ds.count(), k_neg=CONTRAST_K, q_scale=CONTRAST_Q
    )
    top = group_top_k(pairs, "vec_id", ["dot_q", "neg_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: t.select(["vec_id", "slot", "neg_id", "dot_q"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_value_quantiles_hist(sf_dir: str):
    """Exact per-type value quantiles on the HISTOGRAM shape: count
    combiner per (type, cents) → weighted boundary picks
    (ops/agg.weighted_group_quantiles) — two narrow exchanges, the raw
    rows are never sorted (the 100 TB path for bounded value domains).
    Same quantile_disc convention as value_quantiles; REAL SQL oracle."""
    from ..ops.agg import sorted_group_agg, weighted_group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        g = (
            pa.table({"event_type": t["event_type"],
                      "cents": pa.array(cents, pa.int64())})
            .group_by(["event_type", "cents"])
            .aggregate([("cents", "count")])
        )
        return pa.table(
            {"event_type": g["event_type"], "cents": g["cents"],
             "n": pc.cast(g["cents_count"], pa.int64())}
        )

    hist = sorted_group_agg(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "cents"],
        [("n", "sum", "n")],
    )
    return weighted_group_quantiles(
        hist, "event_type", "cents", "n", percents=(25, 50, 75),
        out_col="value_cents",
    )


def q_weighted_median(sf_dir: str):
    """Quantity-weighted median extended price per return flag — the
    exact distributed weighted median (ops/agg.weighted_group_median:
    sort exchange + per-block weight-prefix boundary pick; no group
    materializes in one task). REAL SQL window-cumsum oracle."""
    from ..ops.agg import weighted_group_median

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            np.asarray(t["l_extendedprice"], dtype=np.float64) * 100
        ).astype(np.int64)
        qty = np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "price_c": pa.array(price_c, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
            }
        )

    return weighted_group_median(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "l_returnflag",
        "price_c",
        "qty",
        out_col="wmedian_cents",
    )


def q_contrastive_negatives(sf_dir: str):
    """Contrastive negative sampling + exact integer-quantized scoring
    over the embeddings table (ops/similarity.contrastive_negatives:
    content-stable LCG negatives, one neg_id-colocating join, int dot).
    REAL SQL oracle: same integer formula, unnest-zip dot."""
    from ..ops.similarity import contrastive_negatives

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return contrastive_negatives(
        ds, n_total=ds.count(), k_neg=CONTRAST_K, q_scale=CONTRAST_Q
    )


