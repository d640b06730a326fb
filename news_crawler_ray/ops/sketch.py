"""Count-min sketch term-frequency estimation (Cormode & Muthukrishnan
2005) — the bounded-memory heavy-hitter sketch for streams too wide to
count exactly.

Scale shape: each block contributes a d×w integer matrix of partial
counts (a few KB, independent of block row count); partials are plain
SUMS, so merging is exact in ANY order — the zero-exchange combiner
pattern (ops/agg.partial_group_agg over ≤ d·w cell rows) rather than a
vocabulary-wide shuffle. The engine's exact `top_terms` pays one sort
exchange over the full vocabulary; the sketch replaces that with a
constant-size exchange at the cost of one-sided overestimation
(est ≥ true, with ε·N slack at probability 1−δ for w = e/ε, d = ln 1/δ).

Bucket hashes derive from md5 hex windows (depth i reads hex digits
[i·7, i·7+7)) so DuckDB reproduces the EXACT sketch cell-for-cell —
the same oracle-sharing convention as the Efraimidis–Spirakis keys
(ops/sampling.es_key_sql). The md5 loop runs once per DISTINCT term
per block (the vocabulary, not the token stream), same trade as the
other md5 key paths.

Reference parity: none (the reference counts nothing at scale); this
is SURVEY §2.5/A10 extended to the sketch a 100 TB stream needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CM_DEPTH = 4
CM_WIDTH = 512


def cm_bucket_sql(term_expr: str, depth_expr: str, w: int = CM_WIDTH) -> str:
    """DuckDB expression for the depth-d bucket of a term — identical
    derivation to :func:`_cm_buckets`, term for term."""
    return (
        f"CAST('0x' || substr(md5({term_expr}), 1 + {depth_expr} * 7, 7) "
        f"AS BIGINT) % {w}"
    )


def _cm_buckets(terms: list[str], d: int, w: int) -> np.ndarray:
    """(len(terms), d) int64 bucket matrix from md5 hex windows."""
    out = np.empty((len(terms), d), dtype=np.int64)
    for i, t in enumerate(terms):
        hx = hashlib.md5(t.encode()).hexdigest()
        for j in range(d):
            out[i, j] = int(hx[j * 7 : j * 7 + 7], 16) % w
    return out


def count_min_cells(
    ds,
    text_col: str = "text",
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
):
    """Build the sketch: Dataset → (depth, bucket, c) nonzero cells.

    Per block: tokenize (\\S+), count DISTINCT terms vectorized, hash
    the block vocabulary, scatter-add into a local d×w matrix, emit its
    nonzero cells; a zero-exchange combiner sums cells across blocks
    (≤ d·w rows ever aggregate — constant, not vocabulary-sized)."""
    from .agg import partial_group_agg

    def cells(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "depth": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t[text_col], ""), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return empty
        vocab = pa.table({"term": flat}).group_by("term").aggregate(
            [("term", "count")]
        )
        terms = vocab["term"].to_pylist()
        counts = np.asarray(vocab["term_count"], dtype=np.int64)
        buckets = _cm_buckets(terms, d, w)
        m = np.zeros((d, w), dtype=np.int64)
        for j in range(d):
            np.add.at(m[j], buckets[:, j], counts)
        dd, bb = np.nonzero(m)
        return pa.table(
            {
                "depth": pa.array(dd.astype(np.int64), pa.int64()),
                "bucket": pa.array(bb.astype(np.int64), pa.int64()),
                "c": pa.array(m[dd, bb], pa.int64()),
            }
        )

    return partial_group_agg(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        ["depth", "bucket"],
        [("c", "sum", "c")],
    )


def count_min_estimates(
    cells_tbl: pa.Table,
    probe_terms: list[str],
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
) -> pa.Table:
    """Point queries against a materialized sketch: est(term) =
    min over depths of its cell — one-sided (est ≥ true count)."""
    m = np.zeros((d, w), dtype=np.int64)
    dd = np.asarray(cells_tbl["depth"], dtype=np.int64)
    bb = np.asarray(cells_tbl["bucket"], dtype=np.int64)
    m[dd, bb] = np.asarray(cells_tbl["c"], dtype=np.int64)
    buckets = _cm_buckets(probe_terms, d, w)
    est = m[np.arange(d)[None, :], buckets].min(axis=1)
    return pa.table(
        {
            "term": pa.array(probe_terms, pa.string()),
            "est": pa.array(est, pa.int64()),
        }
    )
