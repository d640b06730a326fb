"""Frontier dedup: keep the best row per ``url_sha1`` (exact, two-phase).

Semantics anchor: the reference's order-preserving dedup-by-link after a
newest-first sort — first occurrence wins
(/root/reference/src/secbot/fetchers/news.py:152-162). Re-expressed as
data: "best" = highest ``priority``, ties broken by earliest
``discovered_at`` then smallest ``url`` — deterministic under any
parallelism.

Two-phase so the shuffle moves as little as possible (SURVEY.md §7 step
3): a vectorized within-batch combiner first (drops most duplicates
before any data movement), then a hash ``repartition(keys=["url_sha1"])``
co-locates surviving rows of each key and the same vectorized kernel
finishes exactly. The key is a SHA-1 digest — uniformly distributed, so
this shuffle has no skew by construction (hot *hosts* exist; hot *keys*
cannot).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

DEFAULT_ORDER = (
    ("priority", "descending"),
    ("discovered_at", "ascending"),
    ("url", "ascending"),
)


def _run_first_mask(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """True at the first row of each equal-value run (sorted column).

    binary(20) sha1 keys go through the zero-copy matrix compare; any
    other type uses the vectorized Arrow inequality.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    first = np.empty(n, dtype=bool)
    if n == 0:
        return first
    first[0] = True
    if n == 1:
        return first
    if pa.types.is_binary(col.type):
        from ..functions.urlnorm import binary20_matrix

        km = binary20_matrix(col)
        first[1:] = (km[1:] != km[:-1]).any(axis=1)
    else:
        first[1:] = pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    return first


def keep_best_batch(batch: pa.Table, order=DEFAULT_ORDER, key: str = "url_sha1") -> pa.Table:
    """Vectorized: sort by (key, *order), keep first row of each key run."""
    if batch.num_rows <= 1:
        return batch
    sort_keys = [(key, "ascending")] + [
        (c, d) for c, d in order if c != key and c in batch.column_names
    ]
    idx = pc.sort_indices(batch, sort_keys=sort_keys)
    sorted_tbl = batch.take(idx)
    return sorted_tbl.filter(pa.array(_run_first_mask(sorted_tbl[key])))


@ray.remote
def _first_last_key(tbl: pa.Table, key: str):
    if tbl.num_rows == 0:
        return (None, None, 0)
    col = tbl[key]
    return (col[0].as_py(), col[-1].as_py(), tbl.num_rows)


@ray.remote
def _keep_first_of_run(tbl: pa.Table, key: str, drop_leading_run: bool) -> pa.Table:
    if tbl.num_rows == 0:
        return tbl
    first = _run_first_mask(tbl[key])
    if drop_leading_run:
        # rows belonging to the leading run continue a run whose true
        # first row lives in an earlier block — drop them all
        first[0] = False
        boundary = np.nonzero(first[1:])[0]
        end = boundary[0] + 1 if boundary.size else len(first)
        first[:end] = False
    return tbl.filter(pa.array(first))


def dedup_frontier_sorted(ds, order=DEFAULT_ORDER, key: str = "url_sha1"):
    """Exact keep-best-per-key via a range-partition SORT instead of a
    hash shuffle: sort by (key, *order) globally, keep the first row of
    each key run, and stitch runs that straddle block boundaries with a
    2-value-per-block metadata pass. Equivalent output to
    :func:`dedup_frontier`; measured to scale better in-sandbox because
    Ray's sort is task-based while hash-shuffle aggregator pools pay a
    per-op actor-startup cost.
    """
    cols = [key] + [c for c, _ in order if c != key]
    desc = [False] + [d == "descending" for c, d in order if c != key]
    mat = ds.sort(cols, descending=desc).materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    metas = ray.get([_first_last_key.remote(r, key) for r in refs])
    drops, prev_last = [], None
    for first, last, nrows in metas:
        drops.append(prev_last is not None and first == prev_last)
        if nrows:
            prev_last = last
    import ray.data as rd

    return rd.from_arrow_refs(
        [_keep_first_of_run.remote(r, key, d) for r, d in zip(refs, drops)]
    )


def dedup_frontier(ds, num_partitions: int = 32, order=DEFAULT_ORDER, key: str = "url_sha1"):
    """Exact global keep-best-per-key over a canonicalized frontier."""
    combined = ds.map_batches(
        lambda b: keep_best_batch(b, order, key),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parts = combined.repartition(num_blocks=num_partitions, keys=[key])
    return parts.map_batches(
        lambda b: keep_best_batch(b, order, key),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # one batch per hash partition: keys stay co-located
    )
