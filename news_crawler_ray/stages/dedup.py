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

DEFAULT_ORDER = (
    ("priority", "descending"),
    ("discovered_at", "ascending"),
    ("url", "ascending"),
)


def keep_best_batch(batch: pa.Table, order=DEFAULT_ORDER, key: str = "url_sha1") -> pa.Table:
    """Vectorized: sort by (key, *order), keep first row of each key run."""
    if batch.num_rows <= 1:
        return batch
    sort_keys = [(key, "ascending")] + [
        (c, d) for c, d in order if c in batch.column_names
    ]
    idx = pc.sort_indices(batch, sort_keys=sort_keys)
    sorted_tbl = batch.take(idx)
    from ..functions.urlnorm import binary20_matrix

    km = binary20_matrix(sorted_tbl[key])
    first = np.empty(len(km), dtype=bool)
    first[0] = True
    first[1:] = (km[1:] != km[:-1]).any(axis=1)
    return sorted_tbl.filter(pa.array(first))


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
