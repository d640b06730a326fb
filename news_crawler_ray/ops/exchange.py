"""Shared entry for the task-based sorted exchange.

Every sort-exchange op (``sorted_group_agg``, the sort-merge join
family, ``budget_sample``, ``_sorted_pairs``, window kernels, ranking)
starts with ``ds.sort(cols).materialize()``. Ray Data's range-partition
sort keeps ONE output partition per input block, and its scheduling
cost grows superlinearly with block count (measured on this box: 5 000
rows in 500 tiny blocks sort in 6.7 s vs 0.09 s after coalescing to 32
blocks — pure scheduling, no data difference). Kernel fan-outs
(``from_arrow_refs`` of per-key-part tasks) are exactly what produces
such degenerate many-tiny-block layouts, so CHAINS of exchange ops
compound the overhead: each stage inherits the previous stage's
fan-out as its sort partition count.

:func:`sorted_mat` fixes the layout adaptively: materialize the input
(block count and byte size are then free metadata), and ONLY when the
layout is degenerate — more blocks than the cap AND tiny average
blocks — coalesce with a streaming ``repartition`` before sorting.

Scale behavior: at 100 TB the per-block size is large, the gate never
fires, and the only delta vs the raw pattern is that upstream lands in
the object store before the sort instead of streaming into it — one
transient extra copy of (usually narrow) exchange rows, spillable.
Wave-critical stages that feed well-formed layouts and cannot afford
that extra landing pass ``coalesce=False`` and keep the exact old
behavior.
"""

from __future__ import annotations

import os


def _default_cap() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    except Exception:
        cpus = os.cpu_count() or 8
    return max(64, 2 * cpus)


def sorted_mat(
    ds,
    cols,
    descending=None,
    coalesce: bool = True,
    max_blocks: int | None = None,
    tiny_block_bytes: int = 1 << 20,
):
    """``ds.sort(cols).materialize()`` with adaptive input coalescing.

    ``descending`` follows ``Dataset.sort``'s contract (bool or list).
    ``coalesce=False`` is bit-for-bit the raw pattern (wave hot path).
    """
    kwargs = {}
    if descending is not None:
        kwargs["descending"] = descending
    if not coalesce:
        return ds.sort(cols, **kwargs).materialize()
    mat = ds.materialize()
    nb = mat.num_blocks()
    cap = max_blocks or _default_cap()
    if nb > cap:
        size = mat.size_bytes() or 0
        if size < nb * tiny_block_bytes:
            mat = mat.repartition(cap)
    return mat.sort(cols, **kwargs).materialize()
