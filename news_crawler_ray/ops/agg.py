"""Partial (combiner-style) aggregation for LOW-cardinality groups.

The generic ``Dataset.groupby`` is a full hash shuffle — the right
shape when the group count is data-scale (e.g. per-user stats). But for
group-BY-constant-small-domain aggregates (TPC-H Q1's ~6 flag/status
cells, per-event-type counts — the reference's per-feed counts,
/root/reference/src/secbot/fetchers/news.py:152-162 tallies) a shuffle
moves every row to compute a handful of cells. The scale-correct plan
(build brief: "pre-aggregate inside map_batches before a groupby") is:

1. one vectorized ``pyarrow.TableGroupBy`` partial per block — the only
   pass over the data, fully parallel, emits O(groups) rows per block;
2. merge the O(blocks × groups) partial rows driver-side with one more
   ``TableGroupBy`` (sum of sums, sum of counts, max of maxes, ...).

Driver memory is bounded by ``max_groups`` — past it this raises
loudly; use ``Dataset.groupby`` for data-scale cardinalities.
"""

from __future__ import annotations

import pyarrow as pa

# merge rule per partial kind: how per-block partials combine
_MERGE = {"sum": "sum", "count_all": "sum", "count": "sum", "max": "max", "min": "min"}


def partial_group_agg(
    ds,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    max_groups: int = 65536,
) -> pa.Table:
    """Aggregate ``ds`` by low-cardinality ``keys`` without a shuffle.

    ``specs`` = [(out_name, kind, col)] with kind in
    {"sum", "count_all", "max", "min"} (col=None for count_all).
    Returns a pyarrow Table sorted by ``keys``.
    """
    aggs = [((c if c is not None else []), k) for _, k, c in specs]
    part_names = [
        (f"{c}_{k}" if c is not None else k) for _, k, c in specs
    ]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_partial(t, keys, specs)
        g = t.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for name, pn in zip([s[0] for s in specs], part_names):
            cols[name] = g[pn]
        return pa.table(cols)

    # partials are tiny (O(groups) rows per block): take_all here is the
    # combiner's merge input, not a dataset materialization
    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not parts:
        return _empty_partial(None, keys, specs)
    tbl = pa.Table.from_pylist(parts)
    if tbl.num_rows > max_groups * 64:
        raise ValueError(
            f"partial_group_agg: {tbl.num_rows} partial rows — group "
            "cardinality is data-scale; use Dataset.groupby instead"
        )
    merge_aggs = [(name, _MERGE[k]) for name, k, _ in specs]
    g = tbl.group_by(keys).aggregate(merge_aggs)
    if g.num_rows > max_groups:
        raise ValueError(
            f"partial_group_agg: {g.num_rows} groups > max_groups="
            f"{max_groups}; use Dataset.groupby instead"
        )
    cols = {k: g[k] for k in keys}
    for name, kind, _ in specs:
        cols[name] = g[f"{name}_{_MERGE[kind]}"]
    out = pa.table(cols)
    return out.sort_by([(k, "ascending") for k in keys])


def _empty_partial(t, keys, specs):
    fields = {}
    for k in keys:
        fields[k] = pa.array([], t.schema.field(k).type if t is not None else pa.string())
    for name, kind, c in specs:
        if kind in ("count", "count_all"):
            fields[name] = pa.array([], pa.int64())
        else:
            fields[name] = pa.array(
                [], t.schema.field(c).type if t is not None else pa.float64()
            )
    return pa.table(fields)
