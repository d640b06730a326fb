"""Global ordering operators: zip-with-index and rank-within-group.

Ray Data has no window/rank primitive, so this is the one place the
engine drops to raw Ray tasks (SURVEY.md §7 "hard parts", stable-index
A8 semantics: SID = BASE + position,
/root/reference/src/secbot/defense/suricata.py:139-195): sort the
dataset, then a metadata pass over the sorted blocks computes per-block
(per-group) starting offsets, and a second per-block task adds the rank
column. Two passes over block refs, no extra shuffle beyond the sort.

Skew note: ``Dataset.sort`` is a range-partition sort — a hot group
(e.g. one host with 10^8 rows) is *split across consecutive blocks* by
Ray's sort rather than funneled into one task, and the offset pass
stitches the ranks back together. That is the engine's hot-host
handling for ranking: no single-task bottleneck, no salting needed
because ranks are computed per block and only counts cross the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _run_boundaries(tbl: pa.Table, group_col: str):
    """Vectorized run boundaries of a sorted group column.

    Returns (run_start_indices incl. 0, run_values) — O(runs) Python,
    O(rows) vectorized compare.
    """
    import pyarrow.compute as pc

    if tbl.num_rows == 0 or group_col not in tbl.column_names:
        # Ray's sort can emit empty blocks with a ZERO-COLUMN schema;
        # treat them as no runs instead of KeyError'ing on the column.
        return np.zeros(0, np.int64), []
    keys = tbl[group_col].combine_chunks()
    n = len(keys)
    if n == 1:
        return np.zeros(1, np.int64), [keys[0].as_py()]
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    values = keys.take(pa.array(starts)).to_pylist()
    return starts, values


@ray.remote
def _block_group_counts(tbl: pa.Table, group_col: str | None):
    """Run-length counts of the (sorted-within-block) group column."""
    if group_col is None:
        return [(None, tbl.num_rows)]
    starts, values = _run_boundaries(tbl, group_col)
    if not len(starts):
        return []
    lengths = np.diff(np.concatenate([starts, [tbl.num_rows]]))
    return list(zip(values, lengths.tolist()))


def _add_rank_impl(tbl: pa.Table, group_col: str | None, offsets: dict, rank_col: str):
    if group_col is None:
        ranks = np.arange(tbl.num_rows, dtype=np.int64) + offsets[None]
    else:
        starts, values = _run_boundaries(tbl, group_col)
        ends = np.concatenate([starts[1:], [tbl.num_rows]])
        ranks = np.arange(tbl.num_rows, dtype=np.int64)
        for s, e, v in zip(starts, ends, values):  # O(runs), not O(rows)
            ranks[s:e] += offsets.get(v, 0) - s
    return tbl.append_column(rank_col, pa.array(ranks, pa.int64()))


@ray.remote
def _add_rank(tbl: pa.Table, group_col: str | None, offsets: dict, rank_col: str):
    return _add_rank_impl(tbl, group_col, offsets, rank_col)


@ray.remote
def _add_rank_split(tbl: pa.Table, group_col, offsets: dict, rank_col: str, k: int):
    """Rank one sorted block, then return it as ``k`` zero-copy slices.

    Downstream task granularity = block granularity, but SORT cost grows
    with exchange-object count (O(input_blocks × partitions) tiny
    objects) — so sorts run coarse and blocks are split HERE, after the
    last exchange, for fine-grained CPU-bound stages (the fused
    fetch+decode). Splitting at rank-add time costs no extra task
    launches: the same remote call just has ``num_returns=k``.
    """
    out = _add_rank_impl(tbl, group_col, offsets, rank_col)
    step = -(-out.num_rows // k) if out.num_rows else 1
    parts = tuple(out.slice(i * step, step) for i in range(k))
    return parts if k > 1 else parts[0]


def with_group_rank(
    ds: "ray.data.Dataset",
    group_col: str | None,
    order: list[str],
    descending: list[bool],
    rank_col: str = "rank",
    split_output: int = 1,
) -> "ray.data.Dataset":
    """Sort by (group, *order) and add a 0-based rank within each group.

    ``group_col=None`` gives a global zip-with-index over the sort order.
    ``split_output=k`` returns each ranked block as ``k`` zero-copy
    slices (see :func:`_add_rank_split`): the sort runs coarse (exchange
    cost grows with block count × partitions) while downstream CPU-bound
    stages get fine-grained tasks.
    """
    if group_col is not None:
        sort_cols = [group_col] + list(order)
        sort_desc = [False] + list(descending)
    else:
        sort_cols, sort_desc = list(order), list(descending)
    from ..ops.exchange import sorted_mat

    mat = sorted_mat(ds, sort_cols, descending=sort_desc)
    if mat.count() == 0:
        # empty inputs can surface as schema-less blocks; emit an empty
        # table with the rank column appended to the known schema
        schema = mat.schema()
        base = schema.base_schema if hasattr(schema, "base_schema") else None
        if isinstance(base, pa.Schema):
            empty = pa.table(
                {f.name: pa.array([], f.type) for f in base}
            ).append_column(rank_col, pa.array([], pa.int64()))
            return ray.data.from_arrow(empty)
        return mat
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    metas = ray.get([_block_group_counts.remote(r, group_col) for r in refs])
    running: dict = {}
    per_block_offsets = []
    for counts in metas:
        off = {g: running.get(g, 0) for g, _ in counts}
        for g, n in counts:
            running[g] = running.get(g, 0) + n
        per_block_offsets.append(off)
    if split_output > 1:
        new_refs = []
        for r, off in zip(refs, per_block_offsets):
            new_refs.extend(
                _add_rank_split.options(num_returns=split_output).remote(
                    r, group_col, off, rank_col, split_output
                )
            )
    else:
        new_refs = [
            _add_rank.remote(r, group_col, off, rank_col)
            for r, off in zip(refs, per_block_offsets)
        ]
    return ray.data.from_arrow_refs(new_refs)


def zip_with_index(ds, order: list[str], descending: list[bool], rank_col: str = "rank"):
    return with_group_rank(ds, None, order, descending, rank_col=rank_col)


def partitioned_group_rank(
    ds: "ray.data.Dataset",
    group_col: str,
    order: list[str],
    descending: list[bool],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Rank within group WITHOUT a global sort: hash-partition on the
    group key co-locates every group in exactly one partition, then one
    vectorized pass per partition sorts and ranks its groups locally.

    Same result as :func:`with_group_rank` (ranks are per-group, so
    cross-group order is irrelevant) at a fraction of the cost — one
    key shuffle instead of a range-partition sort + two metadata passes.
    Skew note: a hot group lands in one partition; for politeness
    ranking that is bounded by the per-host queue budget, and the rank
    kernel is O(n log n) vectorized — salt the key upstream if a single
    group outgrows a block.
    """
    if num_partitions is None:
        # match the session's shuffle sizing (context.configure sets it
        # to ~2 partitions per CPU) — a fixed 32 floods small sessions
        # with aggregator actors
        from ray.data import DataContext

        num_partitions = DataContext.get_current().default_hash_shuffle_parallelism
    parts = ds.repartition(num_blocks=num_partitions, keys=[group_col])

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(rank_col, pa.array([], pa.int64()))
        sort_keys = [(group_col, "ascending")] + [
            (c, "descending" if d else "ascending") for c, d in zip(order, descending)
        ]
        import pyarrow.compute as pc

        idx = pc.sort_indices(t, sort_keys=sort_keys)
        s = t.take(idx)
        # run-boundary rank: position within each group's contiguous run
        keys = s[group_col].combine_chunks()
        n = len(keys)
        if n == 1:
            ranks = np.zeros(1, dtype=np.int64)
        else:
            neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            boundaries = np.concatenate([[0], np.nonzero(neq)[0] + 1])
            run_ids = np.concatenate([[0], np.cumsum(neq)])
            ranks = np.arange(n, dtype=np.int64) - boundaries[run_ids]
        return s.append_column(rank_col, pa.array(ranks, pa.int64()))

    return parts.map_batches(
        rank_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


@ray.remote(num_returns=2)
def _split_leading_run(tbl: pa.Table, key: str):
    """(leading_run, rest) of a key-sorted block — zero-copy slices."""
    import pyarrow.compute as pc

    col = tbl[key].combine_chunks()
    n = len(col)
    neq = pc.not_equal(col, col[0]).to_numpy(zero_copy_only=False)
    hits = np.flatnonzero(neq)
    end = int(hits[0]) if hits.size else n
    return tbl.slice(0, end), tbl.slice(end)


def _donation_plan(metas: list[tuple]) -> tuple[list[bool], list[bool], dict]:
    """Boundary-run ownership over key-sorted blocks.

    ``metas[i] = (first_key, last_key, num_rows)``. A key RUN belongs to
    the block where it starts; blocks whose leading run continues the
    previous block's last key donate that run (or their whole content,
    if single-key) to the owner. Returns ``(strip_leading,
    whole_donated, donations)`` with ``donations[owner] = [donor
    indices, in order]``. O(blocks) driver work — no row data touches
    the driver.
    """
    strip = [False] * len(metas)
    whole = [False] * len(metas)
    donations: dict[int, list[int]] = {}
    chain_owner: int | None = None
    prev_last = None
    for i, (first, last, n) in enumerate(metas):
        if not n:
            continue
        if prev_last is not None and first == prev_last:
            donations.setdefault(chain_owner, []).append(i)
            if first == last:
                whole[i] = True  # entire block continues the run
                continue
            strip[i] = True
        # this block's LAST key starts a run here
        chain_owner = i
        prev_last = last
    return strip, whole, donations


def key_complete_parts(
    ds: "ray.data.Dataset",
    key: str,
    order: list[str] | tuple = (),
    descending: list[bool] | tuple = (),
    coalesce: bool = True,
) -> list[list]:
    """Task-based key co-location WITHOUT a hash shuffle: sort by
    ``(key, *order)``, then donate boundary-straddling key runs so every
    key's rows land in exactly one group. Returns a list of part-ref
    lists — concatenating one entry's parts (in order) yields one
    key-complete, still-sorted table; feed each to a kernel task.

    This is the generic form of the wave scheduler's exchange
    (stages/politeness.schedule_sorted_fused) — one range-partition sort
    (task-based; hash-shuffle aggregator pools pay a measured ~7 s fixed
    startup per op in-sandbox) plus a 3-values-per-block metadata pass.
    Skew: a key spanning many blocks is assembled into its owner task,
    the same co-location a hash shuffle would force.
    """
    from ..ops.exchange import sorted_mat
    from .dedup import _first_last_key

    cols = [key] + list(order)
    desc = [False] + list(descending or [False] * len(order))
    # coalesce=True heals degenerate tiny-block layouts from upstream
    # kernel fan-outs before the sort (ops/exchange.sorted_mat); the
    # wave scheduler passes False — its frontier input is well-formed
    # and the extra input landing is pure cost on the hot path
    mat = sorted_mat(ds, cols, descending=desc, coalesce=coalesce)
    refs = mat.to_arrow_refs()
    if not refs:
        return []
    metas = ray.get([_first_last_key.remote(r, key) for r in refs])
    if all(n == 0 for _, _, n in metas):
        return []
    strip, whole, donations = _donation_plan(metas)
    lead: dict[int, object] = {}
    rest: dict[int, object] = {}
    for i, ref in enumerate(refs):
        if strip[i]:
            lead[i], rest[i] = _split_leading_run.remote(ref, key)
    groups: list[list] = []
    for i, (first, last, n) in enumerate(metas):
        if not n or whole[i]:
            continue  # empty, or fully donated to its owner
        parts = [rest[i] if strip[i] else refs[i]]
        for j in donations.get(i, ()):
            parts.append(refs[j] if whole[j] else lead[j])
        groups.append(parts)
    return groups


def assign_stable_ids(
    ds,
    value_col: str,
    base: int,
    id_col: str = "sid",
):
    """Distinct values -> sort asc -> id = base + position (A8 SID rule)."""
    from ..ops.agg import sorted_distinct

    distinct = sorted_distinct(ds, [value_col])
    ranked = zip_with_index(distinct, [value_col], [False], rank_col="_pos")
    return ranked.map_batches(
        lambda t: t.append_column(
            id_col, pa.array(np.asarray(t["_pos"]) + base, pa.int64())
        ).drop_columns(["_pos"]),
        batch_format="pyarrow",
    )
