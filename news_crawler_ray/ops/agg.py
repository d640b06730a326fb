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
loudly; use :func:`sorted_group_agg` (below) or ``Dataset.groupby``
for data-scale cardinalities.

For DATA-SCALE group counts (per-user stats), :func:`sorted_group_agg`
replaces the hash shuffle with a range-partition SORT exchange: Ray's
sort is task-based, while ``groupby``'s hash-shuffle aggregator pool
pays a measured ~7 s fixed actor-startup per op in-sandbox and
anti-scales with CPU count (BASELINE.md round-2 findings). After the
sort, every key is co-located in one block except the O(num_blocks)
keys straddling block boundaries, which are merged driver-side.
"""

from __future__ import annotations

import polars as pl  # module-level: lazy in-UDF imports race in fused
# parallel map threads (see ops/text.py note)
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .exchange import sorted_mat

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


# --------------------------------------------------------------------------
# sorted_group_agg: data-scale-cardinality group-aggregate, no hash shuffle
# --------------------------------------------------------------------------


def sorted_distinct(ds, keys: list[str]):
    """DATA-SCALE-safe distinct over ``keys``: sorted_group_agg with no
    aggregates (per-block exact distinct after the range-partition sort,
    boundary-straddling keys deduped driver-side). Use
    :func:`partial_group_agg` with empty specs for LOW-cardinality keys
    (no exchange at all)."""
    return sorted_group_agg(ds, keys, [])


def _spec_aggs(specs):
    aggs = [((c if c is not None else []), k) for _, k, c in specs]
    part_names = [(f"{c}_{k}" if c is not None else k) for _, k, c in specs]
    return aggs, part_names


@ray.remote
def _block_agg(tbl: pa.Table, keys, aggs, out_names, part_names) -> pa.Table:
    """Exact group-agg of one sorted block. For keys fully contained in
    the block this is the final answer; boundary-straddling keys yield
    PARTIAL values that the driver merges (every kind in _MERGE is
    mergeable: sum of sums, max of maxes, ...)."""
    if tbl.num_rows == 0:
        # sort exchanges can emit zero-row blocks with an EMPTY schema;
        # group_by would fail on the missing key column
        return pa.table({})
    g = tbl.group_by(keys, use_threads=False).aggregate(aggs)
    cols = {k: g[k] for k in keys}
    for on, pn in zip(out_names, part_names):
        cols[on] = g[pn]
    return pa.table(cols)


@ray.remote
def _first_last_tuple(tbl: pa.Table, keys):
    if tbl.num_rows == 0:
        return (None, None, 0)
    first = tuple(tbl[k][0].as_py() for k in keys)
    last = tuple(tbl[k][-1].as_py() for k in keys)
    return (first, last, tbl.num_rows)


def _tuple_mask(tbl: pa.Table, keys, kt):
    """Boolean mask of rows equal to ONE key tuple (vectorized)."""
    import numpy as np
    import pyarrow.compute as pc

    m = None
    for k, v in zip(keys, kt):
        if v is None:
            e = pc.is_null(tbl[k]).to_numpy(zero_copy_only=False)
        else:
            e = pc.fill_null(
                pc.equal(tbl[k], pa.scalar(v, tbl.schema.field(k).type)), False
            ).to_numpy(zero_copy_only=False)
        m = e if m is None else (m & e)
    return m if m is not None else np.zeros(tbl.num_rows, dtype=bool)


def _key_mask(tbl: pa.Table, keys, key_tuples):
    """Boolean mask of rows whose key tuple is in ``key_tuples``.

    The blocks here come from a range-partition sort, so the only key
    tuples of ``key_tuples`` (= boundary-straddling keys) that can
    appear in a block are the block's FIRST and LAST runs — every other
    key is fully interior to one block. That caps the work at ≤2
    vectorized compares per block, independent of how many blocks (and
    hence straddle keys) the dataset has."""
    import numpy as np

    if tbl.num_rows == 0 or not key_tuples:
        return np.zeros(tbl.num_rows, dtype=bool)
    wanted = set(key_tuples) if not isinstance(key_tuples, set) else key_tuples
    first = tuple(tbl[k][0].as_py() for k in keys)
    last = tuple(tbl[k][-1].as_py() for k in keys)
    mask = np.zeros(tbl.num_rows, dtype=bool)
    for kt in {first, last}:
        if kt in wanted:
            mask |= _tuple_mask(tbl, keys, kt)
    return mask


@ray.remote(num_returns=2)
def _split_straddle(tbl: pa.Table, keys, key_tuples):
    mask = _key_mask(tbl, keys, key_tuples)
    if not mask.any():
        return tbl, tbl.slice(0, 0)
    keep = pa.array(~mask)
    return tbl.filter(keep), tbl.filter(pa.array(mask))


def sorted_group_agg(ds, keys: list[str], specs: list[tuple[str, str, str | None]]):
    """Group-aggregate with DATA-SCALE key cardinality via a
    range-partition sort instead of a hash shuffle.

    Plan: ``ds.sort(keys)`` co-locates each key in one block (except the
    O(num_blocks) keys straddling block boundaries) → one exact
    vectorized ``pa.Table.group_by`` per block (task-parallel) → the
    straddling keys' partial rows (≤2 per block) are merged driver-side
    and emitted as one extra small block. Exchange cost equals the hash
    shuffle's (both move every row once); fixed cost is task-based
    sort setup instead of the aggregator actor-pool startup that
    dominates small-to-medium datasets and anti-scales with CPU count
    (BASELINE.md round-2 measurements: ~0.7 s vs ~7 s per op).

    ``specs`` = [(out_name, kind, col)], kind ∈ {sum, count, count_all,
    min, max} (col=None for count_all). Returns a Dataset with columns
    ``keys + [out_name, ...]``. Output block order is NOT globally
    key-sorted (the repaired boundary block is appended last).
    """
    import ray.data as rd

    aggs, part_names = _spec_aggs(specs)
    out_names = [s[0] for s in specs]
    mat = sorted_mat(ds, keys)
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    partials = [_block_agg.remote(r, keys, aggs, out_names, part_names) for r in refs]
    metas = ray.get([_first_last_tuple.remote(p, keys) for p in partials])
    straddle, prev_last = set(), None
    for first, last, n in metas:
        if n == 0:
            continue
        if prev_last is not None and first == prev_last:
            straddle.add(first)
        prev_last = last
    live = [p for p, (_, _, n) in zip(partials, metas) if n > 0]
    if not live:
        return mat.limit(0)
    if not straddle:
        return rd.from_arrow_refs(live)
    out_refs, boundary_refs = [], []
    skeys = sorted(straddle, key=repr)
    for p in live:
        kept, st = _split_straddle.remote(p, keys, skeys)
        out_refs.append(kept)
        boundary_refs.append(st)
    boundary = pa.concat_tables(ray.get(boundary_refs))
    if boundary.num_rows:
        merge_aggs = [(name, _MERGE[k]) for name, k, _ in specs]
        g = boundary.group_by(keys, use_threads=False).aggregate(merge_aggs)
        cols = {k: g[k] for k in keys}
        for name, kind, _ in specs:
            cols[name] = g[f"{name}_{_MERGE[kind]}"]
        out_refs.append(ray.put(pa.table(cols)))
    return rd.from_arrow_refs(out_refs)


# --------------------------------------------------------------------------
# group_quantiles: exact distributed per-group discrete quantiles
# --------------------------------------------------------------------------


@ray.remote
def _quantile_pick_block(
    tbl: pa.Table, key: str, value_col: str, offsets: dict, targets: dict
) -> pa.Table:
    """Emit the (key, pct, value) rows of ONE sorted block whose
    within-key GLOBAL rank is a quantile target. O(runs × percents)
    Python over run boundaries; values are taken by direct index."""
    from ..stages.index import _run_boundaries

    if key not in tbl.column_names:  # zero-column empty sort block
        return pa.table(
            {key: pa.array([], pa.string()), "pct": pa.array([], pa.int64()),
             value_col: pa.array([], pa.float64())}
        )
    out_k, out_p, out_i = [], [], []
    if tbl.num_rows:
        starts, values = _run_boundaries(tbl, key)
        ends = list(starts[1:]) + [tbl.num_rows]
        for s, e, g in zip(starts, ends, values):
            off = offsets.get(g, 0)
            for rank, pct in targets.get(g, ()):
                j = rank - off
                if 0 <= j < e - s:
                    out_k.append(g)
                    out_p.append(pct)
                    out_i.append(int(s) + int(j))
    vals = tbl[value_col].take(pa.array(out_i, pa.int64()))
    kt = tbl.schema.field(key).type
    return pa.table(
        {
            key: pa.array(out_k, kt),
            "pct": pa.array(out_p, pa.int64()),
            value_col: vals,
        }
    )


def group_quantiles(
    ds, key: str, value_col: str, percents: tuple[int, ...] = (25, 50, 75)
):
    """EXACT per-group discrete quantiles without materializing groups:
    one range-partition sort by ``(key, value)``, a per-block
    (key, count) metadata pass (O(runs) per block — driver traffic is
    tiny for low/moderate key cardinality), then each block emits only
    the rows whose within-key global rank is a target. No group is ever
    held in one task — a single group spanning many blocks (the 100 TB
    skew case) still works because rank selection is offset arithmetic.

    Rank convention matches DuckDB ``quantile_disc``: element at
    ``max(0, ceil(pct·n/100) − 1)`` of the ascending values — computed
    in INTEGER arithmetic here, so keep ``percents`` to values exact in
    float too (25/50/75) when hash-comparing against a SQL oracle.
    Returns a Dataset with columns ``[key, pct, value_col]``.
    """
    import ray.data as rd

    from ..stages.index import _block_group_counts

    mat = sorted_mat(ds, [key, value_col])
    refs = mat.to_arrow_refs()
    empty = pa.table(
        {key: pa.array([], pa.string()), "pct": pa.array([], pa.int64()),
         value_col: pa.array([], pa.float64())}
    )
    if not refs:
        return rd.from_arrow(empty)
    metas = ray.get([_block_group_counts.remote(r, key) for r in refs])
    running: dict = {}
    per_block_offsets = []
    for counts in metas:
        off = {g: running.get(g, 0) for g, _ in counts}
        for g, n in counts:
            running[g] = running.get(g, 0) + n
        per_block_offsets.append(off)
    targets: dict = {}
    for g, n in running.items():
        if n == 0:
            continue
        targets[g] = tuple(
            (max(0, -(-p * n // 100) - 1), p) for p in percents
        )
    picks = [
        _quantile_pick_block.remote(r, key, value_col, off, targets)
        for r, off, counts in zip(refs, per_block_offsets, metas)
        if counts  # skip empty (possibly zero-column-schema) sort blocks
    ]
    if not picks:
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(picks)


@ray.remote
def _block_group_weights(tbl: pa.Table, key: str, weight_col: str):
    """Per-(key-run) int64 weight sums of a sorted-within-block table —
    the weighted generalization of stages/index._block_group_counts."""
    import numpy as np

    from ..stages.index import _run_boundaries

    if tbl.num_rows == 0:
        return []
    starts, values = _run_boundaries(tbl, key)
    if not len(starts):
        return []
    w = np.asarray(tbl[weight_col], dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(w)])
    ends = np.concatenate([starts[1:], [tbl.num_rows]])
    return [(v, int(csum[e] - csum[s])) for v, s, e in zip(values, starts, ends)]


@ray.remote
def _wmedian_pick_block(
    tbl: pa.Table, key: str, val_col: str, weight_col: str,
    base: dict, totals: dict, out_col: str,
):
    import numpy as np

    from ..stages.index import _run_boundaries

    key_type = tbl.schema.field(key).type
    out_k, out_v = [], []
    if tbl.num_rows:
        starts, values = _run_boundaries(tbl, key)
        ends = np.concatenate([starts[1:], [tbl.num_rows]])
        w = np.asarray(tbl[weight_col], dtype=np.int64)
        vals = np.asarray(tbl[val_col], dtype=np.int64)
        for v, s, e in zip(values, starts, ends):
            cw = np.cumsum(w[s:e]) + base.get(v, 0)
            tw = totals[v]
            m = (2 * cw >= tw) & (2 * (cw - w[s:e]) < tw)
            hit = np.flatnonzero(m)
            if len(hit):
                out_k.append(v)
                out_v.append(int(vals[s + hit[0]]))
    return pa.table(
        {key: pa.array(out_k, key_type), out_col: pa.array(out_v, pa.int64())}
    )


@ray.remote
def _wquantile_pick_block(
    tbl: pa.Table, key: str, val_col: str, weight_col: str,
    base: dict, targets: dict, out_col: str,
):
    """Boundary-row picks for MULTIPLE weighted rank targets per key:
    emit (key, pct, val) for each target t where this block's cumulative
    weight first reaches t."""
    import numpy as np

    from ..stages.index import _run_boundaries

    key_type = tbl.schema.field(key).type
    out_k, out_p, out_v = [], [], []
    if tbl.num_rows:
        starts, values = _run_boundaries(tbl, key)
        ends = np.concatenate([starts[1:], [tbl.num_rows]])
        w = np.asarray(tbl[weight_col], dtype=np.int64)
        vals = np.asarray(tbl[val_col], dtype=np.int64)
        for v, s, e in zip(values, starts, ends):
            cw = np.cumsum(w[s:e]) + base.get(v, 0)
            prev = cw - w[s:e]
            for t, pct in targets.get(v, ()):
                hit = np.flatnonzero((cw >= t) & (prev < t))
                if len(hit):
                    out_k.append(v)
                    out_p.append(pct)
                    out_v.append(int(vals[s + hit[0]]))
    return pa.table(
        {
            key: pa.array(out_k, key_type),
            "pct": pa.array(out_p, pa.int64()),
            out_col: pa.array(out_v, pa.int64()),
        }
    )


def weighted_group_quantiles(
    ds, key: str, val_col: str, weight_col: str,
    percents: tuple[int, ...] = (25, 50, 75), out_col: str = "value",
):
    """EXACT per-group weighted quantiles (DuckDB ``quantile_disc``
    convention: smallest v with cumulative weight ≥ ceil(p·W/100)) on
    the histogram shape: when weights are VALUE COUNTS this computes
    classic quantiles while sorting only the (key, value, count)
    histogram — never the raw rows. Composed with a count combiner it
    replaces group_quantiles' full-data sort with two narrow exchanges:
    the 100 TB path for bounded-cardinality value domains (prices in
    cents, token counts, pixel bins). Same block machinery as
    :func:`weighted_group_median`."""
    import ray.data as rd

    mat = sorted_mat(ds, [key, val_col])
    refs = mat.to_arrow_refs()
    if not refs or mat.count() == 0:
        return rd.from_arrow(
            pa.table({key: pa.array([], pa.string()),
                      "pct": pa.array([], pa.int64()),
                      out_col: pa.array([], pa.int64())})
        )
    metas = ray.get([_block_group_weights.remote(r, key, weight_col) for r in refs])
    running: dict = {}
    per_block_base = []
    for weights in metas:
        base = {g: running.get(g, 0) for g, _ in weights}
        for g, tw in weights:
            running[g] = running.get(g, 0) + tw
        per_block_base.append(base)
    targets = {
        g: tuple((max(1, -(-p * tw // 100)), p) for p in percents)
        for g, tw in running.items()
        if tw > 0
    }
    picks = [
        _wquantile_pick_block.remote(r, key, val_col, weight_col, base, targets, out_col)
        for r, base, weights in zip(refs, per_block_base, metas)
        if weights
    ]
    return sorted_group_agg(
        rd.from_arrow_refs(picks), [key, "pct"], [(out_col, "min", out_col)]
    )


def weighted_group_median(
    ds, key: str, val_col: str, weight_col: str, out_col: str = "wmedian"
):
    """EXACT per-group lower weighted median (smallest v with cumulative
    weight ≥ half the group total) without materializing groups: the
    :func:`group_quantiles` shape generalized to weights — one
    range-partition sort by ``(key, value)``, a per-block (key,
    weight-sum) metadata pass, then each block emits only its BOUNDARY
    rows (first row where 2·cumweight crosses the total; at most one
    per key per block). A group spanning many blocks still works —
    crossing detection is offset arithmetic on int64 weight prefix
    sums, exact at any parallelism. ``val_col``/``weight_col`` must be
    int64 (cents/counts); weights ≥ 0. Output ``[key, out_col]``."""
    import ray.data as rd

    mat = sorted_mat(ds, [key, val_col])
    refs = mat.to_arrow_refs()
    if not refs or mat.count() == 0:
        return rd.from_arrow(
            pa.table({key: pa.array([], pa.string()),
                      out_col: pa.array([], pa.int64())})
        )
    metas = ray.get([_block_group_weights.remote(r, key, weight_col) for r in refs])
    running: dict = {}
    per_block_base = []
    for weights in metas:
        base = {g: running.get(g, 0) for g, _ in weights}
        for g, tw in weights:
            running[g] = running.get(g, 0) + tw
        per_block_base.append(base)
    picks = [
        _wmedian_pick_block.remote(r, key, val_col, weight_col, base, running, out_col)
        for r, base, weights in zip(refs, per_block_base, metas)
        if weights
    ]
    # a key's boundary can appear in multiple blocks only at exact
    # half-total block edges — resolve to the smallest value, the SQL
    # MIN-over-satisfying-rows convention
    return sorted_group_agg(
        rd.from_arrow_refs(picks), [key], [(out_col, "min", out_col)]
    )


# ------------------------------------------------ approximate distinct (HLL)


def _bit_length64(w: "np.ndarray") -> "np.ndarray":
    """Exact vectorized bit_length for uint64 (no float log2 — its
    rounding is off-by-one near powers of two). 4x16-bit table lookups."""
    import numpy as np

    table = np.zeros(1 << 16, dtype=np.uint8)
    for b in range(1, 17):
        table[1 << (b - 1) : 1 << b] = b
    bl = table[(w & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for k in (16, 32, 48):
        part = table[((w >> np.uint64(k)) & np.uint64(0xFFFF)).astype(np.int64)]
        bl = np.where(part > 0, part.astype(np.int64) + k, bl)
    return bl


def hll_registers_batch(col: pa.ChunkedArray | pa.Array, p: int = 12) -> "np.ndarray":
    """One batch → 2^p HyperLogLog registers (Flajolet et al. 2007).

    Hash = polars xxhash seed 0 (the same shared primitive as
    exact_dedup's content hash); register index = top ``p`` hash bits,
    rank = leading-zeros-of-suffix + 1 computed with EXACT integer
    bit_length. Registers are order-independent (elementwise max), so
    the partial is deterministic at any parallelism."""
    import numpy as np

    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(col) == 0:
        return regs
    h = pl.from_arrow(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ).hash(seed=0).to_numpy().astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h & np.uint64((1 << (64 - p)) - 1)
    rho = ((64 - p) - _bit_length64(suffix) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: "np.ndarray") -> int:
    """Bias-corrected HLL cardinality estimate from merged registers."""
    import numpy as np

    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear-counting small-range correction
    return int(round(float(e)))


def hll_distinct(ds, col: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col): per-block 2^p-register partials
    (4 KB each — the ONLY bytes that leave a block), elementwise-max
    merge, bias-corrected estimate. Relative error ~1.04/sqrt(2^p)
    (~1.6% at p=12); deterministic (fixed hash seed + exact bit ops),
    so a sequential oracle reproduces the estimate bit-for-bit. The
    at-scale distinct counter: no shuffle, no value set held anywhere.
    Returns a 1-row table (n_distinct_est:int64)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_registers_batch(t[col], p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in parts:
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8))
    return pa.table({"n_distinct_est": pa.array([hll_estimate(merged)], pa.int64())})


# ----------------------------------------------------------------- histogram


def value_histogram(
    ds, col: str, lo: float, hi: float, nbins: int, clip: bool = True
) -> pa.Table:
    """Fixed-width histogram of ``col`` over [lo, hi): one vectorized
    binning per block + the zero-exchange combiner (bins are a
    low-cardinality group key by construction). ``clip`` folds
    out-of-range values into the edge bins; otherwise they are dropped.
    Returns (bin:int64, bin_lo:float64, n:int64), empty bins omitted."""
    import numpy as np

    width = (hi - lo) / nbins

    def derive(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col], dtype=np.float64)
        b = np.floor((v - lo) / width)
        if clip:
            b = np.clip(b, 0, nbins - 1)
            keep = ~np.isnan(v)
        else:
            keep = (~np.isnan(v)) & (b >= 0) & (b < nbins)
        return pa.table({"bin": pa.array(b[keep].astype(np.int64), pa.int64())})

    binned = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_group_agg(binned, ["bin"], [("n", "count_all", None)])
    bins = out["bin"].to_numpy()
    return out.add_column(
        1, "bin_lo", pa.array(lo + bins.astype(np.float64) * width, pa.float64())
    )


def group_var_stats(
    ds, keys: list[str], value_col: str, max_groups: int = 65536
) -> pa.Table:
    """Exact per-group mean / population variance / stddev over an
    INTEGER value column as a zero-exchange combiner (the
    :func:`partial_group_agg` shape): each block emits integer moment
    partials (n, Σv, Σv²) per group, the driver merges the O(blocks ×
    groups) partial rows in arbitrary-precision Python ints, and only
    the final division / sqrt touches float64. Because every float is
    produced by ONE correctly-rounded cast of an exact integer ratio —
    mean = Σv/n, var = (Σv²·n − (Σv)²)/n² — the result is bit-identical
    at any block layout or merge order (the parallelism-proof-float
    rule used across this engine) and equals the SQL
    ``CAST(exact_int AS DOUBLE)`` formula to the last bit. Per-block
    Σv² must fit int64 — guarded loudly via max|v|²·rows ≤ 2⁶²; the
    driver-side merge is unbounded precision. Keys must be non-null
    (sorted driver-side). Output:
    [*keys, n_values, sum_v, mean_v, var_v, std_v] sorted by keys."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        key_cols = {k: t[k] for k in keys}
        if t.num_rows == 0:
            return pa.table(
                {
                    **key_cols,
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "ss": pa.array([], pa.int64()),
                }
            )
        v = pc.cast(t[value_col], pa.int64())
        m = pc.max(pc.abs(v)).as_py() or 0
        if m * m * t.num_rows > (1 << 62):
            raise ValueError(
                f"group_var_stats: per-block sum of squares may overflow "
                f"int64 (max|v|={m}, rows={t.num_rows}); scale the value "
                "column down or shrink the block size"
            )
        tt = pa.table({**key_cols, "_v": v, "_sq": pc.multiply_checked(v, v)})
        g = tt.group_by(keys).aggregate(
            [([], "count_all"), ("_v", "sum"), ("_sq", "sum")]
        )
        return pa.table(
            {
                **{k: g[k] for k in keys},
                "n": g["count_all"],
                "s": g["_v_sum"],
                "ss": g["_sq_sum"],
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict = {}
    for r in parts:
        a = acc.setdefault(tuple(r[k] for k in keys), [0, 0, 0])
        a[0] += r["n"]
        a[1] += r["s"]
        a[2] += r["ss"]
    if len(acc) > max_groups:
        raise ValueError(
            f"group_var_stats: {len(acc)} groups > max_groups={max_groups}; "
            "use sorted_group_agg for data-scale cardinalities"
        )
    rows = []
    for key in sorted(acc):
        n, s, ss = acc[key]
        var = float(ss * n - s * s) / float(n * n)
        rows.append(
            {
                **dict(zip(keys, key)),
                "n_values": n,
                "sum_v": s,
                "mean_v": float(s) / float(n),
                "var_v": var,
                "std_v": math.sqrt(var),
            }
        )
    if not rows:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {
                **{k: pa.array([], types[k]) for k in keys},
                "n_values": pa.array([], pa.int64()),
                "sum_v": pa.array([], pa.int64()),
                "mean_v": pa.array([], pa.float64()),
                "var_v": pa.array([], pa.float64()),
                "std_v": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pylist(rows)


# ------------------------------------------------------------------- rollup


def grouping_sets_agg(
    ds,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    sets: list[tuple[int, ...]],
):
    """SQL ``GROUP BY GROUPING SETS`` as one streaming pass: each row
    fans out to one sub-row per grouping set INSIDE the map task (keys
    outside the set nulled out, exactly DuckDB's frame), then the
    zero-exchange combiner aggregates. The fan-out factor never crosses
    an exchange — same shape as hopping windows. ``sets`` are tuples of
    KEPT key indices and must be distinct. Returns a pyarrow Table with
    NULLs in the rolled-up key columns."""
    import numpy as np  # noqa: F401  (parity with sibling aggregates)

    import pyarrow.compute as pc

    def derive(t: pa.Table) -> pa.Table:
        # One sub-table per grouping set, excluded keys nulled out.
        # Grouping runs on ONE composed string surrogate key: this
        # pyarrow's (16.1.0) multi-key hash grouper splits identical
        # NULL fixed-width keys when any var-width key is present (it
        # hashes the data buffer behind the validity bitmap), so
        # grouping on (set, keys...) directly returns garbage; string
        # keys are unaffected, and the real key values ride along as
        # min() aggregates (constant within a group by construction).
        n = t.num_rows
        outs = []
        for si, kept in enumerate(sets):
            o = t
            parts = [pa.array([str(si)] * n, pa.string())]
            for j, k in enumerate(keys):
                if j not in kept:
                    o = o.set_column(
                        o.column_names.index(k),
                        k,
                        pa.nulls(n, o.schema.field(k).type),
                    )
                    parts.append(pa.array([""] * n, pa.string()))
                else:
                    parts.append(pc.cast(o[k], pa.string()))
            gk = pc.binary_join_element_wise(
                *parts, "\x1f", null_handling="replace", null_replacement="\x00"
            )
            outs.append(o.append_column("_gkey", gk))
        return pa.concat_tables(outs)

    fanned = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_group_agg(
        fanned, ["_gkey"], list(specs) + [(k, "min", k) for k in keys]
    )
    names = [s[0] for s in specs]
    return out.select(list(keys) + names)


def rollup_agg(ds, keys: list[str], specs: list[tuple[str, str, str | None]]):
    """SQL ``GROUP BY ROLLUP(keys...)``: grouping sets = the key-list
    prefixes (level L keeps keys[:L])."""
    sets = [tuple(range(lvl)) for lvl in range(len(keys) + 1)]
    return grouping_sets_agg(ds, keys, specs, sets)


def cube_agg(ds, keys: list[str], specs: list[tuple[str, str, str | None]]):
    """SQL ``GROUP BY CUBE(keys...)``: grouping sets = ALL key subsets
    (2^len(keys) of them — keep the key list short; the fan-out is
    in-task only, like rollup)."""
    from itertools import combinations

    sets = [
        tuple(c)
        for r in range(len(keys) + 1)
        for c in combinations(range(len(keys)), r)
    ]
    return grouping_sets_agg(ds, keys, specs, sets)


def hll_distinct_by(ds, key_col: str, col: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col) GROUP BY key_col: the HLL sketch
    as a group aggregate. Per block, one register set per key (partials
    are (key, 4 KB bytes) rows — still the only bytes leaving a block);
    driver merges per key with elementwise max. Key cardinality must be
    combiner-scale (the registers-per-key table lives on the driver);
    data cardinality is unbounded. Returns (key_col, n_distinct_est)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "regs": pa.array([], pa.binary()),
                }
            )
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending")])
        s = t.take(idx)
        keys = s[key_col].combine_chunks()
        kn = np.asarray(
            pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1)).to_numpy(
                zero_copy_only=False
            )
        ) if s.num_rows > 1 else np.zeros(0, bool)
        starts = np.concatenate([[0], np.flatnonzero(kn) + 1, [s.num_rows]])
        out_k, out_r = [], []
        for a, b in zip(starts[:-1], starts[1:]):
            out_k.append(keys[int(a)].as_py())
            out_r.append(hll_registers_batch(s[col].slice(int(a), int(b - a)), p).tobytes())
        return pa.table(
            {
                key_col: pa.array(out_k, t.schema.field(key_col).type),
                "regs": pa.array(out_r, pa.binary()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged: dict = {}
    for r in parts:
        cur = np.frombuffer(r["regs"], dtype=np.uint8)
        k = r[key_col]
        merged[k] = np.maximum(merged[k], cur) if k in merged else cur
    ks = sorted(merged)
    return pa.table(
        {
            key_col: pa.array(ks),
            "n_distinct_est": pa.array(
                [hll_estimate(merged[k]) for k in ks], pa.int64()
            ),
        }
    )


# ------------------------------------------------ per-group top-k rows


@ray.remote
def _top_k_block(
    key_col: str,
    order_cols: tuple,
    descending: tuple,
    k: int,
    *parts: pa.Table,
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    sort_keys = [(key_col, "ascending")] + [
        (c, "descending" if d else "ascending")
        for c, d in zip(order_cols, descending)
    ]
    s = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys))
    n = s.num_rows
    keys = s[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    # within-key rank = global index minus the key run's start index
    run_starts = np.flatnonzero(new_key)
    run_id = np.cumsum(new_key) - 1
    rank = np.arange(n, dtype=np.int64) - run_starts[run_id]
    out = s.append_column("rn", pa.array(rank + 1, pa.int64()))
    return out.filter(pa.array(rank < k))


def group_top_k(
    ds,
    key_col: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
) -> "ray.data.Dataset":
    """Top-k rows per group (SELECT ... QUALIFY row_number() <= k) on the
    task-based key-complete exchange: one range-partition sort by
    ``(key, *order)``, boundary runs donated so each key's rows land in
    exactly one kernel task, then the rank filter is pure offset
    arithmetic per block — no hash shuffle, no per-group Python, no
    group ever materialized driver-side. ``order_cols`` must make the
    ordering total (include a unique tiebreak column) so the kept rows —
    and the emitted ``rn`` (1-based rank) — are deterministic at any
    parallelism. Ref analog: the per-feed newest-first truncate
    (/root/reference/src/secbot/fetchers/news.py:152-162) generalized to
    per-key."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=order_cols, descending=descending)
    if not groups:
        # empty result must carry the REAL schema (all input columns,
        # their real types) + rn, so downstream selects/unions that
        # worked on data keep working on none
        schema = ds.schema()
        cols = {
            n: pa.array([], t) for n, t in zip(schema.names, schema.types)
        }
        cols["rn"] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(
        [
            _top_k_block.remote(key_col, tuple(order_cols), tuple(descending), k, *parts)
            for parts in groups
        ]
    )


# ---------------------------------------------------------- count-min sketch


def cm_bucket(term: str, j: int, w: int) -> int:
    """Row-``j`` count-min bucket of ``term``: first 8 md5 hex chars of
    ``"{j}:{term}"`` as an int, mod ``w`` — the repo-wide md5 identity
    convention (ops/sampling.py), so DuckDB reproduces it exactly via
    CAST(CONCAT('0x', substr(md5(j || ':' || term), 1, 8)) AS BIGINT) % w."""
    import hashlib

    return int(hashlib.md5(f"{j}:{term}".encode()).hexdigest()[:8], 16) % w


def cm_sketch_counts(
    ds,
    probes: list[str],
    text_col: str = "text",
    w: int = 1024,
    d: int = 3,
) -> pa.Table:
    """Count-min sketch term-frequency estimates — the mergeable
    approximate counter for when the exact term exchange
    (ops/text.top_terms) is too wide. Counters are SUMS, so per-block
    sparse partials (j, bucket, n) merge exactly at ANY order/layout —
    unlike Misra-Gries summaries, whose merge is order-sensitive — and
    the whole op is a zero-exchange combiner: only O(d·w) rows per
    block leave the map. Estimate(term) = min_j counter[j][h_j(term)],
    an integer ≥ the true count (classic one-sided CM error ≤ n/w with
    prob 1-2^-d). Tokens follow the repo-wide \\S+ convention. Output
    (term, cm_count) over ``probes``, sorted by term."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "j": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        text = pc.coalesce(t[text_col], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.list_flatten(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return empty
        g = pa.table({"term": flat}).group_by(["term"]).aggregate([([], "count_all")])
        terms = g["term"].to_pylist()
        counts = np.asarray(g["count_all"], dtype=np.int64)
        js, bs, ns = [], [], []
        for j in range(d):
            buckets = np.fromiter(
                (cm_bucket(term, j, w) for term in terms), np.int64, len(terms)
            )
            # collapse same-bucket collisions inside the block
            acc = np.zeros(w, dtype=np.int64)
            np.add.at(acc, buckets, counts)
            nz = np.flatnonzero(acc)
            js.append(np.full(len(nz), j, np.int64))
            bs.append(nz)
            ns.append(acc[nz])
        return pa.table(
            {
                "j": pa.array(np.concatenate(js), pa.int64()),
                "b": pa.array(np.concatenate(bs), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    sk = partial_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["j", "b"],
        [("n", "sum", "n")],
        max_groups=d * w,
    )
    lut = {
        (j, b): n
        for j, b, n in zip(
            sk["j"].to_pylist(), sk["b"].to_pylist(), sk["n"].to_pylist()
        )
    }
    out_terms = sorted(set(probes))
    ests = [
        min(lut.get((j, cm_bucket(term, j, w)), 0) for j in range(d))
        for term in out_terms
    ]
    return pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "cm_count": pa.array(ests, pa.int64()),
        }
    )


# ------------------------------------------------------------ table profile


def profile_table(ds, cols: list[str]) -> pa.Table:
    """Per-column data profile — the ingest-auditing op run before a
    corpus enters the pipeline: (col, n_rows, n_null, n_distinct), all
    exact integers (no stringified min/max, so the result is
    type-agnostic and oracle-safe). n_rows / n_null are one
    zero-exchange combiner pass over ALL columns together; n_distinct
    is one sorted-distinct exchange PER column (exact, SQL
    count(distinct) semantics: nulls excluded). Swap the distinct leg
    for :func:`hll_distinct` when an estimate is enough at corpus
    scale. Output sorted by col."""

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nns = [], [], []
        for c in cols:
            names.append(c)
            ns.append(t.num_rows)
            nns.append(t[c].null_count if t.num_rows else 0)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nn": pa.array(nns, pa.int64()),
            }
        )

    counts = partial_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["col"],
        [("n_rows", "sum", "n"), ("n_null", "sum", "nn")],
    )
    distincts = []
    for c in cols:
        one = ds.map_batches(
            lambda t, c=c: t.select([c]).filter(pc.is_valid(t[c])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        distincts.append(sorted_distinct(one, [c]).count())
    order = {c: i for i, c in enumerate(counts["col"].to_pylist())}
    nd = [0] * len(order)
    for c, d in zip(cols, distincts):
        nd[order[c]] = d
    return counts.append_column("n_distinct", pa.array(nd, pa.int64()))


# ------------------------------------------------ exact grouped distinct


def group_count_distinct(ds, key_col: str, col: str) -> pa.Table:
    """Exact COUNT(DISTINCT col) GROUP BY key — the hard-count
    complement of :func:`hll_distinct_by`. One sorted-distinct exchange
    over the (key, col) pairs; because the surviving rows are globally
    unique, per-key counts are plain sum-mergeable block partials, so
    the count leg is the zero-exchange combiner. Nulls in ``col`` are
    excluded (SQL count-distinct semantics). The combiner bounds the
    KEY domain (not the value domain) at ~64k groups — for data-scale
    key domains chain :func:`sorted_group_agg` over the distinct pairs
    instead."""

    def drop_null_vals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([key_col, col])
        return t.select([key_col, col]).filter(pc.is_valid(t[col]))

    pairs = sorted_distinct(
        ds.map_batches(drop_null_vals, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, col],
    )
    counts = partial_group_agg(
        pairs, [key_col], [("n_distinct", "count_all", None)]
    )
    # SQL keeps a group whose values are ALL null (count distinct = 0);
    # the null filter above would drop it — left-fill the key domain
    domain = partial_group_agg(
        ds.map_batches(
            lambda t: t.select([key_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        [key_col],
        [("n_rows", "count_all", None)],
    )
    have = set(counts[key_col].to_pylist())
    missing = [k for k in domain[key_col].to_pylist() if k not in have]
    if not missing:
        return counts
    fill = pa.table(
        {
            key_col: pa.array(missing, counts.schema.field(key_col).type),
            "n_distinct": pa.array([0] * len(missing), pa.int64()),
        }
    )
    return pa.concat_tables([counts, fill]).sort_by(
        [(key_col, "ascending")]
    )


# ------------------------------------------ interpolated per-group quantiles


@ray.remote
def _cont_pick_block(
    tbl: pa.Table, key: str, value_col: str, offsets: dict, targets: dict
) -> pa.Table:
    """Emit (key, pct, side, value) rows for the floor/ceil rank picks
    of the continuous-quantile targets present in this sorted block."""
    from ..stages.index import _run_boundaries

    out_k, out_p, out_s, out_i = [], [], [], []
    if tbl.num_rows:
        starts, values = _run_boundaries(tbl, key)
        ends = list(starts[1:]) + [tbl.num_rows]
        for s, e, g in zip(starts, ends, values):
            off = offsets.get(g, 0)
            for rank, pct, side in targets.get(g, ()):
                j = rank - off
                if 0 <= j < e - s:
                    out_k.append(g)
                    out_p.append(pct)
                    out_s.append(side)
                    out_i.append(int(s) + int(j))
    vals = tbl[value_col].take(pa.array(out_i, pa.int64()))
    kt = tbl.schema.field(key).type
    return pa.table(
        {
            key: pa.array(out_k, kt),
            "pct": pa.array(out_p, pa.int64()),
            "side": pa.array(out_s, pa.int64()),
            value_col: vals,
        }
    )


def group_quantiles_cont(
    ds, key: str, value_col: str, percents: tuple[int, ...] = (25, 50, 90)
) -> pa.Table:
    """EXACT per-group INTERPOLATED quantiles (SQL percentile_cont /
    DuckDB quantile_cont) — same rank-selection shape as
    :func:`group_quantiles` (range-partition sort, offset arithmetic,
    no group ever materialized in one task), but each target needs the
    elements at floor((n−1)·q) and ceil((n−1)·q), combined as DuckDB
    does: ``lo·(crn−rn) + hi·(rn−frn)`` (verified bit-exact against
    quantile_cont, including non-dyadic q like 0.9). The pick rows are
    O(groups × percents × 2) — tiny — so the final interpolation is a
    driver-side stitch returning a pa.Table ``[key, pct, value]``."""
    from ..stages.index import _block_group_counts

    mat = sorted_mat(ds, [key, value_col])
    refs = mat.to_arrow_refs()
    kt = ds.schema().field(key).type if hasattr(ds.schema(), "field") else pa.string()
    empty = pa.table(
        {
            key: pa.array([], kt),
            "pct": pa.array([], pa.int64()),
            value_col: pa.array([], pa.float64()),
        }
    )
    if not refs:
        return empty
    metas = ray.get([_block_group_counts.remote(r, key) for r in refs])
    running: dict = {}
    per_block_offsets = []
    for counts in metas:
        off = {g: running.get(g, 0) for g, _ in counts}
        for g, n in counts:
            running[g] = running.get(g, 0) + n
        per_block_offsets.append(off)
    rns: dict = {}
    targets: dict = {}
    for g, n in running.items():
        if n == 0:
            continue
        tg = []
        for p in percents:
            rn = (p / 100) * (n - 1)
            frn = int(np.floor(rn))
            crn = int(np.ceil(rn))
            rns[(g, p)] = (rn, frn, crn)
            tg.append((frn, p, 0))
            if crn != frn:
                tg.append((crn, p, 1))
        targets[g] = tuple(tg)
    picks = pa.concat_tables(
        ray.get(
            [
                _cont_pick_block.remote(r, key, value_col, off, targets)
                for r, off in zip(refs, per_block_offsets)
            ]
        )
    )
    lo: dict = {}
    hi: dict = {}
    for g, p, side, v in zip(
        picks[key].to_pylist(),
        picks["pct"].to_pylist(),
        picks["side"].to_pylist(),
        picks[value_col].to_pylist(),
    ):
        (lo if side == 0 else hi)[(g, p)] = v
    out_k, out_p, out_v = [], [], []
    for (g, p), (rn, frn, crn) in sorted(rns.items(), key=lambda kv: repr(kv[0])):
        lv = lo[(g, p)]
        out_v.append(
            lv if crn == frn else lv * (crn - rn) + hi[(g, p)] * (rn - frn)
        )
        out_k.append(g)
        out_p.append(p)
    return pa.table(
        {
            key: pa.array(out_k, kt),
            "pct": pa.array(out_p, pa.int64()),
            value_col: pa.array(out_v, pa.float64()),
        }
    )


# ----------------------------------------------------- exact correlation


def _group_cross_moments(
    ds, keys: list[str], x_col: str, y_col: str, max_groups: int, opname: str
) -> dict:
    """Shared combiner for the exact two-column moment family
    (:func:`group_corr`, :func:`group_linreg`): each block emits integer
    partials (n, Σx, Σy, Σx², Σy², Σxy) per group via a zero-exchange
    ``group_by`` inside ``map_batches``; the driver merges them in
    arbitrary-precision Python ints. Per-block Σxy overflow is guarded
    loudly (max|x|·max|y|·rows ≤ 2⁶²). Returns {key_tuple: [n, sx, sy,
    sxx, syy, sxy]} — group cardinality is config-scale (≤max_groups),
    the merge never sees row-scale data."""

    def partial(t: pa.Table) -> pa.Table:
        key_cols = {k: t[k] for k in keys}
        if t.num_rows == 0:
            return pa.table(
                {
                    **key_cols,
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sy": pa.array([], pa.int64()),
                    "sxx": pa.array([], pa.int64()),
                    "syy": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                }
            )
        x = pc.cast(t[x_col], pa.int64())
        y = pc.cast(t[y_col], pa.int64())
        mx = pc.max(pc.abs(x)).as_py() or 0
        my = pc.max(pc.abs(y)).as_py() or 0
        if max(mx * mx, my * my, mx * my) * t.num_rows > (1 << 62):
            raise ValueError(
                f"{opname}: per-block moment may overflow int64 "
                f"(max|x|={mx}, max|y|={my}, rows={t.num_rows}); scale "
                "the value columns down or shrink the block size"
            )
        tt = pa.table(
            {
                **key_cols,
                "_x": x,
                "_y": y,
                "_xx": pc.multiply_checked(x, x),
                "_yy": pc.multiply_checked(y, y),
                "_xy": pc.multiply_checked(x, y),
            }
        )
        g = tt.group_by(keys).aggregate(
            [([], "count_all"), ("_x", "sum"), ("_y", "sum"),
             ("_xx", "sum"), ("_yy", "sum"), ("_xy", "sum")]
        )
        return pa.table(
            {
                **{k: g[k] for k in keys},
                "n": g["count_all"],
                "sx": g["_x_sum"],
                "sy": g["_y_sum"],
                "sxx": g["_xx_sum"],
                "syy": g["_yy_sum"],
                "sxy": g["_xy_sum"],
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict = {}
    for r in parts:
        a = acc.setdefault(tuple(r[k] for k in keys), [0, 0, 0, 0, 0, 0])
        for i, f in enumerate(("n", "sx", "sy", "sxx", "syy", "sxy")):
            a[i] += r[f]
    if len(acc) > max_groups:
        raise ValueError(
            f"{opname}: {len(acc)} groups > max_groups={max_groups}; "
            "use sorted_group_agg partials for data-scale cardinalities"
        )
    return acc


def group_corr(
    ds, keys: list[str], x_col: str, y_col: str, max_groups: int = 65536
) -> pa.Table:
    """Exact per-group Pearson correlation over two INTEGER-valued
    columns — the :func:`group_var_stats` recipe extended to cross
    moments via :func:`_group_cross_moments`, and the ONLY floats are
    the final corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ₜ) · √(n·Σy² −
    Σy²ₜ)) computed as one cast per exact integer plus IEEE sqrt/div —
    so the result is bit-identical at any block layout and equals the
    SQL HUGEINT-sum formula to the last bit. Output:
    [*keys, n_values, corr_xy] sorted by keys; groups with zero
    variance on either side emit null."""
    import math

    acc = _group_cross_moments(ds, keys, x_col, y_col, max_groups, "group_corr")
    rows = []
    for key in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[key]
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        corr = (
            None
            if dx == 0 or dy == 0
            else float(n * sxy - sx * sy)
            / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
        )
        rows.append(
            {**dict(zip(keys, key)), "n_values": n, "corr_xy": corr}
        )
    if not rows:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {
                **{k: pa.array([], types[k]) for k in keys},
                "n_values": pa.array([], pa.int64()),
                "corr_xy": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pylist(rows)


def group_linreg(
    ds, keys: list[str], x_col: str, y_col: str, max_groups: int = 65536
) -> pa.Table:
    """Exact per-group ordinary-least-squares line fit y = slope·x +
    intercept over two INTEGER-valued columns (SQL REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2) on the same zero-exchange integer
    cross-moment combiner as :func:`group_corr`
    (:func:`_group_cross_moments`). The only float operations are the
    final

        slope     = f(n·Σxy − Σx·Σy) / f(n·Σxx − Σx²)
        intercept = (f(Σy) − slope·f(Σx)) / f(n)
        r2        = (f(num)·f(num)) / (f(dx)·f(dy))

    where f() is one correctly-rounded int→float64 cast per EXACT
    arbitrary-precision integer — bit-identical at any block layout and
    equal to the DuckDB HUGEINT-sum formula oracle to the last bit.
    Output: [*keys, n_values, slope, intercept, r2] sorted by keys.
    Zero x-variance groups emit null slope/intercept/r2; zero
    y-variance groups emit slope/intercept with null r2 (0/0), matching
    NULLIF in the oracle."""
    acc = _group_cross_moments(ds, keys, x_col, y_col, max_groups, "group_linreg")
    rows = []
    for key in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[key]
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx == 0:
            slope = intercept = r2 = None
        else:
            slope = float(num) / float(dx)
            intercept = (float(sy) - slope * float(sx)) / float(n)
            r2 = (
                None
                if dy == 0
                else (float(num) * float(num)) / (float(dx) * float(dy))
            )
        rows.append(
            {
                **dict(zip(keys, key)),
                "n_values": n,
                "slope": slope,
                "intercept": intercept,
                "r2": r2,
            }
        )
    if not rows:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {
                **{k: pa.array([], types[k]) for k in keys},
                "n_values": pa.array([], pa.int64()),
                "slope": pa.array([], pa.float64()),
                "intercept": pa.array([], pa.float64()),
                "r2": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pylist(rows)


def group_entropy(
    ds,
    keys: list[str],
    value_col: str,
    scale_bits: int = 20,
    max_groups: int = 65536,
) -> pa.Table:
    """Per-group Shannon entropy (bits) of a categorical column's
    distribution — e.g. audience diversity: how evenly a type's events
    spread over users. Two stages, both data-scale safe:

    1. exact per-(key, value) counts on the sorted exchange
       (:func:`sorted_group_agg` — value cardinality may be row-scale);
    2. each count row contributes the INTEGER term
       ``round(c·log2(c)·2^scale_bits)`` — fixed-point quantization is
       part of the operator's definition, so the per-key sum is an
       ORDER-INVARIANT integer combiner (block partials via one
       ``group_by`` per block, arbitrary-precision driver merge), not a
       float reduction whose value depends on block layout.

    The only float math is elementwise ``c·log2(c)`` (np.log2 is
    bitwise position-independent — verified: SIMD body == scalar tail)
    plus the final ``H = log2(n) − (S/2^scale_bits)/n``; quantization
    error is ≤ |values|·2^-(scale_bits+1)/n bits (~1e-12 for defaults).
    Per-block overflow is guarded loudly like :func:`group_corr`
    (max_term·rows ≤ 2⁶²). KEY cardinality is config-scale
    (≤max_groups); output [*keys, n_events, n_values, entropy_bits]
    sorted by keys; a single-value group is pinned to exactly 0.0
    (quantization would otherwise leave a ~2^-scale_bits/n residue)."""
    scale = np.float64(1 << scale_bits)
    counts = sorted_group_agg(ds, [*keys, value_col], [("c", "count_all", None)])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t[k] for k in keys},
                    "n": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        c = np.asarray(t["c"], dtype=np.int64)
        cf = c.astype(np.float64)
        term = np.rint(cf * np.log2(cf) * scale)
        m = float(term.max()) if len(term) else 0.0
        if m * t.num_rows > float(1 << 62):
            raise ValueError(
                f"group_entropy: per-block term sum may overflow int64 "
                f"(max term={m:.3g}, rows={t.num_rows}); lower scale_bits "
                "or shrink the block size"
            )
        tt = pa.table(
            {
                **{k: t[k] for k in keys},
                "_c": t["c"],
                "_t": pa.array(term.astype(np.int64), pa.int64()),
            }
        )
        g = tt.group_by(keys).aggregate(
            [("_c", "sum"), ([], "count_all"), ("_t", "sum")]
        )
        return pa.table(
            {
                **{k: g[k] for k in keys},
                "n": g["_c_sum"],
                "nd": g["count_all"],
                "s": g["_t_sum"],
            }
        )

    parts = counts.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict = {}
    for r in parts:
        a = acc.setdefault(tuple(r[k] for k in keys), [0, 0, 0])
        for i, f in enumerate(("n", "nd", "s")):
            a[i] += r[f]
    if len(acc) > max_groups:
        raise ValueError(
            f"group_entropy: {len(acc)} groups > max_groups={max_groups}; "
            "shard the driver merge for config-scale-violating key domains"
        )
    rows = []
    for key in sorted(acc):
        n, nd, s = acc[key]
        if nd == 1:
            # a single-value group is exactly 0 bits by definition —
            # don't let fixed-point quantization leave a ~2^-20/n residue
            h = 0.0
        else:
            nf = np.float64(n)
            h = float(np.log2(nf) - (np.float64(s) / scale) / nf)
        rows.append(
            {
                **dict(zip(keys, key)),
                "n_events": n,
                "n_values": nd,
                "entropy_bits": h,
            }
        )
    if not rows:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {
                **{k: pa.array([], types[k]) for k in keys},
                "n_events": pa.array([], pa.int64()),
                "n_values": pa.array([], pa.int64()),
                "entropy_bits": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pylist(rows)


# -------------------------------------------------------- skew diagnostics


def key_skew_report(ds, key_col: str) -> pa.Table:
    """Shuffle-skew audit for a prospective partition key — run this
    BEFORE keying an exchange on a column at corpus scale: exact
    per-key counts on the sort exchange (data-scale key domains fine),
    then the count distribution's n_rows / n_keys / max / p50 / p90 /
    p99 via one more constant-key quantile pass. A max_count ≫ p99
    reading is the hot-key signal that routes a join to the skew-aware
    path (ops/join.skew_join) or salts the key. Returns ONE row."""
    counts = sorted_group_agg(ds, [key_col], [("n", "count_all", None)])
    tagged = counts.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(["all"] * t.num_rows, pa.string()),
                "n": t["n"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    q = {
        r["pct"]: r["n"]
        for r in group_quantiles(tagged, "k", "n", percents=(50, 90, 99)).take_all()
    }
    tot = partial_group_agg(
        tagged,
        ["k"],
        [
            ("n_rows", "sum", "n"),
            ("n_keys", "count_all", None),
            ("max_count", "max", "n"),
        ],
    )

    def _cell(col: str) -> int:
        return int(tot[col][0].as_py()) if tot.num_rows else 0

    return pa.table(
        {
            "n_rows": pa.array([_cell("n_rows")], pa.int64()),
            "n_keys": pa.array([_cell("n_keys")], pa.int64()),
            "max_count": pa.array([_cell("max_count")], pa.int64()),
            "p50_count": pa.array([q.get(50, 0)], pa.int64()),
            "p90_count": pa.array([q.get(90, 0)], pa.int64()),
            "p99_count": pa.array([q.get(99, 0)], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# group_pair_counts: distinct-value co-occurrence (market-basket pairs)
# --------------------------------------------------------------------------


@ray.remote
def _pair_block(key_col: str, val_col: str, max_vals: int, *parts: pa.Table) -> pa.Table:
    """Kernel over one key-complete, (key, val)-sorted group: dedup
    consecutive (key, val) rows, then enumerate every unordered distinct
    value pair per key with offset arithmetic (repeat/arange — no
    per-row Python). Sorted order guarantees val_a < val_b strictly."""
    from ..stages.index import _run_boundaries

    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {"val_a": pa.array([], pa.string()), "val_b": pa.array([], pa.string())}
        )
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    vals = tbl[val_col].combine_chunks()
    keep = np.ones(n, dtype=bool)
    if n > 1:
        same_key = pc.equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        same_val = pc.equal(vals.slice(1), vals.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        keep[1:] = ~(same_key & same_val)
    idx = pa.array(np.flatnonzero(keep), pa.int64())
    tbl = pa.table({key_col: keys.take(idx), val_col: vals.take(idx)})
    n = tbl.num_rows
    starts, _ = _run_boundaries(tbl, key_col)
    ends = np.append(starts[1:], n)
    lens = ends - starts
    if lens.size and lens.max() > max_vals:
        raise ValueError(
            f"group_pair_counts: a key holds {int(lens.max())} distinct values "
            f"(> max_vals={max_vals}); pair explosion is quadratic — prefilter "
            "the value domain or raise max_vals deliberately"
        )
    run_end = np.repeat(ends, lens)  # per-row: end of its key run
    cnt_i = run_end - np.arange(n) - 1  # pairs each row anchors as the left side
    total = int(cnt_i.sum())
    if total == 0:
        return pa.table(
            {"val_a": pa.array([], tbl[val_col].type), "val_b": pa.array([], tbl[val_col].type)}
        )
    i_rep = np.repeat(np.arange(n), cnt_i)
    off = np.concatenate([[0], np.cumsum(cnt_i)[:-1]])
    j = i_rep + 1 + (np.arange(total) - np.repeat(off, cnt_i))
    v = tbl[val_col].combine_chunks()
    return pa.table(
        {
            "val_a": v.take(pa.array(i_rep, pa.int64())),
            "val_b": v.take(pa.array(j, pa.int64())),
        }
    )


def group_pair_counts(ds, key_col: str, val_col: str, max_vals: int = 4096) -> pa.Table:
    """Co-occurrence counts: for every unordered pair of DISTINCT values
    (a < b) sharing a key, the number of keys where both appear — the
    market-basket pair-support primitive (SQL: self-join of
    SELECT DISTINCT key, val on key with val_a < val_b, then count).

    Shape: one key-complete sort exchange co-locates each key's rows;
    the per-group kernel dedups and pair-explodes vectorized; pair rows
    (bounded by max_vals²/2 per key, guarded loudly) flow into
    :func:`partial_group_agg` — per-block combiner counts, tiny
    driver merge. No hash shuffle, no all-pairs across keys.

    Returns a pyarrow Table (val_a, val_b, n_keys) sorted by the pair.
    """
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[val_col])
    empty = pa.table(
        {
            "val_a": pa.array([], pa.string()),
            "val_b": pa.array([], pa.string()),
            "n_keys": pa.array([], pa.int64()),
        }
    )
    if not groups:
        return empty
    pair_refs = [
        _pair_block.remote(key_col, val_col, max_vals, *parts) for parts in groups
    ]
    pairs = ray.data.from_arrow_refs(pair_refs)
    out = partial_group_agg(pairs, ["val_a", "val_b"], [("n_keys", "count_all", None)])
    return out if out.num_rows else empty


# -------------------------------------------------- skyline (Pareto set)


def _skyline2d_block(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Block-local 2D skyline (maximize x, minimize y): sort by
    (x desc, y asc) and keep a row iff its y is strictly below the best
    y of all STRICTLY higher-x rows; within an x level only the level's
    min-y rows survive (equal-vector duplicates all kept — matches the
    SQL NOT-EXISTS dominance oracle). O(n log n) vectorized."""
    if t.num_rows == 0:
        return t
    x = np.asarray(t[x_col], dtype=np.int64)
    y = np.asarray(t[y_col], dtype=np.int64)
    order = np.lexsort((y, -x))  # x desc, then y asc
    xs, ys = x[order], y[order]
    level_start = np.zeros(len(xs), dtype=bool)
    level_start[0] = True
    level_start[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(level_start)
    level_min = ys[starts]  # sorted y asc within level -> first is min
    # best y among strictly-higher-x levels (exclusive prefix min)
    M = np.empty(len(starts), dtype=np.int64)
    M[0] = np.iinfo(np.int64).max
    if len(starts) > 1:
        M[1:] = np.minimum.accumulate(level_min)[:-1]
    lvl_of_row = np.cumsum(level_start) - 1
    keep_sorted = (ys == level_min[lvl_of_row]) & (
        level_min[lvl_of_row] < M[lvl_of_row]
    )
    keep = np.zeros(len(xs), dtype=bool)
    keep[order] = keep_sorted
    return t.filter(pa.array(keep))


def skyline2d(ds, x_col: str, y_col: str) -> pa.Table:
    """Distributed 2D skyline / Pareto-preference query (maximize
    ``x_col``, minimize ``y_col``; integer columns): the classic
    two-phase plan — every block computes its LOCAL skyline (a row
    dominated inside one block cannot be in the global answer, so the
    local pass is a correctness-safe prune), the surviving candidates
    (skyline-sized, not data-sized) concatenate driver-side for one
    final pass. Zero exchanges; at 10^10 rows the only driver traffic
    is each block's Pareto frontier. Flip a column's sign upstream to
    change its optimization direction."""
    parts = ds.map_batches(
        lambda t: _skyline2d_block(t, x_col, y_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    if not parts:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {c: pa.array([], types[c]) for c in sch.names}
        )
    merged = pa.Table.from_pylist(parts)
    return _skyline2d_block(merged, x_col, y_col)


# ------------------------------------- bitmap exact distinct (bounded domain)


def group_bitmap_distinct(
    ds,
    key_col: str,
    value_col: str,
    domain_size: int,
    max_groups: int = 4096,
) -> pa.Table:
    """EXACT per-group COUNT(DISTINCT value) with ZERO exchange for
    BOUNDED integer domains: each block emits one packed bitmap
    (domain_size bits as uint64 words) per group — the combiner is
    bitwise OR, fully order-invariant — and the driver pops counts.
    The alternate scale path to :func:`group_count_distinct`'s sorted
    exchange: right when values are dense ints (user ids, shard ids)
    and groups are config-scale — a 10^8 domain is a 12.5 MB bitmap
    per (group, block), moved once, vs shuffling every row. Values
    outside [0, domain_size) raise loudly."""
    words = (domain_size + 63) // 64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: t[key_col],
                    "bm": pa.array([], pa.list_(pa.uint64())),
                }
            )
        keys = t[key_col]
        v = np.asarray(t[value_col], dtype=np.int64)
        if len(v) and (v.min() < 0 or v.max() >= domain_size):
            raise ValueError(
                f"group_bitmap_distinct: value outside [0, {domain_size}) "
                f"(min={v.min()}, max={v.max()}) — raise domain_size or "
                "densify ids first"
            )
        enc = keys.combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        uniq = enc.dictionary
        bms = np.zeros((len(uniq), words), dtype=np.uint64)
        np.bitwise_or.at(
            bms, (codes, v // 64), np.uint64(1) << (v % 64).astype(np.uint64)
        )
        return pa.table(
            {
                key_col: uniq,
                "bm": pa.array(list(bms), pa.list_(pa.uint64())),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict = {}
    for r in parts:
        bm = np.asarray(r["bm"], dtype=np.uint64)
        cur = acc.get(r[key_col])
        acc[r[key_col]] = bm if cur is None else (cur | bm)
    if len(acc) > max_groups:
        raise ValueError(
            f"group_bitmap_distinct: {len(acc)} groups × {words * 8} B "
            f"bitmaps exceed max_groups={max_groups} — use "
            "group_count_distinct's sorted exchange instead"
        )
    rows = [
        {
            key_col: k,
            "n_distinct": int(
                np.unpackbits(bm.view(np.uint8)).sum()
            ),
        }
        for k, bm in sorted(acc.items())
    ]
    if not rows:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table(
            {
                key_col: pa.array([], types[key_col]),
                "n_distinct": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows)


# --------------------------------------------- KMV theta sketch (set ops)


def _kmv_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """md5-based 64-bit hashes (first 16 hex chars) — the engine's
    reproducible-outside-the-engine hash convention (ops/sampling)."""
    import hashlib

    vals = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.array(
        [
            int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
            for v in vals.to_pylist()
        ],
        dtype=np.uint64,
    )


def kmv_sketches(
    ds, key_col: str, value_col: str, k: int = 64, max_groups: int = 4096
) -> dict:
    """K-minimum-values (theta) sketch per group: the k smallest
    DISTINCT 64-bit hashes of ``value_col``. The combiner is
    merge-sorted-keep-k-smallest — fully order-invariant — so one
    streaming pass builds every group's sketch with zero exchange and
    k·8 bytes per (group, block) of driver traffic. Sketches support
    SET OPERATIONS downstream (:func:`kmv_estimate_intersections`):
    distinct-of-union/intersection estimates that exact counting would
    need a full shuffle for. Returns {group: sorted uint64 array}."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: t[key_col],
                    "h": pa.array([], pa.list_(pa.uint64())),
                }
            )
        enc = t[key_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        h = _kmv_hash(t[value_col])
        uniq = enc.dictionary
        lists = []
        for g in range(len(uniq)):
            hs = np.unique(h[codes == g])
            lists.append(hs[:k].tolist())
        return pa.table(
            {key_col: uniq, "h": pa.array(lists, pa.list_(pa.uint64()))}
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc: dict = {}
    for r in parts:
        hs = np.asarray(r["h"], dtype=np.uint64)
        cur = acc.get(r[key_col])
        merged = hs if cur is None else np.concatenate([cur, hs])
        acc[r[key_col]] = np.unique(merged)[:k]
    if len(acc) > max_groups:
        raise ValueError(
            f"kmv_sketches: {len(acc)} groups > max_groups={max_groups}"
        )
    return acc


def kmv_estimate_intersections(sketches: dict, k: int = 64) -> pa.Table:
    """Pairwise distinct-intersection estimates from KMV sketches —
    the standard theta-sketch combine: θ = min of the two sketches'
    normalized kth minima, intersect the hash sets below θ, estimate
    |A∩B| ≈ |∩ below θ| / θ. Deterministic: exact integer set ops plus
    one float expression per pair (the oracle recomputes identically).
    A sketch with fewer than k hashes is EXACT (θ = 1)."""
    span = np.float64(2.0) ** 64
    rows = []
    names = sorted(sketches)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ha, hb = sketches[a], sketches[b]
            tha = (
                np.float64(1.0)
                if len(ha) < k
                else (np.float64(ha[k - 1]) + 1.0) / span
            )
            thb = (
                np.float64(1.0)
                if len(hb) < k
                else (np.float64(hb[k - 1]) + 1.0) / span
            )
            th = min(tha, thb)
            cut = np.uint64(min(int(th * span) - 1, (1 << 64) - 1))
            inter = np.intersect1d(ha[ha <= cut], hb[hb <= cut])
            est = float(np.float64(len(inter)) / th)
            rows.append(
                {
                    "type_a": a,
                    "type_b": b,
                    "n_common_hashes": len(inter),
                    "est_intersection": est,
                }
            )
    return pa.Table.from_pylist(rows)


# ---------------------------------------------- Poisson bootstrap CI


_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — pure uint64 integer ops, so
    bitwise identical at any position/layout (unlike float kernels,
    nothing here depends on SIMD rounding)."""
    z = (x + _SM_GAMMA).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


# P(Poisson(1) <= k) for k = 0..12 — inverse-CDF table for weights
_POIS1_CDF = np.cumsum(
    np.exp(-1.0) / np.cumprod(np.concatenate([[1.0], np.arange(1.0, 13.0)]))
)


def poisson_bootstrap_mean(
    ds,
    id_col: str,
    value_col: str,
    reps: int = 50,
    seed: int = 7,
) -> pa.Table:
    """Distributed bootstrap CI for the mean of an integer column via
    the POISSON bootstrap — the resampling scheme that works when data
    never fits one machine: resample weights w ~ Poisson(1) are drawn
    PER ROW from a content-stable hash (splitmix64(id, rep, seed) →
    inverse CDF), so every replicate's weighted sums are exact-int
    combiner partials (2 ints per (rep, block)) and the whole B-replicate
    bootstrap is ONE streaming pass, reproducible at any layout.
    Driver: B weighted means, percentile CI by sorted pick. Output one
    row: (n_rows, mean, ci_lo, ci_hi, reps) with mean = exact-int
    division and CI bounds exact replicate means."""

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "rep": pa.array([], pa.int64()),
                    "sw": pa.array([], pa.int64()),
                    "swc": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sc": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(t[id_col], dtype=np.int64).view(np.uint64)
        c = np.asarray(t[value_col], dtype=np.int64)
        base = _splitmix64(ids ^ np.uint64(seed))
        rep_ids, sws, swcs, ns, scs = [], [], [], [], []
        for r in range(reps):
            h = _splitmix64(base + np.uint64(r + 1))
            u = (h >> np.uint64(11)).astype(np.float64) / np.float64(1 << 53)
            w = np.searchsorted(_POIS1_CDF, u).astype(np.int64)
            rep_ids.append(r)
            sws.append(int(w.sum()))
            swcs.append(int((w * c).sum()))
            ns.append(n if r == 0 else 0)
            scs.append(int(c.sum()) if r == 0 else 0)
        return pa.table(
            {
                "rep": pa.array(rep_ids, pa.int64()),
                "sw": pa.array(sws, pa.int64()),
                "swc": pa.array(swcs, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "sc": pa.array(scs, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    agg = {r: [0, 0] for r in range(reps)}
    n_rows = 0
    sc = 0
    for row in parts:
        a = agg[row["rep"]]
        a[0] += row["sw"]
        a[1] += row["swc"]
        n_rows += row["n"]
        sc += row["sc"]
    means = sorted(
        float(np.float64(agg[r][1]) / np.float64(agg[r][0]))
        for r in range(reps)
        if agg[r][0]
    )
    lo = means[int(np.floor(0.025 * len(means)))]
    hi = means[min(len(means) - 1, int(np.ceil(0.975 * len(means))) - 1)]
    mean = float(np.float64(sc) / np.float64(n_rows)) if n_rows else None
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "mean_cents": pa.array([mean], pa.float64()),
            "ci_lo": pa.array([lo], pa.float64()),
            "ci_hi": pa.array([hi], pa.float64()),
            "reps": pa.array([reps], pa.int64()),
        }
    )


@ray.remote
def _ks_block_sums(t: "pa.Table") -> "tuple[int, int]":
    if t.num_rows == 0:
        return 0, 0
    return (
        int(pc.sum(t["n1"]).as_py() or 0),
        int(pc.sum(t["n2"]).as_py() or 0),
    )


@ray.remote
def _ks_block_max(t: "pa.Table", b1: int, b2: int, N1: int, N2: int) -> int:
    if t.num_rows == 0:
        return 0
    c1 = b1 + np.cumsum(np.asarray(t["n1"], np.int64))
    c2 = b2 + np.cumsum(np.asarray(t["n2"], np.int64))
    return int(np.max(np.abs(c1 * N2 - c2 * N1)))


def ks_two_sample(ds, value_col: str, cohort_col: str) -> pa.Table:
    """Exact two-sample Kolmogorov–Smirnov statistic between cohort 0
    and cohort 1 rows — the distribution-level drift test completing
    the audit family (type_drift = mean-level KL, value_ranksum =
    location shift; KS is sup-norm ECDF distance, sensitive to ANY
    distributional change).

    All-integer until one final division: per-block (value, n1, n2)
    combiner partials → one value-sorted group-agg exchange → a
    two-ints-per-block metadata pass (exclusive prefix bases, the
    distributed-scan shape of window.global_scan_sum) → per-block
    max |c1·N2 − c2·N1| partials → driver max. Ties are handled
    exactly (the ECDF is evaluated after each distinct value's whole
    tie group). D = max/(N1·N2) — exact at any parallelism. Loud
    guard: N1·N2 must fit int64 (N ≤ ~3·10⁹ per cohort; past that,
    scale the integers by gcd or use the two-scan float128 form).
    Returns a 1-row table (n1, n2, d_num, d_den, d:float64)."""
    from .exchange import sorted_mat

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {value_col: pa.array([], pa.int64()),
                 "n1": pa.array([], pa.int64()),
                 "n2": pa.array([], pa.int64())}
            )
        g = np.asarray(t[cohort_col], np.int64)
        tb = pa.table(
            {
                "v": t[value_col],
                "n1": pa.array((g == 0).astype(np.int64)),
                "n2": pa.array((g == 1).astype(np.int64)),
            }
        )
        a = tb.group_by(["v"]).aggregate([("n1", "sum"), ("n2", "sum")])
        return pa.table(
            {
                value_col: a["v"],
                "n1": pc.cast(a["n1_sum"], pa.int64()),
                "n2": pc.cast(a["n2_sum"], pa.int64()),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    agg = sorted_group_agg(
        parts, [value_col], [("n1", "sum", "n1"), ("n2", "sum", "n2")]
    )
    mat = sorted_mat(agg, [value_col])
    refs = mat.to_arrow_refs()
    sums = ray.get([_ks_block_sums.remote(r) for r in refs]) if refs else []
    N1 = sum(s[0] for s in sums)
    N2 = sum(s[1] for s in sums)
    if N1 == 0 or N2 == 0:
        raise ValueError("ks_two_sample: both cohorts must be non-empty")
    if N1 * N2 >= (1 << 62):
        raise ValueError(
            "ks_two_sample: N1*N2 overflows the exact int64 numerator — "
            "rescale (gcd) or use a two-pass float form at this size"
        )
    b1 = b2 = 0
    maxes = []
    for r, (s1, s2) in zip(refs, sums):
        maxes.append(_ks_block_max.remote(r, b1, b2, N1, N2))
        b1 += s1
        b2 += s2
    d_num = max(ray.get(maxes)) if maxes else 0
    return pa.table(
        {
            "n1": pa.array([N1], pa.int64()),
            "n2": pa.array([N2], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "d_den": pa.array([N1 * N2], pa.int64()),
            "d": pa.array([d_num / (N1 * N2)], pa.float64()),
        }
    )
