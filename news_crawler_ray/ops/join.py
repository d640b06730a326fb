"""Sort-merge anti/semi join — key-membership joins without a hash shuffle.

The reference's membership joins are Python-set lookups in a serial
loop (exclusion filter /root/reference/src/secbot/fetchers/news.py and
the seen-set check); re-expressed at data scale they are anti/semi
joins. ``Dataset.join`` works but pays the hash-shuffle aggregator-pool
startup (~7 s fixed per op in-sandbox, anti-scaling with CPUs —
BASELINE.md round-2 measurements). This module uses the engine's
task-based exchange instead:

1. tag LEFT rows ``_side=0`` (payload kept) and RIGHT rows ``_side=1``
   (projected to the key, payload columns nulled to unify the schema);
2. one range-partition sort of the union by ``(key, _side desc)`` —
   right rows of a key sort BEFORE its left rows;
3. per block (task-parallel): vectorized run detection over the key
   column; a run "has right" iff any ``_side==1`` row is present; anti
   keeps left rows of runs WITHOUT a right row, semi keeps runs WITH;
4. the O(num_blocks) keys straddling block boundaries are decided by a
   second distributed round: each block reports one has-right BIT per
   straddle key (num_blocks × num_straddle_keys bits driver-side — no
   raw rows ever ship to the driver, so a hot key cannot flood it),
   the driver ORs the bits, and each block filters its own straddle
   rows against the global decision.

Equal exchange volume to the hash plan (every row moves once), no
per-op actor-pool startup. Broadcast (``ray.put`` a key set) remains
the better plan when the RIGHT side is small — this is for two
data-scale sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .exchange import sorted_mat

from .agg import _first_last_tuple, _key_mask

_SIDE = "_side"


def _run_ids(col) -> tuple[np.ndarray, np.ndarray]:
    """(run_starts, run_id_per_row) over a sorted column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if n == 1:
        return np.zeros(1, np.int64), np.zeros(1, np.int64)
    neq = pc.fill_null(
        pc.not_equal(col.slice(1), col.slice(0, n - 1)), True
    ).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    run_ids = np.concatenate([[0], np.cumsum(neq)]).astype(np.int64)
    return starts, run_ids


def _membership_kernel(tbl: pa.Table, key: str, anti: bool) -> pa.Table:
    """Anti/semi decision for a block that contains EVERY row of each
    key it contains (guaranteed post-sort for non-straddling keys)."""
    if tbl.num_rows == 0:
        return tbl.drop_columns([_SIDE])
    starts, run_ids = _run_ids(tbl[key])
    is_right = np.asarray(tbl[_SIDE]) == 1
    has_right = np.logical_or.reduceat(is_right, starts)
    keep = ~is_right & (has_right[run_ids] ^ anti)
    return tbl.filter(pa.array(keep)).drop_columns([_SIDE])


@ray.remote(num_returns=3)
def _kernel_split(tbl: pa.Table, key: str, straddle_keys, anti: bool):
    """(decided rows for non-straddle keys,
        this block's rows of straddle keys,
        has-right bit per straddle key — block-local)."""
    mask = _key_mask(tbl, [key], straddle_keys)
    if not mask.any():
        return (
            _membership_kernel(tbl, key, anti),
            tbl.slice(0, 0),
            np.zeros(len(straddle_keys), dtype=bool),
        )
    m = pa.array(mask)
    straddle = tbl.filter(m)
    is_right = np.asarray(straddle[_SIDE]) == 1
    bits = np.zeros(len(straddle_keys), dtype=bool)
    for i, kt in enumerate(straddle_keys):
        bits[i] = bool((_key_mask(straddle, [key], [kt]) & is_right).any())
    return _membership_kernel(tbl.filter(pc.invert(m)), key, anti), straddle, bits


@ray.remote
def _filter_straddle_left(tbl: pa.Table, key: str, keep_keys) -> pa.Table:
    """Left rows of this block whose straddle key survived the global
    decision (keep_keys = keys where has_right XOR anti is true)."""
    if tbl.num_rows == 0:
        return tbl.drop_columns([_SIDE])
    is_left = np.asarray(tbl[_SIDE]) == 0
    keep = is_left & (
        _key_mask(tbl, [key], keep_keys) if keep_keys else np.zeros(tbl.num_rows, bool)
    )
    return tbl.filter(pa.array(keep)).drop_columns([_SIDE])


def sort_merge_membership_join(left, right, key: str, anti: bool = True):
    """Anti (``anti=True``) or semi join of ``left`` against ``right``'s
    key set, via one task-based sort exchange. Returns left's columns."""
    import ray.data as rd

    schema = left.schema()  # ray.data Schema: .names + pyarrow .types
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column(_SIDE, pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n == key:
                cols[n] = pc.cast(t[key], types[n])
            else:
                cols[n] = pa.nulls(t.num_rows, types[n])
        cols[_SIDE] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    mat = sorted_mat(tagged, [key, _SIDE], descending=[False, True])
    refs = mat.to_arrow_refs()
    if not refs:
        return left.limit(0)
    metas = ray.get([_first_last_tuple.remote(r, [key]) for r in refs])
    straddle, prev_last = set(), None
    for first, last, n in metas:
        if n == 0:
            continue
        if prev_last is not None and first == prev_last:
            straddle.add(first)
        prev_last = last
    live = [r for r, (_, _, n) in zip(refs, metas) if n > 0]
    if not live:
        return left.limit(0)
    skeys = sorted(straddle, key=repr)
    out_refs, straddle_refs, bit_refs = [], [], []
    for r in live:
        decided, st, bits = _kernel_split.remote(r, key, skeys, anti)
        out_refs.append(decided)
        straddle_refs.append(st)
        bit_refs.append(bits)
    if skeys:
        # round 2: OR the per-block has-right bits (num_blocks ×
        # num_straddle_keys booleans — rows never leave their blocks),
        # then filter each block's straddle rows against the decision
        has_right = np.logical_or.reduce(ray.get(bit_refs))
        keep_keys = [kt for kt, hr in zip(skeys, has_right) if hr ^ anti]
        out_refs.extend(
            _filter_straddle_left.remote(st, key, keep_keys)
            for st in straddle_refs
        )
    return rd.from_arrow_refs(out_refs)


@ray.remote
def _asof_block(key: str, ts_col: str, right_cols: list, *parts: pa.Table) -> pa.Table:
    """As-of kernel for ONE key-complete block: forward-fill the last
    right row (<= ts) onto each left row — fully vectorized."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    idx = pc.sort_indices(
        tbl,
        sort_keys=[(key, "ascending"), (ts_col, "ascending"), (_SIDE, "ascending")],
    )
    s = tbl.take(idx)
    n = s.num_rows
    is_right = np.asarray(s[_SIDE]) == 0
    seed = np.where(is_right, np.arange(n), -1)
    f = np.maximum.accumulate(seed)  # index of last right row so far
    _, run_ids = _run_ids(s[key])
    valid = (f >= 0) & (run_ids[np.maximum(f, 0)] == run_ids)
    left_pos = np.flatnonzero(~is_right)
    lf, lvalid = f[left_pos], valid[left_pos]
    out = s.filter(pa.array(~is_right)).drop_columns([_SIDE] + list(right_cols))
    gather = pa.array(np.where(lvalid, lf, 0), pa.int64())
    mask = pa.array(lvalid)
    for rc in right_cols:
        vals = s[rc].combine_chunks().take(gather)
        out = out.append_column(
            rc, pc.if_else(mask, vals, pa.scalar(None, s.schema.field(rc).type))
        )
    return out


def sort_merge_asof_join(
    left,
    right,
    key: str,
    ts_col: str,
    right_cols: list[str],
):
    """As-of join (backward, inclusive): for each left row, attach
    ``right_cols`` from the LATEST right row of the same ``key`` with
    ``right.ts <= left.ts`` (null if none) — the operator Ray Data
    lacks, on the engine's task-based key-complete exchange
    (stages/index.key_complete_parts): tag sides, ONE range-partition
    sort by (key, ts, side) with right rows ordered before left at
    equal ts (inclusive match), donate boundary runs, forward-fill per
    block. No hash shuffle, no per-op actor pool.

    Determinism: make the right side unique per (key, ts) upstream
    (e.g. max-id per pair) — among duplicates the survivor is otherwise
    unspecified, exactly as in SQL ASOF JOIN.
    """
    from ..stages.index import key_complete_parts

    l_schema = left.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    out_names = l_names + [c for c in right_cols]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        for rc in right_cols:
            cols[rc] = pa.nulls(t.num_rows, r_types[rc])
        cols[_SIDE] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            if n == key or n == ts_col:
                cols[n] = pc.cast(t[n], l_types[n])
            else:
                cols[n] = pa.nulls(t.num_rows, l_types[n])
        for rc in right_cols:
            cols[rc] = t[rc]
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(tagged, key, order=[ts_col, _SIDE])
    if not groups:
        return left.limit(0)
    import ray.data as rd

    return rd.from_arrow_refs(
        [_asof_block.remote(key, ts_col, list(right_cols), *parts) for parts in groups]
    )


@ray.remote
def _range_block(
    key: str, ts_col: str, low_us: int, high_us: int,
    left_cols: list, right_cols: list, *parts: pa.Table,
) -> pa.Table:
    """Range kernel for ONE key-complete block: emit every (left, right)
    pair of the same key with right.ts in [left.ts+low, left.ts+high].
    Vectorized: two searchsorted probes per key run + repeat/gather —
    output size is window-bounded, never |L|×|R|."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    idx = pc.sort_indices(
        tbl,
        sort_keys=[(key, "ascending"), (_SIDE, "ascending"), (ts_col, "ascending")],
    )
    s = tbl.take(idx)
    is_right = np.asarray(s[_SIDE]) == 0
    ts = np.asarray(s[ts_col].cast(pa.int64()))
    starts, run_ids = _run_ids(s[key])
    ends = np.concatenate([starts[1:], [s.num_rows]])
    l_take: list[np.ndarray] = []
    r_take: list[np.ndarray] = []
    for st, en in zip(starts, ends):
        # within a run: right rows first (side 0), then left rows, each
        # ts-sorted — searchsorted the right slice per left row
        seg_right = is_right[st:en]
        n_r = int(seg_right.sum())
        if n_r == 0 or n_r == en - st:
            continue
        r_ts = ts[st : st + n_r]
        l_idx = np.arange(st + n_r, en)
        lo = np.searchsorted(r_ts, ts[l_idx] + low_us, side="left")
        hi = np.searchsorted(r_ts, ts[l_idx] + high_us, side="right")
        counts = hi - lo
        keep = counts > 0
        if not keep.any():
            continue
        l_take.append(np.repeat(l_idx[keep], counts[keep]))
        # concatenated aranges lo..hi per left row, vectorized
        ck, lk = counts[keep], lo[keep]
        offs = np.concatenate([[0], np.cumsum(ck)[:-1]])
        flat = np.arange(ck.sum()) - np.repeat(offs, ck) + np.repeat(lk, ck)
        r_take.append(st + flat)
    if not l_take:
        empty = {c: pa.array([], s.schema.field(c).type) for c in left_cols}
        for rc in right_cols:
            empty[rc] = pa.array([], s.schema.field(rc).type)
        return pa.table(empty)
    li = pa.array(np.concatenate(l_take), pa.int64())
    ri = pa.array(np.concatenate(r_take), pa.int64())
    cols = {c: s[c].combine_chunks().take(li) for c in left_cols}
    for rc in right_cols:
        cols[rc] = s[rc].combine_chunks().take(ri)
    return pa.table(cols)


def sort_merge_range_join(
    left,
    right,
    key: str,
    ts_col: str,
    right_cols: list[str],
    low: int,
    high: int,
):
    """Bounded range join: all (left, right) pairs of the same ``key``
    with ``right.ts`` in ``[left.ts + low, left.ts + high]`` (units of
    the ts column, e.g. microseconds; inclusive both ends). Same
    exchange as the as-of join — one task-based sort, boundary-run
    donation, per-block searchsorted probes. The window bound is what
    keeps this scale-safe: output is O(|L| × window density), never a
    cross product.
    """
    from ..stages.index import key_complete_parts

    l_schema = left.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        for rc in right_cols:
            cols[rc] = pa.nulls(t.num_rows, r_types[rc])
        cols[_SIDE] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            if n == key or n == ts_col:
                cols[n] = pc.cast(t[n], l_types[n])
            else:
                cols[n] = pa.nulls(t.num_rows, l_types[n])
        for rc in right_cols:
            cols[rc] = t[rc]
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(tagged, key, order=[_SIDE, ts_col])
    if not groups:
        return left.limit(0)
    import ray.data as rd

    return rd.from_arrow_refs(
        [
            _range_block.remote(
                key, ts_col, low, high, l_names, list(right_cols), *parts
            )
            for parts in groups
        ]
    )


def sort_merge_anti_join(left, right, key: str):
    """Left rows whose ``key`` has NO match in ``right`` (J2 exclusion
    semantics, ref news.py exclusion filter, at data scale)."""
    return sort_merge_membership_join(left, right, key, anti=True)


def sort_merge_semi_join(left, right, key: str):
    """Left rows whose ``key`` HAS a match in ``right``."""
    return sort_merge_membership_join(left, right, key, anti=False)


# ------------------------------------------------ bloom-prefilter semi join

_BLOOM_SEED = 3  # one job-wide seed: build and probe must hash identically


def _bloom_positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions by double hashing; ``m`` must be a power of
    two so the mask replaces a modulo."""
    mask = np.uint64(m - 1)
    h1 = h & mask
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)  # odd → full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & mask).astype(np.int64)


def _hash_key_column(col) -> np.ndarray:
    import polars as pl

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.from_arrow(col).hash(seed=_BLOOM_SEED).to_numpy().astype(np.uint64)


def bloom_semi_join(
    left, right, key: str, bits_per_key: int = 16, num_hashes: int = 7
):
    """Semi join where RIGHT is far smaller than LEFT but too large to
    broadcast as an exact key set: per-block bloom partials over right's
    keys (OR-merged driver-side — the bitmap is ``bits_per_key·|right|``
    bits regardless of block count), one ``ray.put`` broadcast, a
    block-local prefilter of left (no shuffle — the bulk of left never
    enters an exchange), then the exact sort-merge semi join over the
    survivors only, which removes bloom false positives. Result is
    therefore EXACT; the bloom only shrinks the exchange. At 16
    bits/key / 7 hashes the false-positive rate is ~5e-4, so the
    exchange sees ~|matches| rows instead of |left|. When right fits a
    plain set, broadcast that instead; when right is data-scale too,
    use sort_merge_semi_join directly (this bitmap broadcast is the
    scale knob in between — 10^9 right keys ≈ a 2 GB bitmap, per node
    once, vs shuffling a 100 TB left)."""
    import ray.data as rd  # noqa: F401

    # one execution of the right lineage: keys are materialized once and
    # reused by the count, the bloom build, and the exact verify (the
    # unmaterialized dataset would re-run its reads/maps three times)
    right_keys = right.select_columns([key]).materialize()
    n_right = right_keys.count()
    if n_right == 0:
        return left.limit(0)
    m = 1 << max(10, int(np.ceil(np.log2(n_right * bits_per_key))))

    def partial(t: pa.Table) -> pa.Table:
        # set bits directly on the PACKED array (m/8 bytes, not an
        # m-byte bool expansion — at 10^9 keys the bool form is 8x the
        # bitmap per block)
        packed_bits = np.zeros(m // 8, dtype=np.uint8)
        if t.num_rows:
            pos = _bloom_positions(_hash_key_column(t[key]), m, num_hashes).ravel()
            np.bitwise_or.at(
                packed_bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        return pa.table({"bits": pa.array([packed_bits.tobytes()], pa.binary())})

    packed = right_keys.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged = np.zeros(m // 8, dtype=np.uint8)
    for row in packed:
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    bloom_ref = ray.put(merged)

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        packed_bits = ray.get(bloom_ref)  # zero-copy plasma view per node
        pos = _bloom_positions(_hash_key_column(t[key]), m, num_hashes)
        hit = (
            packed_bits[pos >> 3] >> (pos & 7).astype(np.uint8)
        ) & np.uint8(1)
        return t.filter(pa.array(hit.all(axis=1)))

    survivors = left.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return sort_merge_semi_join(survivors, right_keys, key)


# ------------------------------------------------ snapshot diff (full-outer)


@ray.remote
def _diff_block(key_col: str, fp_col: str, *parts: pa.Table) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[(key_col, "ascending"), (_SIDE, "ascending")]
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    sides = np.asarray(tbl[_SIDE], dtype=np.int8)
    fps = tbl[fp_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    lens = np.diff(np.concatenate([starts, [n]]))
    if lens.max(initial=0) > 2:
        raise ValueError(
            f"snapshot_diff: duplicate {key_col} within one snapshot "
            f"(a key appeared {lens.max()} times across both sides)"
        )
    # singletons: present on one side only (vectorized verdicts)
    solo = starts[lens == 1]
    solo_status = np.where(sides[solo] == 0, "removed", "added")
    # pairs: changed iff fingerprints differ (sides sort 0 then 1); two
    # rows of the SAME side are a within-snapshot duplicate, not a pair
    pair_starts = starts[lens == 2]
    if len(pair_starts) and not (
        (sides[pair_starts] == 0) & (sides[pair_starts + 1] == 1)
    ).all():
        raise ValueError(
            f"snapshot_diff: duplicate {key_col} within one snapshot "
            "(a key appeared twice on the same side)"
        )
    if len(pair_starts):
        a = fps.take(pa.array(pair_starts, pa.int64()))
        b = fps.take(pa.array(pair_starts + 1, pa.int64()))
        diff = pc.not_equal(a, b).to_numpy(zero_copy_only=False)
        changed = pair_starts[diff]
    else:
        changed = np.zeros(0, dtype=np.int64)
    out_idx = np.concatenate([solo, changed]).astype(np.int64)
    statuses = np.concatenate([solo_status, np.full(len(changed), "changed")])
    return pa.table(
        {
            key_col: keys.take(pa.array(out_idx, pa.int64())),
            "status": pa.array(statuses.tolist(), pa.string()),
        }
    )


def snapshot_diff(a, b, key_col: str, fp_col: str):
    """Full-outer diff of two corpus snapshots by key + content
    fingerprint — the incremental-ingest primitive (which docs were
    added / removed / changed since the last crawl epoch). Both sides
    ship only (key, fingerprint) rows into ONE key-complete sort
    exchange (payloads never move); each key lands in exactly one
    kernel task, so the verdict is local: one side → added/removed,
    both sides → changed iff fingerprints differ, equal rows are
    omitted. Keys must be unique within each snapshot (raises loudly
    otherwise). Unchanged at 100 TB: the exchange volume is O(|keys|)
    narrow rows regardless of document size."""
    from ..stages.index import key_complete_parts

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: t[key_col],
                    fp_col: t[fp_col],
                    _SIDE: pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return f

    tagged = a.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        b.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(tagged, key_col, order=[_SIDE])
    if not groups:
        key_type = dict(zip(a.schema().names, a.schema().types))[key_col]
        return ray.data.from_arrow(
            pa.table(
                {key_col: pa.array([], key_type), "status": pa.array([], pa.string())}
            )
        )
    return ray.data.from_arrow_refs(
        [_diff_block.remote(key_col, fp_col, *parts) for parts in groups]
    )


# ------------------------------------------------ inner equi-join


@ray.remote
def _inner_join_block(
    key_col: str,
    left_cols: tuple,
    right_cols: tuple,
    max_pairs_per_key: int,
    left_outer: str,  # join mode: "inner" | "left" | "right" | "outer"
    *parts: pa.Table,
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[(key_col, "ascending"), (_SIDE, "ascending")]
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    sides = np.asarray(tbl[_SIDE], dtype=np.int8)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key).astype(np.int64)
    ends = np.concatenate([starts[1:], [n]])
    # per run: side0 rows are [start, start+c0), side1 rows the rest
    c_total = ends - starts
    # count of side-1 rows per run via cumulative sum of the side flags
    csum = np.concatenate([[0], np.cumsum(sides, dtype=np.int64)])
    c1 = csum[ends] - csum[starts]
    c0 = c_total - c1
    pairs = c0 * c1
    if pairs.max(initial=0) > max_pairs_per_key:
        raise ValueError(
            f"inner join key with {pairs.max()} output pairs exceeds "
            f"max_pairs_per_key={max_pairs_per_key} (hot-key guard; raise "
            "the cap or pre-aggregate the many-side)"
        )
    T = int(pairs.sum())
    out_cols: dict = {}
    if T == 0:
        li = np.zeros(0, np.int64)
        ri = np.zeros(0, np.int64)
    else:
        live = pairs > 0
        run_rep = np.repeat(np.flatnonzero(live), pairs[live])
        off = np.arange(T, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(pairs[live])])[:-1], pairs[live]
        )
        c1_rep = c1[run_rep]
        li = starts[run_rep] + off // c1_rep
        ri = starts[run_rep] + c0[run_rep] + off % c1_rep
    if left_outer in ("left", "outer"):
        # keys with no right row: keep their left rows, null right cols
        lone = np.flatnonzero((c1 == 0) & (c0 > 0))
        if len(lone):
            extra = np.concatenate(
                [np.arange(starts[r], starts[r] + c0[r]) for r in lone.tolist()]
            ).astype(np.int64)
            li = np.concatenate([li, extra])
            ri = np.concatenate([ri, np.full(len(extra), -1, np.int64)])
    if left_outer in ("right", "outer"):
        # keys with no left row: keep their right rows, null left cols
        rone = np.flatnonzero((c0 == 0) & (c1 > 0))
        if len(rone):
            extra = np.concatenate(
                [np.arange(starts[r], starts[r] + c1[r]) for r in rone.tolist()]
            ).astype(np.int64)
            li = np.concatenate([li, np.full(len(extra), -1, np.int64)])
            ri = np.concatenate([ri, extra])
    # negative index marks the null-padded side: a null take-index
    # yields a null output row, no per-row Python; the key always comes
    # from whichever side is present
    li_arr = pa.array(li, type=pa.int64(), mask=li < 0)
    ri_arr = pa.array(ri, type=pa.int64(), mask=ri < 0)
    ki = np.where(li >= 0, li, ri)
    out_cols[key_col] = keys.take(pa.array(ki, pa.int64()))
    for c in left_cols:
        out_cols[c] = tbl[c].take(li_arr)
    for c in right_cols:
        out_cols[c] = tbl[c].take(ri_arr)
    return pa.table(out_cols)


def sort_merge_inner_join(
    left,
    right,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    right_key: str | None = None,
    max_pairs_per_key: int = 1 << 20,
    how: str = "inner",
):
    """General inner / left-outer equi-join of two DATA-SCALE sides on the
    task-based key-complete exchange (no hash-shuffle aggregator pools
    — BASELINE.md round-2 findings): both sides ship once, each key's
    rows land in exactly one kernel task, and the per-key cartesian is
    assembled by pure offset arithmetic (no per-row Python). Column
    sets must be disjoint; ``right_key`` renames the right side's key
    onto ``key``. Skew: a hot key's entire output materializes in its
    owner task — ``max_pairs_per_key`` raises loudly instead of
    silently exploding (broadcast the small side or pre-aggregate when
    you hit it). ``how="left"`` keeps unmatched left rows with nulled
    right columns; ``how="right"`` keeps unmatched right rows with
    nulled left columns; ``how="outer"`` keeps both (the key always
    comes from whichever side is present). Output columns:
    [key, *left_cols, *right_cols]."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(
            f"how must be 'inner', 'left', 'right' or 'outer', got {how!r}"
        )
    from ..stages.index import key_complete_parts

    # null columns need concrete types: take them from each side's schema
    lsch, rsch = left.schema(), right.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))

    def tag_typed(side: int):
        def f(t: pa.Table) -> pa.Table:
            out = {key: t[(right_key or key)] if side else t[key]}
            for c in left_cols:
                out[c] = t[c] if side == 0 else pa.nulls(t.num_rows, ltypes[c])
            for c in right_cols:
                out[c] = t[c] if side == 1 else pa.nulls(t.num_rows, rtypes[c])
            out[_SIDE] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(out)

        return f

    tagged = left.map_batches(
        tag_typed(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_typed(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(tagged, key, order=[_SIDE])
    if not groups:
        # empty output in the documented join schema, not raw left
        cols = {key: pa.array([], ltypes[key])}
        for c in left_cols:
            cols[c] = pa.array([], ltypes[c])
        for c in right_cols:
            cols[c] = pa.array([], rtypes[c])
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(
        [
            _inner_join_block.remote(
                key, tuple(left_cols), tuple(right_cols), max_pairs_per_key,
                how, *parts
            )
            for parts in groups
        ]
    )


# ------------------------------------------------- skew-aware equi-join


def skew_join(
    left,
    right,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    right_key: str | None = None,
    hot_threshold: int = 100_000,
    max_broadcast_rows: int = 5_000_000,
    max_pairs_per_key: int = 1 << 20,
    how: str = "inner",
):
    """Equi-join with explicit hot-key handling — the scale answer to
    the one failure mode of :func:`sort_merge_inner_join`: a key with
    millions of LEFT rows lands them all in one exchange task. Plan:

    1. exact left-side key counts (narrow (key, n) combiner partials →
       one small exchange over the distinct-key domain);
    2. keys with count > ``hot_threshold`` become the HOT set; their
       right-side rows are filtered block-locally (no exchange),
       bounded by ``max_broadcast_rows``, and broadcast once via
       ``ray.put`` (plasma-shared per node, not re-shipped per batch);
    3. hot left rows join map-side against the broadcast (sorted-run
       binary search + offset-arithmetic cartesian — no per-row
       Python, and crucially NO exchange for the skewed rows);
    4. cold rows take the normal sort-merge exchange; the two outputs
       union. Result is row-identical to the plain join at any ``how``
       (unmatched HOT left rows only matter for left/outer — padded in
       the map-side kernel; hot keys always match on the left by
       construction, so right/outer padding stays on the cold path).

    Use when one side's key histogram is Zipf-ish (crawl frontiers by
    host, events by power user). The hot set is assumed SMALL (it's the
    head of the distribution); the right rows per hot key must fit the
    broadcast budget — both guarded loudly."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(
            f"how must be 'inner', 'left', 'right' or 'outer', got {how!r}"
        )
    from .agg import sorted_group_agg

    rk = right_key or key

    def kpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 "n": pa.array([], pa.int64())}
            )
        g = t.group_by([key]).aggregate([([], "count_all")])
        return pa.table({key: g[key], "n": pc.cast(g["count_all"], pa.int64())})

    counts = sorted_group_agg(
        left.map_batches(kpart, batch_format="pyarrow", zero_copy_batch=True),
        [key],
        [("n", "sum", "n")],
    )
    hot_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], hot_threshold)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # the head of the key histogram: tiny by assumption
    hot_keys = sorted(r[key] for r in hot_rows)
    if not hot_keys:
        return sort_merge_inner_join(
            left, right, key, left_cols, right_cols, right_key=right_key,
            max_pairs_per_key=max_pairs_per_key, how=how,
        )
    hot_arr = pa.array(hot_keys)
    left_hot_n = {r[key]: r["n"] for r in hot_rows}

    # Exact right-side counts for the hot keys (combiner partials →
    # driver merge; ≤ len(hot_keys) rows per block). Splits the hot set:
    # keys whose right rows fit the broadcast budget take the map-side
    # path; the remainder (hot on BOTH sides) take a SALTED exchange.
    key_type = hot_arr.type

    def rcount(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.is_in(t[rk], value_set=hot_arr))
        if t2.num_rows == 0:
            return pa.table(
                {key: pa.array([], key_type), "n": pa.array([], pa.int64())}
            )
        g = t2.group_by([rk]).aggregate([([], "count_all")])
        return pa.table({key: g[rk], "n": pc.cast(g["count_all"], pa.int64())})

    from collections import Counter

    rn: Counter = Counter()
    for r in right.map_batches(
        rcount, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        rn[r[key]] += r["n"]
    bcast_keys: list = []
    super_keys: list = []
    cum = 0
    for k in sorted(hot_keys, key=lambda k: rn.get(k, 0)):
        c = rn.get(k, 0)
        if cum + c <= max_broadcast_rows:
            bcast_keys.append(k)
            cum += c
        else:
            super_keys.append(k)
    bcast_keys.sort()
    super_keys.sort()

    outs = []
    if super_keys:
        outs.append(
            _salted_hot_join(
                left, right, key, rk, left_cols, right_cols, super_keys,
                left_hot_n, hot_threshold, max_pairs_per_key,
            )
        )
    if not bcast_keys:
        cold_left = left.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t[key], value_set=hot_arr))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        cold_right = right.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t[rk], value_set=hot_arr))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        cold_out = sort_merge_inner_join(
            cold_left, cold_right, key, left_cols, right_cols,
            right_key=right_key, max_pairs_per_key=max_pairs_per_key, how=how,
        )
        for o in outs:
            cold_out = cold_out.union(o)
        return cold_out
    bcast_arr = pa.array(bcast_keys)

    right_hot_tbl = pa.concat_tables(
        [
            b
            for b in right.map_batches(
                lambda t: t.filter(pc.is_in(t[rk], value_set=bcast_arr)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).iter_batches(batch_format="pyarrow")
        ]
        or [
            pa.table(
                {
                    rk: pa.array([], hot_arr.type),
                    **{
                        c: pa.array(
                            [], dict(zip(right.schema().names, right.schema().types))[c]
                        )
                        for c in right_cols
                    },
                }
            )
        ]
    )
    right_hot_tbl = right_hot_tbl.select([rk] + list(right_cols))
    right_hot_tbl = right_hot_tbl.take(
        pc.sort_indices(right_hot_tbl, sort_keys=[(rk, "ascending")])
    )
    rh_keys = np.asarray(right_hot_tbl[rk])
    run_new = np.empty(len(rh_keys), dtype=bool)
    if len(rh_keys):
        run_new[0] = True
        run_new[1:] = rh_keys[1:] != rh_keys[:-1]
    starts = np.flatnonzero(run_new)
    lens = np.diff(np.concatenate([starts, [len(rh_keys)]]))
    dim_ref = ray.put((rh_keys[starts] if len(rh_keys) else rh_keys,
                       starts, lens, right_hot_tbl))
    pad_left = how in ("left", "outer")

    def hot_map(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[key], value_set=bcast_arr))
        uk, st, ln, rtbl = ray.get(dim_ref)  # plasma-local after first batch
        lk = np.asarray(t[key])
        n = len(lk)
        if len(uk):
            pos = np.searchsorted(uk, lk)
            posc = np.minimum(pos, len(uk) - 1)
            matched = (pos < len(uk)) & (uk[posc] == lk)
        else:
            posc = np.zeros(n, np.int64)
            matched = np.zeros(n, dtype=bool)
        c1 = np.where(matched, ln[posc], 0)
        if pad_left:
            c1 = np.maximum(c1, 1)  # unmatched left row → one null-padded row
        T = int(c1.sum())
        live = c1 > 0
        row_rep = np.repeat(np.flatnonzero(live), c1[live])
        cum = np.concatenate([[0], np.cumsum(c1[live])])
        off = np.arange(T, dtype=np.int64) - np.repeat(cum[:-1], c1[live])
        m_rep = matched[row_rep]
        ri = np.where(m_rep, st[posc[row_rep]] + off, -1)
        ri_arr = pa.array(ri, type=pa.int64(), mask=ri < 0)
        rep_arr = pa.array(row_rep, pa.int64())
        out = {key: t[key].take(rep_arr)}
        for c in left_cols:
            out[c] = t[c].take(rep_arr)
        for c in right_cols:
            out[c] = rtbl[c].take(ri_arr)
        return pa.table(out)

    hot_out = left.map_batches(
        hot_map, batch_format="pyarrow", zero_copy_batch=True
    )
    cold_left = left.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[key], value_set=hot_arr))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cold_right = right.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[rk], value_set=hot_arr))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cold_out = sort_merge_inner_join(
        cold_left, cold_right, key, left_cols, right_cols, right_key=right_key,
        max_pairs_per_key=max_pairs_per_key, how=how,
    )
    out = hot_out.union(cold_out)
    for o in outs:
        out = out.union(o)
    return out


def _salted_hot_join(
    left,
    right,
    key: str,
    rk: str,
    left_cols: list,
    right_cols: list,
    super_keys: list,
    left_hot_n: dict,
    hot_threshold: int,
    max_pairs_per_key: int,
):
    """Both-sides-hot fallback for :func:`skew_join`: keys too hot on
    the LEFT for one exchange task AND with too many RIGHT rows to
    broadcast. Classic salting — each left row gets a salt in [0, S);
    right rows are replicated once per salt; the join runs on the
    composite ``key\\x00salt`` string, so one key's pair work spreads
    over S exchange tasks instead of one. Output is row-identical to
    the plain join for every ``how``: a both-sides-hot key by
    definition has rows on BOTH sides, so no outer padding can fire for
    these keys — the sub-join is always inner. The cost is shipping the
    super-hot right rows S times; S scales with the left excess
    (ceil(max left count / hot_threshold), capped 64) so the replica
    volume stays proportional to the skew it removes."""
    S = int(min(64, max(2, -(-max(left_hot_n[k] for k in super_keys) // hot_threshold))))
    sup_arr = pa.array(super_keys)
    salts_str = pa.array([str(s) for s in range(S)])

    def salt_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[key], value_set=sup_arr))
        salt = pa.array(
            (np.arange(t.num_rows, dtype=np.int64) % S).astype(np.int64)
        )
        sk = pc.binary_join_element_wise(
            pc.cast(t[key], pa.string()), pc.cast(salt, pa.string()), "\x00"
        )
        return t.append_column("_sk", sk)

    def salt_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[rk], value_set=sup_arr))
        n = t.num_rows
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), S)))
        sk = pc.binary_join_element_wise(
            pc.cast(rep[rk], pa.string()),
            salts_str.take(pa.array(np.tile(np.arange(S, dtype=np.int64), n))),
            "\x00",
        )
        return rep.append_column("_sk", sk)

    sj = sort_merge_inner_join(
        left.map_batches(salt_left, batch_format="pyarrow", zero_copy_batch=True),
        right.map_batches(salt_right, batch_format="pyarrow", zero_copy_batch=True),
        "_sk",
        [key] + list(left_cols),
        list(right_cols),
        right_key="_sk",
        max_pairs_per_key=max_pairs_per_key,
        how="inner",
    )
    keep = [key] + list(left_cols) + list(right_cols)
    return sj.map_batches(
        lambda t: t.select(keep), batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------- SQL set operations


def set_op(left, right, keys: list[str], op: str):
    """SQL INTERSECT / EXCEPT (distinct semantics) between two
    data-scale sides in ONE exchange: each side tags a 0/1 origin
    column, the union rides a single sorted group-aggregate keyed on
    ``keys`` with min/max of the tag, and presence-on-both-sides (or
    left-only) is a block-local filter on the two aggregates. No
    second distinct pass — the group-agg IS the dedup."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    from .agg import sorted_group_agg

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    **{k: t[k] for k in keys},
                    "_side": pa.array(
                        np.full(t.num_rows, side, np.int64), pa.int64()
                    ),
                }
            )

        return f

    both = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    agg = sorted_group_agg(
        both, keys, [("mn", "min", "_side"), ("mx", "max", "_side")]
    )
    want_mx = 1 if op == "intersect" else 0

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["mn"], 0), pc.equal(t["mx"], want_mx))
        return t.filter(mask).select(keys)

    return agg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def set_intersect(left, right, keys: list[str]):
    """SQL INTERSECT: distinct ``keys`` rows present on BOTH sides."""
    return set_op(left, right, keys, "intersect")


def set_except(left, right, keys: list[str]):
    """SQL EXCEPT: distinct ``keys`` rows on the left and NOT right."""
    return set_op(left, right, keys, "except")


# ------------------------------------------------------------- upsert / CDC


def upsert(base, changes, key: str, version_col: str, value_cols: list[str]):
    """MERGE latest-wins (SCD type 1 / CDC apply): the ``changes`` rows
    replace same-key ``base`` rows when their version is >=; new keys
    append. One tagged union + one key-complete rank (group_top_k k=1
    ordered by version desc then change-side-first), so the merge is a
    single exchange and per-key offset arithmetic — no driver-side
    state, no hash shuffle. Column sets must match
    ``[key, version_col, *value_cols]`` on both sides. Output drops
    the helper tag and keeps [key, version_col, *value_cols]."""
    from .agg import group_top_k

    cols = [key, version_col, *value_cols]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            out = {c: t[c] for c in cols}
            out["_src"] = pa.array(np.full(t.num_rows, side, np.int64), pa.int64())
            return pa.table(out)

        return f

    both = base.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        changes.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    top = group_top_k(
        both, key, [version_col, "_src"], [True, True], k=1
    )
    return top.map_batches(
        lambda t: t.select(cols), batch_format="pyarrow"
    )


# ------------------------------------------------- interval overlap join


@ray.remote
def _interval_block(
    key: str, max_pairs_per_key: int, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    t = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    keys = t[key].combine_chunks()
    side = np.asarray(t["_side"], dtype=np.int64)
    start = np.asarray(t["_s"], dtype=np.int64)
    end = np.asarray(t["_e"], dtype=np.int64)
    iid = np.asarray(t["_id"], dtype=np.int64)
    n = t.num_rows
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(
            keys.slice(1), keys.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    runs = np.flatnonzero(new_key).tolist() + [n]
    out_k, out_l, out_r = [], [], []
    for s0, s1 in zip(runs, runs[1:]):
        seg = np.arange(s0, s1)
        li = seg[side[s0:s1] == 0]
        ri = seg[side[s0:s1] == 1]
        if not len(li) or not len(ri):
            continue
        order = np.argsort(start[ri], kind="stable")
        rs, re_, rid = start[ri][order], end[ri][order], iid[ri][order]
        emitted = 0
        for i in li:
            hi = int(np.searchsorted(rs, end[i], side="left"))  # rs < le
            if not hi:
                continue
            mask = re_[:hi] > start[i]  # re > ls
            hits = np.flatnonzero(mask)
            emitted += len(hits)
            if emitted > max_pairs_per_key:
                raise ValueError(
                    f"interval_overlap_join: key {keys[s0]!r} exceeds "
                    f"{max_pairs_per_key} pairs — cap interval spans or "
                    "pre-bucket time upstream"
                )
            out_k.extend([s0] * len(hits))
            out_l.extend([int(iid[i])] * len(hits))
            out_r.extend(int(rid[j]) for j in hits)
    return pa.table(
        {
            key: keys.take(pa.array(out_k, pa.int64())),
            "left_id": pa.array(out_l, pa.int64()),
            "right_id": pa.array(out_r, pa.int64()),
        }
    )


def interval_overlap_join(
    left,
    right,
    key: str,
    max_pairs_per_key: int = 1 << 20,
):
    """Interval-overlap join: all (left, right) pairs of the same
    ``key`` whose half-open intervals intersect
    (``l.start < r.end AND r.start < l.end``) — the sessions×campaigns
    / readings×outages primitive the equi/as-of/range family can't
    express. Both sides carry columns (key, _s, _e, _id); ONE
    key-complete exchange on the tagged union, then per key run the
    right side sorts by start and each left interval takes a
    searchsorted prefix (start < l.end) filtered by end > l.start —
    no all-pairs; a loud per-key pair cap guards pathological spans.
    Output: (key, left_id, right_id)."""
    import ray.data

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: t[key],
                    "_side": pa.array(
                        np.full(t.num_rows, side, np.int64), pa.int64()
                    ),
                    "_s": pc.cast(t["_s"], pa.int64()),
                    "_e": pc.cast(t["_e"], pa.int64()),
                    "_id": pc.cast(t["_id"], pa.int64()),
                }
            )

        return fn

    from ..stages.index import key_complete_parts

    both = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
    groups = key_complete_parts(both, key, order=["_side", "_s", "_id"])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _interval_block.remote(key, max_pairs_per_key, *p)
            for p in groups
        ]
    )
