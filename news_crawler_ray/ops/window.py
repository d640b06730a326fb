"""Gap-based sessionization — the engine's streaming-window operator.

Ray Data has no window primitive, so sessions (runs of per-user events
separated by gaps ≤ ``gap``) are computed with the engine's task-based
key-complete exchange (stages/index.key_complete_parts): one
range-partition sort on ``(user, ts, id)``, boundary-run donation so
every user's events land in exactly one task, then a vectorized
per-block kernel. No hash shuffle, no actor pool, no driver row loop —
driver traffic is 3 metadata values per block.

Semantics (and the DuckDB-oracle equivalent, pipelines/queries):
a NEW session starts at a user's first event and whenever
``ts - prev_ts > gap``; sessions are numbered 1.. per user in
``(ts, id)`` order. Output is one row per session with exact bounds.

This generalizes the reference's day-window semantics
(/root/reference/src/secbot/scheduler.py:43-44 day-scoped seen files →
tumbling windows) to data-driven windows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .exchange import sorted_mat
import ray.data



def _session_breaks(
    tbl: pa.Table, user_col: str, ts_col: str, id_col: str, gap_us: int
):
    """Shared session-break kernel: sort by (user, ts, id) and return
    (sorted_table, new_user, new_session, per-row 1-based session_num).
    ONE implementation serves both the summary (sessionize) and the
    assignment (session_assign) forms, so gap semantics cannot drift."""
    s = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[
                (user_col, "ascending"),
                (ts_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
    )
    n = s.num_rows
    users = s[user_col].combine_chunks()
    ts = np.asarray(s[ts_col].cast(pa.int64()))
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    if n > 1:
        new_user[1:] = pc.not_equal(users.slice(1), users.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    gap_break = np.empty(n, dtype=bool)
    gap_break[0] = True
    if n > 1:
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
    new_s = new_user | gap_break
    snum_global = np.cumsum(new_s)  # 1-based global session number
    user_first = np.maximum.accumulate(np.where(new_user, snum_global, 0))
    session_num = snum_global - user_first + 1
    return s, new_user, new_s, session_num


@ray.remote
def _session_block(
    gap_us: int, user_col: str, ts_col: str, id_col: str, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s, new_user, new_s, _ = _session_breaks(tbl, user_col, ts_col, id_col, gap_us)
    n = s.num_rows
    users = s[user_col].combine_chunks()
    ts = np.asarray(s[ts_col].cast(pa.int64()))
    starts = np.flatnonzero(new_s)
    ends = np.concatenate([starts[1:], [n]])
    # session_num = 1-based session index within each user: global
    # session number minus the user's first session's number, +1
    snum = np.cumsum(new_s)[starts]  # 1-based global session number
    first_of_user = np.maximum.accumulate(np.where(new_user[starts], snum, 0))
    session_num = snum - first_of_user + 1
    return pa.table(
        {
            user_col: users.take(pa.array(starts)),
            "session_num": pa.array(session_num, pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "session_start_us": pa.array(ts[starts], pa.int64()),
            "session_end_us": pa.array(ts[ends - 1], pa.int64()),
        }
    )


def sessionize(
    ds: "ray.data.Dataset",
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """Per-user gap sessions → one row per session:
    ``(user, session_num, n_events, session_start_us, session_end_us)``.
    """
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, user_col, order=[ts_col, id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "session_num": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start_us": pa.array([], pa.int64()),
                    "session_end_us": pa.array([], pa.int64()),
                }
            )
        )
    gap_us = int(gap_minutes * 60_000_000)
    return ray.data.from_arrow_refs(
        [
            _session_block.remote(gap_us, user_col, ts_col, id_col, *parts)
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# Tumbling (fixed-width) window aggregation
# --------------------------------------------------------------------------


def tumbling_window_agg(
    ds,
    ts_col: str,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    unit: str = "hour",
    window_col: str = "window_start",
    exchange: str = "partial",
):
    """Fixed-width (tumbling) time windows: floor ``ts_col`` to ``unit``
    and group-aggregate by ``(window_start, *keys)``.

    The window derive is one vectorized ``floor_temporal`` — windows are
    just another group key, so the aggregate reuses the engine's two
    exchange strategies:

    * ``exchange="partial"`` (default): combiner inside ``map_batches``
      + driver merge (ops/agg.partial_group_agg) — ZERO exchange. Right
      whenever windows × keys is small (a year of hourly windows × a
      handful of event types is ~10^5 cells even over 10^10 rows).
    * ``exchange="sorted"``: task-based range-partition sort
      (ops/agg.sorted_group_agg) for data-scale cardinality (e.g.
      per-user-per-minute windows).

    ``specs`` as in partial_group_agg: [(out_name, kind, col)], kind ∈
    {sum, count, count_all, min, max}. Generalizes the reference's
    day-window semantics (scheduler.py:43-44 day-scoped seen files) to
    any fixed width. Returns a pyarrow Table (partial) / Dataset
    (sorted) with columns ``[window_col, *keys, *out_names]``.
    """
    from .agg import partial_group_agg, sorted_group_agg

    def derive(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(
                window_col, pa.array([], t.schema.field(ts_col).type)
            )
        return t.append_column(window_col, pc.floor_temporal(t[ts_col], unit=unit))

    derived = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    group_keys = [window_col] + list(keys)
    if exchange == "partial":
        return partial_group_agg(derived, group_keys, specs)
    if exchange == "sorted":
        return sorted_group_agg(derived, group_keys, specs)
    raise ValueError(f"unknown exchange {exchange!r} (use 'partial' or 'sorted')")


def hopping_window_agg(
    ds,
    ts_col: str,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    size_minutes: int = 60,
    hop_minutes: int = 30,
    window_col: str = "window_start",
    exchange: str = "partial",
):
    """Hopping (sliding) time windows: every row lands in the
    ``size/hop`` overlapping windows that contain it, then the same
    group-aggregate as tumbling. ``size`` must be a multiple of ``hop``
    (each row is in exactly ``size//hop`` windows — no edge filter).

    The derive is one vectorized replicate: integer-us window starts,
    ``np.repeat`` row indices × take — rows fan out ``size//hop``-fold
    INSIDE the map task, and only the (window, keys) partials leave it
    under ``exchange="partial"``, so the overlap factor never hits an
    exchange.
    """
    import numpy as np

    from .agg import partial_group_agg, sorted_group_agg

    assert size_minutes % hop_minutes == 0, "size must be a multiple of hop"
    fan = size_minutes // hop_minutes
    hop_us = hop_minutes * 60_000_000

    def derive(t: pa.Table) -> pa.Table:
        ts_type = t.schema.field(ts_col).type
        n = t.num_rows
        if n == 0:
            return t.append_column(window_col, pa.array([], ts_type))
        us = np.asarray(t[ts_col].cast(pa.int64()))
        w0 = (us // hop_us) * hop_us
        starts = (
            w0[:, None] - np.arange(fan, dtype=np.int64)[None, :] * hop_us
        ).ravel()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), fan))
        out = t.take(idx)
        return out.append_column(
            window_col, pa.array(starts, pa.int64()).cast(ts_type)
        )

    derived = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    group_keys = [window_col] + list(keys)
    if exchange == "partial":
        return partial_group_agg(derived, group_keys, specs)
    if exchange == "sorted":
        return sorted_group_agg(derived, group_keys, specs)
    raise ValueError(f"unknown exchange {exchange!r} (use 'partial' or 'sorted')")


# --------------------------------------------------------------------------
# Running (cumulative) per-key aggregates — SUM() OVER (PARTITION BY ... )
# --------------------------------------------------------------------------


@ray.remote
def _running_block(
    key_col: str, ts_col: str, id_col: str, val_col: str, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    idx = pc.sort_indices(
        tbl,
        sort_keys=[(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
    )
    s = tbl.take(idx)
    n = s.num_rows
    keys = s[key_col].combine_chunks()
    v = np.asarray(s[val_col], dtype=np.int64)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    total = np.cumsum(v)
    # per-key running sum = global cumsum minus the prefix before the key
    run_starts = np.flatnonzero(new_key)
    base = np.where(run_starts > 0, total[run_starts - 1], 0)
    running = total - np.repeat(base, np.diff(np.concatenate([run_starts, [n]])))
    return pa.table(
        {
            id_col: s[id_col],
            "running": pa.array(running, pa.int64()),
        }
    )


def running_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "v_int",
) -> "ray.data.Dataset":
    """Exact cumulative SUM(val) OVER (PARTITION BY key ORDER BY ts, id)
    — the window-function classic — on the task-based key-complete
    exchange: one sort, each key's full history lands in its owner task,
    prefix sums are one vectorized cumsum (no per-row loop, no hash
    shuffle). ``val_col`` must be int64: integer totals are exact and
    order-proof (a float cumsum would make the result depend on
    summation order). Output (id, running:int64)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[ts_col, id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "running": pa.array([], pa.int64())}
            )
        )
    return ray.data.from_arrow_refs(
        [
            _running_block.remote(key_col, ts_col, id_col, val_col, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _block_int_sum(tbl: pa.Table, val_col: str) -> int:
    if not tbl.num_rows:
        return 0
    s = pc.sum(pc.cast(tbl[val_col], pa.int64())).as_py()
    return int(s or 0)


@ray.remote
def _add_exclusive_scan(tbl: pa.Table, val_col: str, base: int, out_col: str) -> pa.Table:
    v = np.asarray(tbl[val_col], dtype=np.int64)
    excl = np.empty(len(v), np.int64)
    if len(v):
        excl[0] = base
        np.cumsum(v[:-1], out=excl[1:])
        excl[1:] += base
    return tbl.append_column(out_col, pa.array(excl, pa.int64()))


def global_scan_sum(
    ds,
    order: list[str],
    descending: list[bool],
    val_col: str,
    out_col: str = "scan",
) -> "ray.data.Dataset":
    """EXCLUSIVE global prefix sum of int64 ``val_col`` over a total
    order — the classic distributed scan. Shape: one range-partition
    sort, a ONE-INT-per-block metadata pass (the only driver traffic),
    then an embarrassingly parallel per-block cumsum-plus-base task.
    Integer arithmetic makes the result exact and layout-proof at any
    parallelism (a float scan would depend on summation order).

    The engine uses it for the GPT-style sequence-packing manifest
    (every doc's absolute token offset in the concatenated corpus
    stream); it is the same offset-stitch as stages/index.zip_with_index
    generalized from row counts to value sums."""
    mat = sorted_mat(ds, order, descending=descending)
    refs = mat.to_arrow_refs()
    if not refs or mat.count() == 0:
        return mat
    sums = ray.get([_block_int_sum.remote(r, val_col) for r in refs])
    bases = np.zeros(len(sums), np.int64)
    np.cumsum(np.asarray(sums[:-1], dtype=np.int64), out=bases[1:])
    return ray.data.from_arrow_refs(
        [
            _add_exclusive_scan.remote(r, val_col, int(b), out_col)
            for r, b in zip(refs, bases)
        ]
    )


@ray.remote
def _rolling_block(
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    k: int,
    *parts: pa.Table,
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
    )
    n = s.num_rows
    keys = s[key_col].combine_chunks()
    v = np.asarray(s[val_col], dtype=np.int64)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    run_starts = np.flatnonzero(new_key)
    run_lens = np.diff(np.concatenate([run_starts, [n]]))
    pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, run_lens)
    w = np.minimum(pos, k) + 1  # rows actually in [k PRECEDING, CURRENT]
    total = np.cumsum(v)
    jm1 = np.arange(n, dtype=np.int64) - w  # row before the window start
    prev = np.where(jm1 >= 0, total[np.maximum(jm1, 0)], 0)
    roll = total - prev
    return pa.table(
        {
            id_col: s[id_col],
            "rolling_n": pa.array(w, pa.int64()),
            "rolling_sum": pa.array(roll, pa.int64()),
            # one exact int/int ratio per row — parallelism-proof float
            "rolling_avg": pa.array(roll.astype(np.float64) / w, pa.float64()),
        }
    )


def rolling_window(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "v_int",
    k_preceding: int = 3,
) -> "ray.data.Dataset":
    """SUM/COUNT/AVG(val) OVER (PARTITION BY key ORDER BY ts, id ROWS
    BETWEEN k PRECEDING AND CURRENT ROW) — the bounded row-window
    sibling of :func:`running_sum`, on the same task-based key-complete
    exchange: one sort, each key's history in its owner task, and the
    bounded window is cumsum minus a shifted cumsum with the window
    width clamped at each partition edge (pure offset arithmetic, no
    per-row loop). ``val_col`` must be int64 so sums are exact and the
    average is a single correctly-rounded int/int cast — bit-identical
    at any parallelism. Output (id, rolling_n, rolling_sum,
    rolling_avg)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[ts_col, id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "rolling_n": pa.array([], pa.int64()),
                    "rolling_sum": pa.array([], pa.int64()),
                    "rolling_avg": pa.array([], pa.float64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _rolling_block.remote(key_col, ts_col, id_col, val_col, k_preceding, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _recrawl_block(
    key_col: str, ts_col: str, val_col: str, base_us: int, max_shift: int,
    *parts: pa.Table,
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.sort_by([(key_col, "ascending")]).combine_chunks()
    keys = tbl[key_col]
    n = tbl.num_rows
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    bounds = np.concatenate([np.flatnonzero(new_key), [n]])
    ts = np.asarray(pc.cast(tbl[ts_col], pa.int64()), dtype=np.int64)
    vals = tbl[val_col].to_numpy(zero_copy_only=False)
    out = {"key": [], "n_fetches": [], "n_versions": [], "last_us": [], "next": []}
    for a, b in zip(bounds[:-1], bounds[1:]):
        nf = int(b - a)
        nv = len(np.unique(vals[a:b]))
        last = int(ts[a:b].max())
        shift = min(nf - nv, max_shift)
        out["key"].append(keys[int(a)].as_py())
        out["n_fetches"].append(nf)
        out["n_versions"].append(nv)
        out["last_us"].append(last)
        out["next"].append(last + (base_us << shift))
    return pa.table(
        {
            key_col: pa.array(out["key"], keys.type),
            "n_fetches": pa.array(out["n_fetches"], pa.int64()),
            "n_versions": pa.array(out["n_versions"], pa.int64()),
            "last_us": pa.array(out["last_us"], pa.int64()),
            "next_fetch_us": pa.array(out["next"], pa.int64()),
        }
    )


def recrawl_schedule(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    base_us: int = 3_600_000_000,
    max_shift: int = 6,
):
    """Adaptive revisit scheduling (Cho & Garcia-Molina freshness
    policy, the recrawl loop the reference's fixed cron lacks): per
    key, count fetches and DISTINCT observed content versions; every
    confirmed-unchanged revisit doubles the revisit interval (capped at
    ``base_us << max_shift``); next fetch = last fetch + interval. All
    int64 µs arithmetic — exact at any parallelism.

    Shape: one key-complete exchange; the per-key kernel is O(history)
    — per-URL fetch history is naturally bounded (it grows with
    revisits, not corpus size), the same skew envelope as the
    politeness queue. Output (key, n_fetches, n_versions, last_us,
    next_fetch_us)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col)
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_fetches": pa.array([], pa.int64()),
                    "n_versions": pa.array([], pa.int64()),
                    "last_us": pa.array([], pa.int64()),
                    "next_fetch_us": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _recrawl_block.remote(key_col, ts_col, val_col, base_us, max_shift, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _decay_block(
    key_col: str, ts_col: str, val_col: str, half_life_us: int, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.sort_by([(key_col, "ascending")]).combine_chunks()
    keys = tbl[key_col]
    n = tbl.num_rows
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    bounds = np.concatenate([np.flatnonzero(new_key), [n]])
    us = np.asarray(pc.cast(tbl[ts_col], pa.int64()), dtype=np.int64)
    cents = np.asarray(tbl[val_col], dtype=np.int64)
    out_k, out_last, out_sum = [], [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        last = int(us[a:b].max())
        shift = np.minimum((last - us[a:b]) // half_life_us, 62)
        out_k.append(keys[int(a)].as_py())
        out_last.append(last)
        out_sum.append(int((cents[a:b] >> shift).sum()))
    return pa.table(
        {
            key_col: pa.array(out_k, keys.type),
            "last_us": pa.array(out_last, pa.int64()),
            "decayed_cents": pa.array(out_sum, pa.int64()),
        }
    )


def decayed_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "cents",
    half_life_us: int = 3_600_000_000,
):
    """Freshness-weighted per-key value total: each event contributes
    ``value >> floor(age/half_life)`` relative to the key's NEWEST
    event — an exact-integer exponential decay (the recency weighting a
    ranking/trending pass applies), order-free and layout-proof where a
    float EWMA would be neither. Requires val_col >= 0 int64. One
    key-complete exchange. Output (key, last_us, decayed_cents)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col)
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "last_us": pa.array([], pa.int64()),
                    "decayed_cents": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _decay_block.remote(key_col, ts_col, val_col, half_life_us, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _gap_stats_block(
    key_col: str, ts_col: str, carry_cols: tuple, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    ts = np.asarray(tbl[ts_col], dtype=np.int64)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.concatenate([np.flatnonzero(new_key), [n]])
    counts, gaps, first_idx = [], [], []
    for a, b in zip(starts[:-1], starts[1:]):
        counts.append(int(b - a))
        gaps.append(int(np.diff(ts[a:b]).min()) if b - a >= 2 else None)
        first_idx.append(int(a))
    take = pa.array(first_idx, pa.int64())
    cols = {key_col: keys.take(take)}
    cols.update({c: tbl[c].take(take) for c in carry_cols if c != key_col})
    cols["n_events"] = pa.array(counts, pa.int64())
    cols["min_gap"] = pa.array(gaps, pa.int64())
    return pa.table(cols)


def group_gap_stats(ds, key_col: str, ts_col: str, carry_cols: tuple = ()):
    """Per-key event count + MIN adjacent gap of the sorted ``ts_col``
    (the politeness-audit primitive: a per-host crawl schedule is
    compliant iff min_gap >= the host's delay). One key-complete sort
    exchange, vectorized diff per key run, no per-row Python.
    ``carry_cols``: extra columns whose first-row value per key is
    carried through (constant-per-key attributes like delay_ms).
    ``min_gap`` is NULL for single-event keys."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[ts_col])
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        cols = {key_col: pa.array([], types[key_col])}
        cols.update(
            {c: pa.array([], types[c]) for c in carry_cols if c != key_col}
        )
        cols["n_events"] = pa.array([], pa.int64())
        cols["min_gap"] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(
        [
            _gap_stats_block.remote(key_col, ts_col, tuple(carry_cols), *parts)
            for parts in groups
        ]
    )


@ray.remote
def _rank_block(
    key_col: str, order_col: str, id_col: str, n_tiles: int, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[
                (key_col, "ascending"),
                (order_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    run_id = np.cumsum(new_key) - 1
    sizes = np.diff(np.concatenate([starts, [n]]))
    pos = np.arange(n, dtype=np.int64) - starts[run_id]  # 0-based row number
    size = sizes[run_id]
    # SQL row_number / percent_rank / ntile over a TOTAL order (the
    # id tiebreak) — rank == row_number, percent_rank = (rn-1)/(N-1)
    pct = np.where(size > 1, pos / np.maximum(size - 1, 1), 0.0)
    # DuckDB ntile: first (N % tiles) buckets get ceil(N/tiles) rows
    big = size % n_tiles
    ceil_sz = -(-size // n_tiles)
    floor_sz = size // n_tiles
    cut = big * ceil_sz
    tile = np.where(
        pos < cut,
        pos // np.maximum(ceil_sz, 1),
        big + (pos - cut) // np.maximum(floor_sz, 1),
    )
    return pa.table(
        {
            id_col: tbl[id_col],
            "rn": pa.array(pos + 1, pa.int64()),
            "pct_rank": pa.array(pct, pa.float64()),
            "tile": pa.array(tile + 1, pa.int64()),
        }
    )


def rank_window(ds, key_col: str, order_col: str, id_col: str, n_tiles: int = 4):
    """The rank window-function family — ROW_NUMBER, PERCENT_RANK,
    NTILE(n) OVER (PARTITION BY key ORDER BY order, id) — on the
    key-complete exchange: one sort, each partition lands whole in its
    owner task, ranks/percentiles/tiles are pure offset arithmetic.
    The id tiebreak makes the order total, so every output (including
    the float percent_rank, an exact ratio of small ints) is
    deterministic at any parallelism. NTILE uses DuckDB's convention
    (first N%n buckets take the extra row)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[order_col, id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "pct_rank": pa.array([], pa.float64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _rank_block.remote(key_col, order_col, id_col, n_tiles, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _lag_lead_block(
    key_col: str,
    order_cols: tuple,
    id_col: str,
    val_col: str,
    keep_value: bool,
    *parts: pa.Table,
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    idx = np.arange(n, dtype=np.int64)
    prev_i = pa.array(idx - 1, type=pa.int64(), mask=new_key)
    last_of_key = np.concatenate([new_key[1:], [True]])
    next_i = pa.array(idx + 1, type=pa.int64(), mask=last_of_key)
    vals = tbl[val_col].combine_chunks()
    cols = {
        id_col: tbl[id_col],
        "prev_value": vals.take(prev_i),
        "next_value": vals.take(next_i),
    }
    if keep_value:
        cols["value"] = vals
    return pa.table(cols)


def lag_lead(
    ds,
    key_col: str,
    order_cols: list[str],
    id_col: str,
    val_col: str,
    keep_value: bool = False,
):
    """LAG(val) / LEAD(val) OVER (PARTITION BY key ORDER BY order, id)
    on the key-complete exchange: one sort, shifts are null-masked
    take-indices (nulls at partition edges), no per-row Python.
    ``order_cols`` must end in a unique tiebreak so the shift targets
    are deterministic at any parallelism. ``keep_value`` also emits the
    row's own value, so (prev, current) pairs need no join back."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=list(order_cols))
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        cols = {
            id_col: pa.array([], types[id_col]),
            "prev_value": pa.array([], types[val_col]),
            "next_value": pa.array([], types[val_col]),
        }
        if keep_value:
            cols["value"] = pa.array([], types[val_col])
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(
        [
            _lag_lead_block.remote(
                key_col, tuple(order_cols), id_col, val_col, keep_value, *parts
            )
            for parts in groups
        ]
    )


@ray.remote
def _session_assign_block(
    gap_us: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    carry_cols: tuple,
    *parts: pa.Table,
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s, _, _, session_num = _session_breaks(tbl, user_col, ts_col, id_col, gap_us)
    cols = {
        id_col: s[id_col],
        "session_num": pa.array(session_num, pa.int64()),
    }
    for c in carry_cols:
        cols[c] = s[c]
    return pa.table(cols)


def session_assign(
    ds,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    carry_cols: tuple = (),
):
    """Per-EVENT session ids (the assignment form of sessionize: every
    row tagged with its 1-based session number within its user) — the
    enrichment a training pipeline needs to group events by session
    downstream. SAME break kernel as sessionize (_session_breaks), so
    the two forms cannot drift. ``carry_cols`` ride through to the
    output so downstream stages need no join back onto the input —
    the kernel already has every row co-located and sorted."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, user_col, order=[ts_col, id_col])
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        cols = {
            id_col: pa.array([], types[id_col]),
            "session_num": pa.array([], pa.int64()),
        }
        for c in carry_cols:
            cols[c] = pa.array([], types[c])
        return ray.data.from_arrow(pa.table(cols))
    gap_us = int(gap_minutes * 60_000_000)
    return ray.data.from_arrow_refs(
        [
            _session_assign_block.remote(
                gap_us, user_col, ts_col, id_col, tuple(carry_cols), *parts
            )
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# rank with ties (RANK / DENSE_RANK)
# --------------------------------------------------------------------------


@ray.remote
def _rank_ties_block(
    key_col: str, order_col: str, id_col: str, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[
                (key_col, "ascending"),
                (order_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    order = tbl[order_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    new_ord = np.empty(n, dtype=bool)
    new_ord[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_ord[1:] = new_key[1:] | pc.not_equal(
            order.slice(1), order.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    key_starts = np.flatnonzero(new_key)
    key_run = np.cumsum(new_key) - 1
    pos = idx - key_starts[key_run]  # 0-based row number within key
    # RANK: 1 + position of the first row of this (key, order) tie run
    ord_starts = np.flatnonzero(new_ord)
    ord_run = np.cumsum(new_ord) - 1
    rank = ord_starts[ord_run] - key_starts[key_run] + 1
    # DENSE_RANK: tie-run ordinal within the key (no gaps)
    cord = np.cumsum(new_ord)
    dense = cord - cord[key_starts][key_run] + 1
    # CUME_DIST: (# rows with order <= this row's) / key size — the
    # tie run's END offset over the key run's size, one IEEE division
    # of exact small ints (parallelism-proof float)
    key_sizes = np.diff(np.concatenate([key_starts, [n]]))
    ord_ends = np.concatenate([ord_starts[1:], [n]])
    cume = (ord_ends[ord_run] - key_starts[key_run]) / key_sizes[key_run]
    return pa.table(
        {
            id_col: tbl[id_col],
            "rn": pa.array(pos + 1, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
            "dense_rank": pa.array(dense, pa.int64()),
            "cume_dist": pa.array(cume, pa.float64()),
        }
    )


def rank_with_ties(ds, key_col: str, order_col: str, id_col: str):
    """RANK() / DENSE_RANK() / CUME_DIST() OVER (PARTITION BY key ORDER
    BY order) plus ROW_NUMBER with the id tiebreak — the tie-aware half
    of the rank window family (rank_window covers the total-order
    half). Ties in ``order_col`` share a rank (gaps for RANK, none for
    DENSE_RANK; CUME_DIST counts the whole tie run), so all three are
    deterministic at any parallelism even without a total order; only
    ``rn`` needs the tiebreak. Same key-complete exchange, pure offset
    arithmetic per block; cume_dist is one IEEE division of exact
    small ints."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[order_col, id_col])
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], types[id_col]),
                    "rn": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "dense_rank": pa.array([], pa.int64()),
                    "cume_dist": pa.array([], pa.float64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _rank_ties_block.remote(key_col, order_col, id_col, *parts)
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# FIRST_VALUE / LAST_VALUE per group
# --------------------------------------------------------------------------


@ray.remote
def _first_last_block(
    key_col: str, order_cols: tuple, val_col: str, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    ends = np.concatenate([starts[1:], [n]]) - 1
    vals = tbl[val_col].combine_chunks()
    return pa.table(
        {
            key_col: keys.take(pa.array(starts, pa.int64())),
            "first_value": vals.take(pa.array(starts, pa.int64())),
            "last_value": vals.take(pa.array(ends, pa.int64())),
            "n_rows": pa.array(ends - starts + 1, pa.int64()),
        }
    )


def group_first_last(ds, key_col: str, order_cols: list[str], val_col: str):
    """FIRST_VALUE(val) / LAST_VALUE(val) OVER (PARTITION BY key ORDER
    BY order ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
    reduced to one row per key — the first/last-touch attribution
    aggregate. ``order_cols`` must end in a unique tiebreak so both
    picks are deterministic at any parallelism. One key-complete
    exchange; the picks are two take-indices per block."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=list(order_cols))
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], types[key_col]),
                    "first_value": pa.array([], types[val_col]),
                    "last_value": pa.array([], types[val_col]),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _first_last_block.remote(key_col, tuple(order_cols), val_col, *parts)
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# LOCF forward fill
# --------------------------------------------------------------------------


@ray.remote
def _fill_forward_block(
    key_col: str, order_cols: tuple, id_col: str, val_col: str, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    key_run = np.cumsum(new_key) - 1
    vals = tbl[val_col].combine_chunks()
    valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    # last valid index at-or-before each row; entries that point into a
    # PREVIOUS key (accumulate crosses key runs) are masked to null —
    # exactly SQL's "no prior value in this partition => NULL"
    last = np.maximum.accumulate(np.where(valid, idx, -1))
    crossed = last < starts[key_run]
    take = pa.array(np.where(crossed, 0, last), pa.int64(), mask=crossed)
    return pa.table(
        {
            id_col: tbl[id_col],
            "filled": vals.take(take),
        }
    )


def fill_forward(ds, key_col: str, order_cols: list[str], id_col: str, val_col: str):
    """LOCF gap repair: last_value(val IGNORE NULLS) OVER (PARTITION BY
    key ORDER BY order ROWS UNBOUNDED PRECEDING) — nulls replaced by the
    most recent non-null within the key, leading nulls stay null. One
    key-complete exchange; the fill is a single maximum.accumulate over
    valid row indices per block (key crossings null-masked), no per-row
    Python. ``order_cols`` must end in a unique tiebreak."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=list(order_cols))
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], types[id_col]),
                    "filled": pa.array([], types[val_col]),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _fill_forward_block.remote(
                key_col, tuple(order_cols), id_col, val_col, *parts
            )
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# RANGE (time-interval) window sum
# --------------------------------------------------------------------------


@ray.remote
def _range_sum_block(
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    interval_us: int,
    *parts: pa.Table,
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    ends = np.concatenate([starts[1:], [n]])
    ts = pc.cast(tbl[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
    v = pc.cast(tbl[val_col], pa.int64()).to_numpy(zero_copy_only=False)
    out = np.empty(n, np.int64)
    # O(runs) Python over key runs; inside each run the frame bounds are
    # two vectorized searchsorteds and the sum a cumsum difference
    for s, e in zip(starts, ends):
        t_run = ts[s:e]
        cum = np.cumsum(v[s:e])
        lo = np.searchsorted(t_run, t_run - interval_us, side="left")
        hi = np.searchsorted(t_run, t_run, side="right")
        w = cum[hi - 1]  # hi >= 1 always (row is its own peer)
        w = w - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        out[s:e] = w
    return pa.table(
        {
            id_col: tbl[id_col],
            "range_sum": pa.array(out, pa.int64()),
        }
    )


def range_window_sum(
    ds, key_col: str, ts_col: str, id_col: str, val_col: str, interval_us: int
):
    """SUM(val) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    ``interval_us`` PRECEDING AND CURRENT ROW) — the TIME-based window
    completing the matrix next to rolling_window's ROWS frame. SQL
    RANGE semantics: the frame is every row whose ts lies in
    [ts − interval, ts], INCLUDING later-ordered peers at the same ts,
    so no tiebreak is needed for determinism. ``val_col`` must be
    integer (cents-scale floats upstream) so the sums are exact at any
    parallelism. One key-complete exchange; per run the frame bounds
    are two searchsorteds against the run's own timestamps and the sum
    a cumsum difference."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[ts_col, id_col])
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], types[id_col]),
                    "range_sum": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _range_sum_block.remote(
                key_col, ts_col, id_col, val_col, interval_us, *parts
            )
            for parts in groups
        ]
    )


# --------------------------------------------------------------------------
# ordered ARRAY_AGG (collect_list)
# --------------------------------------------------------------------------


@ray.remote
def _collect_list_block(
    key_col: str, order_cols: tuple, val_col: str, *parts: pa.Table
) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    offsets = pa.array(
        np.concatenate([starts, [n]]).astype(np.int32), pa.int32()
    )
    values = tbl[val_col].combine_chunks()
    lists = pa.ListArray.from_arrays(offsets, values)
    return pa.table(
        {
            key_col: keys.take(pa.array(starts, pa.int64())),
            "values": lists,
        }
    )


def group_collect_list(ds, key_col: str, order_cols: list[str], val_col: str):
    """Ordered ARRAY_AGG: one ``list<val>`` row per key, elements in
    ``order_cols`` order (end with a unique tiebreak for determinism)
    — SQL's list(val ORDER BY ...) GROUP BY key. One key-complete
    exchange; the list assembly is a single zero-copy
    ListArray.from_arrays over the sorted block (run starts ARE the
    offsets), no per-row Python. A key's whole list materializes in
    its owner task — cap or pre-slice upstream for pathological keys
    (same contract as the join kernels' hot-key guard)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=list(order_cols))
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], types[key_col]),
                    "values": pa.array([], pa.list_(types[val_col])),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _collect_list_block.remote(key_col, tuple(order_cols), val_col, *parts)
            for parts in groups
        ]
    )


def group_string_agg(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    sep: str = ",",
    out_col: str = "agg",
):
    """Ordered STRING_AGG: one delimited string per key, elements in
    ``order_cols`` order — SQL's string_agg(val, sep ORDER BY ...)
    GROUP BY key. Rides :func:`group_collect_list` (one key-complete
    exchange, zero-copy ListArray assembly); the join itself is a
    single vectorized ``pc.binary_join`` per block, no per-row Python.
    Same hot-key contract as collect_list: a key's whole string
    materializes in its owner task."""

    lists = group_collect_list(ds, key_col, order_cols, val_col)

    def join_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: t[key_col],
                out_col: pc.binary_join(t["values"].combine_chunks(), sep),
            }
        )

    return lists.map_batches(join_block, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# session funnel
# --------------------------------------------------------------------------


@ray.remote
def _funnel_block(
    gap_us: int,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    stages: tuple,
    *parts: pa.Table,
) -> list:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    if not tables:
        return [0] * len(stages)
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s, _, new_s, _ = _session_breaks(tbl, user_col, ts_col, id_col, gap_us)
    ts = np.asarray(s[ts_col].cast(pa.int64()))
    starts = np.flatnonzero(new_s)
    run_id = np.cumsum(new_s) - 1
    types = s[type_col].combine_chunks()
    n_sessions = len(starts)
    int_min = np.iinfo(np.int64).min
    int_max = np.iinfo(np.int64).max
    t_prev = np.full(n_sessions, int_min, np.int64)
    alive = np.ones(n_sessions, dtype=bool)
    counts = []
    for stage in stages:
        mask = pc.equal(types, stage).to_numpy(zero_copy_only=False)
        cand = np.where(mask & (ts > t_prev[run_id]), ts, int_max)
        t_stage = np.minimum.reduceat(cand, starts)
        alive = alive & (t_stage < int_max)
        counts.append(int(alive.sum()))
        t_prev = np.where(alive, t_stage, t_prev)
    return counts


def funnel_counts(
    ds,
    stages: list[str],
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> pa.Table:
    """Session conversion funnel: how many sessions reach stage 1, then
    stage 2 STRICTLY AFTER their first stage-1 event, and so on — the
    ordered-sequence analytics a behavioral dataset ships with. Rides
    the SAME session-break kernel as sessionize/session_assign (gap
    semantics cannot drift); per block each stage is one vectorized
    mask + minimum.reduceat over session runs ("first qualifying ts
    after the previous stage's"), sessions are task-complete because
    users are, and only len(stages) ints per block reach the driver.
    Output: (stage, n_sessions) with cumulative stage labels."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, user_col, order=[ts_col, id_col])
    labels = [">".join(stages[: i + 1]) for i in range(len(stages))]
    if not groups:
        return pa.table(
            {
                "stage": pa.array(labels, pa.string()),
                "n_sessions": pa.array([0] * len(stages), pa.int64()),
            }
        )
    gap_us = int(gap_minutes * 60_000_000)
    partials = ray.get(
        [
            _funnel_block.remote(
                gap_us, user_col, ts_col, id_col, type_col, tuple(stages), *parts
            )
            for parts in groups
        ]
    )
    totals = [sum(p[i] for p in partials) for i in range(len(stages))]
    return pa.table(
        {
            "stage": pa.array(labels, pa.string()),
            "n_sessions": pa.array(totals, pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# COUNT(*) OVER (PARTITION BY key)
# --------------------------------------------------------------------------


@ray.remote
def _group_size_block(key_col: str, id_col: str, *parts: pa.Table) -> pa.Table:
    import numpy as np

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(tbl, sort_keys=[(key_col, "ascending")])
    )
    n = tbl.num_rows
    keys = tbl[key_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    sizes = np.diff(np.concatenate([starts, [n]]))
    run_id = np.cumsum(new_key) - 1
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_in_group": pa.array(sizes[run_id], pa.int64()),
        }
    )


def group_size_window(ds, key_col: str, id_col: str):
    """COUNT(*) OVER (PARTITION BY key) as a per-row enrichment — one
    key-complete exchange, run sizes by offset arithmetic. Composite
    partition keys pack into one int64/string column upstream (the
    engine's composite-key pattern: every key-complete kernel is
    single-column, so multi-column keys ride a reversible pack)."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[])
    if not groups:
        types = dict(zip(ds.schema().names, ds.schema().types))
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], types[id_col]),
                    "n_in_group": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [_group_size_block.remote(key_col, id_col, *parts) for parts in groups]
    )


# --------------------------------------------------------------------------
# late-data watermark (streaming-window semantics as a data computation)
# --------------------------------------------------------------------------

_TS_MIN = np.iinfo(np.int64).min


@ray.remote
def _block_max_ts(t: pa.Table, ts_col: str) -> int:
    if t.num_rows == 0 or ts_col not in t.column_names:
        return _TS_MIN
    return int(
        pc.max(t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())).as_py()
    )


@ray.remote
def _wm_partial(
    t: pa.Table, ts_col: str, carry_us: int, lateness_us: int, window_us: int
) -> pa.Table:
    """Per-block partial: exclusive prefix-max watermark (local scan ⊕
    the carry from all earlier blocks), late mask, tumbling-window
    kept/late counts. O(windows-per-block) rows out."""
    if t.num_rows == 0 or ts_col not in t.column_names:
        return pa.table(
            {
                "w": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "n_late": pa.array([], pa.int64()),
            }
        )
    ts = np.asarray(t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()))
    n = len(ts)
    prev = np.empty(n, np.int64)
    prev[0] = _TS_MIN
    if n > 1:
        np.maximum.accumulate(ts[:-1], out=prev[1:])
    prev = np.maximum(prev, carry_us)
    late = (prev != _TS_MIN) & (ts < prev - lateness_us)
    w = ts // window_us * window_us
    g = pa.table(
        {
            "w": pa.array(w, pa.int64()),
            "n_kept": pa.array((~late).astype(np.int64), pa.int64()),
            "n_late": pa.array(late.astype(np.int64), pa.int64()),
        }
    ).group_by(["w"]).aggregate([("n_kept", "sum"), ("n_late", "sum")])
    return pa.table(
        {"w": g["w"], "n_kept": g["n_kept_sum"], "n_late": g["n_late_sum"]}
    )


def watermark_window_counts(
    ds,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    lateness_us: int = 3_600_000_000,
    window_us: int = 3_600_000_000,
    window_col: str = "window_start",
) -> pa.Table:
    """Streaming late-data accounting as a deterministic batch op: with
    arrival order defined by ``arrival_col``, the watermark before each
    event is the max event-time seen so far (exclusive prefix max);
    events with ``ts < watermark - lateness`` are LATE (a streaming
    engine would have closed their window). Emits per tumbling window
    (window_start, n_kept, n_late) — the drop-rate audit for choosing
    an allowed-lateness budget.

    Shape: one range-partition sort on the arrival order, a
    1-int-per-block metadata pass (block max ts → exclusive carry — the
    same carry-chain trick as fill_forward), then per-block vectorized
    prefix-max + combiner counts. No per-row Python, no second
    exchange; driver merges O(blocks × windows) partial rows."""
    mat = sorted_mat(ds, [arrival_col])
    refs = mat.to_arrow_refs()
    if not refs:
        return pa.table(
            {
                window_col: pa.array([], pa.timestamp("us")),
                "n_kept": pa.array([], pa.int64()),
                "n_late": pa.array([], pa.int64()),
            }
        )
    maxes = ray.get([_block_max_ts.remote(r, ts_col) for r in refs])
    carries = []
    cur = _TS_MIN
    for m in maxes:
        carries.append(cur)
        cur = max(cur, m)
    parts = ray.get(
        [
            _wm_partial.remote(r, ts_col, c, lateness_us, window_us)
            for r, c in zip(refs, carries)
        ]
    )
    merged = (
        pa.concat_tables(parts)
        .group_by(["w"])
        .aggregate([("n_kept", "sum"), ("n_late", "sum")])
    )
    merged = merged.sort_by([("w", "ascending")])
    return pa.table(
        {
            window_col: merged["w"].cast(pa.timestamp("us")),
            "n_kept": merged["n_kept_sum"].cast(pa.int64()),
            "n_late": merged["n_late_sum"].cast(pa.int64()),
        }
    )


# ----------------------------------------------------- time-weighted mean


@ray.remote
def _twap_block(
    key_col: str, ts_col: str, id_col: str, val_col: str, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    t = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    # parts arrive key-complete and sorted by (key, ts, id)
    keys = t[key_col].combine_chunks()
    ts = np.asarray(pc.cast(t[ts_col].combine_chunks(), pa.int64()))
    c = np.asarray(t[val_col], dtype=np.int64)
    n = t.num_rows
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(
            keys.slice(1), keys.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    # LOCF integral: each sample holds until the next one; the key's
    # last sample carries no weight (the window closes at max ts)
    w = np.zeros(n, dtype=np.int64)
    if n > 1:
        w[:-1] = ts[1:] - ts[:-1]
    w[np.roll(new_key, -1)] = 0  # zero the weight at each key's end
    # overflow guard on the ACTUAL terms (float64 bound, 2^-52 rel
    # error is irrelevant at the 2^62 margin): every |c·Δ| product and
    # the running |Σ| must stay inside int64
    prod = np.abs(c).astype(np.float64) * w.astype(np.float64)
    if n and (prod.max() > float(1 << 62) or prod.sum() > float(1 << 62)):
        raise ValueError(
            f"time_weighted_avg: per-block Σ|c·Δ| ≈ {prod.sum():.3g} "
            f"may overflow int64 (rows={n}); scale the value down or "
            "narrow the time window"
        )
    term = c * w
    starts = np.flatnonzero(new_key)
    ends = np.concatenate([starts[1:], [n]])
    cs = np.concatenate([[0], np.cumsum(term)])
    num = cs[ends] - cs[starts]
    return pa.table(
        {
            key_col: keys.take(pa.array(starts)),
            "n_events": pa.array(ends - starts, pa.int64()),
            "dur_us": pa.array(ts[ends - 1] - ts[starts], pa.int64()),
            "num": pa.array(num, pa.int64()),
        }
    )


def time_weighted_avg(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
) -> pa.Table:
    """Per-key TIME-weighted mean (TWAP) of an integer value column:
    each sample holds (LOCF) until the key's next sample, so

        twap = Σ value_i · (t_{i+1} − t_i)  /  (t_last − t_first)

    — the irregular-sampling average a last-price/sensor series needs,
    where the plain mean over-weights bursts. ONE key-complete exchange
    (sort by (key, ts, id), boundary-run donation), vectorized
    cumsum-diff per block, integer-exact numerator/denominator with a
    loud per-block overflow guard; the ONLY float is the final
    num/dur division (one correctly-rounded cast each) — bit-identical
    at any layout and to a SQL HUGEINT lead()-weighted formula.
    Single-sample keys (zero duration) emit null."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key_col, order=[ts_col, id_col])
    if not groups:
        return pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "twap": pa.array([], pa.float64()),
            }
        )
    parts = ray.get(
        [
            _twap_block.remote(key_col, ts_col, id_col, val_col, *p)
            for p in groups
        ]
    )
    merged = pa.concat_tables(parts)
    idx = pc.sort_indices(merged, sort_keys=[(key_col, "ascending")])
    merged = merged.take(idx)
    num = merged["num"].to_pylist()
    dur = merged["dur_us"].to_pylist()
    twap = [
        (float(a) / float(d)) if d else None for a, d in zip(num, dur)
    ]
    return pa.table(
        {
            key_col: merged[key_col],
            "n_events": merged["n_events"],
            "twap": pa.array(twap, pa.float64()),
        }
    )


# ------------------------- unordered per-key aggregates attached to rows


@ray.remote
def _attach_group_block(
    key: str, specs: tuple, mark_first: str | None, *parts: "pa.Table"
) -> "pa.Table":
    """One key-complete, key-sorted group set: compute per-run
    aggregates with reduceat and repeat them back onto the rows."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return parts[0]
    t = pa.concat_tables(tables).combine_chunks()
    col = t[key].combine_chunks()
    m = t.num_rows
    new = np.ones(m, dtype=bool)
    if m > 1:
        new[1:] = pc.not_equal(col.slice(1), col.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new)
    run_ids = np.cumsum(new) - 1
    out = t
    if mark_first is not None:
        out = out.append_column(mark_first, pa.array(new, pa.bool_()))
    for out_name, kind, src in specs:
        if kind == "count_all":
            ends = np.concatenate([starts[1:], [m]])
            vals = (ends - starts).astype(np.int64)
        else:
            x = np.asarray(t[src], dtype=np.int64)
            if kind == "sum":
                vals = np.add.reduceat(x, starts)
            elif kind == "min":
                vals = np.minimum.reduceat(x, starts)
            elif kind == "max":
                vals = np.maximum.reduceat(x, starts)
            else:
                raise ValueError(f"attach_group_agg: unknown kind {kind!r}")
        out = out.append_column(out_name, pa.array(vals[run_ids], pa.int64()))
    return out


def attach_group_agg(ds, key: str, specs: list, mark_first: str | None = None):
    """``agg(col) OVER (PARTITION BY key)`` — per-key unordered
    aggregates ATTACHED to every row in ONE key-complete exchange.

    Replaces the aggregate-then-join-back plan (two exchanges + a join
    for each aggregated side) wherever downstream math needs group
    totals next to the rows — e.g. the Kneser-Ney chain's c(w1·),
    N1+(w1·), N1+(·w2) marginals. ``specs`` = [(out_name, kind, col)],
    kind ∈ {sum, min, max, count_all} over int64 columns (col=None for
    count_all). ``mark_first`` names an extra bool column set True on
    each key run's first row — a global DISTINCT-key count becomes a
    plain row sum. Output rows/columns = input + one int64 column per
    spec; row order is the (key-sorted) exchange order."""
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(ds, key)
    if not groups:
        # Empty input must still carry the attached columns so the
        # schema matches the non-empty path (downstream drops/selects
        # assume they exist).
        schema = ds.schema()
        empty = pa.table(
            {n: pa.array([], t) for n, t in zip(schema.names, schema.types)}
        )
        if mark_first is not None:
            empty = empty.append_column(mark_first, pa.array([], pa.bool_()))
        for out_name, _kind, _src in specs:
            empty = empty.append_column(out_name, pa.array([], pa.int64()))
        return ray.data.from_arrow(empty)
    sp = tuple((o, k, c) for o, k, c in specs)
    return ray.data.from_arrow_refs(
        [
            _attach_group_block.remote(key, sp, mark_first, *parts)
            for parts in groups
        ]
    )
