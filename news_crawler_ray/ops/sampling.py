"""Deterministic (stratified) sampling over a keyed column.

A large-scale training-data pipeline samples by CONTENT-STABLE hash, not
by RNG state: the same row is kept in every rerun, on any cluster shape,
at any parallelism — so downstream caches/checkpoints stay valid and an
incremental rerun over new data keeps the old sample fixed. The
predicate is ``md5(str(key))[:8] < threshold(fraction)`` — md5 so any
external tool (DuckDB ``md5()``, the correctness oracle) can reproduce
the exact sample; hex strings compare lexicographically = numerically.

The md5 loop is per-row (C digest per row, same trade as
``ops/text.fingerprint_batch``); when external parity is not required,
swap in the vectorized 64-bit polars hash used by the dedup keys. Rows
stream through one ``map_batches`` filter — no shuffle, no driver pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from .exchange import sorted_mat

_HEX_SPAN = 16**8  # first 8 hex chars of the digest


def fraction_threshold_hex(fraction: float) -> str:
    """The 8-hex-char cutoff under which a uniform digest falls with
    probability ``fraction`` — shared by the op and its SQL oracle.

    ``fraction >= 1.0`` returns ``"g"``: every hex string compares below
    it (``'f' < 'g'``), so keep-all really keeps ALL rows — a clamped
    ``"ffffffff"`` under strict ``<`` would silently drop keys whose
    digest prefix is exactly ffffffff (~2 rows per 10^10)."""
    f = min(max(fraction, 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(min(int(f * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def _digest_prefixes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    vals = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.array(
        [hashlib.md5(str(v).encode()).hexdigest()[:8] for v in vals.to_pylist()],
        dtype="U8",
    )


def hash_sample_batch(
    batch: pa.Table,
    key_col: str,
    fraction: float | None = None,
    strata_col: str | None = None,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.0,
) -> pa.Table:
    """Keep rows whose md5(key) prefix falls under the (per-stratum)
    threshold. Uniform mode: ``fraction``. Stratified mode:
    ``strata_col`` + ``fractions`` ({stratum: fraction}, others get
    ``default_fraction``) — e.g. downsample dominant languages while
    keeping rare ones whole."""
    if batch.num_rows == 0:
        return batch
    prefixes = _digest_prefixes(batch[key_col])
    if strata_col is None:
        keep = prefixes < np.array(fraction_threshold_hex(fraction or 0.0), dtype="U8")
    else:
        import pyarrow.compute as pc

        strata = batch[strata_col].combine_chunks()
        enc = strata.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        # null strata get a sentinel code mapped to default_fraction
        codes = np.asarray(pc.fill_null(enc.indices, len(uniq)), dtype=np.int64)
        th_by_code = np.array(
            [
                fraction_threshold_hex((fractions or {}).get(s, default_fraction))
                for s in uniq
            ]
            + [fraction_threshold_hex(default_fraction)],
            dtype="U8",
        )
        keep = prefixes < th_by_code[codes]
    return batch.filter(pa.array(keep))


@ray.remote
def _budget_filter_block(
    tbl: "pa.Table", key: str, weight_col: str, base: dict, budget: int
) -> "pa.Table":
    import numpy as np

    from ..stages.index import _run_boundaries

    if tbl.num_rows == 0:
        return tbl
    starts, values = _run_boundaries(tbl, key)
    ends = np.concatenate([starts[1:], [tbl.num_rows]])
    w = np.asarray(tbl[weight_col], dtype=np.int64)
    keep = np.zeros(tbl.num_rows, dtype=bool)
    for v, s, e in zip(values, starts, ends):
        cw = np.cumsum(w[s:e]) + base.get(v, 0)
        keep[s:e] = cw <= budget
    return tbl.filter(pa.array(keep))


def budget_sample(
    ds,
    key: str,
    weight_col: str,
    order_cols: list[str],
    budget: int,
):
    """Per-key WEIGHT-BUDGET sampling — the corpus-assembly primitive
    behind "B tokens per language": keep each key's rows, in a
    content-stable order, while the running weight total stays ≤
    ``budget``. Deterministic (the order is part of the contract, e.g.
    an md5 rank) and exact at any parallelism: one range-partition sort
    by (key, *order), a per-block (key, weight-sum) metadata pass, then
    each block filters with its exclusive base offset — the
    weighted-median machinery pointed at a cutoff instead of a rank.
    A key spanning many blocks still works; no group materializes."""
    import ray.data as rd

    from ..ops.agg import _block_group_weights

    mat = sorted_mat(ds, [key] + list(order_cols))
    refs = mat.to_arrow_refs()
    if not refs or mat.count() == 0:
        return mat
    metas = ray.get([_block_group_weights.remote(r, key, weight_col) for r in refs])
    running: dict = {}
    per_block_base = []
    for weights in metas:
        b = {g: running.get(g, 0) for g, _ in weights}
        for g, tw in weights:
            running[g] = running.get(g, 0) + tw
        per_block_base.append(b)
    return rd.from_arrow_refs(
        [
            _budget_filter_block.remote(r, key, weight_col, b, budget)
            for r, b, weights in zip(refs, per_block_base, metas)
            if weights
        ]
    )


def hash_sample(
    ds,
    key_col: str,
    fraction: float | None = None,
    strata_col: str | None = None,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.0,
):
    return ds.map_batches(
        lambda b: hash_sample_batch(
            b, key_col, fraction, strata_col, fractions, default_fraction
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def sample_case_sql(
    key_col: str, strata_col: str, fractions: dict[str, float], default_fraction: float
) -> str:
    """The oracle-side predicate for a stratified sample — built from the
    SAME thresholds as the op, so query and SQL cannot drift."""
    cases = " ".join(
        f"WHEN '{s}' THEN '{fraction_threshold_hex(f)}'" for s, f in sorted(fractions.items())
    )
    return (
        f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 8) < "
        f"CASE {strata_col} {cases} ELSE '{fraction_threshold_hex(default_fraction)}' END"
    )


# ------------------------------------------------ train/val/test split


def split_thresholds_hex(val_fraction: float, test_fraction: float) -> tuple[str, str]:
    """(test_cut, val_cut) — digest prefixes below ``test_cut`` are test
    rows, below ``val_cut`` val rows, the rest train. Shared by the op
    and its SQL oracle so the assignment cannot drift."""
    return (
        fraction_threshold_hex(test_fraction),
        fraction_threshold_hex(test_fraction + val_fraction),
    )


def split_column_batch(
    batch: pa.Table, key_col: str, val_fraction: float, test_fraction: float
) -> pa.Table:
    """Append a ``split`` column ('train'|'val'|'test') assigned by
    content-stable hash — disjoint, exhaustive, identical on every rerun
    and cluster shape (the property a 100 TB training corpus needs so an
    incremental re-ingest never moves an old row across splits).
    Streams block-local through ``map_batches``; no shuffle, no RNG."""
    if batch.num_rows == 0:
        return batch.append_column("split", pa.array([], pa.string()))
    t_test, t_val = split_thresholds_hex(val_fraction, test_fraction)
    prefixes = _digest_prefixes(batch[key_col])
    split = np.where(
        prefixes < np.array(t_test, dtype="U8"),
        "test",
        np.where(prefixes < np.array(t_val, dtype="U8"), "val", "train"),
    )
    return batch.append_column("split", pa.array(split.tolist(), pa.string()))


def dataset_split(ds, key_col: str, val_fraction: float, test_fraction: float):
    return ds.map_batches(
        lambda b: split_column_batch(b, key_col, val_fraction, test_fraction),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def split_case_sql(key_col: str, val_fraction: float, test_fraction: float) -> str:
    """Oracle-side split assignment, from the SAME thresholds as the op."""
    t_test, t_val = split_thresholds_hex(val_fraction, test_fraction)
    return (
        f"CASE WHEN substr(md5(CAST({key_col} AS VARCHAR)), 1, 8) < '{t_test}' "
        f"THEN 'test' WHEN substr(md5(CAST({key_col} AS VARCHAR)), 1, 8) < '{t_val}' "
        "THEN 'val' ELSE 'train' END"
    )


# ------------------------------------------------ target-mixture sampling


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float], budget: int
) -> dict[str, float]:
    """Per-stratum keep fractions that land a target mixture inside a
    row budget: ``fraction_s = min(1, budget·weight_s / count_s)`` —
    the data-mixing step of corpus assembly (e.g. rebalance languages
    or sources to a recipe). Expected kept rows per stratum ≈
    budget·weight_s, capped at the stratum's actual size (a rare
    stratum is kept whole, never upsampled). Pure function shared by
    the engine pass and the SQL oracle; strata absent from ``weights``
    get 0."""
    out: dict[str, float] = {}
    for s, c in counts.items():
        w = weights.get(s, 0.0)
        out[s] = min(1.0, (budget * w) / c) if c else 0.0
    return out


def mixture_sample(ds, key_col: str, strata_col: str, weights: dict[str, float], budget: int):
    """Two-phase mixture sampling: one combiner pass counts strata
    (O(strata) rows leave the map — no shuffle), the fractions formula
    runs driver-side on that tiny table, then the content-stable
    stratified filter streams block-local. Deterministic end-to-end."""
    from .agg import partial_group_agg

    counts_tbl = partial_group_agg(ds, [strata_col], [("n", "count_all", None)])
    counts = dict(
        zip(counts_tbl[strata_col].to_pylist(), counts_tbl["n"].to_pylist())
    )
    fr = mixture_fractions(counts, weights, budget)
    return hash_sample(
        ds, key_col, strata_col=strata_col, fractions=fr, default_fraction=0.0
    )


# -------------------------------------------------- crawl budget allocation


def budget_allocate(
    ds, key_col: str, weight_col: str, total_budget: int
) -> pa.Table:
    """Per-host fetch-quota allocation (the politeness scheduler's
    capacity split, ref scale analog of the per-feed limits at
    /root/reference/src/secbot/config.py:46-66): ``total_budget`` slots
    divided proportionally to each key's integer weight mass by the
    LARGEST-REMAINDER method — floor(B·w/W) per key plus one extra slot
    for the B − Σfloor largest remainders (ties → smaller key first).
    Entirely integer arithmetic (remainders compared as B·w mod W over
    the shared denominator), so quotas are exact and
    parallelism-proof, and Σquota == total_budget ALWAYS. Weight sums
    ride the zero-exchange combiner; the allocation itself runs over
    the per-key table (config-scale — for data-scale key domains rank
    the remainders with group_top_k instead). Output:
    [key, weight, quota] sorted by key."""
    from .agg import partial_group_agg

    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    weights = partial_group_agg(
        ds, [key_col], [("weight", "sum", weight_col)]
    )
    keys = weights[key_col].to_pylist()
    w = [int(x) for x in weights["weight"].to_pylist()]
    if any(x < 0 for x in w):
        raise ValueError("budget_allocate: negative weights")
    total_w = sum(w)
    if total_w == 0:
        quota = [0] * len(keys)
    else:
        base = [total_budget * x // total_w for x in w]
        rem = [total_budget * x % total_w for x in w]
        leftover = total_budget - sum(base)
        order = sorted(range(len(keys)), key=lambda i: (-rem[i], keys[i]))
        quota = list(base)
        for i in order[:leftover]:
            quota[i] += 1
    return pa.table(
        {
            key_col: pa.array(keys, weights.schema.field(key_col).type),
            "weight": pa.array(w, pa.int64()),
            "quota": pa.array(quota, pa.int64()),
        }
    )


# ------------------------------------------- per-row weighted sampling


def weight_sample_batch(
    batch: pa.Table, key_col: str, p: np.ndarray
) -> pa.Table:
    """Keep row i with probability ``p[i]`` (importance sampling),
    content-stable: the keep decision is md5(key) < p-scaled cutoff, so
    the same row keeps the same fate across reruns/parallelism and the
    DuckDB oracle reproduces the exact sample (weight_sample_sql). The
    per-row cutoff is the same int(f·16⁸) quantization as
    :func:`fraction_threshold_hex`; ``p >= 1`` always keeps."""
    if batch.num_rows == 0:
        return batch
    prefixes = _digest_prefixes(batch[key_col])
    cut = np.array(
        [
            "g" if x >= 1.0 else format(min(int(x * _HEX_SPAN), _HEX_SPAN - 1), "08x")
            for x in p
        ],
        dtype="U8",
    )
    return batch.filter(pa.array(prefixes < cut))


def weight_sample_sql(key_col: str, p_expr: str) -> str:
    """The oracle-side predicate: identical quantization, hex-string
    comparison (lower(to_hex(..)) — DuckDB hex is uppercase, md5 is
    lowercase)."""
    return (
        f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 8) < "
        f"CASE WHEN ({p_expr}) >= 1 THEN 'g' ELSE "
        f"lpad(lower(to_hex(CAST(least(floor(({p_expr}) * {_HEX_SPAN}), "
        f"{_HEX_SPAN - 1}) AS BIGINT))), 8, '0') END"
    )


# -------------------- weighted sampling WITHOUT replacement (per group)

ES_SPAN = float(1 << 60)  # 15 hex chars = 60 bits: fits BIGINT for the
# oracle's CAST('0x' || substr(md5(k), 1, 15) AS BIGINT)


def es_weighted_keys(key_col, weights: np.ndarray) -> np.ndarray:
    """Efraimidis–Spirakis (2006) weighted-sampling keys: with
    u = (md5_60(key) + 1) / 2^60 in (0,1], the top-k rows by
    log2(u) / w (descending) are EXACTLY a weighted sample without
    replacement — the distributed reservoir for "pick k docs per
    stratum proportional to quality" selections. Content-stable (same
    row, same fate at any parallelism/rerun) and oracle-reproducible:
    the float path is one correctly-rounded uint→double cast, +1, one
    exact power-of-two division, one log2, one IEEE division by w.
    log2 goes through libm (math.log2) — bit-identical to DuckDB's
    log2 on this host, where numpy's SIMD np.log2 drifts a ulp on ~5%
    of inputs (measured; tools/audit_strict caught 11 drifted keys at
    sf0.01). ``weights`` must be >= 1 (caller shifts integer weights
    by +1)."""
    import math

    vals = key_col.combine_chunks() if isinstance(key_col, pa.ChunkedArray) else key_col
    h = np.array(
        [
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in vals.to_pylist()
        ],
        dtype=np.uint64,
    )
    u = (h.astype(np.float64) + 1.0) / ES_SPAN
    lg = np.fromiter(map(math.log2, u.tolist()), np.float64, len(u))
    return lg / np.asarray(weights, dtype=np.float64)


def es_key_sql(key_col: str, w_expr: str) -> str:
    """The oracle-side E-S key: identical derivation, term for term."""
    return (
        f"log2((CAST(CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) AS DOUBLE) + 1) / {float(1 << 60)!r}) / CAST({w_expr} AS DOUBLE)"
    )

