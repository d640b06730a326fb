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
