"""Vectorized hashing primitives shared by the dedup/text operators.

Per-token 64-bit hashes come from polars (vectorized SIMD-ish C, seeded,
stable within a polars version) over the *flattened* token array of a
whole Arrow batch — no per-row Python. Shingles, minhash permutations and
band hashes are then pure numpy over flat arrays with ``reduceat`` per
document. This is the pattern that keeps MinHash/SimHash throughput
bounded by memory bandwidth, not the interpreter, at 100 TB scale.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE61 = np.uint64((1 << 61) - 1)


def tokenize_batch(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a string array → (flat token hashes, doc offsets).

    Returns ``hashes`` (uint64, one per token across the batch) and
    ``offsets`` (int64, len = n_docs + 1) delimiting each document's
    token span. Null/empty docs get empty spans.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.coalesce(texts, ""), r"\s+")
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    # splitting ""/leading-whitespace yields empty tokens: drop them and
    # remap offsets through the keep-count prefix sum (all vectorized)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        csum = np.concatenate([[0], np.cumsum(keep_np)])
        offsets = csum[offsets]
        flat = flat.filter(keep)
    hashes = pl.from_arrow(flat).hash(seed=0).to_numpy().astype(np.uint64)
    return hashes, offsets


def shingle_hashes(
    token_hashes: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc via a rolling polynomial combine.

    Docs with fewer than ``k`` tokens contribute their whole-doc combine
    as a single shingle (so short docs still dedup exactly).
    Returns (flat shingle hashes uint64, offsets per doc).
    """
    n_docs = len(offsets) - 1
    out_chunks: list[np.ndarray] = []
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    # vectorized over the flat array: shingle[i] = poly-combine of k
    # consecutive token hashes. Build k shifted views and combine.
    h = token_hashes
    C = np.uint64(0x9E3779B97F4A7C15)
    lens = offsets[1:] - offsets[:-1]
    if len(h) == 0:
        return np.zeros(0, np.uint64), out_offsets
    combined = np.zeros(max(0, len(h) - k + 1), dtype=np.uint64)
    if len(combined):
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            acc = np.zeros_like(combined)
            for j in range(k):
                acc = acc * C + h[j : j + len(combined)]
        combined = acc
    pos = 0
    for d in range(n_docs):
        s, e = offsets[d], offsets[d + 1]
        ln = e - s
        if ln == 0:
            out_offsets[d + 1] = pos
            continue
        if ln < k:
            with np.errstate(over="ignore"):
                acc = np.uint64(0)
                for j in range(s, e):
                    acc = acc * C + h[j]
            out_chunks.append(np.array([acc], np.uint64))
            pos += 1
        else:
            seg = combined[s : e - k + 1]
            out_chunks.append(seg)
            pos += len(seg)
        out_offsets[d + 1] = pos
    flat = np.concatenate(out_chunks) if out_chunks else np.zeros(0, np.uint64)
    return flat, out_offsets


def minhash_signatures(
    shingles: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix.

    Permutations are universal hashes ``(a*x + b) mod 2^61-1`` with
    (a, b) drawn from a fixed-seed RNG — identical across processes and
    cluster sizes. Per-doc minimum via ``np.minimum.reduceat``.
    Empty docs get all-MAX signatures (match nothing).
    """
    rng = np.random.default_rng(seed)
    # a, b < 2^32 so every product in _modmul_add fits uint64 exactly
    # (a*hi < 2^63, a*lo < 2^62) — a genuine (a*x+b) mod 2^61-1 family,
    # verified against big-int arithmetic in tests/test_ops.py
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(shingles) == 0:
        return sig
    x = shingles & MERSENNE61
    # (n_shingles, num_perm) hashed matrix; modmul in uint64 is fine because
    # values < 2^61 and python ints avoid overflow via object? No — use
    # float-free splitmix trick: (a*x+b) mod M with 128-bit via np.uint64
    # overflow-safe decomposition.
    hx = _modmul_add(x, a, b)
    # reduceat over nonempty-doc START indices only: empty docs own no
    # elements, so consecutive nonempty starts delimit exact doc spans
    # (clipping indices instead silently merges the tail segment).
    nonempty = offsets[:-1] < offsets[1:]
    idxs = offsets[:-1][nonempty]
    if len(idxs):
        sig[nonempty] = np.minimum.reduceat(hx, idxs, axis=0)
    return sig


def _modmul_add(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact (a*x + b) mod 2^61-1 in uint64, requiring a, b < 2^32.

    x < 2^61 splits into hi (< 2^31) and lo (< 2^30), so a*hi < 2^63 and
    a*lo < 2^62 never wrap. The remaining shift (t1 << 30, up to 2^91)
    reduces via 2^61 ≡ 1 (mod M): y*2^30 = (y>>31)*2^61 + (y&(2^31-1))*2^30
    ≡ (y>>31) + (y&(2^31-1))<<30, every term < 2^61.
    """
    M = MERSENNE61
    x = x[:, None]
    lo = x & np.uint64((1 << 30) - 1)
    hi = x >> np.uint64(30)
    t1 = (a * hi) % M
    t1 = ((t1 >> np.uint64(31)) + ((t1 & np.uint64((1 << 31) - 1)) << np.uint64(30))) % M
    t2 = (a * lo) % M
    return (t1 + t2 + b) % M


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 — polynomial combine of each band's rows."""
    n_docs, num_perm = sig.shape
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    r = num_perm // bands
    C = np.uint64(0xC2B2AE3D27D4EB4F)
    view = sig.reshape(n_docs, bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((n_docs, bands), dtype=np.uint64)
        for j in range(r):
            acc = acc * C + view[:, :, j]
    return acc


def simhash64(token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit vote sums over token hashes."""
    n_docs = len(offsets) - 1
    if len(token_hashes) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = np.unpackbits(token_hashes.view(np.uint8).reshape(-1, 8), axis=1)  # (n,64) little-endian bytes
    votes = bits.astype(np.int32) * 2 - 1
    sums = np.full((n_docs, 64), -1, dtype=np.int64)  # empty docs → hash 0
    nonempty = offsets[:-1] < offsets[1:]
    idxs = offsets[:-1][nonempty]
    if len(idxs):
        sums[nonempty] = np.add.reduceat(votes, idxs, axis=0)
    out_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(out_bits, axis=1)
    return packed.view(np.uint64).ravel()


def morton_interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order (Morton) key from the low 16 bits of two int columns:
    bit-interleave x into even positions, y into odd — the classic
    part1by1 spread, vectorized int64 (results fit in 32 bits, so no
    sign-bit divergence vs the SQL oracle's signed BIGINT chain).

    Sorting by this key co-locates rows that are close in BOTH
    dimensions, so partitioned parquet written in zkey order gets
    min/max row-group pruning on either column — the multi-dimensional
    clustering trick behind Delta/Iceberg OPTIMIZE ZORDER."""

    def part1by1(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.int64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return part1by1(x) | (part1by1(y) << 1)


def winnow_select(
    shingles: np.ndarray, offsets: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03): for
    every window of ``w`` consecutive shingle hashes select the minimum
    value, RIGHTMOST occurrence on ties; a doc's fingerprint is the
    resulting value SET. Docs with fewer than ``w`` shingles (but at
    least one) contribute their minimum value — short docs still
    fingerprint. Guarantee: any shared run of ``w + k - 1`` tokens
    between two docs shares at least one selected fingerprint.

    Vectorized across the flat shingle array: one sliding_window_view +
    one reversed argmin; windows straddling doc boundaries are masked
    out via searchsorted. Only sub-window docs fall to a per-doc loop
    (rare: docs shorter than w+k-1 tokens).

    Returns (doc_idx, fp) exploded pairs, value-deduped per doc,
    ordered by (doc_idx, fp).
    """
    n_docs = len(offsets) - 1
    m = len(shingles)
    sel = np.zeros(m, dtype=bool)
    lens = offsets[1:] - offsets[:-1]
    if m >= w:
        from numpy.lib.stride_tricks import sliding_window_view

        v = sliding_window_view(shingles, w)
        rm = (w - 1) - np.argmin(v[:, ::-1], axis=1).astype(np.int64)
        starts = np.arange(len(v), dtype=np.int64)
        doc_idx = np.searchsorted(offsets, starts, side="right") - 1
        valid = starts + w <= offsets[doc_idx + 1]
        sel[starts[valid] + rm[valid]] = True
    for d in np.flatnonzero((lens > 0) & (lens < w)):
        seg = shingles[offsets[d] : offsets[d + 1]]
        sel[offsets[d] + int(np.flatnonzero(seg == seg.min())[-1])] = True
    pos = np.flatnonzero(sel)
    doc_of = (np.searchsorted(offsets, pos, side="right") - 1).astype(np.int64)
    fp = shingles[pos]
    order = np.lexsort((fp, doc_of))
    doc_of, fp = doc_of[order], fp[order]
    keep = np.ones(len(fp), dtype=bool)
    if len(fp) > 1:
        keep[1:] = (doc_of[1:] != doc_of[:-1]) | (fp[1:] != fp[:-1])
    return doc_of[keep], fp[keep]


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR between two uint64 arrays (vectorized)."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
