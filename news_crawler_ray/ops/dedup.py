"""Deduplication operators over document tables.

Five families, each a composition of ``map_batches`` (vectorized partial
work) + one key-colocating shuffle (``groupby``/``repartition``) — the
partial/final pattern that keeps the all-to-all exchange as small as
possible (SURVEY.md §2.5 A2/A4/A6 re-expressed for training data):

* exact       — content hash → keep min-id per hash (one shuffle of
                (hash, id), never of the texts themselves)
* minhash-LSH — shingle → MinHash → band buckets → candidate pairs →
                signature-verified jaccard (MMDS ch.3 / Broder '97 style)
* simhash     — 64-bit SimHash → 4-band exact-match buckets → pairs with
                hamming distance ≤ d (Charikar '02 / Manku et al. '07)
* n-gram jaccard — exact token-shingle jaccard verification for a pairs
                table (the verify stage behind minhash-LSH)
* embedding cosine — random-hyperplane LSH buckets → within-bucket
                cosine ≥ τ pairs (near-dup in embedding space)

All pair outputs have ``id_a < id_b`` and are globally deduplicated.
At 10^10-doc scale the bucket groupbys shuffle only (key, id, sig) —
tens of bytes per row, not documents.
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray

from . import hashing as H
from .exchange import sorted_mat

logger = logging.getLogger(__name__)


def _log_truncated_bucket(kind: str, size: int, cap: int) -> None:
    """Surface over-cap LSH buckets: past the cap a bucket emits a STAR
    (min-id hub ↔ every other row, B-1 pairs) instead of all B(B-1)/2
    pairs — bounded output that still CONNECTS the bucket for cluster
    resolution (ops/graph.connected_components), where plain truncation
    both lost pairs and, under the owner-band rule, suppressed them in
    every later band too. The non-hub pair loss must stay observable."""
    dropped = size * (size - 1) // 2 - (size - 1)
    logger.warning(
        "%s LSH bucket over cap: size=%d cap=%d star-fallback "
        "(emitted=%d, dropped_pairs=%d)",
        kind, size, cap, size - 1, dropped,
    )


def _rename_tbl(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """dict-based rename (pyarrow 16 only takes a list)."""
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def _multi_runs(t: pa.Table, key_cols: list[str]):
    """(start, end) spans of multi-row runs in a table SORTED by key_cols.

    Vectorized boundary detection; the returned Python loop is O(number
    of runs with ≥2 rows) — i.e. O(actual candidate groups), which after
    LSH bucketing is a tiny fraction of rows. This replaces
    ``groupby().map_groups`` whose per-group call overhead dominates when
    buckets are many and small.
    """
    n = t.num_rows
    if n < 2:
        return
    neq = np.zeros(n - 1, dtype=bool)
    for c in key_cols:
        col = t[c].combine_chunks()
        neq |= pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1, [n]])
    for i in range(len(starts) - 1):
        if starts[i + 1] - starts[i] >= 2:
            yield int(starts[i]), int(starts[i + 1])


def _bucketed_pairs(
    ds, key_cols: list[str], pair_fn, num_partitions: int | None = None,
    strategy: str = "sort",
):
    """Co-locate rows by bucket keys and emit pairs per multi-row run via
    ``pair_fn(table, start, end)``.

    ``strategy="sort"`` (default): a task-based range-partition sort
    brings equal keys into contiguous runs; pairs for runs fully inside
    a block are emitted per block, and the (few) runs that straddle
    block boundaries are re-assembled from their boundary rows and
    paired in follow-up tasks — exact output, no hash-shuffle op
    (measured ~10x cheaper per op in-sandbox; BASELINE.md round-2).
    ``strategy="hash"``: one key shuffle, one batch per partition —
    the classic plan, kept for clusters where aggregator pools persist.
    """
    if strategy == "hash":
        from ray.data import DataContext

        if num_partitions is None:
            num_partitions = DataContext.get_current().default_hash_shuffle_parallelism
        parts = ds.repartition(num_blocks=num_partitions, keys=key_cols)

        def per_partition(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pair_fn(t, 0, 0)
            idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in key_cols])
            s = t.take(idx)
            runs = list(_multi_runs(s, key_cols))
            pair_many = getattr(pair_fn, "pair_many", None)
            if pair_many is not None:
                return pair_many(s, runs)
            outs = [pair_fn(s, a, b) for a, b in runs]
            if not outs:
                return pair_fn(s, 0, 0)
            return pa.concat_tables(outs)

        return parts.map_batches(
            per_partition, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    return _sorted_pairs(ds, key_cols, pair_fn)


def _sorted_pairs(ds, key_cols: list[str], pair_fn):
    import ray

    import ray.data as rd

    mat = sorted_mat(ds, key_cols)
    refs = mat.to_arrow_refs()
    if not refs:
        return mat.map_batches(
            lambda t: pair_fn(t, 0, 0), batch_format="pyarrow", batch_size=None
        )

    @ray.remote
    def _bounds(t: pa.Table):
        if t.num_rows == 0:
            return None
        return (
            tuple(t[c][0].as_py() for c in key_cols),
            tuple(t[c][-1].as_py() for c in key_cols),
        )

    bounds = ray.get([_bounds.remote(r) for r in refs])
    nonempty = [i for i, b in enumerate(bounds) if b]
    boundary_keys: set[tuple] = set()
    for i, j in zip(nonempty, nonempty[1:]):
        if bounds[i][1] == bounds[j][0]:
            boundary_keys.add(bounds[i][1])

    @ray.remote(num_returns=2)
    def _block(t: pa.Table, bkeys: list[tuple]):
        if t.num_rows == 0:
            return pair_fn(t, 0, 0), []
        is_b = np.zeros(t.num_rows, dtype=bool)
        side: list[tuple[tuple, pa.Table]] = []
        for kt in bkeys:
            m = np.ones(t.num_rows, dtype=bool)
            for c, v in zip(key_cols, kt):
                m &= pc.equal(t[c], v).to_numpy(zero_copy_only=False)
            if m.any():
                side.append((kt, t.filter(pa.array(m))))
                is_b |= m
        interior = t.filter(pa.array(~is_b)) if is_b.any() else t
        runs = list(_multi_runs(interior, key_cols))
        pair_many = getattr(pair_fn, "pair_many", None)
        if pair_many is not None:
            # one vectorized call over ALL runs: per-run pa.table
            # construction + a many-table concat dominated blocks with
            # thousands of size-2 runs (measured 3.3 s for 150 k runs)
            pairs = pair_many(interior, runs)
        else:
            outs = [pair_fn(interior, a, b) for a, b in runs]
            pairs = pa.concat_tables(outs) if outs else pair_fn(t, 0, 0)
        return pairs, side

    bkeys = sorted(boundary_keys)
    outs = [_block.remote(r, bkeys) for r in refs]
    pair_refs = [p for p, _ in outs]
    sides = ray.get([s for _, s in outs])
    by_key: dict[tuple, list[pa.Table]] = {}
    for side in sides:  # block order preserved → stable row order per run
        for kt, tbl in side:
            by_key.setdefault(kt, []).append(tbl)

    @ray.remote
    def _run_pairs(tbls: list[pa.Table]):
        t = pa.concat_tables(tbls).combine_chunks()
        return pair_fn(t, 0, t.num_rows)

    extra = [_run_pairs.remote(tbls) for tbls in by_key.values()]
    return rd.from_arrow_refs(pair_refs + extra)


# ---------------------------------------------------------------- exact


def content_hash_batch(batch: pa.Table, text_col: str, out_col: str = "content_hash") -> pa.Table:
    """Vectorized 64-bit content hash (polars xxhash) of the text column."""
    hashes = pl.from_arrow(batch[text_col].combine_chunks()).hash(seed=0).to_numpy()
    return batch.append_column(out_col, pa.array(hashes.view(np.int64), pa.int64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text content.

    Partial: per-batch hash (no shuffle of text bytes). Final: min-id
    per 64-bit hash over the task-based sort exchange
    (ops/agg.sorted_group_agg) — same data movement as the hash shuffle
    without its aggregator-pool startup. Returns
    Dataset[content_hash, id_col]. Collision probability at 10^10 docs
    over 64 bits is ~0.003 — pair a second independent seed column if
    that matters for the corpus.
    """
    from .agg import sorted_group_agg

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sorted_group_agg(hashed, ["content_hash"], [(id_col, "min", id_col)])


# ---------------------------------------------------------- minhash-LSH


def minhash_batch(
    batch: pa.Table, text_col: str, id_col: str, num_perm: int, shingle_k: int
) -> pa.Table:
    """text → MinHash signature; all-vectorized (polars hash + reduceat).

    Output: (id, sig fixed-size list<int64>). Stateless, so it runs in
    the elastic task pool — no actor pinning needed.
    """
    th, off = H.tokenize_batch(batch[text_col])
    sh, soff = H.shingle_hashes(th, off, shingle_k)
    sig = H.minhash_signatures(sh, soff, num_perm)
    flat = pa.array(sig.astype(np.int64).ravel(), pa.int64())
    sig_col = pa.FixedSizeListArray.from_arrays(flat, num_perm)
    return pa.table({id_col: batch[id_col], "sig": sig_col})


def minhash_signature_ds(ds, text_col="text", id_col="doc_id", num_perm=64, shingle_k=5):
    return ds.map_batches(
        lambda b: minhash_batch(b, text_col, id_col, num_perm, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _explode_bands(batch: pa.Table, bands: int, num_perm: int, id_col: str) -> pa.Table:
    n = batch.num_rows
    sig = np.asarray(batch["sig"].combine_chunks().flatten(), dtype=np.int64).reshape(n, num_perm).astype(np.uint64)
    bh = H.band_hashes(sig, bands)  # (n, bands)
    ids = batch[id_col]
    idx = pa.array(np.repeat(np.arange(n), bands), pa.int64())
    return pa.table(
        {
            id_col: ids.take(idx),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "bucket": pa.array(bh.ravel().astype(np.int64), pa.int64()),
            "sig": batch["sig"].take(idx),
        }
    )


def _bucket_pairs(
    group: pa.Table, id_col: str, num_perm: int, max_bucket: int = 256,
    start: int = 0, end: int | None = None, bands: int | None = None,
) -> pa.Table:
    """All (a<b) pairs within one LSH bucket (rows [start:end)) + their
    signature-estimated jaccard.

    ``max_bucket`` bounds degenerate buckets (e.g. empty-text docs): a
    bucket of B docs emits B(B-1)/2 pairs, so one pathological bucket
    can explode the output. Past the cap the bucket emits a STAR —
    min-id hub paired with every other row, B-1 pairs — which keeps the
    bucket connected for cluster resolution while logging the non-hub
    pairs dropped. (Plain head-truncation interacted badly with the
    owner-band rule: a pair cut here was also suppressed in every LATER
    band that saw it, losing it globally; the star keeps every row
    reachable through the hub.)

    Owner-band rule (when ``bands`` is given): a pair is emitted ONLY by
    the first band in which its two signatures collide — recomputable
    locally from the full signatures — so the global output is already
    distinct and the cross-band dedup shuffle disappears entirely.
    """
    end = group.num_rows if end is None else end
    n = end - start
    if n < 2:
        return _empty_pairs(id_col)
    ids = np.asarray(group[id_col].slice(start, n), dtype=np.int64)
    sig = np.asarray(
        group["sig"].slice(start, n).combine_chunks().flatten(), dtype=np.int64
    ).reshape(n, num_perm)
    if n > max_bucket:
        _log_truncated_bucket("minhash", n, max_bucket)
        hub = int(np.argmin(ids))
        iu = np.full(n - 1, hub, dtype=np.int64)
        ju = np.delete(np.arange(n, dtype=np.int64), hub)
    else:
        iu, ju = np.triu_indices(n, k=1)
    est = (sig[iu] == sig[ju]).mean(axis=1)
    a = np.minimum(ids[iu], ids[ju])
    b = np.maximum(ids[iu], ids[ju])
    keep = a != b
    if bands is not None and start < end:
        this_band = int(group["band"][start].as_py())
        if this_band > 0:
            bh = H.band_hashes(sig.astype(np.uint64), bands)
            earlier = (bh[iu, :this_band] == bh[ju, :this_band]).any(axis=1)
            keep &= ~earlier
    return pa.table(
        {
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        }
    )


def _empty_pairs(id_col: str) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    num_partitions: int | None = None,
):
    """Near-duplicate candidate pairs with signature-estimated jaccard.

    sig → band-explode (flat narrow table) → ONE bucket-co-locating
    shuffle with per-partition vectorized run-pairing → threshold
    filter. The output is already globally distinct via the owner-band
    rule (each pair is emitted only by the first band where it
    collides, recomputed locally from the signatures), so the cross-
    band dedup shuffle of the naive plan does not exist at all.
    """
    sigs = minhash_signature_ds(ds, text_col, id_col, num_perm, shingle_k)
    exploded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, num_perm, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _bucketed_pairs(
        exploded,
        ["band", "bucket"],
        lambda t, a, b: _bucket_pairs(
            t, id_col, num_perm, start=a, end=b, bands=bands
        ),
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )


def dedup_keep_min_id(pairs_ds, ids_ds, id_col: str = "doc_id"):
    """Resolve a pairs table into kept ids: drop every id_b (id_a < id_b).

    One-pass transitive approximation (b of any pair is dropped; chains
    collapse to their min id when pairs are complete within buckets).
    Rides the sort-merge anti join (ops/join.py) — duplicate id_b rows
    need no pre-aggregation there, so the groupby+hash-join pair this
    replaced collapses into one task-based sort exchange.
    """
    from .join import sort_merge_anti_join

    drop = pairs_ds.map_batches(
        lambda t: pa.table({id_col: t["id_b"]}), batch_format="pyarrow"
    )
    return sort_merge_anti_join(ids_ds, drop, id_col)


# ------------------------------------------------------------- simhash


def simhash_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """text → 64-bit simhash (int64) per row; fully vectorized."""
    th, off = H.tokenize_batch(batch[text_col])
    sh = H.simhash64(th, off)
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(sh.astype(np.int64), pa.int64()),
        }
    )


def simhash_ds(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(
        lambda b: simhash_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_near_dup_pairs(
    ds, text_col="text", id_col="doc_id", max_hamming: int = 3, bands: int = 4
):
    """Pairs with hamming(simhash) ≤ ``max_hamming`` via the 4-band trick:
    any two hashes within distance 3 agree exactly on ≥1 of 4 16-bit
    bands (pigeonhole, Manku et al. WWW'07), so bucket per band value,
    pair within buckets, verify the true distance vectorized.
    """
    sigs = simhash_ds(ds, text_col, id_col)
    return hash64_near_dup_pairs(
        sigs, hash_col="simhash", id_col=id_col,
        max_hamming=max_hamming, bands=bands, kind="simhash",
    )


def hash64_near_dup_pairs(
    sigs,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    kind: str = "hash64",
    max_bucket: int = 1024,
):
    """Generic banded near-dup pairing over ANY 64-bit hash column
    (simhash over text, perceptual hash over images, ...): pairs with
    hamming ≤ ``max_hamming``, found EXACTLY via the pigeonhole band
    trick — two hashes within distance ``bands - 1`` must agree on at
    least one of ``bands`` equal-width slices, so bucketing per band
    value misses nothing. One narrow-row bucket shuffle; true distance
    verified vectorized; owner-band rule makes the output distinct
    without a dedup exchange; over-cap buckets fall back to a hub star
    (see :func:`_bucket_pairs`)."""
    assert max_hamming < bands, "pigeonhole needs max_hamming < bands"
    assert 64 % bands == 0, "bands must divide 64"

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        h = np.asarray(b[hash_col], dtype=np.int64).astype(np.uint64)
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        parts = [(h >> np.uint64(width * i)) & mask for i in range(bands)]
        idx = pa.array(np.repeat(np.arange(n), bands), pa.int64())
        return pa.table(
            {
                id_col: b[id_col].take(idx),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "bucket": pa.array(np.stack(parts, axis=1).ravel().astype(np.int64), pa.int64()),
                "_h64": b[hash_col].take(idx),
            }
        )

    def bucket_pairs(g: pa.Table, start: int = 0, end: int | None = None) -> pa.Table:
        end = g.num_rows if end is None else end
        n = end - start
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int32())}
            )
        ids = np.asarray(g[id_col].slice(start, n), dtype=np.int64)
        h = np.asarray(g["_h64"].slice(start, n), dtype=np.int64).astype(np.uint64)
        if n > max_bucket:
            # over-cap bucket → star fallback (see _bucket_pairs): O(B)
            # hub pairs keep the bucket connected for cluster resolution
            _log_truncated_bucket(kind, n, max_bucket)
            hub = int(np.argmin(ids))
            iu = np.full(n - 1, hub, dtype=np.int64)
            ju = np.delete(np.arange(n, dtype=np.int64), hub)
        else:
            iu, ju = np.triu_indices(n, k=1)
        dist = H.hamming_distance64(h[iu], h[ju])
        a = np.minimum(ids[iu], ids[ju])
        b_ = np.maximum(ids[iu], ids[ju])
        keep = (dist <= max_hamming) & (a != b_)
        # owner-band rule: emit only in the first band whose slice
        # matches — output distinct without a dedup shuffle
        this_band = int(g["band"][start].as_py())
        if this_band > 0:
            width = np.uint64(64 // bands)
            mask = np.uint64((1 << int(width)) - 1)
            for bb in range(this_band):
                pa_ = (h[iu] >> (width * np.uint64(bb))) & mask
                pb_ = (h[ju] >> (width * np.uint64(bb))) & mask
                keep &= pa_ != pb_
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b_[keep], pa.int64()),
                "hamming": pa.array(dist[keep].astype(np.int32), pa.int32()),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return _bucketed_pairs(exploded, ["band", "bucket"], bucket_pairs)


# ------------------------------------------------- n-gram jaccard verify


def winnow_fingerprint_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> pa.Table:
    """Per-batch MOSS winnowing explode: (id, fp) pairs, value-deduped
    per doc. Winnowing is per-doc, so the output is block-layout proof.
    fp is the uint64 shingle hash stored as int64 (bit view)."""
    if batch.num_rows == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
        )
    th, off = H.tokenize_batch(batch[text_col])
    sh, soff = H.shingle_hashes(th, off, k)
    doc_of, fp = H.winnow_select(sh, soff, w)
    ids = np.asarray(batch[id_col], dtype=np.int64)[doc_of]
    return pa.table(
        {id_col: pa.array(ids, pa.int64()),
         "fp": pa.array(fp.view(np.int64), pa.int64())}
    )


def winnow_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 4096,
):
    """Winnowing near-dup candidate pairs (the MOSS plagiarism-detection
    scheme — a LOCAL fingerprint family complementing MinHash/SimHash):
    docs sharing >= ``min_shared`` winnowed fingerprints. Any shared run
    of ``w + k - 1`` tokens guarantees a shared fingerprint, so long
    verbatim overlaps cannot be missed (the property MinHash lacks).

    Shape: per-batch winnow explode (narrow (id, fp) rows — tens of
    bytes, never the texts) → ONE fp-colocating sorted exchange with
    per-run pairing → sorted group-agg on (id_a, id_b) summing shared
    counts → threshold. Over-cap fp buckets (a fingerprint shared by
    >``max_bucket`` docs, i.e. corpus boilerplate) emit a min-id star
    and log, like the other LSH families.

    Output (id_a < id_b, n_shared), globally distinct."""
    exploded = ds.map_batches(
        lambda b: winnow_fingerprint_batch(b, text_col, id_col, k, w),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return shared_fingerprint_pairs(
        exploded, id_col=id_col, min_shared=min_shared,
        max_bucket=max_bucket, family="winnow",
    )


def shared_fingerprint_pairs(
    exploded,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    min_shared: int = 2,
    max_bucket: int = 4096,
    family: str = "fp",
    emit_capped: bool = False,
    size_col: str | None = None,
):
    """Common tail of every local-fingerprint dedup family (winnowing,
    image tile hashes): given exploded narrow (id, fp) rows — value-
    deduped per id by the caller — emit id pairs sharing >= ``min_shared``
    fingerprints. ONE fp-colocating exchange with per-run pairing →
    sorted group-agg on (id_a, id_b) summing shared counts → threshold.
    Over-cap fp buckets (corpus boilerplate) emit a min-id star and log.

    ``emit_capped=True`` adds a ``capped`` bool column: True on any pair
    at least one of whose shared fingerprints came from an over-cap
    (star-truncated) bucket — for those pairs ``n_shared`` is a LOWER
    bound on the true intersection, not an exact count, and downstream
    scores derived from it (e.g. containment) are lower bounds too.

    ``size_col``: name of a per-row constant-per-id column on the
    exploded rows (e.g. the id's distinct-fingerprint set size). When
    given, the output carries ``n_a``/``n_b`` = that value for each
    pair side, riding the SAME exchange (the pair kernel reads it off
    the bucket rows; the group-agg keeps it with a ``min`` — constant
    per id, so any picker works). This is what lets containment skip a
    second corpus pass + two join exchanges for set sizes.

    Output (id_a < id_b, n_shared[, n_a, n_b][, capped]), globally
    distinct."""
    from .agg import sorted_group_agg

    def empty() -> pa.Table:
        cols = {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "cap": pa.array([], pa.int64()),
        }
        if size_col is not None:
            cols["n_a"] = pa.array([], pa.int64())
            cols["n_b"] = pa.array([], pa.int64())
        return pa.table(cols)

    def fp_run_pairs(t: pa.Table, a: int, b: int) -> pa.Table:
        n = b - a
        if n < 2:
            return empty()
        raw = np.asarray(t[id_col].slice(a, n), dtype=np.int64)
        order = np.argsort(raw, kind="stable")
        ids = raw[order]
        if len(ids) > max_bucket:
            _log_truncated_bucket(family, len(ids), max_bucket)
            iu = np.zeros(len(ids) - 1, dtype=np.int64)
            ju = np.arange(1, len(ids), dtype=np.int64)
            cap = np.ones(len(iu), np.int64)
        else:
            iu, ju = np.triu_indices(len(ids), k=1)
            cap = np.zeros(len(iu), np.int64)
        cols = {
            "id_a": pa.array(ids[iu], pa.int64()),
            "id_b": pa.array(ids[ju], pa.int64()),
            "n": pa.array(np.ones(len(iu), np.int64), pa.int64()),
            "cap": pa.array(cap, pa.int64()),
        }
        if size_col is not None:
            sizes = np.asarray(t[size_col].slice(a, n), dtype=np.int64)[order]
            cols["n_a"] = pa.array(sizes[iu], pa.int64())
            cols["n_b"] = pa.array(sizes[ju], pa.int64())
        return pa.table(cols)

    def pair_many(t: pa.Table, runs: list) -> pa.Table:
        """All runs of one block in vectorized numpy: runs are grouped
        by size and expanded with a shared local triu index — no per-run
        pa.table, no many-table concat (the per-run path measured 3.3 s
        for 150 k size-2 runs; this does the same block in ~0.1 s).
        Over-cap runs take the star fallback loop (rare by design)."""
        if not runs:
            return empty()
        raw = np.asarray(t[id_col], dtype=np.int64)
        sz = (
            np.asarray(t[size_col], dtype=np.int64)
            if size_col is not None
            else None
        )
        starts = np.fromiter((a for a, _ in runs), np.int64, len(runs))
        ends = np.fromiter((b for _, b in runs), np.int64, len(runs))
        m = ends - starts
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_cap: list[np.ndarray] = []
        out_na: list[np.ndarray] = []
        out_nb: list[np.ndarray] = []
        small = m <= max_bucket
        for size in np.unique(m[small]):
            idx = starts[small][m[small] == size]
            iu, ju = np.triu_indices(int(size), k=1)
            gi = (idx[:, None] + iu[None, :]).ravel()
            gj = (idx[:, None] + ju[None, :]).ravel()
            x, y = raw[gi], raw[gj]
            first_lo = x < y
            out_a.append(np.where(first_lo, x, y))
            out_b.append(np.where(first_lo, y, x))
            out_cap.append(np.zeros(len(gi), np.int64))
            if sz is not None:
                sx, sy = sz[gi], sz[gj]
                out_na.append(np.where(first_lo, sx, sy))
                out_nb.append(np.where(first_lo, sy, sx))
        for a, b in zip(starts[~small], ends[~small]):
            n = int(b - a)
            _log_truncated_bucket(family, n, max_bucket)
            order = np.argsort(raw[a:b], kind="stable")
            ids = raw[a:b][order]
            out_a.append(np.repeat(ids[0], n - 1))
            out_b.append(ids[1:])
            out_cap.append(np.ones(n - 1, np.int64))
            if sz is not None:
                szs = sz[a:b][order]
                out_na.append(np.repeat(szs[0], n - 1))
                out_nb.append(szs[1:])
        ida = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        idb = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        cap = np.concatenate(out_cap) if out_cap else np.zeros(0, np.int64)
        cols = {
            "id_a": pa.array(ida, pa.int64()),
            "id_b": pa.array(idb, pa.int64()),
            "n": pa.array(np.ones(len(ida), np.int64), pa.int64()),
            "cap": pa.array(cap, pa.int64()),
        }
        if size_col is not None:
            cols["n_a"] = pa.array(
                np.concatenate(out_na) if out_na else np.zeros(0, np.int64),
                pa.int64(),
            )
            cols["n_b"] = pa.array(
                np.concatenate(out_nb) if out_nb else np.zeros(0, np.int64),
                pa.int64(),
            )
        return pa.table(cols)

    fp_run_pairs.pair_many = pair_many
    pairs = _bucketed_pairs(exploded, [fp_col], fp_run_pairs)
    specs = [("n_shared", "sum", "n"), ("n_cap", "sum", "cap")]
    if size_col is not None:
        specs += [("n_a", "min", "n_a"), ("n_b", "min", "n_b")]
    shared = sorted_group_agg(pairs, ["id_a", "id_b"], specs)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows:
            t = t.filter(pc.greater_equal(t["n_shared"], min_shared))
        cols = {"id_a": t["id_a"], "id_b": t["id_b"], "n_shared": t["n_shared"]}
        if size_col is not None:
            cols["n_a"] = t["n_a"]
            cols["n_b"] = t["n_b"]
        if emit_capped:
            cols["capped"] = pc.greater(t["n_cap"], 0)
        return pa.table(cols)

    return shared.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _shingle_distinct_arrays(
    batch: pa.Table, text_col: str, id_col: str, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT k-shingle hashes for one batch: (doc ids repeated
    per distinct shingle, shingle hashes uint64). Distinctness is one
    lexsort + first-occurrence mask — no per-doc Python loop."""
    th, off = H.tokenize_batch(batch[text_col])
    sh, soff = H.shingle_hashes(th, off, k)
    if len(sh) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    doc_of = np.repeat(np.arange(len(soff) - 1), np.diff(soff))
    order = np.lexsort((sh, doc_of))
    d2, s2 = doc_of[order], sh[order]
    first = np.ones(len(s2), dtype=bool)
    first[1:] = (d2[1:] != d2[:-1]) | (s2[1:] != s2[:-1])
    ids = np.asarray(batch[id_col], dtype=np.int64)[d2[first]]
    return ids, s2[first]


def containment_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.9,
    max_bucket: int = 4096,
):
    """Shingle-CONTAINMENT near-dup pairs: |S(A)∩S(B)| / min(|S(A)|,
    |S(B)|) ≥ ``threshold`` over per-doc DISTINCT k-token shingle sets
    (Broder '97 "containment" — the asymmetric resemblance). Catches the
    case every Jaccard family misses: a short doc fully CONTAINED in a
    longer one (quote inclusion, article + boilerplate wrap) has
    containment 1.0 but Jaccard ≈ |A|/|B|, far below any LSH threshold.

    Shape: per-batch distinct-shingle explode (narrow (id, fp, n_set)
    rows — never the texts; ``n_set`` = the doc's distinct-shingle
    count, computed in the SAME pass and repeated per row, +8 B/row) →
    `shared_fingerprint_pairs(size_col="n_set")` — ONE fp-colocating
    sorted exchange whose pair kernel reads both sides' set sizes off
    the bucket rows, so n_shared AND |S(A)|, |S(B)| arrive on the pair
    rows together (n_shared is the EXACT intersection size since each
    distinct shared shingle contributes exactly 1) → one vectorized
    division + filter. No second corpus pass, no join exchanges (the
    previous shape re-shingled the corpus for sizes and paid two
    sort-merge joins to pin them). Over-cap fp buckets (corpus
    boilerplate shared by >``max_bucket`` docs) emit a min-id star and
    log loudly, like the other LSH families — at fixture scale the cap
    never binds, so the output matches the uncapped SQL oracle exactly.

    Scale: the explode is O(total tokens) narrow rows — exact but heavy
    at 100 TB; winnow_dup_pairs (w>1) is the sparser approximate
    candidate path when full-shingle cost is prohibitive.

    Output (id_a < id_b, n_shared, containment), globally distinct.
    Ref parity: reference dedups exact URLs only (news.py get()); this
    is the LLM-corpus generalization SURVEY.md §2.5/A2 calls for."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps = _shingle_distinct_arrays(batch, text_col, id_col, k)
        if len(ids) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "fp": pa.array([], pa.int64()),
                 "n_set": pa.array([], pa.int64())}
            )
        # ids arrive grouped (lexsort by doc); per-doc distinct counts
        # repeat onto each of the doc's rows in the same pass
        uids, inv, counts = np.unique(ids, return_inverse=True, return_counts=True)
        return pa.table(
            {id_col: pa.array(ids, pa.int64()),
             "fp": pa.array(fps.view(np.int64), pa.int64()),
             "n_set": pa.array(counts[inv].astype(np.int64), pa.int64())}
        )

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = shared_fingerprint_pairs(
        exploded, id_col=id_col, min_shared=1,
        max_bucket=max_bucket, family="containment", emit_capped=True,
        size_col="n_set",
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "containment": pa.array([], pa.float64()),
                    "capped": pa.array([], pa.bool_()),
                }
            )
        shared_n = np.asarray(t["n_shared"], dtype=np.int64)
        den = np.minimum(
            np.asarray(t["n_a"], dtype=np.int64),
            np.asarray(t["n_b"], dtype=np.int64),
        ).astype(np.float64)
        cont = shared_n.astype(np.float64) / den
        keep = cont >= threshold
        return pa.table(
            {
                "id_a": pa.array(np.asarray(t["id_a"], np.int64)[keep], pa.int64()),
                "id_b": pa.array(np.asarray(t["id_b"], np.int64)[keep], pa.int64()),
                "n_shared": pa.array(shared_n[keep], pa.int64()),
                "containment": pa.array(cont[keep], pa.float64()),
                "capped": pa.array(
                    np.asarray(t["capped"], dtype=bool)[keep], pa.bool_()
                ),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _merge_spans_block(id_col: str, n: int, *parts: pa.Table) -> pa.Table:
    """Per-doc interval union of [pos, pos+n) removal windows over one
    key-complete, pos-sorted group run. O(docs) Python, numpy per doc."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.sort_by([(id_col, "ascending"), ("pos", "ascending")])
    ids = tbl[id_col].combine_chunks()
    pos = np.asarray(tbl["pos"], dtype=np.int64)
    m = tbl.num_rows
    new_doc = np.empty(m, dtype=bool)
    new_doc[0] = True
    if m > 1:
        new_doc[1:] = pc.not_equal(ids.slice(1), ids.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
    bounds = np.concatenate([np.flatnonzero(new_doc), [m]])
    out_id, out_starts, out_ends = [], [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        p = pos[a:b]
        ends = p + n
        # merged-interval boundaries: a window starts a new interval when
        # it begins past the running max end of all earlier windows
        run_end = np.maximum.accumulate(ends)
        brk = np.concatenate([[True], p[1:] > run_end[:-1]])
        s_idx = np.flatnonzero(brk)
        e_idx = np.concatenate([s_idx[1:], [len(p)]]) - 1
        out_id.append(ids[int(a)].as_py())
        out_starts.append(p[s_idx].tolist())
        out_ends.append(run_end[e_idx].tolist())
    return pa.table(
        {
            id_col: pa.array(out_id, ids.type),
            "rm_starts": pa.array(out_starts, pa.list_(pa.int64())),
            "rm_ends": pa.array(out_ends, pa.list_(pa.int64())),
        }
    )


def dedup_span_removal(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    pos_bits: int = 20,
):
    """EXACT duplicate-substring removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every n-token window
    whose token sequence occurs more than once corpus-wide is removed
    from ALL BUT its owner occurrence — the globally smallest
    (doc_id, pos) — with overlapping removed windows merged. Output
    (id, clean_text, n_tokens_removed).

    Shape: (1) per-block shingle-hash explode → narrow (ghash, doc,
    pos) rows (tokenize/shingle kernels shared with MinHash — never the
    texts); (2) ONE sorted group-agg on ghash → occurrence count + min
    packed(doc·2^pos_bits + pos) owner; (3) sort-merge join back on
    ghash, keep count>1 non-owner rows; (4) per-doc interval union on
    the key-complete exchange; (5) LEFT sort-merge join docs⋈spans +
    one vectorized token re-stitch (mask, ListArray, binary_join).
    Docs must have < 2^pos_bits tokens and ids < 2^(63-pos_bits);
    64-bit shingle-hash collisions share exact_dedup's documented risk.
    Short docs (< n tokens) participate via their whole-doc shingle."""
    from ..stages.index import key_complete_parts
    from .agg import sorted_group_agg
    from .join import sort_merge_inner_join

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ghash": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "packed": pa.array([], pa.int64()),
                "one": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        th, off = H.tokenize_batch(t[text_col])
        sh, soff = H.shingle_hashes(th, off, n)
        counts = np.diff(soff)
        total = int(counts.sum())
        if total == 0:
            return empty
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pos = np.arange(total, dtype=np.int64) - np.repeat(soff[:-1], counts)
        ids = np.asarray(t[id_col], dtype=np.int64)[doc_of]
        return pa.table(
            {
                "ghash": pa.array(sh.view(np.int64), pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "packed": pa.array((ids << pos_bits) + pos, pa.int64()),
                "one": pa.array(np.ones(total, np.int64), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    owners = sorted_group_agg(
        exploded, ["ghash"], [("cnt", "sum", "one"), ("owner", "min", "packed")]
    )
    joined = sort_merge_inner_join(
        exploded.map_batches(
            lambda t: t.select(["ghash", id_col, "pos", "packed"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        owners,
        "ghash",
        [id_col, "pos", "packed"],
        ["cnt", "owner"],
    )

    def victims(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        keep = pc.and_(
            pc.greater(t["cnt"], 1), pc.not_equal(t["packed"], t["owner"])
        )
        return t.filter(keep).select([id_col, "pos"])

    spans = joined.map_batches(victims, batch_format="pyarrow", zero_copy_batch=True)
    groups = key_complete_parts(spans, id_col, order=["pos"])
    if groups:
        span_ds = ray.data.from_arrow_refs(
            [_merge_spans_block.remote(id_col, n, *parts) for parts in groups]
        )
    else:
        span_ds = ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "rm_starts": pa.array([], pa.list_(pa.int64())),
                    "rm_ends": pa.array([], pa.list_(pa.int64())),
                }
            )
        )
    docs_spans = sort_merge_inner_join(
        ds, span_ds, id_col, [text_col], ["rm_starts", "rm_ends"], how="left"
    )

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_tokens_removed": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern_regex(pc.coalesce(t[text_col], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        keep_tok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(keep_tok)])
        off = csum[off]  # offsets over non-empty tokens
        flat = flat.filter(pa.array(keep_tok))
        n_tok = np.diff(off)
        remove = np.zeros(int(off[-1]), dtype=bool)
        starts_col = t["rm_starts"].combine_chunks()
        ends_col = t["rm_ends"].combine_chunks()
        s_flat = np.asarray(starts_col.flatten(), dtype=np.int64)
        e_flat = np.asarray(ends_col.flatten(), dtype=np.int64)
        s_off = np.asarray(starts_col.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(s_off))
        # clip span ends at each doc's token count, shift to flat space
        e_clip = np.minimum(e_flat, n_tok[row_of])
        lens = np.maximum(e_clip - s_flat, 0)
        base = off[row_of] + s_flat
        if lens.sum():
            idx = np.repeat(base, lens) + (
                np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
            )
            remove[idx] = True
        kept = ~remove
        kcs = np.concatenate([[0], np.cumsum(kept)])
        new_off = kcs[off].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(kept))
        )
        removed_per_row = (np.diff(off) - np.diff(kcs[off])).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pc.binary_join(lists, " "),
                "n_tokens_removed": pa.array(removed_per_row, pa.int64()),
            }
        )

    return docs_spans.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_verify(
    pairs_ds,
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.0,
    num_partitions: int = 8,
):
    """Exact token-shingle jaccard for each (id_a, id_b) pair.

    Joins the pairs table against the docs table twice (hash joins on
    id), then computes true jaccard per pair vectorized-per-row. The
    joins ship only the paired docs' texts — candidate pairs after LSH
    are a tiny fraction of the corpus, so this never rescans everything.
    """
    docs_a = docs_ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_a", text_col: "_text_a"}
    )
    docs_b = docs_ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_b", text_col: "_text_b"}
    )
    j = pairs_ds.join(docs_a, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    j = j.join(docs_b, join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def compute(b: pa.Table) -> pa.Table:
        ja = np.empty(b.num_rows, dtype=np.float64)
        ha, oa = H.tokenize_batch(b["_text_a"])
        hb, ob = H.tokenize_batch(b["_text_b"])
        sa, soa = H.shingle_hashes(ha, oa, shingle_k)
        sb, sob = H.shingle_hashes(hb, ob, shingle_k)
        for i in range(b.num_rows):
            A = set(sa[soa[i] : soa[i + 1]].tolist())
            B = set(sb[sob[i] : sob[i + 1]].tolist())
            u = len(A | B)
            ja[i] = (len(A & B) / u) if u else 1.0
        out = b.drop_columns(["_text_a", "_text_b"]).append_column(
            "jaccard", pa.array(ja, pa.float64())
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j.map_batches(compute, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- embedding cosine near-dup


class CosineLSHStage:
    """Embedding → random-hyperplane LSH bucket ids (T tables × B bits).

    Projection matrix built once per actor from a fixed seed; buckets are
    sign-bit codes. Near-identical vectors collide in ≥1 table w.h.p.
    """

    def __init__(self, vec_col: str, id_col: str, dim: int, n_tables: int, n_bits: int, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((n_tables, n_bits, dim))
        self.vec_col, self.id_col = vec_col, id_col
        self.n_tables, self.n_bits = n_tables, n_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        V = np.asarray(batch[self.vec_col].combine_chunks().flatten(), dtype=np.float64).reshape(n, -1)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        codes = np.zeros((n, self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (V @ self.proj[t].T) > 0  # (n, n_bits)
            codes[:, t] = bits @ (1 << np.arange(self.n_bits, dtype=np.int64))
        idx = pa.array(np.repeat(np.arange(n), self.n_tables), pa.int64())
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(idx),
                "table": pa.array(np.tile(np.arange(self.n_tables, dtype=np.int32), n), pa.int32()),
                "bucket": pa.array(codes.ravel(), pa.int64()),
                self.vec_col: batch[self.vec_col].take(idx),
            }
        )


def embedding_cosine_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    threshold: float = 0.95,
    n_tables: int = 4,
    n_bits: int = 12,
    max_bucket: int = 512,
    concurrency: int | tuple = 2,
    seed: int = 11,
):
    """Pairs with cosine ≥ threshold via hyperplane-LSH bucketing.

    Output is globally distinct via the owner-table rule (a pair is
    emitted only by the first table whose codes collide, recomputed
    locally from the vectors) — one shuffle total.
    """
    def lsh(batch: pa.Table) -> pa.Table:
        # tasks, not a pool: the per-worker "state" is a 4x12x64 seeded
        # projection (microseconds to rebuild) — an actor pool's ~0.9 s
        # per-call spin-up (measured) buys nothing here; ``concurrency``
        # is kept for API compatibility and ignored
        return CosineLSHStage(vec_col, id_col, dim, n_tables, n_bits, seed)(batch)

    exploded = ds.map_batches(
        lsh, batch_format="pyarrow", zero_copy_batch=True
    )
    proj_cache: dict[int, np.ndarray] = {}

    def _proj() -> np.ndarray:
        if 0 not in proj_cache:
            proj_cache[0] = np.random.default_rng(seed).standard_normal(
                (n_tables, n_bits, dim)
            )
        return proj_cache[0]

    def bucket_pairs(g: pa.Table, start: int = 0, end: int | None = None) -> pa.Table:
        end = g.num_rows if end is None else end
        n = end - start
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if n < 2:
            return empty
        ids = np.asarray(g[id_col].slice(start, n), dtype=np.int64)
        V = np.asarray(
            g[vec_col].slice(start, n).combine_chunks().flatten(), dtype=np.float64
        ).reshape(n, -1)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        if n > max_bucket:
            # over-cap bucket → star fallback (see _bucket_pairs): O(B)
            # hub pairs instead of an O(B²) matmul + pair blowup
            _log_truncated_bucket("cosine", n, max_bucket)
            hub = int(np.argmin(ids))
            iu = np.full(n - 1, hub, dtype=np.int64)
            ju = np.delete(np.arange(n, dtype=np.int64), hub)
            cos = V[ju] @ V[hub]
        else:
            iu, ju = np.triu_indices(n, k=1)
            cos = (V @ V.T)[iu, ju]
        a = np.minimum(ids[iu], ids[ju])
        b_ = np.maximum(ids[iu], ids[ju])
        keep = (cos >= threshold) & (a != b_)
        this_table = int(g["table"][start].as_py())
        if this_table > 0:
            proj = _proj()
            weights = 1 << np.arange(n_bits, dtype=np.int64)
            for tt in range(this_table):
                codes = ((V @ proj[tt].T) > 0) @ weights
                keep &= codes[iu] != codes[ju]
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b_[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return _bucketed_pairs(exploded, ["table", "bucket"], bucket_pairs)


# ------------------------------------------------ SemDeDup (cluster-partitioned)


@ray.remote
def _semantic_dedup_block(
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float,
    max_cluster: int,
    *parts: pa.Table,
) -> pa.Table:
    """Per-cluster cosine dedup kernel: the exchange guarantees every
    cluster is complete in this task, so components never span tasks —
    a local union-find per cluster is exact, no distributed CC round."""
    from .similarity import _as_matrix, _normalize

    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[(cluster_col, "ascending"), (id_col, "ascending")]
        )
    )
    ids = np.asarray(tbl[id_col], dtype=np.int64)
    drop_ids, rep_ids = [], []
    for start, end in _multi_runs(tbl, [cluster_col]):
        n = end - start
        if n > max_cluster:
            _log_truncated_bucket("semantic-dedup cluster", n, max_cluster)
            end = start + max_cluster
            n = max_cluster
        V = _normalize(_as_matrix(tbl[vec_col].slice(start, n), n))
        S = V @ V.T
        ia, ib = np.nonzero(np.triu(S >= threshold, k=1))
        if len(ia) == 0:
            continue
        # union-find over local indices; ids ascending → root = min id
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ia.tolist(), ib.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for i in range(n):
            r = find(i)
            if r != i:
                drop_ids.append(ids[start + i])
                rep_ids.append(ids[start + r])
    return pa.table(
        {
            id_col: pa.array(drop_ids, pa.int64()),
            "rep_id": pa.array(rep_ids, pa.int64()),
        }
    )


def semantic_dedup_ids(
    ds,
    centroids: np.ndarray,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse k-means
    quantization partitions the corpus, near-dups are resolved WITHIN
    each cluster only — the pairing cost drops from O(N²) to
    O(sum B_c²) and the exchange ships each row once, keyed by cluster.
    Returns the DROPPED rows as (id, rep_id) where rep is the min id of
    the row's within-cluster cosine-≥-threshold component; keep-set =
    anti-join against these ids. Pairs split across clusters are missed
    by design (the recall/cost knob is the cluster count); over-cap
    clusters are truncated and logged like the LSH bucket caps.
    Centroids come from the caller (train_centroids on a driver-side
    sample — training is sample-scale, assignment is the distributed
    part) and are broadcast once inside kmeans_assign."""
    from ..stages.index import key_complete_parts
    from .similarity import kmeans_assign

    assigned = kmeans_assign(ds, centroids, vec_col=vec_col, cluster_col="cluster")
    groups = key_complete_parts(assigned, "cluster", order=[id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "rep_id": pa.array([], pa.int64())}
            )
        )
    return ray.data.from_arrow_refs(
        [
            _semantic_dedup_block.remote(
                id_col, vec_col, "cluster", threshold, max_cluster, *parts
            )
            for parts in groups
        ]
    )
