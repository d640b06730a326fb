"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All stateless vectorized ``map_batches`` stages
(pyarrow.compute kernels; the only per-row Python is md5, which is a C
hot loop per string).
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl  # module-level on purpose: a lazy in-UDF import races
# when fused map stages first touch polars from parallel threads of one
# worker (observed: 'polars._reexport has no attribute Series')
import pyarrow as pa
import pyarrow.compute as pc
import ray

# BPE-ish token pattern: letter runs, digit runs, single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this that "
    "be from"
).split()

# tiny function-word profiles for the n-gram/marker language heuristic;
# deterministic and dependency-free (a real fastText model would slot in
# as an actor-pool stage with the same signature)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "that"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es": ("el", "los", "las", "es", "una", "para", "como", "pero"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}


def token_stats_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens, n_bpe_tokens, n_chars_measured) — exact-integer stats."""
    text = pc.coalesce(batch[text_col], "")
    # count \S+ runs directly: split-based counting overcounts edge
    # whitespace ("a " splits to ["a", ""]) — this matches the DuckDB
    # oracle regexp_extract_all(text, '\S+') exactly
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_bpe = pc.cast(pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": n_tokens,
            "n_bpe_tokens": n_bpe,
            "n_chars_measured": n_chars,
        }
    )


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: token_stats_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_score_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> pa.Table:
    """Heuristic quality features + a composite score in [0, 1].

    Features mirror common pretraining-corpus filters (Gopher/C4-style):
    length, mean word length, stopword ratio, punctuation ratio,
    alpha ratio. Integer counts are exact; the composite is documented
    arithmetic over them.
    """
    sw = stopwords or STOPWORDS
    text = pc.coalesce(batch[text_col], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.float64())
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
    offsets = np.asarray(toks.combine_chunks().offsets if isinstance(toks, pa.ChunkedArray) else toks.offsets, dtype=np.int64)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(ne_np)])
    n_tokens = (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.float64)
    sw_pattern = "|".join(f"(?:^{w}$)" for w in sw)
    is_stop = pc.cast(pc.match_substring_regex(flat, sw_pattern, ignore_case=True), pa.int64())
    st_np = pc.and_(pc.cast(is_stop, pa.bool_()), pc.cast(nonempty, pa.bool_()))
    st_np = pc.cast(st_np, pa.int64()).to_numpy(zero_copy_only=False)
    scs = np.concatenate([[0], np.cumsum(st_np)])
    n_stop = (scs[offsets[1:]] - scs[offsets[:-1]]).astype(np.float64)

    nt = np.maximum(n_tokens, 1.0)
    nch = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1.0)
    mean_wlen = nch / nt
    stop_ratio = n_stop / nt
    punct_ratio = n_punct.to_numpy(zero_copy_only=False) / nch
    alpha_ratio = n_alpha.to_numpy(zero_copy_only=False) / nch
    length_ok = np.clip(n_tokens / 50.0, 0, 1)  # saturates at 50 tokens
    wlen_ok = np.exp(-0.5 * ((mean_wlen - 5.0) / 3.0) ** 2)
    score = 0.35 * length_ok + 0.25 * np.clip(stop_ratio * 4, 0, 1) + 0.2 * alpha_ratio + 0.2 * wlen_ok * (1 - np.clip(punct_ratio * 4, 0, 1) * 0.5)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            "n_stopwords": pa.array(n_stop.astype(np.int64), pa.int64()),
            "mean_word_len": pa.array(mean_wlen, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            "quality_score": pa.array(score, pa.float64()),
        }
    )


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id", stopwords=None):
    return ds.map_batches(
        lambda b: quality_score_batch(b, text_col, id_col, stopwords),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


GOPHER_REQUIRED_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher repetition/format quality RULES (Rae et al. 2021 Table A1)
    as EXACT integer arithmetic — every threshold is an integer cross-
    multiplication (10·x ≤ y), never a float ratio, so the op is
    bit-identical to its SQL oracle and immune to FP drift:

      bit 0  word count in [50, 100000]
      bit 1  mean word length in [3, 10]   (3·W ≤ chars ≤ 10·W)
      bit 2  symbol-to-word ratio ≤ 0.1    ('#' + '...' occurrences)
      bit 3  ≤10% of lines start with a bullet
      bit 4  ≤30% of lines end with '...'
      bit 5  ≥80% of words contain an alphabetic char
      bit 6  ≥2 of the 8 required stopwords present

    ``reasons`` sets a bit per FAILED rule; ``keep`` = reasons == 0.
    One vectorized pass, zero exchange; '...' occurrences count via the
    replace-length trick (both sides), line stats via RE2 (?m) anchors
    (both sides RE2 — identical multiline semantics)."""
    text = pc.coalesce(batch[text_col], "")
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_nonspace = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64())
    n_hash = pc.cast(pc.count_substring(text, "#"), pa.int64())
    n_ell = pc.divide(
        pc.subtract(
            pc.utf8_length(text),
            pc.utf8_length(pc.replace_substring(text, "...", "")),
        ),
        3,
    )
    n_ell = pc.cast(n_ell, pa.int64())
    n_lines = pc.add(
        pc.cast(pc.count_substring(text, "\n"), pa.int64()), 1
    )
    n_bullet = pc.cast(
        pc.count_substring_regex(text, r"(?m)^[-*•]"), pa.int64()
    )
    n_ell_end = pc.cast(
        pc.count_substring_regex(text, r"(?m)\.\.\.$"), pa.int64()
    )
    n_alpha_w = pc.cast(
        pc.count_substring_regex(text, r"\S*[A-Za-z]\S*"), pa.int64()
    )
    n_req = None
    for w in GOPHER_REQUIRED_STOPWORDS:
        ind = pc.cast(
            pc.match_substring_regex(text, rf"\b{w}\b", ignore_case=True),
            pa.int64(),
        )
        n_req = ind if n_req is None else pc.add(n_req, ind)

    W = np.asarray(n_words, dtype=np.int64)
    C = np.asarray(n_nonspace, dtype=np.int64)
    L = np.asarray(n_lines, dtype=np.int64)
    sym = np.asarray(n_hash, dtype=np.int64) + np.asarray(n_ell, dtype=np.int64)
    r = np.zeros(len(W), dtype=np.int64)
    r |= np.where((W < 50) | (W > 100_000), 1 << 0, 0)
    r |= np.where((3 * W > C) | (C > 10 * W), 1 << 1, 0)
    r |= np.where(10 * sym > W, 1 << 2, 0)
    r |= np.where(10 * np.asarray(n_bullet, np.int64) > L, 1 << 3, 0)
    r |= np.where(10 * np.asarray(n_ell_end, np.int64) > 3 * L, 1 << 4, 0)
    r |= np.where(10 * np.asarray(n_alpha_w, np.int64) < 8 * W, 1 << 5, 0)
    r |= np.where(np.asarray(n_req, np.int64) < 2, 1 << 6, 0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": n_words,
            "n_lines": n_lines,
            "reasons": pa.array(r, pa.int64()),
            "keep": pa.array(r == 0, pa.bool_()),
        }
    )


def gopher_quality_flags(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-wide Gopher-rule gate: see `gopher_quality_batch`."""
    return ds.map_batches(
        lambda b: gopher_quality_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def detect_language_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Marker-word language vote: argmax over per-language marker counts.

    Ties / no markers → 'und'. One vectorized regex count per language —
    L passes over the batch, no per-row Python.
    """
    text = pc.coalesce(batch[text_col], "")
    n = batch.num_rows
    langs = list(LANG_MARKERS)
    counts = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        pattern = "|".join(rf"\b{m}\b" if lang != "zh" else m for m in LANG_MARKERS[lang])
        counts[:, j] = pc.count_substring_regex(text, pattern, ignore_case=True).to_numpy(
            zero_copy_only=False
        )
    best = counts.argmax(axis=1)
    best_count = counts[np.arange(n), best]
    second = np.sort(counts, axis=1)[:, -2] if len(langs) > 1 else np.zeros(n)
    decided = (best_count > 0) & (best_count > second)
    pred = np.array([langs[b] for b in best], dtype=object)
    pred[~decided] = "und"
    return pa.table(
        {
            id_col: batch[id_col],
            "lang_pred": pa.array(pred.tolist(), pa.string()),
            "lang_votes": pa.array(best_count, pa.int64()),
        }
    )


def detect_language(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: detect_language_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, md5 hex, rolling 64-bit poly hash) content fingerprints.

    md5 matches any external tool (DuckDB ``md5()``); the rolling hash is
    the cheap in-pipeline identity (same family as the reference's
    sha256(title|link) keying, scheduler.py:52-53).
    """
    texts = batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts.to_pylist()]
    roll = pl.from_arrow(texts).hash(seed=1).to_numpy().astype(np.uint64)
    return pa.table(
        {
            id_col: batch[id_col],
            "md5": pa.array(md5s, pa.string()),
            "fingerprint64": pa.array(roll.view(np.int64), pa.int64()),
        }
    )


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: fingerprint_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# PII redaction: RE2 patterns shared (dialect-identical) with DuckDB's
# regexp_replace, applied in a fixed order so overlapping matches
# resolve identically everywhere.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    patterns=PII_PATTERNS, out_col: str = "text_redacted",
) -> pa.Table:
    """Replace e-mail / phone / IP literals with typed placeholders —
    one vectorized RE2 pass per pattern, no per-row Python."""
    out = pc.coalesce(batch[text_col], "")
    for pat, repl in patterns:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return pa.table({id_col: batch[id_col], out_col: out})


def redact_pii(ds, text_col: str = "text", id_col: str = "doc_id", patterns=PII_PATTERNS):
    return ds.map_batches(
        lambda b: redact_pii_batch(b, text_col, id_col, patterns),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def flag_contaminated_batch(
    batch: pa.Table, needles: list[str], text_col: str = "text",
    id_col: str = "doc_id", flag_col: str = "contaminated",
) -> pa.Table:
    """Benchmark-decontamination check: flag docs whose text contains any
    needle (a benchmark n-gram), one vectorized substring scan per
    needle. Right for the usual SMALL benchmark set (needles broadcast
    once, scans are C). If the needle set itself reaches data scale,
    switch to the shingle form: explode both sides into n-gram hashes
    and ``ops.join.sort_merge_semi_join`` them."""
    text = pc.coalesce(batch[text_col], "")
    hit = np.zeros(batch.num_rows, dtype=bool)
    for needle in needles:
        hit |= pc.match_substring(text, needle).to_numpy(zero_copy_only=False)
    return pa.table({id_col: batch[id_col], flag_col: pa.array(hit)})


def flag_contaminated(ds, needles: list[str], text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: flag_contaminated_batch(b, list(needles), text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _shingle_strings_batch(
    batch: pa.Table, text_col: str, id_col: str, k: int
) -> pa.Table:
    """Per-doc DISTINCT k-token shingle STRINGS for one batch:
    (doc_id, s) rows, block-locally distinct. Fully vectorized: one
    regex split, k strided takes, one ``binary_join_element_wise``, one
    C group_by for the distinct. String shingles (vs the uint64
    ``hashing.shingle_hashes`` form) keep the op SQL-oracle-checkable;
    the hash form is the drop-in when shingle bytes dominate at 100 TB."""
    text = pc.coalesce(batch[text_col], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    # re-pack non-empty tokens and recompute per-doc lengths
    doc_of_tok = np.repeat(
        np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets)
    )[keep]
    flat = flat.filter(pa.array(keep))
    lens = np.bincount(doc_of_tok, minlength=batch.num_rows).astype(np.int64)
    tok_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    counts = np.maximum(lens - k + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "s": pa.array([], pa.string())}
        )
    doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    base = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(base, counts)
    starts = np.repeat(tok_starts, counts) + pos_in_doc
    cols = [flat.take(pa.array(starts + j, pa.int64())) for j in range(k)]
    sh = pc.binary_join_element_wise(*cols, " ")
    t = pa.table(
        {
            id_col: pa.array(
                np.asarray(batch[id_col], dtype=np.int64)[doc_of], pa.int64()
            ),
            "s": sh,
        }
    )
    return t.group_by([id_col, "s"]).aggregate([])


def shingle_decontaminate(
    docs,
    needles,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_col: str = "contaminated",
):
    """Needle-SCALE benchmark decontamination — the documented scale
    path of :func:`flag_contaminated` (whose broadcast substring scan
    is right only while the benchmark set is small): flag every doc
    sharing at least one k-token shingle with ANY needle document.
    Both sides explode into narrow (id, shingle) rows block-locally
    (never the texts); the needle shingles build a BLOOM bitmap
    broadcast once, the doc shingles prefilter block-locally (the bulk
    of the corpus never enters an exchange), the survivors take the
    exact sort-merge semi join (bloom false positives removed), and the
    distinct hit ids attach back onto the full doc id set with a left
    join — neither side is broadcast as an exact key set, so the needle
    corpus may be as large as the training corpus. Output:
    (doc_id, contaminated:bool) for every doc."""
    from .agg import sorted_distinct
    from .join import bloom_semi_join, sort_merge_inner_join

    doc_sh = docs.map_batches(
        lambda b: _shingle_strings_batch(b, text_col, id_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    needle_sh = needles.map_batches(
        lambda b: _shingle_strings_batch(b, text_col, id_col, k).select(["s"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hits = sorted_distinct(
        bloom_semi_join(doc_sh, needle_sh, "s").map_batches(
            lambda t: t.select([id_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        [id_col],
    ).map_batches(
        lambda t: t.append_column(
            "_hit", pa.array(np.ones(t.num_rows, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = docs.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(
        ids, hits, id_col, [], ["_hit"], how="left"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                flag_col: pc.is_valid(t["_hit"]),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# Corpus term statistics: heavy hitters, per-doc repetition, term search
# --------------------------------------------------------------------------


def _doc_term_freqs(
    batch: pa.Table, text_col: str, id_col: str, terms: list[str] | None = None
) -> pa.Table:
    """Per-(doc, term) frequencies for one batch — the shared exploded
    kernel behind :func:`repetition_stats` / :func:`term_search` /
    :func:`top_terms`. Whitespace tokens, empties dropped (identical to
    ``token_stats``'s ``\\S+`` semantics and the DuckDB oracles'
    ``regexp_split_to_array(text, '\\s+')`` + empty filter).

    One ``split_pattern_regex`` + one vectorized ``Table.group_by`` —
    no per-row Python. ``terms`` prunes the exploded rows to a query
    set BEFORE the group_by (term search touches only matching tokens).
    Returns columns (row_idx, term, tf) with row_idx positional into
    ``batch``.
    """
    text = pc.coalesce(batch[text_col], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    row_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets))
    keep = pc.not_equal(flat, "")
    if terms is not None:
        keep = pc.and_(keep, pc.is_in(flat, value_set=pa.array(terms, pa.string())))
    keep_np = keep.to_numpy(zero_copy_only=False)
    pairs = pa.table(
        {"row_idx": pa.array(row_idx[keep_np]), "term": flat.filter(keep)}
    )
    g = pairs.group_by(["row_idx", "term"]).aggregate([("term", "count")])
    return pa.table(
        {"row_idx": g["row_idx"], "term": g["term"],
         "tf": pc.cast(g["term_count"], pa.int64())}
    )


def repetition_stats_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style repetition features, exact-integer per doc:
    (id, n_tokens, n_unique_tokens, top_token_count). The classic
    "fraction of tokens in the most common token" filter is
    top_token_count / n_tokens — emitted as its two integer terms so
    the driver hash is float-free.
    """
    tf = _doc_term_freqs(batch, text_col, id_col)
    g = tf.group_by(["row_idx"]).aggregate(
        [("tf", "sum"), ("tf", "max"), ("tf", "count")]
    )
    n = batch.num_rows
    n_tok = np.zeros(n, np.int64)
    top = np.zeros(n, np.int64)
    uniq = np.zeros(n, np.int64)
    idx = np.asarray(g["row_idx"], dtype=np.int64)
    n_tok[idx] = np.asarray(g["tf_sum"], dtype=np.int64)
    top[idx] = np.asarray(g["tf_max"], dtype=np.int64)
    uniq[idx] = np.asarray(g["tf_count"], dtype=np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique_tokens": pa.array(uniq, pa.int64()),
            "top_token_count": pa.array(top, pa.int64()),
        }
    )


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def top_terms(ds, k: int = 50, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Corpus heavy hitters: EXACT global top-``k`` (term, n) by count.

    Scale shape (the combiner pattern): (1) one vectorized partial count
    per block — the only pass over the text, emitting O(vocab-per-block)
    narrow rows; (2) ``sorted_group_agg`` merges partials with the
    task-based range-partition exchange (vocabulary is data-scale on a
    real corpus — no driver-size assumption, no hash-shuffle actor
    pool); (3) per-block top-k (exact: after the group-agg each term
    exists in exactly one row globally); (4) driver merge of
    O(blocks × k) finalists. Ties break (n desc, term asc).
    """
    from .agg import sorted_group_agg

    partials = ds.map_batches(
        _term_count_partial(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = sorted_group_agg(partials, ["term"], [("n", "sum", "n")])
    finalists = pa.concat_tables(
        ray.get(
            [
                _topk_block.remote(r, k)
                for r in totals.materialize().to_arrow_refs()
            ]
        )
    )
    return finalists.sort_by([("n", "descending"), ("term", "ascending")]).slice(0, k)


@ray.remote
def _topk_block(t: pa.Table, k: int) -> pa.Table:
    if t.num_rows == 0 or "term" not in t.column_names:
        return pa.table({"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    if t.num_rows <= k:
        return t.select(["term", "n"])
    return t.sort_by([("n", "descending"), ("term", "ascending")]).slice(0, k).select(["term", "n"])


def term_search(
    ds, terms: list[str], k: int = 10, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Inverted-index-style search: for each query term, the top-``k``
    docs by exact term frequency — (term, doc_id, tf), ties (tf desc,
    doc_id asc).

    Scale shape: the query terms are a broadcast SMALL side (closure
    capture → plasma once per task); each block prunes its exploded
    tokens to the query set before counting, then emits only its local
    per-term top-k (≤ |terms|·k narrow rows per block — exact, since a
    doc's text lives wholly in one row/block). The driver merges
    O(blocks · |terms| · k) finalist rows. No exchange at all.
    """

    def block_search(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        tf = _doc_term_freqs(t, text_col, id_col, terms=terms)
        if tf.num_rows == 0:
            return empty
        out = pa.table(
            {
                "term": tf["term"],
                "doc_id": pc.take(t[id_col], tf["row_idx"]),
                "tf": tf["tf"],
            }
        )
        return _head_per_term(out, k)

    finalist_rows = ds.map_batches(
        block_search, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not finalist_rows:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
    return _head_per_term(pa.Table.from_pylist(finalist_rows), k)


def _head_per_term(t: pa.Table, k: int) -> pa.Table:
    """First ``k`` rows per term of ``t`` under (tf desc, doc_id asc) —
    vectorized run-boundary slicing, no per-group Python loop."""
    s = t.sort_by(
        [("term", "ascending"), ("tf", "descending"), ("doc_id", "ascending")]
    )
    terms_np = s.column("term").combine_chunks().to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(
        np.concatenate([[True], terms_np[1:] != terms_np[:-1]])
    )
    bounds = np.concatenate([starts, [len(terms_np)]])
    rank = np.arange(len(terms_np), dtype=np.int64) - np.repeat(
        bounds[:-1], np.diff(bounds)
    )
    return s.filter(pa.array(rank < k))


def top_ngrams(
    ds, n: int = 2, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Corpus n-gram heavy hitters (LM-style n-gram statistics): exact
    global top-``k`` space-joined word n-grams by count. Same scale
    shape as :func:`top_terms` (per-block combiner partial →
    sort-exchange over the n-gram vocabulary → per-block top-k →
    driver merge); n-grams never cross documents, and empties are
    dropped BEFORE adjacency (matching the DuckDB
    list_filter-then-pair oracle).
    """
    from .agg import sorted_group_agg

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        text = pc.coalesce(t[text_col], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < n:
            return empty
        # vectorized adjacency: an n-gram starts at i iff rows i..i+n-1
        # share one doc — no per-row Python, one element-wise join
        same = np.ones(m - n + 1, dtype=bool)
        for j in range(1, n):
            same &= r[j : m - n + 1 + j] == r[: m - n + 1]
        parts = [f.slice(j, m - n + 1) for j in range(n)]
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, " ")
        grams = joined.filter(pa.array(same))
        if len(grams) == 0:
            return empty
        g = pa.table({"term": grams}).group_by(["term"]).aggregate([("term", "count")])
        return pa.table(
            {"term": g["term"], "n": pc.cast(g["term_count"], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = sorted_group_agg(partials, ["term"], [("n", "sum", "n")])
    finalists = pa.concat_tables(
        ray.get([_topk_block.remote(r, k) for r in totals.materialize().to_arrow_refs()])
    )
    return finalists.sort_by([("n", "descending"), ("term", "ascending")]).slice(0, k)


def normalize_text_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "text_norm",
) -> pa.Table:
    """C4-style text normalization, dialect-identical to the DuckDB
    oracle (nfc_normalize/lower/regexp_replace/trim): NFC unicode
    normalization → lowercase → collapse whitespace runs to one space →
    trim edges. NFC runs through polars (vectorized utf8proc; this
    pyarrow build's ``utf8_normalize`` does not COMPOSE — verified
    'e'+U+0301 stays decomposed under form="NFC"); everything else is
    pyarrow.compute."""
    t = pc.coalesce(batch[text_col], "")
    t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    t = pl.from_arrow(t).str.normalize("NFC").to_arrow()
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim(t, characters=" ")
    return pa.table({id_col: batch[id_col], out_col: t})


def normalize_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: normalize_text_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------- chunking


def chunk_documents_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
) -> pa.Table:
    """Token-window chunking (the pretraining / embedding prep op): each
    doc → overlapping chunks of ``size`` whitespace tokens every
    ``stride`` (chunk starts = range(0, n_tokens, stride); the last
    chunk is the tail). Fully vectorized: one regex split, numpy range
    stitching, one gather, one binary_join — no per-row Python. Tokens
    follow the repo-wide \\S+ convention (empties dropped). Docs with 0
    tokens yield 0 chunks. Output (id, chunk_id, chunk)."""
    text = pc.coalesce(batch[text_col], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = pc.list_flatten(toks)
    raw_off = np.asarray(toks.offsets, dtype=np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    F = flat.filter(pa.array(keep))
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    O = kept_cum[raw_off]  # filtered per-row token offsets
    n_tok = np.diff(O)
    n_chunks = (n_tok + stride - 1) // stride  # 0 chunks for 0 tokens
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_col: pa.array([], batch.schema.field(id_col).type),
                "chunk_id": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    row_rep = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_chunks)
    cum = np.concatenate([[0], np.cumsum(n_chunks)])
    local = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], n_chunks)
    start = local * stride
    lens = np.minimum(start + size, n_tok[row_rep]) - start
    abs_start = O[:-1][row_rep] + start
    coff = np.concatenate([[0], np.cumsum(lens)])
    idx = (
        np.arange(int(coff[-1]), dtype=np.int64)
        - np.repeat(coff[:-1], lens)
        + np.repeat(abs_start, lens)
    )
    chunk_list = pa.ListArray.from_arrays(
        pa.array(coff, pa.int32()), F.take(pa.array(idx))
    )
    # polars-normalized text arrives as large_string; binary_join needs
    # a separator of the SAME string type as the list values
    sep = pa.scalar(
        " ", pa.large_string() if pa.types.is_large_string(F.type) else pa.string()
    )
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(row_rep)),
            "chunk_id": pa.array(local, pa.int64()),
            "chunk": pc.binary_join(chunk_list, sep).cast(pa.string()),
        }
    )


def chunk_documents(ds, text_col="text", id_col="doc_id", size=32, stride=24):
    return ds.map_batches(
        lambda b: chunk_documents_batch(b, text_col, id_col, size, stride),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------------- tf-idf


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Top-``k`` TF-IDF terms per document, the classic two-pass shape:

    1. document frequency: per-block distinct (doc, term) pairs →
       zero-exchange combiner count per term (vocabulary-sized, NOT
       corpus-sized — the only thing that reaches the driver);
    2. idf = ln(N / df) broadcast once (``ray.put``), then a second
       streaming pass scores tf·idf per (doc, term) and takes each
       doc's top-k inside the block (docs are block-local because tf
       was derived there) — no shuffle anywhere.

    Ties break (score desc, term asc); score floats come from one
    shared np.log, so a sequential oracle reproduces the order
    bit-for-bit. Output (id, term, rank)."""
    import ray

    from .agg import partial_group_agg

    def df_partial(b: pa.Table) -> pa.Table:
        pairs = _doc_term_freqs(b, text_col, id_col)
        return pa.table({"term": pairs["term"]})

    df_tbl = partial_group_agg(
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        [("df", "count_all", None)],
    )
    n_docs = ds.count()
    idf = np.log(n_docs / df_tbl["df"].to_numpy().astype(np.float64))
    idf_ref = ray.put((df_tbl["term"].combine_chunks(), idf))

    def score(b: pa.Table) -> pa.Table:
        terms_arr, idf_v = ray.get(idf_ref)
        pairs = _doc_term_freqs(b, text_col, id_col)
        if pairs.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "term": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        pos = pc.index_in(pairs["term"], value_set=terms_arr)
        s = pairs["tf"].to_numpy().astype(np.float64) * idf_v[
            np.asarray(pc.fill_null(pos, 0), dtype=np.int64)
        ]
        tbl = pairs.append_column("score", pa.array(s, pa.float64()))
        idx = pc.sort_indices(
            tbl,
            sort_keys=[
                ("row_idx", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ],
        )
        srt = tbl.take(idx)
        rows = srt["row_idx"].to_numpy()
        # rank within each row run, keep rank < k
        starts = np.concatenate([[0], np.flatnonzero(np.diff(rows)) + 1])
        rank = np.arange(len(rows), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(rows)]]))
        )
        keep = rank < k
        return pa.table(
            {
                id_col: b[id_col].take(pa.array(rows[keep])),
                "term": srt["term"].filter(pa.array(keep)),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def token_freq_spectrum(ds, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Zipf frequency-of-frequencies: how many distinct terms occur
    exactly n times — the corpus-statistics pass behind vocabulary
    truncation and hapax analysis. Same combiner → term exchange as
    top_terms, then a SECOND zero-exchange combiner over the tiny
    (count → n_terms) domain. Returns (n, n_terms), exact."""
    from .agg import partial_group_agg, sorted_group_agg

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        g = tf.group_by(["term"]).aggregate([("tf", "sum")])
        return pa.table({"term": g["term"], "n": pc.cast(g["tf_sum"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = sorted_group_agg(partials, ["term"], [("n", "sum", "n")])
    return partial_group_agg(totals, ["n"], [("n_terms", "count_all", None)])


# ------------------------------------------------- duplicate n-gram spans


def _ngram_explode_batch(
    batch: pa.Table, text_col: str, id_col: str, n: int
) -> pa.Table:
    """One block → (gram, id) rows: every n-token window of every doc,
    gram = tokens joined by ' '. Same flatten/filter/offset-stitch
    machinery as chunk_documents_batch; the n shifted gathers feed one
    vectorized binary_join_element_wise — no per-row Python."""
    text = pc.coalesce(batch[text_col], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = pc.list_flatten(toks)
    raw_off = np.asarray(toks.offsets, dtype=np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    F = flat.filter(pa.array(keep))
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    O = kept_cum[raw_off]
    n_tok = np.diff(O)
    cnt = np.maximum(n_tok - n + 1, 0)
    total = int(cnt.sum())
    if total == 0:
        return pa.table(
            {
                "gram": pa.array([], pa.string()),
                id_col: pa.array([], batch.schema.field(id_col).type),
            }
        )
    live = cnt > 0
    row_rep = np.repeat(np.flatnonzero(live), cnt[live])
    cum = np.concatenate([[0], np.cumsum(cnt[live])])
    local = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], cnt[live])
    g0 = O[:-1][row_rep] + local
    sep = pa.scalar(
        " ", pa.large_string() if pa.types.is_large_string(F.type) else pa.string()
    )
    shifted = [F.take(pa.array(g0 + s)) for s in range(n)]
    return pa.table(
        {
            "gram": pc.binary_join_element_wise(*shifted, sep).cast(pa.string()),
            id_col: batch[id_col].take(pa.array(row_rep)),
        }
    )


@ray.remote
def _dup_gram_partial(id_col: str, *parts: pa.Table) -> pa.Table:
    """Kernel for one gram-complete exchange task: every instance of
    each gram in this task is the gram's GLOBAL instance set, so an
    instance is duplicated iff its run length > 1. Emits per-doc
    partial dup counts (id, nd)."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    s = tbl.take(pc.sort_indices(tbl, sort_keys=[("gram", "ascending")]))
    nrows = s.num_rows
    grams = s["gram"].combine_chunks()
    new_g = np.empty(nrows, dtype=bool)
    new_g[0] = True
    if nrows > 1:
        new_g[1:] = pc.not_equal(grams.slice(1), grams.slice(0, nrows - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_g)
    lens = np.diff(np.concatenate([starts, [nrows]]))
    dup = np.repeat(lens > 1, lens)
    t = pa.table(
        {id_col: s[id_col], "d": pa.array(dup.astype(np.int64), pa.int64())}
    )
    g = t.group_by([id_col]).aggregate([("d", "sum")])
    return pa.table({id_col: g[id_col], "nd": pc.cast(g["d_sum"], pa.int64())})


def dup_ngram_stats(ds, text_col: str = "text", id_col: str = "doc_id", n: int = 5):
    """Exact duplicate-n-gram statistics per document — the
    training-data substring-dedup signal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): a gram INSTANCE is
    duplicated iff its n-token string occurs more than once in the
    whole corpus (any doc, any position). Three scale-safe legs:

    1. explode (gram, id) per block — vectorized, \\S+ tokens;
    2. gram-key-complete exchange → per-task run-length dup marking →
       per-doc partial counts (only narrow (id, nd) rows leave);
    3. doc-sum exchange + left join back onto per-doc gram totals
       (computed block-locally, no exchange), so gram-less docs emit 0s.

    Grams travel as strings for oracle-exact identity; at corpus scale
    swap the exchange key for a 64-bit gram hash (collision-accepted)
    to keep the exchange narrow. Output (id, n_grams, n_dup_grams,
    dup_gram_ratio) with the ratio one exact int/int cast."""
    from ..stages.index import key_complete_parts
    from .agg import sorted_group_agg
    from .join import sort_merge_inner_join

    def base_stats(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t[text_col], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        raw_off = np.asarray(toks.offsets, dtype=np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        kept_cum = np.concatenate([[0], np.cumsum(keep)])
        n_tok = np.diff(kept_cum[raw_off])
        cnt = np.maximum(n_tok - n + 1, 0)
        return pa.table(
            {id_col: t[id_col], "n_grams": pa.array(cnt, pa.int64())}
        )

    base = ds.map_batches(base_stats, batch_format="pyarrow", zero_copy_batch=True)
    grams = ds.map_batches(
        lambda b: _ngram_explode_batch(b, text_col, id_col, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    groups = key_complete_parts(grams, "gram")
    if groups:
        partials = ray.data.from_arrow_refs(
            [_dup_gram_partial.remote(id_col, *parts) for parts in groups]
        )
        dup = sorted_group_agg(partials, [id_col], [("n_dup_grams", "sum", "nd")])
    else:
        dup = ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_dup_grams": pa.array([], pa.int64()),
                }
            )
        )
    joined = sort_merge_inner_join(
        base,
        dup,
        id_col,
        left_cols=["n_grams"],
        right_cols=["n_dup_grams"],
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        ng = np.asarray(t["n_grams"], dtype=np.int64)
        nd = pc.coalesce(t["n_dup_grams"], pa.scalar(0, pa.int64()))
        ndv = np.asarray(nd, dtype=np.int64)
        ratio = np.where(ng > 0, ndv / np.maximum(ng, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": t["n_grams"],
                "n_dup_grams": nd,
                "dup_gram_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------- bit-parallel edit distance


def myers_distance_batch(
    prefixes: "np.ndarray", lens: "np.ndarray", pattern: bytes
) -> "np.ndarray":
    """Levenshtein distance of ONE pattern (≤64 bytes) against MANY
    texts at once — Myers' 1999 bit-vector algorithm with every
    bit-word vectorized across the row axis: O(max_len) numpy uint64
    passes for the whole batch, no per-row DP. ``prefixes`` is an
    (R, L) uint8 matrix (null-padded), ``lens`` the true byte lengths.
    Byte-level distance == character Levenshtein for ASCII text (the
    caller is expected to slice/sanitize accordingly)."""
    m = len(pattern)
    if not 1 <= m <= 64:
        raise ValueError(f"pattern length {m} outside [1, 64]")
    R, L = prefixes.shape
    one = np.uint64(1)
    peq = np.zeros(256, np.uint64)
    for i, ch in enumerate(pattern):
        peq[ch] |= one << np.uint64(i)
    hmask = one << np.uint64(m - 1)
    pv = np.full(R, ~np.uint64(0), np.uint64)
    mv = np.zeros(R, np.uint64)
    score = np.full(R, m, np.int64)
    final = np.where(lens == 0, score, -1)
    for j in range(min(L, int(lens.max()) if R else 0)):
        eq = peq[prefixes[:, j]]
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        score += ((ph & hmask) != 0).astype(np.int64)
        score -= ((mh & hmask) != 0).astype(np.int64)
        ph = (ph << one) | one
        mh = mh << one
        pv = mh | ~(xv | ph)
        mv = ph & xv
        final = np.where(lens == j + 1, score, final)
    return final


def _prefix_matrix(col, prefix_len: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Arrow string column → (R, prefix_len) uint8 matrix + byte lens."""
    sliced = pc.utf8_slice_codeunits(
        pc.fill_null(col, ""), start=0, stop=prefix_len
    )
    lens = pc.binary_length(sliced).to_numpy(zero_copy_only=False).astype(np.int64)
    arr = np.array(sliced.to_pylist(), dtype=f"S{prefix_len}")
    mat = arr.view(np.uint8).reshape(len(lens), prefix_len)
    return mat, lens


def edit_distance_search(
    ds,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    max_dist: int = 10,
):
    """Fuzzy search: byte-level Levenshtein of each doc's
    ``prefix_len``-byte text prefix against a broadcast list of query
    patterns, keeping hits within ``max_dist`` — the typo-tolerant
    lookup a curation pipeline runs to find near-copies of a known
    snippet. Patterns ship once in the task closure (tiny); each block
    runs Q bit-parallel Myers passes (vectorized across rows), so the
    hot loop is O(Q · prefix_len) numpy ops per block regardless of
    row count. Output: (id, pattern_id, dist) rows, dist ≤ max_dist."""
    pats = [p.encode("utf-8")[:prefix_len] for p in patterns]

    def block(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        out_id, out_p, out_d = [], [], []
        if t.num_rows:
            mat, lens = _prefix_matrix(t[text_col], prefix_len)
            for pi, pat in enumerate(pats):
                d = myers_distance_batch(mat, lens, pat)
                keep = np.flatnonzero(d <= max_dist)
                if len(keep):
                    out_id.append(ids.take(pa.array(keep, pa.int64())))
                    out_p.append(
                        pa.array(np.full(len(keep), pi, np.int64), pa.int64())
                    )
                    out_d.append(pa.array(d[keep], pa.int64()))
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "pattern_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_id]
                ),
                "pattern_id": pa.concat_arrays(out_p),
                "dist": pa.concat_arrays(out_d),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- keyword hit counts


def keyword_hit_counts(ds, keywords: list[str], text_col: str = "text") -> pa.Table:
    """Per-keyword document-frequency report — the reference's
    keyword-list predicate (news.py:38-68, case-insensitive substring)
    turned into a tagging/monitoring count: for each keyword, how many
    docs contain it. One lowercase pass + one vectorized
    match_substring per keyword per block, K ints per block to the
    driver (zero-exchange combiner). Keywords ship in the task closure
    (config-scale)."""
    kws = [k.lower() for k in keywords]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            counts = [0] * len(kws)
        else:
            low = pc.utf8_lower(pc.fill_null(t[text_col], ""))
            counts = [
                int(
                    pc.sum(
                        pc.match_substring(low, k).cast(pa.int64())
                    ).as_py()
                    or 0
                )
                for k in kws
            ]
        return pa.table(
            {
                "keyword": pa.array(kws, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    acc = {k: 0 for k in kws}
    for r in parts:
        acc[r["keyword"]] += r["n"]
    return pa.table(
        {
            "keyword": pa.array(kws, pa.string()),
            "n_docs": pa.array([acc[k] for k in kws], pa.int64()),
        }
    )


def _term_count_partial(text_col: str, id_col: str):
    """Per-block (term, n) combiner partial — shared by top_terms /
    vocab_build: one exploded-kernel pass, O(vocab-per-block) rows out."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        g = tf.group_by(["term"]).aggregate([("tf", "sum")])
        return pa.table({"term": g["term"], "n": pc.cast(g["tf_sum"], pa.int64())})

    return partial


def vocab_build(
    ds, min_count: int = 2, text_col: str = "text", id_col: str = "doc_id"
):
    """Tokenizer vocabulary: every term with corpus count >= min_count,
    assigned a stable contiguous 0-based token_id in (count desc, term
    asc) order — the word→id table a tokenizer/embedding trainer feeds
    on. Combiner partials → task-based sorted group-agg over the
    (data-scale) vocabulary → threshold filter → ONE global rank sort
    (stages/index.zip_with_index). Deterministic at any parallelism:
    the order key (n desc, term asc) is a total order."""
    from ..stages.index import zip_with_index
    from .agg import sorted_group_agg

    partials = ds.map_batches(
        _term_count_partial(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = sorted_group_agg(partials, ["term"], [("n", "sum", "n")])

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table(
                {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return t.filter(pc.greater_equal(t["n"], min_count))

    kept = totals.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return zip_with_index(kept, ["n", "term"], [True, False], rank_col="token_id")


def doc_rarity(
    ds,
    rare_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc rare-token signal (exact integers): n_tokens, n_rare
    (token occurrences whose GLOBAL corpus frequency <= rare_max), and
    sum_term_freq (sum over occurrences of each token's corpus count —
    low values = unusual vocabulary, the integer-exact cousin of
    unigram-LM surprisal). The OOV/noise filter a pretraining curation
    pass runs before tokenizer fitting.

    Shape: exploded (doc, term, tf) pairs → corpus totals ATTACHED on
    the term-complete exchange (ops/window.attach_group_agg — the
    aggregate-then-join-back plan paid an extra exchange plus a
    re-execution of the explode) → per-doc sums on the doc exchange.
    Two exchanges, all task-based, no driver materialization."""
    from .agg import sorted_group_agg
    from .window import attach_group_agg

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type if id_col in t.column_names else pa.string()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        ids = t[id_col].take(tf["row_idx"])
        return pa.table(
            {id_col: ids, "term": tf["term"], "tf": pc.cast(tf["tf"], pa.int64())}
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    joined = attach_group_agg(pair_ds, "term", [("n", "sum", "tf")])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tf" not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_rare": pa.array([], pa.int64()),
                    "sum_term_freq": pa.array([], pa.int64()),
                }
            )
        tf = pc.cast(t["tf"], pa.int64())
        n = pc.cast(t["n"], pa.int64())
        rare = pc.if_else(pc.less_equal(n, rare_max), tf, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": tf,
                "n_rare": rare,
                "sum_term_freq": pc.multiply_checked(tf, n),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_group_agg(
        scored,
        [id_col],
        [
            ("n_tokens", "sum", "n_tokens"),
            ("n_rare", "sum", "n_rare"),
            ("sum_term_freq", "sum", "sum_term_freq"),
        ],
    )


def _char_pair_explode(terms: pa.Array, weights, max_len: int) -> pa.Table:
    """Adjacent-codepoint pairs of each term, weighted: O(max word
    length) vectorized slice kernels, no per-row Python."""
    tl = pc.utf8_length(terms)
    outs = []
    for i in range(max(0, max_len - 1)):
        mask = pc.greater(tl, i + 1)
        sub_t = terms.filter(mask)
        if len(sub_t) == 0:
            break
        outs.append(
            pa.table(
                {
                    "l": pc.utf8_slice_codeunits(sub_t, start=i, stop=i + 1),
                    "r": pc.utf8_slice_codeunits(sub_t, start=i + 1, stop=i + 2),
                    "n": weights.filter(mask),
                }
            )
        )
    if not outs:
        return pa.table(
            {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    flat = pa.concat_tables(outs)
    g = flat.group_by(["l", "r"]).aggregate([("n", "sum")])
    return pa.table(
        {"l": g["l"], "r": g["r"], "n": pc.cast(g["n_sum"], pa.int64())}
    )


@ray.remote
def _pair_topk_block(t: pa.Table, k: int) -> pa.Table:
    empty = pa.table(
        {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
         "n_pairs": pa.array([], pa.int64())}
    )
    if t.num_rows == 0 or "n_pairs" not in t.column_names:
        return empty
    order = [("n_pairs", "descending"), ("l", "ascending"), ("r", "ascending")]
    return t.sort_by(order).slice(0, k).select(["l", "r", "n_pairs"])


def bpe_merge_candidates(
    ds, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """One iteration of BPE tokenizer training, distributed: the global
    top-``k`` adjacent character pairs by occurrence count across all
    token occurrences (Sennrich et al. 2016's merge-candidate step —
    the highest-count pair is the next merge rule).

    Scale shape: each block (1) counts its DISTINCT tokens first (the
    sentencepiece trick — pair-explode work scales with block
    vocabulary, not token count), (2) explodes adjacent codepoint
    pairs weighted by the local counts via O(max word length)
    vectorized slice kernels, and emits a (l, r, n) combiner partial;
    ONE sorted group-agg exchange merges partials; per-block top-k +
    driver merge finishes exactly (each (l,r) exists in one row after
    the agg). Ties (n desc, l, r)."""
    from .agg import sorted_group_agg

    term_partial = _term_count_partial(text_col, id_col)

    def partial(t: pa.Table) -> pa.Table:
        w = term_partial(t)
        if w.num_rows == 0:
            return _char_pair_explode(pa.array([], pa.string()), pa.array([], pa.int64()), 0)
        max_len = pc.max(pc.utf8_length(w["term"])).as_py() or 0
        return _char_pair_explode(
            w["term"].combine_chunks(), w["n"].combine_chunks(), int(max_len)
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = sorted_group_agg(partials, ["l", "r"], [("n_pairs", "sum", "n")])
    finalists = pa.concat_tables(
        ray.get(
            [_pair_topk_block.remote(r, k) for r in totals.materialize().to_arrow_refs()]
        )
    )
    return finalists.sort_by(
        [("n_pairs", "descending"), ("l", "ascending"), ("r", "ascending")]
    ).slice(0, k)


# Ordered HTML→text extraction patterns — the single source of truth
# shared with the DuckDB oracle (pipelines/queries builds the identical
# nested regexp_replace chain), like PII_PATTERNS. RE2-safe (no
# backtracking), dotall via inline (?s) so <script> bodies spanning
# newlines strip. Reference analog: the listing parser strips markup
# before item extraction (/root/reference/src/secbot/parsers via
# BeautifulSoup get_text); this is the engine's vectorized form.
HTML_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"\s+", " "),
    (r"^ | $", ""),
]


def html_to_text_batch(
    batch: pa.Table, html_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Vectorized HTML→text extraction (the fetch→parse step of every
    web corpus pipeline): drop script/style/comment blocks, strip tags,
    unescape the common entities, collapse whitespace. One compiled RE2
    pass per pattern over the whole column — no per-row Python."""
    s = pc.coalesce(batch[html_col], "")
    for pat, repl in HTML_STRIP_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return pa.table({id_col: batch[id_col], "text_extracted": s})


def html_to_text(ds, html_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: html_to_text_batch(b, html_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# og:/link structured-metadata extraction — the discovery step of every
# image+caption crawl (LAION mines <meta property="og:image"> + alt/og
# titles for its pairs). One RE2 pattern per field, each with exactly one
# named capture group; the DuckDB oracle uses the SAME patterns with the
# name stripped (og_meta_sql_pattern), so the two sides cannot drift.
# Reference analog: the listing parser pulls per-item fields out of page
# HTML by selector (/root/reference/src/secbot/fetchers/news.py:98-122);
# this is the head-metadata form of that extraction.
OG_META_PATTERNS: dict[str, str] = {
    "page_title": r"<title>(?P<page_title>[^<]*)</title>",
    "og_title": r'<meta property="og:title" content="(?P<og_title>[^"]*)"',
    "og_image": r'<meta property="og:image" content="(?P<og_image>[^"]*)"',
    "canonical_url": r'<link rel="canonical" href="(?P<canonical_url>[^"]*)"',
}


def og_meta_sql_pattern(name: str) -> str:
    """The DuckDB form of an OG_META_PATTERNS entry: same regex, plain
    (unnamed) capture group for regexp_extract(html, pat, 1)."""
    return OG_META_PATTERNS[name].replace(f"(?P<{name}>", "(")


def og_metadata_batch(
    batch: pa.Table, html_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Vectorized page-metadata extraction: one pc.extract_regex per
    field over the whole HTML column (first match wins, null when the
    page lacks the tag). No per-row Python, no DOM build — head metadata
    is shallow enough that anchored RE2 fields are the scale path."""
    s = pc.coalesce(batch[html_col], "")
    cols: dict = {id_col: batch[id_col]}
    for name, pat in OG_META_PATTERNS.items():
        m = pc.extract_regex(s, pat)
        cols[name] = pc.struct_field(m, name)
    return pa.table(cols)


def og_metadata(ds, html_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: og_metadata_batch(b, html_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# Caption/alt-text junk signals — the single source of truth shared with
# the DuckDB oracle (LAION-style caption cleaning: filenames, bare URLs,
# camera placeholders carry no training signal). RE2-safe.
CAPTION_JUNK_PATTERNS: dict[str, str] = {
    "is_filename": r"(?i)^[a-z0-9 _-]+\.(jpe?g|png|gif|webp|bmp)$",
    "has_url": r"https?://",
    "has_placeholder": r"(?i)(untitled|dsc[ _-]?[0-9]|img[ _-]?[0-9]|no caption|stock photo)",
}


def caption_junk_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Vectorized junk-caption signals: one compiled RE2 scan per
    pattern over the column + exact digit/char counts. A curation pass
    filters on these (drop filenames/URL-only captions, cap digit
    ratio)."""
    s = pc.coalesce(batch[text_col], "")
    cols: dict = {id_col: batch[id_col]}
    for name, pat in CAPTION_JUNK_PATTERNS.items():
        cols[name] = pc.match_substring_regex(s, pat)
    cols["n_digits"] = pc.cast(
        pc.count_substring_regex(s, "[0-9]"), pa.int64()
    )
    cols["n_chars"] = pc.cast(pc.utf8_length(s), pa.int64())
    return pa.table(cols)


def caption_junk(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: caption_junk_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SCRIPT_CLASSES: dict[str, str] = {
    # RE2 single-codepoint classes — identical semantics in pyarrow's
    # count_substring_regex and DuckDB's regexp_replace (both RE2), so
    # the SQL oracle shares these literal pattern strings.
    "latin": r"[A-Za-z]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}\x{1F00}-\x{1FFF}]",
    "han": r"[\x{4E00}-\x{9FFF}]",
    "hangul": r"[\x{AC00}-\x{D7AF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
    "kana": r"[\x{3040}-\x{30FF}]",
}


def script_profile_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Unicode-script profile: exact per-script codepoint counts (one
    vectorized RE2 class scan per script) + dominant-script label.

    Complements the marker-word ``detect_language`` (language ≠ script;
    script is the cheap first routing signal a multilingual corpus
    pipeline applies before any model). Dominant = first max in
    SCRIPT_CLASSES order; all-zero → 'none' — the same deterministic
    tie rule the SQL oracle's CASE chain expresses.
    """
    s = pc.coalesce(batch[text_col], "")
    names = list(SCRIPT_CLASSES)
    n = batch.num_rows
    counts = np.zeros((n, len(names)), dtype=np.int64)
    cols: dict = {id_col: batch[id_col]}
    for j, name in enumerate(names):
        c = pc.cast(pc.count_substring_regex(s, SCRIPT_CLASSES[name]), pa.int64())
        counts[:, j] = c.to_numpy(zero_copy_only=False)
        cols[f"n_{name}"] = c
    best = counts.argmax(axis=1)  # first max wins, matching the CASE chain
    pred = np.array([names[b] for b in best], dtype=object)
    pred[counts.max(axis=1) == 0] = "none"
    cols["script_pred"] = pa.array(pred.tolist(), pa.string())
    return pa.table(cols)


def script_profile(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: script_profile_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def char_entropy_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    q_bits: int = 20,
) -> pa.Table:
    """Per-doc character-level Shannon entropy (the gibberish /
    repeated-char quality gate): per-doc byte histogram via ONE
    bincount over (row, byte), each count's ``c·(log2 n − log2 c)``
    term QUANTIZED to an int (doc_surprisal's trick) so the per-doc
    reduction is an exact order-free integer sum — the SQL oracle
    reproduces it bit-for-bit (DuckDB log2 is bit-equal to np.log2 on
    this host, see bigram_pmi). Bytes == codepoints on ASCII corpora
    (the fixture guarantee; a multibyte corpus would shift both sides
    identically only under a byte-level SQL dialect). Output
    (id, n_chars, entropy_q) with entropy bits = entropy_q/(2^q_bits·n).
    Docs with no characters are dropped (the SQL GROUP BY convention)."""
    texts = batch[text_col]
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    texts = pc.coalesce(texts, "")
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n_rows = batch.num_rows
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "entropy_q": pa.array([], pa.int64()),
        }
    )
    if n_rows == 0:
        return empty
    off0 = texts.offset  # zero-copy batch slices start mid-buffer
    offsets = np.frombuffer(texts.buffers()[1], dtype=np.int32)[
        off0 : off0 + n_rows + 1
    ].astype(np.int64)
    data_buf = texts.buffers()[2]
    if data_buf is None or offsets[-1] == offsets[0]:
        return empty
    raw = np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    counts = np.zeros((n_rows, 256), dtype=np.int64)
    np.add.at(counts, (row_of, raw.astype(np.int64)), 1)
    n = lens.astype(np.float64)
    c = counts.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.floor(
            c * (np.log2(n)[:, None] - np.log2(c)) * np.float64(1 << q_bits) + 0.5
        )
    terms[counts == 0] = 0.0
    ent = terms.astype(np.int64).sum(axis=1)
    keep = lens > 0
    return pa.table(
        {
            id_col: batch[id_col].filter(pa.array(keep)),
            "n_chars": pa.array(lens[keep], pa.int64()),
            "entropy_q": pa.array(ent[keep], pa.int64()),
        }
    )


def char_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: char_entropy_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def remove_boilerplate_lines(
    ds,
    min_count: int = 20,
    min_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet/RefinedWeb-style corpus-level boilerplate line removal:
    drop every newline-delimited line of length >= ``min_len`` that
    occurs at least ``min_count`` times across the WHOLE corpus (nav
    menus, cookie banners, copyright footers), preserving the order of
    surviving lines. Returns (id, clean_text, n_removed).

    Scale shape: (1) one vectorized partial line-count per block —
    the only full pass over the text; (2) ``sorted_group_agg`` merges
    the (line, n) partials on the task-based exchange; (3) the
    threshold filter leaves the hot set, bounded above by
    total_lines/min_count and in practice tiny (it IS the boilerplate
    vocabulary), collected on the driver and broadcast ONCE via
    ``ray.put``; (4) one rebuild pass per block: split → ``is_in``
    membership mask → prefix-sum offset re-stitch → ``binary_join``.
    No per-row Python anywhere. If the hot set ever outgrew the
    broadcast bound, step 4 swaps for explode + ``sort_merge_anti_join``
    on line + ordered reassembly on the key-complete exchange (the
    stages/sinks ordered-concat pattern)."""
    from .agg import sorted_group_agg

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"line": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        parts = pc.split_pattern(pc.coalesce(t[text_col], ""), "\n")
        flat = pc.list_flatten(parts)
        flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), min_len))
        if len(flat) == 0:
            return empty
        g = pa.table({"line": flat}).group_by(["line"]).aggregate([("line", "count")])
        return pa.table(
            {"line": g["line"], "n": pc.cast(g["line_count"], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    totals = sorted_group_agg(partials, ["line"], [("n", "sum", "n")])

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table({"line": pa.array([], pa.string())})
        return t.filter(pc.greater_equal(t["n"], min_count)).select(["line"])

    hot_rows = totals.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    hot_ref = ray.put(pa.array(sorted(r["line"] for r in hot_rows), pa.string()))

    def rebuild(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)  # zero-copy from the local object store
        parts = pc.split_pattern(pc.coalesce(t[text_col], ""), "\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        # hot lines all have len >= min_len by construction — membership
        # alone decides the drop; short/rare lines pass untouched
        drop = pc.is_in(flat, value_set=hot).to_numpy(zero_copy_only=False)
        offsets = np.asarray(parts.offsets, dtype=np.int64)
        csum = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(drop, out=csum[1:])
        removed = csum[offsets[1:]] - csum[offsets[:-1]]
        kept_off = (offsets - csum[offsets]).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(kept_off, pa.int32()), flat.filter(pa.array(~drop))
        )
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pc.binary_join(lst, "\n"),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return ds.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)


_LINE_NO_BITS = 21  # 2M lines/doc; doc_id must fit 42 bits


@ray.remote
def _line_dedup_block(
    id_col: str, text_col: str, min_len: int, *parts: pa.Table
) -> pa.Table:
    """Reassembly kernel for one doc-complete part: docs rows (side 0)
    carry text, kept rows (side 1) carry winning line_nos. Fully
    vectorized: one split, one packed isin, one offset re-stitch."""
    tables = [p for p in parts if p.num_rows]
    t = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    side = np.asarray(t["_side"], dtype=np.int8)
    docs = t.filter(pa.array(side == 0))
    kept = t.filter(pa.array(side == 1))
    ids_d = np.asarray(docs[id_col], dtype=np.int64)
    texts = docs[text_col].combine_chunks()
    lines = pc.split_pattern(pc.coalesce(texts, ""), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = pc.list_flatten(lines)
    off = np.asarray(lines.offsets, dtype=np.int64)
    counts = off[1:] - off[:-1]
    doc_of = np.repeat(np.arange(len(ids_d), dtype=np.int64), counts)
    line_no = np.arange(len(flat), dtype=np.int64) - off[doc_of]
    packed_all = (ids_d[doc_of] << _LINE_NO_BITS) | line_no
    kept_packed = (
        np.asarray(kept[id_col], dtype=np.int64) << _LINE_NO_BITS
    ) | np.asarray(kept["line_no"], dtype=np.int64)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    participate = lens >= min_len
    keep = ~participate | np.isin(packed_all, kept_packed)
    new_counts = np.bincount(
        doc_of[keep], minlength=len(ids_d)
    ).astype(np.int64)
    new_off = np.zeros(len(ids_d) + 1, np.int64)
    np.cumsum(new_counts, out=new_off[1:])
    lst = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32), pa.int32()), flat.filter(pa.array(keep))
    )
    return pa.table(
        {
            id_col: pa.array(ids_d, pa.int64()),
            "clean_text": pc.binary_join(lst, "\n"),
            "n_removed": pa.array(counts - new_counts, pa.int64()),
        }
    )


def dedup_lines_first_wins(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
):
    """Global FIRST-WINS exact line deduplication (the RefinedWeb /
    MassiveText intra-corpus step): every newline-delimited line of
    length >= ``min_len`` keeps only its first occurrence in corpus
    order (doc_id, line_no); all later occurrences — across docs AND
    within a doc — are removed. Sub-``min_len`` lines (empty lines with
    the default) are structural and always kept. Differs from
    `remove_boilerplate_lines` (count-threshold removal of ALL
    occurrences): here exactly one copy of every duplicated line
    survives, at its earliest position. Returns (id, clean_text,
    n_removed).

    Scale shape: (1) one vectorized explode pass ships NARROW
    (line_hash, packed doc·line position) rows — never line text;
    (2) `sorted_group_agg` min on the task-based exchange picks each
    hash's earliest occurrence — the winner rows ARE the kept set, so
    no second join against the occurrences; (3) winners (two int64s
    per surviving line) union the docs on a doc-complete exchange and
    one vectorized kernel re-stitches surviving lines per doc. A
    boilerplate line with millions of occurrences is just a long run
    under a min-aggregate — no pair blowup. 64-bit line-hash collision
    risk is the same accepted exact_dedup trade (documented there)."""
    from ..stages.index import key_complete_parts
    from .agg import sorted_group_agg

    def occurrences(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"lh": pa.array([], pa.int64()), "packed": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) and int(ids.max()) >= 1 << (63 - _LINE_NO_BITS):
            raise ValueError("doc_id exceeds the 42-bit packing bound")
        lines = pc.split_pattern(pc.coalesce(t[text_col], ""), "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        off = np.asarray(lines.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), off[1:] - off[:-1])
        line_no = np.arange(len(flat), dtype=np.int64) - off[doc_of]
        if len(line_no) and int(line_no.max()) >= 1 << _LINE_NO_BITS:
            raise ValueError("line_no exceeds the 21-bit packing bound")
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        part = lens >= min_len
        if not part.any():
            return empty
        lh = pl.from_arrow(flat.filter(pa.array(part))).hash(seed=0).to_numpy()
        packed = (ids[doc_of[part]] << _LINE_NO_BITS) | line_no[part]
        return pa.table(
            {
                "lh": pa.array(lh.view(np.int64), pa.int64()),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    occ = ds.map_batches(occurrences, batch_format="pyarrow", zero_copy_batch=True)
    winners = sorted_group_agg(occ, ["lh"], [("w", "min", "packed")])

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "line_no": pa.array([], pa.int64())}
            )
        w = np.asarray(t["w"], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(w >> _LINE_NO_BITS, pa.int64()),
                "line_no": pa.array(w & ((1 << _LINE_NO_BITS) - 1), pa.int64()),
            }
        )

    kept = winners.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: t[id_col],
                    text_col: t[text_col]
                    if side == 0
                    else pa.nulls(t.num_rows, pa.string()),
                    "line_no": pa.nulls(t.num_rows, pa.int64())
                    if side == 0
                    else t["line_no"],
                    "_side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return f

    tagged = ds.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(kept.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
    groups = key_complete_parts(tagged, id_col, order=["_side"])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_removed": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _line_dedup_block.remote(id_col, text_col, min_len, *parts)
            for parts in groups
        ]
    )


@ray.remote
def _assemble_tokens_block(id_col: str, *parts: pa.Table) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    tbl = tbl.sort_by([(id_col, "ascending"), ("ord", "ascending")]).combine_chunks()
    tid = pc.cast(pc.fill_null(tbl["token_id"], -1), pa.int64())
    tid = tid.combine_chunks() if isinstance(tid, pa.ChunkedArray) else tid
    ids = tbl[id_col].combine_chunks()
    n = tbl.num_rows
    new_doc = np.empty(n, dtype=bool)
    new_doc[0] = True
    if n > 1:
        new_doc[1:] = pc.not_equal(ids.slice(1), ids.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_doc)
    bounds = np.concatenate([starts, [n]]).astype(np.int64)
    strs = pc.cast(tid, pa.string())
    lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), strs)
    oov = np.asarray(pc.equal(tid, -1), dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(oov)])
    return pa.table(
        {
            id_col: ids.take(pa.array(starts)),
            "token_ids": pc.binary_join(lists, " "),
            "n_oov": pa.array(csum[bounds[1:]] - csum[bounds[:-1]], pa.int64()),
        }
    )


def tokenize_with_vocab(
    docs, vocab, text_col: str = "text", id_col: str = "doc_id"
):
    """Apply a trained word-level vocabulary (``vocab_build``'s
    (term, token_id) table) to a corpus: per doc, the space-joined
    token-id sequence in original token order, OOV as -1, plus the OOV
    count — the encode step between tokenizer training and sequence
    packing.

    Shape: vectorized (doc, ord, term) explode (prefix-sum ordinals,
    empties dropped with the \\S+ convention) → one sort-merge LEFT
    join against the DATA-SCALE vocab on term (no broadcast assumption
    — a web-corpus vocab is millions of rows) → ordered per-doc
    reassembly on the key-complete exchange (ListArray re-stitch +
    binary_join, no per-row Python). Docs with zero tokens are absent
    from the output (the SQL GROUP BY convention)."""
    from ..stages.index import key_complete_parts
    from .join import sort_merge_inner_join

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "ord": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                }
            )
        toks = pc.split_pattern_regex(pc.coalesce(t[text_col], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_kept = row_of[keep]
        kept_per_row = np.bincount(row_kept, minlength=t.num_rows)
        off_kept = np.concatenate([[0], np.cumsum(kept_per_row)])
        ords = np.arange(len(row_kept), dtype=np.int64) - np.repeat(
            off_kept[:-1], kept_per_row
        )
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(row_kept)),
                "ord": pa.array(ords + 1, pa.int64()),  # 1-based like SQL
                "term": flat.filter(pa.array(keep)),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        exploded, vocab, "term", [id_col, "ord"], ["token_id"], how="left"
    )
    groups = key_complete_parts(joined, id_col, order=["ord"])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "token_ids": pa.array([], pa.string()),
                    "n_oov": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [_assemble_tokens_block.remote(id_col, *parts) for parts in groups]
    )


# --------------------------------------------------------- inverted index


def posting_lists(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Inverted-index build: one row per term with its document
    frequency and the SORTED posting list (SQL ``list(doc_id ORDER BY
    doc_id)`` over distinct (term, doc) pairs) — the search-index /
    retrieval primitive over a tokenized corpus.

    Shape: the shared exploded kernel (:func:`_doc_term_freqs`, one
    regex split + one vectorized group_by per block — distinctness is
    free) → ONE key-complete exchange on ``term``
    (ops/window.group_collect_list: run starts become the ListArray
    offsets, zero-copy) → df = list length, block-local. Hot-term
    caveat inherited from collect_list: a stop-word's full posting list
    materializes in its owner task — prune a stopword/DF-ceiling list
    upstream at corpus scale (same contract as vocab_build's floor)."""
    from .window import group_collect_list

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                }
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        ids = pc.cast(t[id_col].take(tf["row_idx"]), pa.int64())
        return pa.table({"term": tf["term"], id_col: ids})

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    lists = group_collect_list(pair_ds, "term", [id_col], id_col)
    return lists.map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "df": pc.cast(pc.list_value_length(t["values"]), pa.int64()),
                "postings": t["values"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------ fuzzy match join


@ray.remote
def _fuzzy_join_block(
    id_col: str, s_col: str, max_dist: int, *parts: pa.Table
) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    t = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    side = np.asarray(t["_side"], dtype=np.int64)
    ids = np.asarray(t[id_col], dtype=np.int64)
    strs = t[s_col].to_pylist()
    blks = t["_blk"].to_pylist()
    # a part is key-complete but may hold SEVERAL blocks (sorted runs);
    # pairing must stay within one block or the blocking contract leaks
    n = t.num_rows
    run_starts = [0] + [i for i in range(1, n) if blks[i] != blks[i - 1]] + [n]
    out_l, out_r, out_d = [], [], []
    for s0, s1 in zip(run_starts, run_starts[1:]):
        seg = np.arange(s0, s1)
        li = seg[side[s0:s1] == 0]
        ri = seg[side[s0:s1] == 1]
        if not len(li) or not len(ri):
            continue
        rbytes = [strs[i].encode("utf-8")[:64] for i in ri]
        L = max(len(b) for b in rbytes)
        prefixes = np.zeros((len(ri), L), np.uint8)
        lens = np.zeros(len(ri), np.int64)
        for j, b in enumerate(rbytes):
            prefixes[j, : len(b)] = np.frombuffer(b, np.uint8)
            lens[j] = len(b)
        for i in li:
            pat = strs[i].encode("utf-8")[:64]
            if not pat:
                continue
            d = myers_distance_batch(prefixes, lens, pat)
            hit = np.flatnonzero(d <= max_dist)
            out_l.extend([int(ids[i])] * len(hit))
            out_r.extend(int(ids[ri[j]]) for j in hit)
            out_d.extend(int(d[j]) for j in hit)
    return pa.table(
        {
            "left_id": pa.array(out_l, pa.int64()),
            "right_id": pa.array(out_r, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        }
    )


def fuzzy_match_join(
    left,
    right,
    id_col: str = "id",
    s_col: str = "s",
    max_dist: int = 2,
    block_chars: int = 1,
):
    """Record-linkage fuzzy join: (left_id, right_id, dist) for every
    cross-side pair with byte-level Levenshtein ≤ ``max_dist`` whose
    strings share a BLOCK (first ``block_chars`` characters) — the
    classic blocking+verify shape: candidate generation is an
    equi-exchange on the block key, never an all-pairs; the verify is
    the bit-parallel Myers kernel (one vectorized pass per left string
    per block, no per-pair DP). Blocking is part of the operator
    contract (a typo inside the block prefix moves a record to another
    block and is NOT matched) — the oracle applies the identical block
    predicate. SCALE: block granularity is the skew knob — 1 char ≈
    tens of blocks (fine for dimension-sized sides), corpus scale wants
    2-3 chars (or prefix+length) so no single block outgrows one task's
    L×R verify. Strings are truncated to 64 bytes (Myers word width);
    byte distance == character distance for ASCII inputs."""
    import ray.data

    from ..stages.index import key_complete_parts

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            s = t[s_col].combine_chunks()
            blk = pc.utf8_slice_codeunits(s, 0, block_chars)
            return pa.table(
                {
                    "_blk": blk,
                    "_side": pa.array(
                        np.full(t.num_rows, side, np.int64), pa.int64()
                    ),
                    id_col: t[id_col],
                    s_col: s,
                }
            )

        return fn

    both = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
    groups = key_complete_parts(both, "_blk", order=["_side", id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [
            _fuzzy_join_block.remote(id_col, s_col, max_dist, *p)
            for p in groups
        ]
    )


# ----------------------------------------------- unigram-LM surprisal


def doc_surprisal(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale_bits: int = 20,
):
    """Per-doc unigram-LM surprisal in bits — the float cousin of
    :func:`doc_rarity`: each token contributes −log2(c_w / N) where c_w
    is its corpus count and N the corpus token total. Every token's
    term is QUANTIZED to an integer (floor(log2(c_w/N)·2^scale_bits
    + 0.5) — quantization is part of the operator definition, the
    ops/agg.group_entropy trick), so the per-doc reduction is an exact
    integer sum: order-free, layout-proof, and expressible in REAL SQL
    (quantization absorbs the last-ulp np.log2-vs-libm drift). Same two
    task-based exchanges as doc_rarity (explode → totals ATTACHED on
    the term exchange → per-doc sums); floats only in the final
    bits = −S/2^scale_bits and bits_per_token division. Output:
    (doc_id, n_tokens, surprisal_bits, bits_per_token)."""
    from .agg import sorted_group_agg
    from .window import attach_group_agg

    scale = np.float64(1 << scale_bits)

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        ids = pc.cast(t[id_col].take(tf["row_idx"]), pa.int64())
        return pa.table(
            {id_col: ids, "term": tf["term"], "tf": pc.cast(tf["tf"], pa.int64())}
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    joined = attach_group_agg(pair_ds, "term", [("n", "sum", "tf")])
    # joined's blocks are eager refs: the corpus token total is one
    # cheap pass over them (Σ tf — each occurrence row counted once)
    n_total = sum(
        r["s"]
        for r in joined.map_batches(
            lambda t: pa.table(
                {"s": pa.array(
                    [pc.sum(t["tf"]).as_py() or 0 if t.num_rows else 0],
                    pa.int64(),
                )}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    nf = np.float64(n_total)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tf" not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        tf = np.asarray(t["tf"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        qterm = np.floor(
            np.log2(n.astype(np.float64) / nf) * scale + np.float64(0.5)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(tf, pa.int64()),
                "q": pa.array(qterm * tf, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    agg = sorted_group_agg(
        scored, [id_col], [("n_tokens", "sum", "n_tokens"), ("s", "sum", "q")]
    )

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"], dtype=np.int64).astype(np.float64)
        nt = np.asarray(t["n_tokens"], dtype=np.int64).astype(np.float64)
        bits = -(s / scale)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "surprisal_bits": pa.array(bits, pa.float64()),
                "bits_per_token": pa.array(bits / nt, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


NB_QUANT = 1 << 20


def _nb_lq(x) -> np.ndarray:
    """floor(log2(x)·2^20 + 0.5) as int64 — the shared quantized-log
    convention (char_entropy / zipf_slope; DuckDB log2 verified
    bit-equal to np.log2 on this host)."""
    return np.floor(
        np.log2(np.asarray(x, dtype=np.float64)) * NB_QUANT + 0.5
    ).astype(np.int64)


@ray.remote
def _nb_score_block(
    id_col: str, labels: list[str], prior_q: np.ndarray, norm_q: np.ndarray,
    *parts: pa.Table,
) -> pa.Table:
    """Argmax scoring over one doc-complete run set: rows are n_tok
    markers (label '') and per-(doc,label) quantized likelihood
    partials; the score matrix build is two np.add.at scatters + one
    vectorized argmax — no per-row Python."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    n = tbl.num_rows
    ids = tbl[id_col].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(ids.slice(1), ids.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    run_id = np.cumsum(new_key) - 1
    starts = np.flatnonzero(new_key)
    n_docs = len(starts)
    li = pc.index_in(
        tbl["label"].combine_chunks(), value_set=pa.array([""] + labels)
    ).to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False)
    marker = li == 0
    ntok = np.zeros(n_docs, np.int64)
    np.add.at(ntok, run_id[marker], val[marker])
    P = np.zeros((n_docs, len(labels)), np.int64)
    pm = ~marker
    np.add.at(P, (run_id[pm], li[pm] - 1), val[pm])
    scores = prior_q[None, :] - ntok[:, None] * norm_q[None, :] + P
    best = np.argmax(scores, axis=1)  # first max = smallest label wins ties
    return pa.table(
        {
            id_col: ids.take(pa.array(starts, pa.int64())),
            "pred_label": pa.array([labels[b] for b in best], pa.string()),
            "score_q": pa.array(scores[np.arange(n_docs), best], pa.int64()),
        }
    )


def naive_bayes_classify(
    train_ds,
    test_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
):
    """Multinomial naive-Bayes train → classify — the fastText/CCNet
    quality-classifier slot of a curation pipeline, exact-integer
    throughout so any layout/parallelism is bit-identical.

    Model: add-one smoothing; score(d, l) = log2 P(l) +
    Σ_w tf_w·log2((c_{l,w}+1)/(N_l+V)). Every log2 is quantized via
    :func:`_nb_lq`, so per-(doc,label) sums are order-free int64.
    Smoothed zero terms (c=0 → log2 1 = 0) vanish, which is what makes
    the likelihood an INNER join against the (label, term) count table
    — absent pairs contribute exactly 0.

    Shape: train explode → one (label,term) sorted group-agg (counts
    materialized once: vocab×L narrow rows) → config-scale label stats
    driver-side → test explode → one term-complete join → one
    doc-complete exchange whose kernel is two scatters + an argmax.
    Output (id, pred_label, score_q); test docs with zero tokens are
    absent (same as the SQL oracle's token-derived doc set)."""
    from .agg import partial_group_agg, sorted_group_agg
    from .join import sort_merge_inner_join
    from ..stages.index import key_complete_parts

    def tr_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.string()),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        return pa.table(
            {
                "label": t[label_col].take(tf["row_idx"]),
                "term": tf["term"],
                "tf": pc.cast(tf["tf"], pa.int64()),
            }
        )

    counts = sorted_group_agg(
        train_ds.map_batches(tr_pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "term"],
        [("c", "sum", "tf")],
    ).materialize()  # vocab×L narrow rows, read 3×below

    # config-scale label stats (and V) driver-side
    n_lang_tbl = partial_group_agg(counts, ["label"], [("n_lang", "sum", "c")])
    d_lang_tbl = partial_group_agg(train_ds, [label_col], [("d", "count_all", None)])
    v_train = sorted_group_agg(
        counts, ["term"], [("nl", "count_all", None)]
    ).count()
    n_lang = dict(zip(n_lang_tbl["label"].to_pylist(), n_lang_tbl["n_lang"].to_pylist()))
    d_lang = dict(zip(d_lang_tbl[label_col].to_pylist(), d_lang_tbl["d"].to_pylist()))
    labels = sorted(n_lang)  # ascending = deterministic tie-break order
    d_total = sum(d_lang.values())
    prior_q = _nb_lq([d_lang[l] for l in labels]) - _nb_lq(d_total)
    norm_q = _nb_lq([n_lang[l] + v_train for l in labels])

    def add_cq(t: pa.Table) -> pa.Table:
        cq = _nb_lq(np.asarray(t["c"], dtype=np.int64) + 1)
        return pa.table(
            {"term": t["term"], "label": t["label"],
             "cq": pa.array(cq, pa.int64())}
        )

    counts_cq = counts.map_batches(add_cq, batch_format="pyarrow", zero_copy_batch=True)

    def te_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        return pa.table(
            {
                id_col: pc.cast(t[id_col].take(tf["row_idx"]), pa.int64()),
                "term": tf["term"],
                "tf": pc.cast(tf["tf"], pa.int64()),
            }
        )

    test_pairs = test_ds.map_batches(
        te_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(
        test_pairs, counts_cq, "term", [id_col, "tf"], ["label", "cq"]
    )

    def to_partial(t: pa.Table) -> pa.Table:
        val = np.asarray(t["tf"], np.int64) * np.asarray(t["cq"], np.int64)
        return pa.table(
            {id_col: t[id_col], "label": t["label"],
             "val": pa.array(val, pa.int64())}
        )

    def to_marker(t: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: t[id_col],
             "label": pa.array([""] * t.num_rows, pa.string()),
             "val": t["tf"]}
        )

    union = joined.map_batches(
        to_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        test_pairs.map_batches(to_marker, batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(union, id_col, order=["label"])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()),
                 "pred_label": pa.array([], pa.string()),
                 "score_q": pa.array([], pa.int64())}
            )
        )
    return ray.data.from_arrow_refs(
        [
            _nb_score_block.remote(id_col, labels, prior_q, norm_q, *parts)
            for parts in groups
        ]
    )


def dsir_importance(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    doc by the unigram log-ratio log p_target(x) − log p_raw(x), where
    both LMs are add-one-smoothed over the raw vocabulary; resampling
    by these weights shifts a crawl corpus toward a target domain.
    ``target_col`` marks the target-domain docs (bool).

    Exact-integer scoring: logratio_q = Σ_w tf·(Lq(c_t+1) − Lq(c_r+1))
    + n_tok·(Lq(N_r+V) − Lq(N_t+V)) with the shared quantized-log
    :func:`_nb_lq`, so per-doc sums are order-free int64 and bit-equal
    to the SQL oracle. Absent-in-target terms contribute Lq(1)=0 by
    construction, so the likelihood rides ONE inner join against the
    (term, cr, ct) totals (every pair matches: raw counts include the
    doc itself). Shape: explode → both totals ATTACHED on one
    term-complete exchange → one doc group-agg. Output
    (id, n_tokens, logratio_q)."""
    from .agg import sorted_group_agg
    from .window import attach_group_agg

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()),
                 "tft": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, text_col, id_col)
        ids = pc.cast(t[id_col].take(tf["row_idx"]), pa.int64())
        is_t = pc.cast(t[target_col].take(tf["row_idx"]), pa.bool_())
        tf_i = pc.cast(tf["tf"], pa.int64())
        return pa.table(
            {
                id_col: ids,
                "term": tf["term"],
                "tf": tf_i,
                "tft": pc.if_else(is_t, tf_i, pa.scalar(0, pa.int64())),
            }
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    # (cr, ct) totals ATTACHED on the one term-complete exchange
    # (ops/window.attach_group_agg) — the aggregate + join-back plan
    # paid an extra exchange and re-executed the explode per consumer;
    # _first marks each term run once so the vocabulary size is a row sum
    joined = attach_group_agg(
        pair_ds,
        "term",
        [("cr", "sum", "tf"), ("ct", "sum", "tft")],
        mark_first="_first",
    )
    stats = joined.map_batches(
        lambda t: pa.table(
            {
                "nr": pa.array([pc.sum(t["tf"]).as_py() or 0], pa.int64()),
                "nt": pa.array([pc.sum(t["tft"]).as_py() or 0], pa.int64()),
                "v": pa.array(
                    [pc.sum(pc.cast(t["_first"], pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )
        if t.num_rows
        else pa.table(
            {"nr": pa.array([0], pa.int64()), "nt": pa.array([0], pa.int64()),
             "v": pa.array([0], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    n_raw = sum(r["nr"] for r in stats)
    n_tgt = sum(r["nt"] for r in stats)
    v = sum(r["v"] for r in stats)
    k_norm = int(_nb_lq(n_raw + v)[()]) - int(_nb_lq(n_tgt + v)[()]) if v else 0

    def to_val(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tf" not in t.column_names:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "val": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64())}
            )
        ct = np.asarray(t["ct"], np.int64)
        cr = np.asarray(t["cr"], np.int64)
        dq = _nb_lq(ct + 1) - _nb_lq(cr + 1)
        val = np.asarray(t["tf"], np.int64) * dq
        return pa.table(
            {id_col: t[id_col], "val": pa.array(val, pa.int64()), "tf": t["tf"]}
        )

    agg = sorted_group_agg(
        joined.map_batches(to_val, batch_format="pyarrow", zero_copy_batch=True),
        [id_col],
        [("sum_val", "sum", "val"), ("n_tokens", "sum", "tf")],
    )

    def finish(t: pa.Table) -> pa.Table:
        lr = (
            np.asarray(t["sum_val"], np.int64)
            + np.asarray(t["n_tokens"], np.int64) * k_norm
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "logratio_q": pa.array(lr, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def heldout_cross_entropy(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale_bits: int = 20,
):
    """Held-out LM evaluation: train an add-one-smoothed unigram model
    on the EVEN-id half of the corpus, score every ODD-id doc's
    bits-per-token under it — the train/eval drift check a corpus
    refresh runs before swapping data in. Same quantized-integer-term
    trick as :func:`doc_surprisal` (each token contributes
    floor(log2((c_w+1)/(N+V+1))·2^k + 0.5) — an exact order-free int),
    held-out terms LEFT-join the train totals so OOV tokens get the
    smoothed floor probability. Output per held-out doc:
    (doc_id, n_tokens, heldout_bits, bits_per_token)."""
    from .agg import sorted_group_agg
    from .join import sort_merge_inner_join

    scale = np.float64(1 << scale_bits)

    def pairs(train: bool):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "term": pa.array([], pa.string()),
                        "tf": pa.array([], pa.int64()),
                    }
                )
            ids64 = pc.cast(t[id_col], pa.int64())
            want = pc.equal(
                pc.bit_wise_and(ids64, pa.scalar(1, pa.int64())),
                pa.scalar(0 if train else 1, pa.int64()),
            )
            f = t.filter(want)
            if f.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "term": pa.array([], pa.string()),
                        "tf": pa.array([], pa.int64()),
                    }
                )
            tf = _doc_term_freqs(f, text_col, id_col)
            ids = pc.cast(f[id_col].take(tf["row_idx"]), pa.int64())
            return pa.table(
                {
                    id_col: ids,
                    "term": tf["term"],
                    "tf": pc.cast(tf["tf"], pa.int64()),
                }
            )

        return fn

    train_ds = ds.map_batches(pairs(True), batch_format="pyarrow", zero_copy_batch=True)
    ho_ds = ds.map_batches(pairs(False), batch_format="pyarrow", zero_copy_batch=True)
    totals = sorted_group_agg(train_ds, ["term"], [("c", "sum", "tf")])
    stats = totals.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64()),
                "v": pa.array([t.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    n_train = sum(r["n"] for r in stats)
    v_train = sum(r["v"] for r in stats)
    denom = np.float64(n_train + v_train + 1)
    joined = sort_merge_inner_join(
        ho_ds, totals, "term", [id_col, "tf"], ["c"], how="left"
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tf" not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        tf = np.asarray(t["tf"], dtype=np.int64)
        c = np.asarray(
            pc.coalesce(t["c"], pa.scalar(0, t.schema.field("c").type)),
            dtype=np.int64,
        )
        qterm = np.floor(
            np.log2((c + 1).astype(np.float64) / denom) * scale
            + np.float64(0.5)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(tf, pa.int64()),
                "q": pa.array(qterm * tf, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    agg = sorted_group_agg(
        scored, [id_col], [("n_tokens", "sum", "n_tokens"), ("s", "sum", "q")]
    )

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"], dtype=np.int64).astype(np.float64)
        nt = np.asarray(t["n_tokens"], dtype=np.int64).astype(np.float64)
        bits = -(s / scale)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "heldout_bits": pa.array(bits, pa.float64()),
                "bits_per_token": pa.array(bits / nt, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUANT = 1 << 20


def bm25_search(
    ds,
    terms: list[str],
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25 top-k retrieval for a fixed query-term set (Robertson/
    Sparck-Jones; Lucene-style idf, log2 variant): score(d) =
    Σ_t idf(t)·tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)). Every
    per-(doc,term) contribution is QUANTIZED to int64 (shared _nb_lq
    convention), so the per-doc total is an exact merge-order-free
    integer sum and the final ranking (score_q DESC, doc_id) is fully
    deterministic — bit-identical to the SQL oracle, which evaluates
    the same float expression in the same parenthesization.

    Shape: pass 1 streams tiny per-block partials — (term, df) rows
    plus a '' marker row carrying (n_docs, n_tokens) — summed on the
    driver into |Q|+2 constants (a doc lives in one block, so per-block
    df partials are exact). Pass 2 emits narrow (doc, term, tf, dl)
    rows for MATCHING docs only, scores them vectorized with the
    broadcast constants, and ONE doc-keyed exchange + a top-k sort of
    one narrow row per matching doc finishes. Nothing ever ships text
    through an exchange."""
    from .agg import sorted_group_agg

    terms = list(terms)

    def _doc_term_tf(t: pa.Table):
        """(flat nonempty tokens, doc_of, per-doc dl) for one block."""
        toks = pc.split_pattern_regex(pc.coalesce(t[text_col], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        doc_of = doc_of[keep]
        dl = np.bincount(doc_of, minlength=t.num_rows).astype(np.int64)
        return flat, doc_of, dl

    def stats_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_tok": pa.array([], pa.int64())}
            )
        flat, doc_of, dl = _doc_term_tf(t)
        out_t, out_df = [""], [0]
        for q in terms:
            eq = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[eq], minlength=t.num_rows)
            out_t.append(q)
            out_df.append(int((tf > 0).sum()))
        n = len(out_t)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "df": pa.array(out_df, pa.int64()),
                "n_docs": pa.array([t.num_rows] + [0] * (n - 1), pa.int64()),
                "n_tok": pa.array([int(len(flat))] + [0] * (n - 1), pa.int64()),
            }
        )

    rows = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n_docs = float(sum(r["n_docs"] for r in rows))
    n_tok = float(sum(r["n_tok"] for r in rows))
    df: dict[str, float] = {q: 0.0 for q in terms}
    for r in rows:
        if r["term"]:
            df[r["term"]] += r["df"]
    avgdl = n_tok / n_docs
    idf = {
        q: float(np.log2((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for q, d in df.items()
        if d > 0
    }

    def score_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()),
             "tq": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        flat, doc_of, dl = _doc_term_tf(t)
        ids = np.asarray(t[id_col], dtype=np.int64)
        out_id, out_q, out_tf = [], [], []
        for q, w in idf.items():
            eq = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[eq], minlength=t.num_rows)
            hit = tf > 0
            if not hit.any():
                continue
            tf_f = tf[hit].astype(np.float64)
            dl_f = dl[hit].astype(np.float64)
            num = tf_f * (BM25_K1 + 1.0)
            den = tf_f + BM25_K1 * ((1.0 - BM25_B) + (BM25_B * dl_f) / avgdl)
            tq = np.floor((w * num) / den * BM25_QUANT + 0.5).astype(np.int64)
            out_id.append(ids[hit])
            out_q.append(tq)
            out_tf.append(tf[hit].astype(np.int64))
        if not out_id:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "tq": pa.array(np.concatenate(out_q), pa.int64()),
                "tf": pa.array(np.concatenate(out_tf), pa.int64()),
            }
        )

    scored = ds.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_doc = sorted_group_agg(
        scored, [id_col], [("score_q", "sum", "tq"), ("n_hits", "sum", "tf")]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "n_hits": pa.array([], pa.int64()),
                 "score_q": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        sq = np.asarray(t["score_q"], dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": t["n_hits"],
                "score_q": t["score_q"],
                "score": pa.array(
                    sq.astype(np.float64) / float(BM25_QUANT), pa.float64()
                ),
            }
        )

    out = per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["score_q", id_col], descending=[True, False]).limit(k)
