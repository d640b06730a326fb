"""Dedup family: minhash/ngram/simhash/containment/winnow/spans/semantic + curation chains.

Split from pipelines/queries.py (registry unchanged — see
queries.build_queries); mechanical move, no semantic change.
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..ops import dedup as dd
from ..ops import multimodal as mm
from ..ops import sampling as sp
from ..ops import similarity as sim
from ..ops import text as tx
from ..stages.index import assign_stable_ids
from ..stages.parse import merged_distinct_iocs

from .queries_rel import (
    ORACLE_SQL,
    TOKEN_BUDGET,
    WEB_MIN_TOKENS,
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    _drop_word3,
    _ds_from_table,
    _planted_docs_tbl,
    _planted_embeddings_tbl,
    _read,
    _swap01,
)

def q_minhash_dedup_pairs(sf_dir: str):
    """MinHash+LSH near-dup detection over documents + planted one-word-
    drop mutations (deterministic). Non-SQL: LSH bucketing."""
    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    pairs = dd.minhash_lsh_pairs(planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5)
    return pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram jaccard verification of the minhash candidates."""
    planted_tbl = _planted_docs_tbl(sf_dir, _drop_word3)
    planted = _ds_from_table(planted_tbl)
    pairs = dd.minhash_lsh_pairs(planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5)
    ver = dd.ngram_jaccard_verify(pairs, _ds_from_table(planted_tbl), threshold=0.6)
    return ver.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


def q_dedup_spans(sf_dir: str):
    """Exact duplicate-substring REMOVAL (Lee et al. 2022) over the
    planted near-dup corpus: every duplicated 5-token window stripped
    from all non-owner occurrences, overlaps merged
    (ops/dedup.dedup_span_removal). Non-SQL: sequential-replica oracle
    pipelines/expected.expected_span_removal."""
    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    return dd.dedup_span_removal(planted, n=5)


def q_winnow_dup_pairs(sf_dir: str):
    """MOSS winnowing near-dup pairs over documents + planted one-word-
    drop mutations: docs sharing >= WINNOW_MIN_SHARED winnowed local
    fingerprints (ops/dedup.winnow_dup_pairs — guarantees a shared
    fingerprint for any verbatim run of w+k-1 tokens, the property the
    probabilistic MinHash family lacks). Non-SQL: sequential-replica
    oracle (pipelines/expected.expected_winnow_pairs)."""
    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    return dd.winnow_dup_pairs(
        planted, k=WINNOW_K, w=WINNOW_W, min_shared=WINNOW_MIN_SHARED
    )


def q_gopher_quality(sf_dir: str):
    """Gopher-rules quality gate (ops/text.gopher_quality_flags): seven
    Rae-et-al Table A1 rules as exact integer cross-multiplications,
    a per-doc failed-rule bitmask and keep flag. Zero exchange."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.gopher_quality_flags(ds)


def _gopher_oracle_sql() -> str:
    from ..ops.text import GOPHER_REQUIRED_STOPWORDS

    req = " + ".join(
        f"CASE WHEN regexp_matches(t, '\\b{w}\\b', 'i') THEN 1 ELSE 0 END"
        for w in GOPHER_REQUIRED_STOPWORDS
    )
    return (
        "SELECT doc_id, n_words, n_lines, CAST(reasons AS BIGINT) AS reasons, "
        "  reasons = 0 AS keep FROM ("
        "  SELECT doc_id, n_words, n_lines, "
        "    (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END"
        "     + CASE WHEN 3*n_words > n_nonspace OR n_nonspace > 10*n_words "
        "         THEN 2 ELSE 0 END"
        "     + CASE WHEN 10*(n_hash + n_ell) > n_words THEN 4 ELSE 0 END"
        "     + CASE WHEN 10*n_bullet > n_lines THEN 8 ELSE 0 END"
        "     + CASE WHEN 10*n_ell_end > 3*n_lines THEN 16 ELSE 0 END"
        "     + CASE WHEN 10*n_alpha_w < 8*n_words THEN 32 ELSE 0 END"
        "     + CASE WHEN n_req < 2 THEN 64 ELSE 0 END) AS reasons"
        "  FROM ("
        "    SELECT doc_id, "
        r"      CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS n_words, "
        r"      CAST(len(regexp_extract_all(t, '\S')) AS BIGINT) AS n_nonspace, "
        "      CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash, "
        "      CAST((length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) "
        "        AS n_ell, "
        "      CAST(length(t) - length(replace(t, chr(10), '')) + 1 AS BIGINT) "
        "        AS n_lines, "
        "      CAST(len(regexp_extract_all(t, '(?m)^[-*•]')) AS BIGINT) "
        "        AS n_bullet, "
        r"      CAST(len(regexp_extract_all(t, '(?m)\.\.\.$')) AS BIGINT) "
        "        AS n_ell_end, "
        r"      CAST(len(regexp_extract_all(t, '\S*[A-Za-z]\S*')) AS BIGINT) "
        "        AS n_alpha_w, "
        f"      ({req}) AS n_req "
        "    FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)))"
    )


ORACLE_SQL["gopher_quality"] = _gopher_oracle_sql()


LINE_TOKENS = 6  # tokens per synthetic line in the line-dedup plant


def _nl6(tokens: list[str]) -> str:
    """Group tokens 6-per-line — deterministic multi-line structure the
    SQL oracle re-derives with range(…, 6) + list slicing."""
    return "\n".join(
        " ".join(tokens[i : i + LINE_TOKENS])
        for i in range(0, len(tokens), LINE_TOKENS)
    )


def _planted_lines_tbl(sf_dir: str) -> pa.Table:
    """documents newline-ified (6 tokens/line) + planted tail copies:
    copy doc_id+1e6 = lines 2.. of its source (token-aligned, so every
    copy line exactly duplicates a source line). Shared by the query
    and the SQL oracle."""
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    toks = [(s or "").split() for s in t["text"].to_pylist()]
    ids = np.asarray(t["doc_id"], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate([ids, ids + 1_000_000]), pa.int64()
            ),
            "text": pa.array(
                [_nl6(tk) for tk in toks]
                + [_nl6(tk[LINE_TOKENS:]) for tk in toks],
                pa.string(),
            ),
        }
    )


def q_line_dedup(sf_dir: str):
    """Global first-wins exact LINE dedup (RefinedWeb/MassiveText
    intra-corpus step, ops/text.dedup_lines_first_wins) over newline-
    ified documents + planted tail copies: every duplicated line keeps
    only its earliest (doc_id, line_no) occurrence, so the planted
    copies collapse to empty. REAL SQL oracle: row_number() over
    (PARTITION BY line ORDER BY doc_id, line_no)."""
    planted = _ds_from_table(_planted_lines_tbl(sf_dir))
    out = tx.dedup_lines_first_wins(planted, min_len=1)
    return out


ORACLE_SQL["line_dedup"] = (
    r"WITH base AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''), "
    r"'\S+') AS t FROM documents), "
    "nl AS ("
    "  SELECT doc_id, array_to_string(list_transform(range(1, len(t)+1, 6), "
    "    i -> array_to_string(t[i:i+5], ' ')), chr(10)) AS text FROM base"
    "  UNION ALL"
    "  SELECT doc_id + 1000000, array_to_string(list_transform("
    "    range(1, len(t[7:])+1, 6), "
    "    i -> array_to_string((t[7:])[i:i+5], ' ')), chr(10)) FROM base"
    "), "
    "occ AS (SELECT doc_id, u.line AS line, u.line_no AS line_no FROM ("
    "  SELECT doc_id, unnest(list_transform(str_split(text, chr(10)), "
    "    (x, i) -> struct_pack(line := x, line_no := i - 1))) AS u FROM nl)), "
    "flagged AS (SELECT doc_id, line, line_no, "
    "  (length(line) < 1 OR row_number() OVER ("
    "     PARTITION BY line ORDER BY doc_id, line_no) = 1) AS keep "
    "  FROM occ) "
    "SELECT doc_id, "
    "  coalesce(string_agg(line, chr(10) ORDER BY line_no) "
    "    FILTER (WHERE keep), '') AS clean_text, "
    "  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed "
    "FROM flagged GROUP BY doc_id"
)


CONTAIN_K = 5
CONTAIN_THR = 0.9


def _half_doc(s: str) -> str:
    """Containment mutation: keep the first max(ceil(n/2), k) tokens —
    a sub-document fully CONTAINED in its source (containment 1.0,
    Jaccard ≈ 0.5 — below every Jaccard-LSH threshold)."""
    t = s.split()
    return " ".join(t[: max((len(t) + 1) // 2, CONTAIN_K)])


def q_containment_pairs(sf_dir: str):
    """Asymmetric shingle-containment near-dup pairs over documents +
    planted half-docs (ops/dedup.containment_dup_pairs): |S(A)∩S(B)| /
    min(|S(A)|, |S(B)|) >= 0.9 over distinct 5-token shingle sets. The
    planted halves score containment 1.0 — invisible to the Jaccard
    families at their thresholds. REAL SQL oracle: DuckDB re-derives
    the shingle sets with list_transform + a self-join."""
    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _half_doc))
    return dd.containment_dup_pairs(
        planted, k=CONTAIN_K, threshold=CONTAIN_THR
    )


ORACLE_SQL["containment_pairs"] = (
    r"WITH base AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''), "
    r"'\S+') AS t FROM documents), "
    "planted AS ("
    "  SELECT doc_id, t FROM base"
    "  UNION ALL"
    "  SELECT doc_id + 1000000, t[1:greatest((len(t)+1)//2, 5)] FROM base"
    "), "
    "sh AS (SELECT doc_id, unnest("
    "  CASE WHEN len(t) >= 5 THEN list_transform(range(1, len(t)-3), "
    "         i -> array_to_string(t[i:i+4], chr(31))) "
    "       WHEN len(t) > 0 THEN [array_to_string(t, chr(31))] "
    "       ELSE CAST([] AS VARCHAR[]) END) AS s FROM planted), "
    "dsh AS (SELECT DISTINCT doc_id, s FROM sh), "
    "sz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared "
    "  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id "
    "  GROUP BY 1, 2) "
    # capped is constitutionally FALSE here: the oracle fixture never
    # exceeds the engine's max_bucket (checked by _check_cap elsewhere),
    # so every engine pair must carry an exact (uncapped) n_shared
    "SELECT id_a, id_b, n_shared, containment, FALSE AS capped FROM ("
    "  SELECT i.id_a, i.id_b, i.n_shared, "
    "    CAST(i.n_shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) "
    "      AS containment "
    "  FROM inter i JOIN sz sa ON sa.doc_id = i.id_a "
    "  JOIN sz sb ON sb.doc_id = i.id_b) "
    "WHERE containment >= 0.9"
)


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs over documents + word-swapped copies."""
    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _swap01))
    return dd.simhash_near_dup_pairs(planted, max_hamming=3).map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )


def q_embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (planted noisy copies, seed 3)."""
    tab = _planted_embeddings_tbl(sf_dir)
    pairs = dd.embedding_cosine_pairs(_ds_from_table(tab), threshold=0.98)
    return pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


SEMDEDUP_NLIST = 8
SEMDEDUP_TRAIN_N = 2000
SEMDEDUP_THRESHOLD = 0.98


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-partitioned semantic dedup) over the planted
    noisy-copy embeddings: k-means coarse quantization partitions the
    corpus, near-dups resolve within clusters only, dropped rows come
    back as (vec_id, rep_id). Centroids train on a driver-side head
    sample (sample-scale); assignment + pairing are distributed."""
    tab = _planted_embeddings_tbl(sf_dir)
    head = tab.slice(0, SEMDEDUP_TRAIN_N)
    E = np.asarray(
        head["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(head.num_rows, -1)
    C = sim.train_centroids(E, nlist=SEMDEDUP_NLIST)
    return dd.semantic_dedup_ids(
        _ds_from_table(tab), C, threshold=SEMDEDUP_THRESHOLD
    )


def q_knn_ivf(sf_dir: str):
    """IVF-pruned ANN over the embeddings table (approximate scale path)."""
    # training sample + query vectors: stream only the first ~2000 rows
    # off disk (training is a sample-scale concern; assignment is the
    # distributed part) — never a full-table driver read
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    head_schema = pa.schema(
        [pf.schema_arrow.field("vec_id"), pf.schema_arrow.field("embedding")]
    )
    batches, need = [], 2000
    for b in pf.iter_batches(batch_size=2048, columns=["vec_id", "embedding"]):
        batches.append(b)
        need -= b.num_rows
        if need <= 0:
            break
    tbl = pa.Table.from_batches(batches, schema=head_schema).slice(0, 2000)
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    C = sim.train_centroids(E, nlist=16)
    q_ids = np.asarray(tbl["vec_id"], dtype=np.int64)[:5]
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = sim.knn_ivf(ds, q_ids, E[:5], C, k=10, nprobe=8)
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


def q_langid(sf_dir: str):
    """Marker-word language ID over documents (heuristic, non-SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.detect_language(ds).map_batches(
        lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )


def q_token_budget_sample(sf_dir: str):
    """Per-language token-budget corpus assembly: keep docs in
    content-stable md5 order while each language's running token total
    stays <= TOKEN_BUDGET (ops/sampling.budget_sample — one sort
    exchange + per-block weight-prefix filter). REAL SQL window-cumsum
    oracle with the shared md5 identity."""
    from ..ops.sampling import _digest_prefixes, budget_sample

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "")
        n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_tokens": n_tok,
                "h": pa.array(_digest_prefixes(t["doc_id"]), pa.string()),
            }
        )

    kept = budget_sample(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        key="lang",
        weight_col="n_tokens",
        order_cols=["h", "doc_id"],
        budget=TOKEN_BUDGET,
    )
    return kept.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def q_curate_web_corpus(sf_dir: str):
    """END-TO-END web corpus curation v2 — the raw-crawl front end the
    C4 chain (q_curate_corpus) assumes already happened: plant exact
    dup pages (a LEFT join on doc_id+1), wrap in an HTML shell, extract
    text (shared RE2 chain), quality-gate on token count, exact-dedup
    keep-min-id (semi join back), then assemble per-language token
    budgets in content-stable md5 order. Every stage is an
    individually-oracled op; the oracle is the SAME chain as SQL CTEs,
    bit-exact end to end."""
    from ..ops.dedup import content_hash_batch
    from ..ops.join import sort_merge_inner_join
    from ..ops.sampling import _digest_prefixes, budget_sample
    from ..ops.window import attach_group_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def a_side(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "text": t["text"],
             "nxt": pa.array(eid + 1, pa.int64())}
        )

    def n_side(t: pa.Table) -> pa.Table:
        # only eid%8==0 rows READ text_n, so only doc_id≡1 (mod 8) rows
        # can be probed — pre-filtering cuts the join's text shipment 8x
        # (left-join semantics for the rest are unchanged: null, unused)
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        m = pa.array(eid % 8 == 1)
        return pa.table(
            {"nxt": t["doc_id"].filter(m), "text_n": t["text"].filter(m)}
        )

    joined = sort_merge_inner_join(
        docs.map_batches(a_side, batch_format="pyarrow", zero_copy_batch=True),
        docs.map_batches(n_side, batch_format="pyarrow", zero_copy_batch=True),
        "nxt",
        ["doc_id", "lang", "text"],
        ["text_n"],
        how="left",
    )

    def plant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "text": pa.array([], pa.string())}
            )
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        body = pc.if_else(
            pc.and_(pa.array(eid % 8 == 0), pc.is_valid(t["text_n"])),
            t["text_n"],
            t["text"],
        )
        html = pc.binary_join_element_wise(
            "<html><head><script>var x = 1;</script><style>.nav {c: red}</style>"
            "</head><body><p>",
            pc.coalesce(body, ""),
            " &amp; tail</p><div>menu&nbsp;end</div></body></html>",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"], "text": html})

    pages = joined.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)

    def extract_and_gate(t: pa.Table) -> pa.Table:
        ext = tx.html_to_text_batch(t, "text", "doc_id")["text_extracted"]
        n_tok = pc.cast(pc.count_substring_regex(ext, r"\S+"), pa.int64())
        out = pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "text": ext,
             "n_tokens": n_tok}
        )
        return out.filter(pc.greater_equal(out["n_tokens"], WEB_MIN_TOKENS))

    gated = pages.map_batches(
        extract_and_gate, batch_format="pyarrow", zero_copy_batch=True
    )

    def meta_rows(t: pa.Table) -> pa.Table:
        # hash + project away the text in ONE pass: everything downstream
        # (dedup winners, semi join, budget sample) needs only narrow rows
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64()),
                 "content_hash": pa.array([], pa.int64()),
                 "h": pa.array([], pa.string())}
            )
        h = content_hash_batch(t, "text")
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "n_tokens": t["n_tokens"],
             "content_hash": h["content_hash"],
             "h": pa.array(_digest_prefixes(t["doc_id"]), pa.string())}
        )

    # meta rows are consumed exactly once (by the attach exchange), so
    # the heavy join→plant→extract chain executes once with no
    # materialize barrier
    meta = gated.map_batches(
        meta_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    # keep-min-id dedup in ONE exchange: attach min doc_id per content
    # hash and filter in place (the winners + semi-join-back plan paid
    # two exchanges — and needed the meta rows materialized to branch)
    survivors = attach_group_agg(
        meta, "content_hash", [("min_id", "min", "doc_id")]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["min_id"])).select(
            ["doc_id", "lang", "n_tokens", "h"]
        )
        if t.num_rows
        else t.select(["doc_id", "lang", "n_tokens", "h"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    kept = budget_sample(
        survivors,
        key="lang",
        weight_col="n_tokens",
        order_cols=["h", "doc_id"],
        budget=TOKEN_BUDGET,
    )
    return kept.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_tokens"]), batch_format="pyarrow"
    )


def q_cross_corpus_overlap(sf_dir: str):
    """Full-document train/eval leakage check: docs of corpus A (even
    ids, with planted copies of B docs at id%8==0) whose exact text
    also appears in corpus B (odd ids). Planting is itself a
    distributed LEFT join on doc_id+1; detection is a semi join on the
    64-bit content hash — only narrow (hash, id) rows cross the
    exchange, never the texts (exact_dedup's documented collision
    trade). REAL SQL oracle with text IN-subquery."""
    from ..ops.dedup import content_hash_batch
    from ..ops.join import sort_merge_inner_join, sort_merge_semi_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # hash BEFORE the plant join on both sides: the planted text of an
    # id%8==0 doc IS its successor's text, so its content hash equals
    # the successor's content hash — the join can carry 64-bit hashes
    # instead of documents, and no text ever crosses an exchange
    def a_key(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        m = pa.array(eid % 2 == 0)
        sub = t.filter(m)
        h = content_hash_batch(sub, "text")
        return pa.table(
            {"doc_id": sub["doc_id"],
             "h_own": h["content_hash"],
             "nxt": pa.array(eid[eid % 2 == 0] + 1, pa.int64())}
        )

    def nxt_side(t: pa.Table) -> pa.Table:
        # only eid%8==0 probes succeed and read text_n, so only
        # doc_id≡1 (mod 8) rows can match — 8x fewer rows shipped
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        sub = t.filter(pa.array(eid % 8 == 1))
        h = content_hash_batch(sub, "text")
        return pa.table({"nxt": sub["doc_id"], "h_n": h["content_hash"]})

    a = docs.map_batches(a_key, batch_format="pyarrow", zero_copy_batch=True)
    planted = sort_merge_inner_join(
        a,
        docs.map_batches(nxt_side, batch_format="pyarrow", zero_copy_batch=True),
        "nxt",
        ["doc_id", "h_own"],
        ["h_n"],
        how="left",
    )

    def choose(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "content_hash": pa.array([], pa.int64())}
            )
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        use_n = pa.array((eid % 8 == 0))
        h = pc.if_else(
            pc.and_(use_n, pc.is_valid(t["h_n"])), t["h_n"], t["h_own"]
        )
        return pa.table({"doc_id": t["doc_id"], "content_hash": h})

    ha = planted.map_batches(choose, batch_format="pyarrow", zero_copy_batch=True)

    def hash_b(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["doc_id"], dtype=np.int64)
        sub = t.filter(pa.array(eid % 2 == 1))
        return content_hash_batch(sub, "text").select(["content_hash"])

    hb = docs.map_batches(hash_b, batch_format="pyarrow", zero_copy_batch=True)
    hit = sort_merge_semi_join(ha, hb, "content_hash")
    return hit.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )


def q_zipf_slope(sf_dir: str):
    """Zipf-law fit of the corpus unigram distribution: exact OLS of
    quantized log2(count) on quantized log2(rank) over the ranked
    vocabulary (term-count combiner → one global rank sort →
    ops/agg.group_linreg's integer cross-moment combiner). Slope ~ -s
    is the Zipf exponent a tokenizer/coverage analysis reads off.
    REAL SQL oracle: the shared HUGEINT REGR template on the same
    quantized logs (DuckDB log2 is bit-equal to np.log2 here)."""
    from ..ops.agg import group_linreg, sorted_group_agg
    from ..stages.index import zip_with_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = ds.map_batches(
        tx._term_count_partial("text", "doc_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = sorted_group_agg(partials, ["term"], [("n", "sum", "n")])
    ranked = zip_with_index(totals, ["n", "term"], [True, False], rank_col="rank0")

    def xy(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rank0" not in t.column_names:
            return pa.table(
                {"grp": pa.array([], pa.string()),
                 "x": pa.array([], pa.int64()),
                 "y": pa.array([], pa.int64())}
            )
        rank = np.asarray(t["rank0"], np.int64) + 1
        n = np.asarray(t["n"], np.int64)
        q = np.float64(1 << 20)
        x = np.floor(np.log2(rank.astype(np.float64)) * q + 0.5).astype(np.int64)
        y = np.floor(np.log2(n.astype(np.float64)) * q + 0.5).astype(np.int64)
        return pa.table(
            {"grp": pa.array(["all"] * t.num_rows, pa.string()),
             "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())}
        )

    return group_linreg(
        ranked.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True),
        ["grp"],
        "x",
        "y",
    )


def q_corpus_report(sf_dir: str):
    """One-pass corpus health report (the dashboard numbers every
    curation run prints): doc/token/char totals, max doc length and
    distinct language count — ONE combiner pass emitting a single
    partial row per block plus a narrow lang set, merged driver-side
    (O(blocks) rows). REAL SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "")
        toks = np.asarray(
            pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
            dtype=np.int64,
        )
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array([int(toks.sum())], pa.int64()),
                "n_chars": pa.array(
                    [int(pc.sum(pc.utf8_length(text)).as_py() or 0)], pa.int64()
                ),
                "max_doc_tokens": pa.array(
                    [int(toks.max()) if len(toks) else 0], pa.int64()
                ),
                "langs": pa.array(
                    [pc.unique(t["lang"]).to_pylist()], pa.list_(pa.string())
                ),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    langs = {g for r in rows for g in (r["langs"] or []) if g is not None}
    return pa.table(
        {
            "n_docs": pa.array([sum(r["n_docs"] for r in rows)], pa.int64()),
            "n_tokens": pa.array([sum(r["n_tokens"] for r in rows)], pa.int64()),
            "n_chars": pa.array([sum(r["n_chars"] for r in rows)], pa.int64()),
            "max_doc_tokens": pa.array(
                [max((r["max_doc_tokens"] for r in rows), default=0)], pa.int64()
            ),
            "n_langs": pa.array([len(langs)], pa.int64()),
        }
    )


def q_langid_confusion(sf_dir: str):
    """Language-ID evaluation: confusion matrix of predicted vs labeled
    language — detect_language joined back to the label column on one
    sort-merge exchange, then a count combiner. REAL SQL oracle (the
    langid CTE joined to documents.lang)."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = tx.detect_language(docs).map_batches(
        lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )
    labels = docs.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )
    joined = sort_merge_inner_join(pred, labels, "doc_id", ["lang_pred"], ["lang"])

    def ones(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.column_names:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "lang_pred": pa.array([], pa.string()),
                 "one": pa.array([], pa.int64())}
            )
        return pa.table(
            {"lang": t["lang"], "lang_pred": t["lang_pred"],
             "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
        )

    return sorted_group_agg(
        joined.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "lang_pred"],
        [("n", "sum", "one")],
    )


def q_ioc_extract(sf_dir: str):
    """M8/A6: defang-aware IOC extraction + global distinct over the
    deterministic ASEC-analog fixture pages."""
    from ..fixtures import synth

    pages = ray.data.from_arrow(synth.make_ioc_pages(60, seed=42))
    return merged_distinct_iocs(pages)




DECON_SHINGLE_K = 8
DECON_NEEDLE_MOD = 50


def q_decontaminate_scaled(sf_dir: str):
    """Needle-SCALE benchmark decontamination (the documented scale
    path of flag_contaminated's broadcast scan): benchmark corpus =
    every doc_id % 50 == 0 document, flag = shares any 8-token shingle
    with any benchmark doc. Both sides explode block-locally into
    narrow (id, shingle) rows; ONE semi join + one left join back —
    neither side is broadcast (ops/text.shingle_decontaminate). REAL
    SQL oracle re-derives the identical shingle strings with list
    slicing + the same joins."""
    from ..ops.text import shingle_decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    needles = docs.map_batches(
        lambda t: t.filter(
            pa.array(np.asarray(t["doc_id"], dtype=np.int64) % DECON_NEEDLE_MOD == 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return shingle_decontaminate(docs, needles, k=DECON_SHINGLE_K)


ORACLE_SQL["decontaminate_scaled"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         array_to_string(t[CAST(i AS BIGINT):CAST(i AS BIGINT)+{DECON_SHINGLE_K - 1}], ' ') AS s
  FROM toks, UNNEST(range(1, len(t) - {DECON_SHINGLE_K} + 2)) AS u(i)),
nsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % {DECON_NEEDLE_MOD} = 0),
hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN nsh USING (s))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""
