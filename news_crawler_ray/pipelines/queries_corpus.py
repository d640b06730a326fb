"""Corpus curation + multimodal stats: letterbox/sharpness/color, audio/video, BPE, z-order, pagerank.

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

from .queries_embed import (
    LETTERBOX_N,
)
from .queries_rel import (
    BOILER_MIN_COUNT,
    BOILER_MIN_LEN,
    ORACLE_SQL,
    PACK_SEQ_LEN,
    _ds_from_table,
    _read,
    _rename,
)

def q_letterbox_stats(sf_dir: str):
    """Letterbox/pillarbox bar detection over a planted image store
    (ops/multimodal.detect_letterbox — stacked group decode, vectorized
    border reduces). Non-SQL (binary decode): sequential-replica oracle
    pipelines/expected.expected_letterbox."""
    from ..fixtures import synth
    from ..ops.multimodal import detect_letterbox

    ps = ray.data.from_arrow(synth.make_letterbox_store(LETTERBOX_N, seed=42))
    return detect_letterbox(ps)


def q_sharpness(sf_dir: str):
    """Blur detection over the planted-bars store: exact integer
    Laplacian moments per image (ops/multimodal.sharpness_score).
    Non-SQL decode: sequential-replica oracle expected_sharpness."""
    from ..fixtures import synth
    from ..ops.multimodal import sharpness_score

    ps = ray.data.from_arrow(synth.make_letterbox_store(LETTERBOX_N, seed=42))
    return sharpness_score(ps)


def q_dominant_color(sf_dir: str):
    """Dominant 12-bit quantized color per image over the planted-bars
    store (ops/multimodal.dominant_color — stacked group decode + one
    bincount matrix per stack; ties → smallest bin). Non-SQL:
    sequential-replica oracle expected_dominant_color."""
    from ..fixtures import synth
    from ..ops.multimodal import dominant_color

    ps = ray.data.from_arrow(synth.make_letterbox_store(LETTERBOX_N, seed=42))
    return dominant_color(ps)


AUDIO_N = 150
VIDEO_N = 60
VIDEO_EVERY_N = 5


def q_audio_features(sf_dir: str):
    """Audio-modality features over a deterministic WAV store: REAL
    RIFF/PCM16 decode in an actor-pool stage
    (ops/multimodal.AudioFeatureStage), exact integer per-sample
    moments (Σs², max|s|, sign transitions) so results are
    parallelism-proof. The reference has no audio (SURVEY §2); this is
    the opaque-binary payload family (input_hint) extended to the audio
    modality. Non-SQL (binary decode): sequential-replica oracle
    pipelines/expected.expected_audio_features decodes with stdlib
    ``wave`` (an INDEPENDENT reader of the same container) + explicit
    per-sample Python loops."""
    from ..fixtures import synth
    from ..ops.multimodal import audio_features

    store = ray.data.from_arrow(synth.make_audiostore(AUDIO_N, seed=42))
    return audio_features(store).select_columns(
        ["audio_id", "n_samples", "duration_us", "sum_sq", "peak",
         "zero_cross", "rms", "decode_ok"]
    )


def q_video_frame_stats(sf_dir: str):
    """Sampled-frame features over a deterministic framed-video store:
    the length-framed NCV1 container is SEEKED (unsampled frames are
    never decoded — the at-scale point of frame sampling), each sampled
    frame decoded with the real image codec, features = exact integer
    luma sum + the shared phash64 kernel
    (ops/multimodal.VideoFrameSampleStage). Non-SQL: sequential-replica
    oracle expected_video_frame_stats walks the container with its own
    struct loop and per-pixel sums."""
    from ..fixtures import synth
    from ..ops.multimodal import sample_video_frames

    store = ray.data.from_arrow(synth.make_videostore(VIDEO_N, seed=42))
    return sample_video_frames(store, every_n=VIDEO_EVERY_N)


AUDIO_DUP_N = 120
AUDIO_DUP_EVERY = 4
AUDIO_DUP_HAMMING = 6
VIDEO_CUT_N = 40
VIDEO_CUT_EVERY = 6
# planted cut (fresh uniform background) SAD ≈ 167‰ of max; the moving
# square's worst frame-to-frame SAD (wrap jump) ≈ 67‰ — 120 separates
SCENE_CUT_MILLI = 120


def q_audio_near_dup(sf_dir: str):
    """Audio near-duplicate pairs over a planted-dup WAV store: real
    decode → 64-bit energy-envelope hash (the audio phash,
    ops/multimodal.audio_envelope_hash64, exact integer
    cross-multiplies) → the SHARED banded-hamming pairing
    (hash64_near_dup_pairs, bands=8 keeps the pigeonhole exact at
    hamming ≤ 6) — audio dedup rides the same one-exchange machinery
    as simhash/image phash. Oracle: sequential all-pairs hamming over
    independently decoded clips (no banding), so a bucketing bug
    cannot self-confirm."""
    from ..fixtures import synth
    from ..ops.multimodal import audio_near_dup_pairs

    store = synth.make_audiostore(
        AUDIO_DUP_N, seed=42, dup_every=AUDIO_DUP_EVERY
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["audio_id"], 2, 32), pa.int64())
        return pa.table({"aid": ids, "bytes": t["bytes"]})

    ds = ray.data.from_arrow(store).map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    )
    return audio_near_dup_pairs(
        ds, id_col="aid", max_hamming=AUDIO_DUP_HAMMING, bands=8
    ).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_video_scene_cuts(sf_dir: str):
    """Scene-cut detection over a planted-cut video store: consecutive
    frame decode per clip, cut = inter-frame SAD over SCENE_CUT_MILLI
    permille of the max possible difference — all-integer
    (ops/multimodal.VideoSceneCutStage). Oracle: sequential
    struct-walk + per-pixel loops re-derives every delta."""
    from ..fixtures import synth
    from ..ops.multimodal import video_scene_cuts

    store = ray.data.from_arrow(
        synth.make_videostore(VIDEO_CUT_N, seed=42, cut_every=VIDEO_CUT_EVERY)
    )
    return video_scene_cuts(store, threshold_milli=SCENE_CUT_MILLI)


RETR_N = 80
RETR_KS = (1, 5, 10)


def q_audio_spectral(sf_dir: str):
    """Audio spectral features: real WAV decode + one rfft per clip,
    dominant non-DC bin + exact integer frequency
    (ops/multimodal.AudioSpectralStage). Oracle: sequential stdlib-wave
    decode + the shared rfft kernel per clip (codec-kernel-sharing
    convention, like phash64)."""
    from ..fixtures import synth
    from ..ops.multimodal import audio_spectral

    store = ray.data.from_arrow(synth.make_audiostore(AUDIO_N, seed=42))
    return audio_spectral(store).select_columns(
        ["audio_id", "dominant_bin", "dominant_hz", "n_bins"]
    )


def q_caption_retrieval(sf_dir: str):
    """Caption→image retrieval recall@k — the cross-modal eval metric
    of a CLIP-style corpus (ops/multimodal.caption_retrieval_eval):
    quantized-int unit embeddings on BOTH sides so every score is an
    exact int64 dot (float matmul is not batch-split deterministic),
    gallery broadcast once, per-batch rank partials, combiner rollup.
    Oracle: sequential full-matrix replica with the shared kernels."""
    from ..fixtures import synth
    from ..ops.multimodal import caption_retrieval_eval

    t = synth.make_pagestore(RETR_N, seed=42)
    t = t.append_column(
        "ordinal", pa.array(np.arange(t.num_rows, dtype=np.int64), pa.int64())
    )
    return caption_retrieval_eval(
        _ds_from_table(t.select(["ordinal", "bytes", "fmt", "caption"])),
        ks=RETR_KS,
    )


def q_zorder_layout(sf_dir: str):
    """Z-order clustering layout over events: Morton-interleave
    (user_id, value-cents) low 16 bits into a space-filling key, then
    rank globally by (zkey, event_id) — the write order that gives
    partitioned parquet min/max pruning on BOTH columns (Delta/Iceberg
    OPTIMIZE ZORDER). Key kernel: ops/hashing.morton_interleave16;
    rank: the one-sort offset-stitch (stages/index.zip_with_index)."""
    from ..ops.hashing import morton_interleave16
    from ..stages.index import zip_with_index

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def key(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"], dtype=np.int64)
        cents = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        z = morton_interleave16(uid, cents)
        return pa.table(
            {"event_id": t["event_id"], "zkey": pa.array(z, pa.int64())}
        )

    keyed = ev.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    return zip_with_index(keyed, ["zkey", "event_id"], [False, False], rank_col="zrank")


def q_bpe_merges(sf_dir: str):
    """Distributed BPE merge-candidate counting (one tokenizer-training
    iteration): global top-50 adjacent character pairs by weighted
    occurrence over all tokens (ops/text.bpe_merge_candidates — block
    vocab dedup → vectorized codepoint-pair explode → one exchange)."""
    return tx.bpe_merge_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=50
    )


def q_decayed_value_sum(sf_dir: str):
    """Freshness-weighted per-user value totals: exact-integer
    exponential decay (value >> floor(age/half_life) vs the user's
    newest event) — ops/window.decayed_sum, one key-complete exchange.
    REAL SQL oracle with identical shift arithmetic."""
    from ..ops.window import decayed_sum

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "cents": pa.array(c, pa.int64())}
        )

    return decayed_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_recrawl_schedule(sf_dir: str):
    """Adaptive revisit scheduling over the events fetch log (user=URL,
    value=content-version proxy): unchanged revisits double the
    interval, capped at base<<6 (ops/window.recrawl_schedule — one
    key-complete exchange, exact int64 µs). REAL SQL oracle."""
    from ..ops.window import recrawl_schedule

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return recrawl_schedule(ev)


def q_caption_junk(sf_dir: str):
    """LAION-style caption junk signals over planted junky captions
    (filename-only, URL-bearing, placeholder-prefixed — planted
    identically in the SQL oracle): ops/text.caption_junk, one RE2 scan
    per shared pattern + exact digit/char counts. REAL SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        ds5 = did % 5
        base = pc.coalesce(t["text"], "")
        did_s = pc.cast(t["doc_id"], pa.string())
        fname = pc.binary_join_element_wise("IMG_", did_s, ".jpg", "")
        url = pc.binary_join_element_wise(
            base, " see https://ex.example/p?id=", did_s, ""
        )
        unt = pc.binary_join_element_wise("Untitled photo ", base, "")
        out = pc.if_else(pa.array(ds5 == 0), fname, base)
        out = pc.if_else(pa.array(ds5 == 1), url, out)
        out = pc.if_else(pa.array(ds5 == 2), unt, out)
        return pa.table({"doc_id": t["doc_id"], "text": out})

    return tx.caption_junk(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


# residue doc_id % 8 → appended snippet (0 keeps the doc pure-Latin);
# shared verbatim by the Ray plant and the SQL CASE below
SCRIPT_SNIPPETS: list[str] = [
    "",
    "привет мир поток данных",
    "γειά σου κόσμε δεδομένα",
    "数据 处理 引擎 爬虫",
    "데이터 처리 엔진 수집",
    "بيانات معالجة محرك زحف",
    "データ しょり エンジン クロール",
    "мир 数据 データ mixed",
]


def q_script_detect(sf_dir: str):
    """Unicode-script routing profile (the cheap first signal a
    multilingual corpus pipeline applies before any language model)
    over planted multilingual snippets: ops/text.script_profile — one
    RE2 class scan per script (SCRIPT_CLASSES is the shared pattern
    dict), exact codepoint counts + first-max dominant label. REAL SQL
    oracle: length-minus-regexp_replace per class + same CASE chain."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        base = pc.coalesce(t["text"], "")
        out = base
        for r in range(1, 8):
            aug = pc.binary_join_element_wise(base, SCRIPT_SNIPPETS[r], " ")
            out = pc.if_else(pa.array(did % 8 == r), aug, out)
        return pa.table({"doc_id": t["doc_id"], "text": out})

    return tx.script_profile(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


def _script_detect_oracle_sql() -> str:
    from ..ops.text import SCRIPT_CLASSES

    plant = (
        "CASE "
        + " ".join(
            f"WHEN doc_id % 8 = {r} THEN text || ' ' || '{SCRIPT_SNIPPETS[r]}'"
            for r in range(1, 8)
        )
        + " ELSE text END"
    )
    counts = ", ".join(
        f"CAST(length(t) - length(regexp_replace(t, '{pat}', '', 'g')) "
        f"AS BIGINT) AS n_{name}"
        for name, pat in SCRIPT_CLASSES.items()
    )
    names = list(SCRIPT_CLASSES)
    g = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    pred = (
        f"CASE WHEN {g} = 0 THEN 'none' "
        + " ".join(f"WHEN n_{n} = {g} THEN '{n}'" for n in names)
        + " END"
    )
    return (
        f"WITH planted AS (SELECT doc_id, {plant} AS t FROM documents), "
        f"c AS (SELECT doc_id, {counts} FROM planted) "
        f"SELECT *, {pred} AS script_pred FROM c"
    )


ORACLE_SQL["script_detect"] = _script_detect_oracle_sql()


REP_SMOOTH_M = 25  # pseudo-doc count pulling small hosts toward the mean


def q_source_reputation(sf_dir: str):
    """Per-source Bayesian-shrunk quality score — the crawl-prioritization
    signal that ranks hosts by mean doc quality while shrinking
    small-sample hosts toward the corpus mean (m=REP_SMOOTH_M pseudo-docs
    at the global rate). ONE zero-exchange combiner pass
    (ops/agg.partial_group_agg) yields exact integer (n_docs, sum_tok)
    per source; the global rate stays a rational g_num/g_den so the only
    float op is the final division — done on arbitrary-precision ints
    then one correctly-rounded conversion each side, bit-identical to the
    SQL HUGEINT/DOUBLE cast."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "documents", ["text", "source"])

    def prep(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(pc.coalesce(t["text"], ""), r"\S+"), pa.int64()
        )
        return pa.table({"source": t["source"], "n_tok": n_tok})

    per = partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_docs", "count_all", None), ("sum_tok", "sum", "n_tok")],
    )
    n_docs = per["n_docs"].to_pylist()
    sum_tok = per["sum_tok"].to_pylist()
    g_den = sum(n_docs)  # Python ints: exact at any corpus size
    g_num = sum(sum_tok)
    m = REP_SMOOTH_M
    score = [
        float(s * g_den + m * g_num) / float((n + m) * g_den)
        for n, s in zip(n_docs, sum_tok)
    ]
    return pa.table(
        {
            "source": per["source"],
            "n_docs": pa.array(n_docs, pa.int64()),
            "sum_tok": pa.array(sum_tok, pa.int64()),
            "rep_score": pa.array(score, pa.float64()),
        }
    )


ORACLE_SQL["source_reputation"] = (
    "WITH d AS (SELECT source, CAST(len(regexp_extract_all(text, '\\S+')) "
    "  AS BIGINT) AS n_tok FROM documents), "
    "s AS (SELECT source, count(*) AS n_docs, sum(n_tok) AS sum_tok "
    "  FROM d GROUP BY source), "
    "g AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS g_den, "
    "  CAST(sum(sum_tok) AS HUGEINT) AS g_num FROM s) "
    "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
    "  CAST(sum_tok AS BIGINT) AS sum_tok, "
    f"  CAST(CAST(sum_tok AS HUGEINT) * g_den + {REP_SMOOTH_M} * g_num AS DOUBLE) / "
    f"  CAST((CAST(n_docs AS HUGEINT) + {REP_SMOOTH_M}) * g_den AS DOUBLE) AS rep_score "
    "FROM s, g"
)


def q_char_entropy(sf_dir: str):
    """Character-entropy quality gate (ops/text.char_entropy — one
    bincount per block, quantized-int entropy terms, order-free exact
    sum). REAL SQL oracle: lateral substr explode + identical float
    expression per term."""
    return tx.char_entropy(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_html_extract(sf_dir: str):
    """HTML→text extraction (the parse step after fetch in every web
    corpus pipeline): wrap each doc's text in a deterministic HTML
    shell (script/style/comment blocks, tags, entities) identically to
    the SQL oracle, then extract with the shared ordered RE2 chain
    (ops/text.HTML_STRIP_PATTERNS → html_to_text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        html = pc.binary_join_element_wise(
            "<html><head><script>var x = 1;\nif (x) { x += 2; }</script>"
            "<style>.nav {color: red}</style><title>Doc ",
            did,
            "</title></head><body><!-- hidden\ncomment --><p>",
            pc.coalesce(t["text"], ""),
            " &amp; more &lt;tags&gt;</p><div>menu&nbsp;item</div></body></html>",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": html})

    return tx.html_to_text(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


_OG_PLANT_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' - example</title>"
    '<meta property="og:title" content="Doc \' || CAST(doc_id AS VARCHAR) || '
    "': ' || coalesce(regexp_extract(text, '\\S+'), '') || '\">"
    '<meta property="og:image" content="https://img.example/i\' || '
    "CAST(doc_id % 64 AS VARCHAR) || '.jpg\">"
    '<link rel="canonical" href="https://docs.example/a/\' || '
    "CAST(doc_id AS VARCHAR) || '\">"
    "</head><body><p>' || text || '</p></body></html>'"
)


def q_og_metadata(sf_dir: str):
    """Structured page-metadata extraction (ops/text.og_metadata) — the
    image+caption DISCOVERY step of a LAION-style crawl: og:image names
    the payload URL, og:title/page title the caption candidates,
    rel=canonical the dedup key. Pages are planted deterministically
    (same expression as the SQL plant), then each field is one
    pc.extract_regex pass over the column; the oracle extracts with the
    SAME patterns (og_meta_sql_pattern strips the group name)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        txt = pc.coalesce(t["text"], "")
        tok = pc.coalesce(
            pc.struct_field(pc.extract_regex(txt, r"(?P<t>\S+)"), "t"), ""
        )
        imod = pc.cast(
            pa.array(t["doc_id"].to_numpy() % 64, pa.int64()), pa.string()
        )
        html = pc.binary_join_element_wise(
            "<html><head><title>Doc ", did, " - example</title>"
            '<meta property="og:title" content="Doc ', did, ": ", tok,
            '"><meta property="og:image" content="https://img.example/i',
            imod, '.jpg"><link rel="canonical" href="https://docs.example/a/',
            did, '"></head><body><p>', txt, "</p></body></html>",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": html})

    return tx.og_metadata(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


ORACLE_SQL["og_metadata"] = (
    f"WITH page AS (SELECT doc_id, {_OG_PLANT_SQL} AS html FROM documents) "
    "SELECT doc_id, "
    + ", ".join(
        f"regexp_extract(html, '{tx.og_meta_sql_pattern(name)}', 1) AS {name}"
        for name in tx.OG_META_PATTERNS
    )
    + " FROM page"
)


ANCHOR_HOSTS = 50  # target-host registry size for the anchor plant


@ray.remote
def _anchor_agg_block(*parts: pa.Table) -> pa.Table:
    """Per-host anchor rollup over one key-complete, (host, anchor,
    doc_id)-sorted run set: counts are offset arithmetic; the ordered
    join and distinct-source count loop only over HOSTS (config-scale),
    never rows."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    n = tbl.num_rows
    hosts = tbl["host"].combine_chunks()
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    if n > 1:
        new_key[1:] = pc.not_equal(hosts.slice(1), hosts.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(new_key)
    ends = np.append(starts[1:], n)
    docs = tbl["doc_id"].to_numpy(zero_copy_only=False)
    anchors = tbl["anchor"].to_pylist()
    return pa.table(
        {
            "host": hosts.take(pa.array(starts, pa.int64())),
            "n_anchors": pa.array(ends - starts, pa.int64()),
            "n_src_docs": pa.array(
                [len(np.unique(docs[s:e])) for s, e in zip(starts, ends)],
                pa.int64(),
            ),
            "anchors": pa.array(
                [" | ".join(anchors[s:e]) for s, e in zip(starts, ends)],
                pa.string(),
            ),
        }
    )


def q_anchor_texts(sf_dir: str):
    """Anchor-text corpus per target host — the classic web-graph
    feature build (a target's anchors label it better than its own
    text; search and LLM-pretraining corpora both aggregate this).
    Pages plant 1 + doc_id % 3 anchors with arithmetic-derived targets;
    the REAL work is stages/parse.extract_anchor_texts (paired
    href/anchor recovery, zero exchange) then ONE host-complete sort
    exchange whose kernel emits count / distinct-source count / ordered
    ' | '-joined anchor list per host. The oracle re-derives the same
    (host, anchor) rows arithmetically and aggregates in SQL."""
    from ..stages.index import key_complete_parts
    from ..stages.parse import extract_anchor_texts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        did = pc.cast(t["doc_id"], pa.string())
        parts: list = ["<p>", pc.coalesce(t["text"], ""), "</p>"]
        for i in range(3):
            hmod = pc.cast(
                pa.array((ids * 7 + i * 3) % ANCHOR_HOSTS, pa.int64()), pa.string()
            )
            tag = pc.binary_join_element_wise(
                '<a href="https://h', hmod, ".example/p", did, f"x{i}",
                f'">link ', did, f" {i}</a>", "",
            )
            parts.append(
                pc.if_else(pa.array(ids % 3 >= i), tag, pa.scalar(""))
            )
        html = pc.binary_join_element_wise(*parts, "")
        return pa.table({"doc_id": t["doc_id"], "text": html})

    harvest = extract_anchor_texts(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )
    groups = key_complete_parts(harvest, "host", order=["anchor", "doc_id"])
    if not groups:
        return pa.table(
            {
                "host": pa.array([], pa.string()),
                "n_anchors": pa.array([], pa.int64()),
                "n_src_docs": pa.array([], pa.int64()),
                "anchors": pa.array([], pa.string()),
            }
        )
    return ray.data.from_arrow_refs(
        [_anchor_agg_block.remote(*parts) for parts in groups]
    )


ORACLE_SQL["anchor_texts"] = (
    "WITH a AS (SELECT doc_id, "
    f"  'h' || CAST((doc_id * 7 + i * 3) % {ANCHOR_HOSTS} AS VARCHAR) "
    "    || '.example' AS host, "
    "  'link ' || CAST(doc_id AS VARCHAR) || ' ' || CAST(i AS VARCHAR) AS anchor "
    "  FROM documents, LATERAL (SELECT unnest(generate_series(0, doc_id % 3)) AS i)) "
    "SELECT host, count(*) AS n_anchors, count(DISTINCT doc_id) AS n_src_docs, "
    "  string_agg(anchor, ' | ' ORDER BY anchor, doc_id) AS anchors "
    "FROM a GROUP BY host"
)


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence-packing manifest: treat the corpus as one
    token stream concatenated in doc_id order, cut it into fixed
    PACK_SEQ_LEN-token training sequences, and emit each doc's absolute
    token offset and first/last sequence index. The scan is
    ops/window.global_scan_sum — one sort + a one-int-per-block
    metadata pass + parallel per-block integer cumsum (exact,
    layout-proof). Token counts share token_stats' \\S+ semantics with
    the SQL oracle."""
    from ..ops.window import global_scan_sum

    counts = tx.token_stats(_read(sf_dir, "documents", ["doc_id", "text"])).map_batches(
        lambda t: t.select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = global_scan_sum(
        counts, ["doc_id"], [False], "n_tokens", out_col="tok_start"
    )

    def derive(t: pa.Table) -> pa.Table:
        ns = np.asarray(t["n_tokens"], np.int64)
        start = np.asarray(t["tok_start"], np.int64)
        first = start // PACK_SEQ_LEN
        last = np.where(ns == 0, first, (start + ns - 1) // PACK_SEQ_LEN)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "tok_start": t["tok_start"],
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
            }
        )

    return scanned.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def q_remove_boilerplate(sf_dir: str):
    """Corpus-level boilerplate line removal (the CCNet/RefinedWeb
    line-dedup curation pass): plant a universal header line, a mod-7
    footer family, and a short repeated line identically to the SQL
    oracle, then strip every line of length >= BOILER_MIN_LEN occurring
    >= BOILER_MIN_COUNT times corpus-wide
    (ops/text.remove_boilerplate_lines — combiner partials → sorted
    exchange → tiny hot-set broadcast → one vectorized rebuild pass)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        footer_txt = pc.binary_join_element_wise(
            "\nall rights reserved form ",
            pc.cast(pa.array(did % 7), pa.string()),
            "",
        )
        footer = pc.if_else(
            pa.array(did % 3 == 0), footer_txt, pa.scalar("", pa.string())
        )
        okline = pc.if_else(
            pa.array(did % 2 == 0),
            pa.scalar("\nok", pa.string()),
            pa.scalar("", pa.string()),
        )
        planted = pc.binary_join_element_wise(
            "subscribe to our newsletter\n",
            pc.coalesce(t["text"], ""),
            footer,
            okline,
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": planted})

    return tx.remove_boilerplate_lines(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True),
        min_count=BOILER_MIN_COUNT,
        min_len=BOILER_MIN_LEN,
    )


def q_crawl_flagship(sf_dir: str):
    """The north-rule flagship: multi-wave frontier crawl over the
    synthetic image+caption page-store (deterministic; non-SQL)."""
    from ..fixtures import synth
    from .crawl import CrawlConfig, run_crawl

    out_dir = tempfile.mkdtemp(prefix="crawl_q_", dir="/tmp")
    ps = synth.make_pagestore(80, seed=42)
    fr = synth.make_frontier(60, seed=42)
    robots = synth.make_robots(seed=42)
    res = run_crawl(
        fr, ps, robots, out_dir,
        config=CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=4),
    )
    return res.fetched_dataset().select_columns(
        ["url", "host", "wave", "crawl_rank", "fetch_status", "image_id"]
    )


def q_politeness_audit(sf_dir: str):
    """Politeness as an auditable RESULT, not a side effect: per
    (host, wave) fetch count + the MINIMUM inter-fetch gap of the
    scheduled virtual-clock times vs the host's crawl delay — a
    compliant schedule has min_gap_us >= delay_us everywhere
    (north-rule per-host politeness budget; ref news.py:135 sleep(1)).
    One key-complete exchange over the flagship crawl's output."""
    from ..fixtures import synth
    from ..ops.window import group_gap_stats
    from .crawl import CrawlConfig, run_crawl

    out_dir = tempfile.mkdtemp(prefix="crawl_aud_", dir="/tmp")
    res = run_crawl(
        synth.make_frontier(60, seed=42),
        synth.make_pagestore(80, seed=42),
        synth.make_robots(seed=42),
        out_dir,
        config=CrawlConfig(max_waves=2, num_seen_shards=2, dedup_partitions=4),
    )
    ds = res.fetched_dataset().select_columns(
        ["host", "wave", "fetch_at_us", "delay_ms"]
    )

    def with_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t["host"], pc.cast(t["wave"], pa.string()), "#"
        )
        return t.append_column("hw", k)

    stats = group_gap_stats(
        ds.map_batches(with_key, batch_format="pyarrow", zero_copy_batch=True),
        "hw",
        "fetch_at_us",
        carry_cols=("host", "wave", "delay_ms"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "wave": pc.cast(t["wave"], pa.int32()),
                "n_fetches": t["n_events"],
                "min_gap_us": t["min_gap"],
                "delay_us": pc.multiply(
                    pc.cast(t["delay_ms"], pa.int64()), pa.scalar(1000, pa.int64())
                ),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


# --- corpus term statistics / windows: constants shared between the Ray
# queries and their DuckDB oracles so the two sides cannot drift
TOP_TERMS_K = 50
VOCAB_MIN_COUNT = 3
RARE_MAX = 2
SEARCH_TERMS = ("spark", "join", "window", "stream", "vector")
SEARCH_K = 10

# exploded-token relation reused by the term-stat oracles — identical
# semantics to ops/text._doc_term_freqs (\s+ split, empties dropped)


def q_top_terms(sf_dir: str):
    """Corpus heavy hitters: exact global top-K terms by count —
    per-block combiner partials → task-based sort exchange over the
    (data-scale) vocabulary → per-block top-K → driver merge
    (ops/text.top_terms)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.top_terms(ds, k=TOP_TERMS_K)


def q_tokenize_vocab(sf_dir: str):
    """Tokenizer APPLY step: encode every doc with the trained
    vocabulary (ops/text.tokenize_with_vocab — explode with prefix-sum
    ordinals → LEFT join the data-scale vocab → ordered reassembly on
    the key-complete exchange). OOV → -1; output is the space-joined id
    string + OOV count per doc. REAL SQL oracle (vocab CTE + ordered
    string_agg)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = tx.vocab_build(ds, min_count=VOCAB_MIN_COUNT)
    return tx.tokenize_with_vocab(ds, vocab)


def q_vocab_build(sf_dir: str):
    """Tokenizer vocabulary with stable contiguous ids: terms above a
    count floor, ranked (count desc, term asc) → 0-based token_id
    (ops/text.vocab_build — combiner partials, sorted group-agg over
    the data-scale vocabulary, one global rank sort)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.vocab_build(ds, min_count=VOCAB_MIN_COUNT)


def q_top_terms_per_lang(sf_dir: str):
    """Trending/top-k terms PER SEGMENT: the 3 most frequent terms per
    language — exploded counts on the sorted exchange (shared
    _doc_term_freqs kernel) chained into group_top_k on the lang
    exchange; (count desc, term asc) deterministic ties."""
    from ..ops.agg import group_top_k, sorted_group_agg
    from ..ops.text import _doc_term_freqs

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()), "term": pa.array([], pa.string())}
            )
        tf = _doc_term_freqs(t, "text", "doc_id")
        # occurrences, not distinct docs: repeat each (doc,term) tf times
        reps = np.asarray(tf["tf"], dtype=np.int64)
        idx = np.repeat(np.arange(len(reps)), reps)
        return pa.table(
            {
                "lang": t["lang"].take(tf["row_idx"].take(pa.array(idx))),
                "term": tf["term"].take(pa.array(idx)),
            }
        )

    counts = sorted_group_agg(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "term"],
        [("n", "count_all", None)],
    )
    return group_top_k(counts, "lang", ["n", "term"], [True, False], k=3)


def q_posting_lists(sf_dir: str):
    """Inverted-index build (ops/text.posting_lists): per term the
    document frequency and SORTED posting list over distinct
    (term, doc) pairs — exploded kernel per block, ONE key-complete
    exchange on term, zero-copy ListArray assembly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.posting_lists(ds)


def q_doc_surprisal(sf_dir: str):
    """Per-doc unigram-LM surprisal in bits (ops/text.doc_surprisal):
    every token's −log2(c_w/N) term is quantized to an integer, so the
    per-doc reduction is an exact order-free integer sum — REAL-SQL
    oracled to the bit (DuckDB log2/floor == numpy's on this host).
    The LM-quality curation signal doc_rarity approximates with pure
    integers."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.doc_surprisal(ds)


def q_heldout_entropy(sf_dir: str):
    """Held-out LM eval (ops/text.heldout_cross_entropy): add-one
    unigram model trained on even-id docs scores the odd-id half —
    bits-per-token under the train distribution. Quantized integer
    terms keep the per-doc sum exact and order-free; REAL SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.heldout_cross_entropy(ds)


def q_doc_rarity(sf_dir: str):
    """Per-doc rare-token signal (exact integers): token count, rare
    occurrences (global freq <= 2), and summed corpus frequency — the
    integer-exact unigram-surprisal cousin used as an OOV/noise
    curation filter (ops/text.doc_rarity: explode → totals → join back
    on term → per-doc sums, three task-based exchanges)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.doc_rarity(ds, rare_max=RARE_MAX)


def q_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition features (exact integers): token
    count, distinct-token count, most-common-token count — the
    "top-token coverage" pretraining filter as its two integer terms."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.repetition_stats(ds)


def q_term_search(sf_dir: str):
    """Inverted-index search: top-K docs per query term by exact term
    frequency. Broadcast query terms, per-block prune+count+top-K
    partials, driver merge — no exchange (ops/text.term_search)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.term_search(ds, list(SEARCH_TERMS), k=SEARCH_K)


def q_chunk_docs(sf_dir: str):
    """Token-window chunking for pretraining/embedding prep: 32-token
    chunks every 24 over the documents table (ops/text
    .chunk_documents — vectorized fan-out inside the map task)."""
    return tx.chunk_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]), size=32, stride=24
    )


def q_curate_corpus(sf_dir: str):
    """END-TO-END text corpus curation (the C4-style prep a pretraining
    run executes): quality filter (exact-int Gopher thresholds) →
    normalize → exact dedup on normalized text (keep-min-doc-id on ONE
    attach exchange — the winners + semi-join plan paid two exchanges
    and re-ran the normalize per consumer) → overlapping 32/24 token
    chunking — one streaming plan stitched from individually-oracled
    ops; the oracle is the same chain as SQL CTEs."""
    from ..ops.dedup import content_hash_batch
    from ..ops.window import attach_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def filt(b: pa.Table) -> pa.Table:
        q = tx.quality_score_batch(b)
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], 20), pc.greater_equal(q["n_stopwords"], 1)
        )
        return b.filter(keep)

    norm = tx.normalize_text(
        ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    )
    hashed = norm.map_batches(
        lambda b: content_hash_batch(b, "text_norm"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    survivors = attach_group_agg(
        hashed, "content_hash", [("min_id", "min", "doc_id")]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["min_id"])).drop_columns(
            ["content_hash", "min_id"]
        )
        if t.num_rows
        else t.drop_columns(["content_hash", "min_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return tx.chunk_documents(survivors, text_col="text_norm", size=32, stride=24)


def q_tfidf_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document: combiner df pass + broadcast-idf
    scoring pass, no shuffle (ops/text.tfidf_top_terms)."""
    return tx.tfidf_top_terms(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=3
    )


def q_suppliers_per_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region → counts per region name: the
    two-hop dim chain composed DRIVER-side (nation⋈region is dim-sized),
    one broadcast lookup over the fact table, zero exchanges."""
    from ..ops.agg import partial_group_agg

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rname = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    rk = np.asarray(nat["n_regionkey"], dtype=np.int64)
    order = np.argsort(nk, kind="stable")
    dim_ref = ray.put((nk[order], rk[order]))

    def to_regionkey(t: pa.Table) -> pa.Table:
        nk_s, rk_s = ray.get(dim_ref)
        sn = np.asarray(t["s_nationkey"], dtype=np.int64)
        pos = np.minimum(np.searchsorted(nk_s, sn), len(nk_s) - 1)
        hit = nk_s[pos] == sn
        return pa.table({"r_regionkey": pa.array(rk_s[pos][hit], pa.int64())})

    sup = _read(sf_dir, "supplier", ["s_nationkey"])
    counts = partial_group_agg(
        sup.map_batches(to_regionkey, batch_format="pyarrow", zero_copy_batch=True),
        ["r_regionkey"],
        [("n_suppliers", "count_all", None)],
    )
    return pa.table(
        {
            "r_name": pa.array(
                [rname[k] for k in counts["r_regionkey"].to_pylist()], pa.string()
            ),
            "n_suppliers": counts["n_suppliers"],
        }
    )


def q_revenue(sf_dir: str):
    """TPC-H Q6 analog: filtered revenue sum in integer cents (exact at
    any merge order; both sides compute round(price*discount*100) with
    the same IEEE ops), zero exchanges."""
    from ..ops.agg import partial_group_agg

    li = _read(
        sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity"]
    )

    def cents(t: pa.Table) -> pa.Table:
        d = np.asarray(t["l_discount"], dtype=np.float64)
        q = np.asarray(t["l_quantity"], dtype=np.float64)
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        keep = (d >= 0.05) & (d <= 0.07) & (q < 24)
        # half-AWAY rounding (floor(x+0.5) for positives) to match
        # DuckDB's round(); np.rint is half-even and differs on .5 cents
        rev = np.floor(p[keep] * d[keep] * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "one": pa.array(np.zeros(len(rev), np.int64()), pa.int64()),
                "rev": pa.array(rev, pa.int64()),
            }
        )

    out = partial_group_agg(
        li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["one"],
        [("revenue_cents", "sum", "rev"), ("n_lines", "count_all", None)],
    )
    return out.drop_columns(["one"])


def _pagestore_edges(t: pa.Table) -> pa.Table:
    """caption link: tokens → int (src, dst) edge rows (shared by the
    pagerank query and its sequential oracle)."""
    srcs, dsts = [], []
    for iid, cap in zip(t["image_id"].to_pylist(), t["caption"].to_pylist()):
        s = int(iid[3:])
        for tok in (cap or "").split():
            if tok.startswith("link:"):
                srcs.append(s)
                dsts.append(int(tok[-8:]))
    return pa.table(
        {"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())}
    )


def q_tensor_prep(sf_dir: str):
    """Training tensor prep over the page-store: center-crop →
    block-mean resize → normalize; verified by exact per-channel
    integer sums of the cropped-resized uint8 image."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(60, seed=42))
    out = mm.tensor_prep(ps, out=16, concurrency=2, batch_size=32)
    return out.map_batches(
        lambda t: t.select(["image_id", "sum_r", "sum_g", "sum_b"]),
        batch_format="pyarrow",
    )


def q_pagerank(sf_dir: str):
    """Integer-exact distributed PageRank over the page-store outlink
    graph (5 power iterations; per iteration one src-rank hash join +
    one sum-by-dst sort exchange — ranks stay a Dataset throughout)."""
    from ..fixtures import synth
    from ..ops.graph import pagerank_int

    ps = ray.data.from_arrow(synth.make_pagestore(80, seed=42))
    edges = ps.map_batches(
        _pagestore_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    # num_partitions=2: each iteration's hash join pays the fixed
    # aggregator-pool startup (BASELINE.md round-2 finding); at gate
    # scale wider pools only add cold-start, at 10^10 nodes raise it
    return pagerank_int(edges, num_nodes=80, iters=5, num_partitions=2)


def q_channel_histogram(sf_dir: str):
    """Corpus-wide per-channel pixel histogram over the synthetic
    page-store (decode → bincount partials → combiner; exact ints)."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(60, seed=42))
    return mm.corpus_channel_histogram(ps, bins=16, concurrency=2, batch_size=32)


def q_hll_users_by_type(sf_dir: str):
    """Approximate distinct users per event type: the HLL sketch as a
    group aggregate (per-key 4 KB register partials, max-merge)."""
    from ..ops.agg import hll_distinct_by

    return hll_distinct_by(
        _read(sf_dir, "events", ["event_type", "user_id"]), "event_type", "user_id"
    )


def q_running_totals(sf_dir: str):
    """SUM() OVER (PARTITION BY user ORDER BY ts, id): per-user running
    value totals in integer cents (exact at any merge order) on the
    key-complete exchange (ops/window.running_sum)."""
    from ..ops.window import running_sum

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return t.drop_columns(["value"]).append_column(
            "v_int", pa.array(v, pa.int64())
        )

    return running_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    ).map_batches(
        lambda t: _rename(t, {"running": "running_cents"}), batch_format="pyarrow"
    )


IMG_FILTER_N = 200


def q_image_corpus_filter(sf_dir: str):
    """LAION-style admission filter over the page-store METADATA (min
    dim, aspect bound, caption token floor, fmt allowlist) — the
    decode-free first pass of an image-corpus ingest. ``bytes`` is
    dropped before the stage so only narrow columns flow; the SQL
    oracle runs the same predicates over the inlined fixture metadata."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(IMG_FILTER_N, seed=42).select(
            ["image_id", "w", "h", "fmt", "caption"]
        )
    )
    return mm.image_meta_filter(ps)


def q_aspect_buckets(sf_dir: str):
    """SDXL-style aspect-ratio bucketing over the page-store metadata:
    integer-exact nearest-bucket assignment (ops/multimodal
    .aspect_buckets) so training batches group uniform shapes. The SQL
    oracle ranks the same cross-multiplied distortion over a buckets
    VALUES table."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(IMG_FILTER_N, seed=42).select(["image_id", "w", "h"])
    )
    return mm.aspect_buckets(ps)


CLIP_SCORE_N = 120
OUTLINK_DEG_N = 150




AUG_N = 80


def q_augment_images(sf_dir: str):
    """Deterministic per-image augmentation (content-stable hflip +
    edge crop, real decode/re-encode — ops/multimodal.ImageAugmentStage)
    verified by exact integer pixel moments of the AUGMENTED store:
    (image_id, aug_flip, aug_crop, w, h, luma_sum). Oracle: sequential
    per-image replica with explicit flip/crop on independently decoded
    pixels."""
    from ..fixtures import synth
    from ..ops.multimodal import augment_images

    ps = synth.make_pagestore(AUG_N, seed=42).select(
        ["image_id", "bytes", "fmt"]
    )
    aug = augment_images(_ds_from_table(ps))

    def stats(t: pa.Table) -> pa.Table:
        from ..fixtures import codec as fcodec

        sums = []
        for buf, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            sums.append(int(fcodec.decode(buf, fmt).astype(np.int64).sum()))
        return pa.table(
            {
                "image_id": t["image_id"],
                "aug_flip": t["aug_flip"],
                "aug_crop": t["aug_crop"],
                "w": t["w"],
                "h": t["h"],
                "luma_sum": pa.array(sums, pa.int64()),
            }
        )

    return aug.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def q_curate_audio_corpus(sf_dir: str):
    """End-to-end audio-corpus curation (the audio analog of
    curate_image_corpus): ONE fused decode pass per clip — row-level
    decode validation, integer duration + exact cross-multiplied rms
    admission gates, envelope hash — then exact-envelope dedup keeping
    the min admitted audio_id per hash on the NARROW manifest
    (ops/multimodal.curate_audio_corpus; payload bytes never enter the
    exchange). Oracle: sequential stdlib-wave replica with the same
    integer predicates and a keep-min dict."""
    from ..fixtures import synth
    from ..ops.multimodal import curate_audio_corpus

    store = ray.data.from_arrow(
        synth.make_audiostore(AUDIO_DUP_N, seed=42, dup_every=AUDIO_DUP_EVERY)
    )
    return curate_audio_corpus(store).map_batches(
        lambda t: t.select(
            ["audio_id", "n_samples", "duration_us", "sum_sq", "ahash"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_curate_video_corpus(sf_dir: str):
    """End-to-end video-corpus curation (the video analog of the image
    and audio chains): ONE fused container walk per clip — frame-count
    floor, jump-cut-density gate (inlined SAD detector), first-frame
    phash — then exact keep-min dedup on the narrow manifest
    (ops/multimodal.curate_video_corpus). Oracle: sequential
    struct-walk replica with the same integer predicates."""
    from ..fixtures import synth
    from ..ops.multimodal import curate_video_corpus

    store = ray.data.from_arrow(
        synth.make_videostore(VIDEO_CUT_N, seed=42, cut_every=VIDEO_CUT_EVERY)
    )
    return curate_video_corpus(store).map_batches(
        lambda t: t.select(["video_id", "n_frames", "n_cuts", "first_phash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


VIDEO_DUP_N = 60


def q_video_near_dup(sf_dir: str):
    """Video near-duplicate pairs: first-frame perceptual hash per clip
    (seek to frame 0 only — the container's length framing makes this a
    header-offset read + one decode) through the SHARED banded-hamming
    exchange. Completes the near-dup matrix across text / image /
    audio / video on one pairing machinery. Oracle: sequential
    all-pairs hamming over independently struct-walked first frames."""
    from ..fixtures import codec as fcodec
    from ..fixtures import synth
    from ..ops.dedup import hash64_near_dup_pairs

    store = synth.make_videostore(VIDEO_DUP_N, seed=42)

    def first_phash(t: pa.Table) -> pa.Table:
        ids, ph = [], []
        for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            px = fcodec.decode_video_frames(buf, [0])[0][1]
            ids.append(int(vid[3:]))
            ph.append(fcodec.phash64(px))
        return pa.table(
            {"vid": pa.array(ids, pa.int64()), "vhash": pa.array(ph, pa.int64())}
        )

    ds = ray.data.from_arrow(store).map_batches(
        first_phash, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash64_near_dup_pairs(
        ds, hash_col="vhash", id_col="vid", max_hamming=1, bands=2, kind="video"
    ).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
