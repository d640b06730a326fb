"""Driver-contract query suite: one entry per operator family.

Each ``q_*`` builder takes ``sf_dir`` and returns a Ray Dataset /
pyarrow Table; ``ORACLE_SQL[name]`` is the DuckDB-equivalent statement
over the same parquet tables (pre-registered views). Column names match
BETWEEN the Ray result and the SQL — the driver's compare sorts columns
by name and hashes values.

SQL-expressible operators get an oracle (the exactness gate); crawl /
LSH / decode pipelines are non-SQL and get rows-only checks — each of
those is still deterministic (fixed seeds, fixed mutations) so the
row-count is stable across runs and parallelism levels.

Reference anchors per query are noted inline (SURVEY.md §2 ids).
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

from .queries_rel import *  # noqa: F401,F403
from .queries_dedup import *  # noqa: F401,F403
from .queries_media import *  # noqa: F401,F403
from .queries_ingest import *  # noqa: F401,F403
from .queries_embed import *  # noqa: F401,F403
from .queries_corpus import *  # noqa: F401,F403
from .queries_join_window import *  # noqa: F401,F403
from .queries_analytics import *  # noqa: F401,F403
from .queries_text import *  # noqa: F401,F403
from .queries_oracle_sql import *  # noqa: F401,F403
from .queries_corpus import _pagestore_edges  # noqa: F401 (re-export: used by tests/expected.py)
from .queries_media import _cropdup_iid, _meta_audit_store, _neardup_iid  # noqa: F401 (re-export: used by tests/expected.py)
from .queries_rel import _drop_word3, _ds_from_table, _planted_docs_tbl, _planted_embeddings_tbl, _read, _rename, _swap01  # noqa: F401 (re-export: used by tests/expected.py)

from .queries_analytics import (
    q_ab_lift,
    q_audience_overlap,
    q_bitmap_distinct_users,
    q_crawl_budget,
    q_csv_ingest,
    q_cumulative_users,
    q_daily_growth,
    q_event_same_day_count,
    q_event_type_cooccurrence,
    q_events_time_travel,
    q_events_upsert,
    q_events_watermark,
    q_fuzzy_entity_join,
    q_jsonl_ingest,
    q_keyword_hits,
    q_partitioned_read,
    q_price_qty_skyline,
    q_quantity_price_corr,
    q_resolve_redirects,
    q_retention_cohorts,
    q_session_funnel,
    q_shuffle_positions,
    q_sitemap_urls,
    q_type_drift,
    q_url_trap_flags,
    q_user_entropy_by_type,
    q_user_event_type_list,
    q_user_key_skew,
    q_user_twap,
    q_user_type_path,
    q_users_both_halves,
    q_users_first_half_only,
    q_value_gini,
    q_value_mean_ci,
    q_value_ranksum,
    q_value_trend,
    q_value_trimmed_mean,
    q_value_zscore,
    q_view_click_overlap,
)
from .queries_corpus import (
    q_anchor_texts,
    q_aspect_buckets,
    q_audio_features,
    q_bpe_merges,
    q_caption_junk,
    q_channel_histogram,
    q_char_entropy,
    q_chunk_docs,
    q_crawl_flagship,
    q_curate_corpus,
    q_decayed_value_sum,
    q_doc_rarity,
    q_doc_surprisal,
    q_dominant_color,
    q_heldout_entropy,
    q_hll_users_by_type,
    q_html_extract,
    q_image_corpus_filter,
    q_letterbox_stats,
    q_og_metadata,
    q_pack_sequences,
    q_pagerank,
    q_politeness_audit,
    q_posting_lists,
    q_recrawl_schedule,
    q_remove_boilerplate,
    q_repetition_stats,
    q_revenue,
    q_running_totals,
    q_script_detect,
    q_sharpness,
    q_source_reputation,
    q_suppliers_per_region,
    q_tensor_prep,
    q_term_search,
    q_tfidf_terms,
    q_tokenize_vocab,
    q_top_terms,
    q_top_terms_per_lang,
    q_video_frame_stats,
    q_vocab_build,
    q_zorder_layout,
)
from .queries_dedup import (
    q_containment_pairs,
    q_corpus_report,
    q_cross_corpus_overlap,
    q_curate_web_corpus,
    q_dedup_spans,
    q_embedding_dup_pairs,
    q_gopher_quality,
    q_ioc_extract,
    q_knn_ivf,
    q_langid,
    q_langid_confusion,
    q_line_dedup,
    q_minhash_dedup_pairs,
    q_ngram_jaccard_pairs,
    q_semantic_dedup,
    q_simhash_pairs,
    q_token_budget_sample,
    q_winnow_dup_pairs,
    q_zipf_slope,
)
from .queries_embed import (
    q_canonical_docs,
    q_clicks_prior_view,
    q_contrastive_negatives,
    q_decontaminate_docs,
    q_dedup_corpus,
    q_dsir_weights,
    q_dup_components,
    q_embedding_pca,
    q_embedding_pca_proj,
    q_hard_negatives,
    q_kmeans_clusters,
    q_knn_pq,
    q_knn_recall,
    q_leakage_safe_split,
    q_mixture_sample,
    q_nb_classify,
    q_pii_redact,
    q_pq_codes,
    q_sample_docs,
    q_sampled_quantiles,
    q_sessionize,
    q_tokenizer_fertility,
    q_url_canonical_dups,
    q_value_quantiles_hist,
    q_value_weighted_sample,
    q_views_before_click,
    q_weighted_median,
    q_weighted_type_sample,
)
from .queries_ingest import (
    q_evolving_ingest,
    q_ipc_ingest,
    q_news_pipeline,
    q_orc_ingest,
    q_rss_advisories,
    q_wet_ingest,
)
from .queries_join_window import (
    q_caption_consistency,
    q_caption_pixel_corr,
    q_cm_counts,
    q_corpus_diff,
    q_curate_image_corpus,
    q_customer_orders_full_join,
    q_customer_orders_left_join,
    q_dataset_split,
    q_dup_ngrams,
    q_event_customer_skew_join,
    q_event_range_window,
    q_event_rolling,
    q_event_sessions,
    q_event_type_sample,
    q_event_type_transitions,
    q_event_value_stats,
    q_events_rollup,
    q_exact_phash_dups,
    q_integrity_report,
    q_lineitem_orders_join,
    q_lineitems_of_large_parts,
    q_orders_customer_right_join,
    q_outlink_degrees,
    q_payload_psnr,
    q_profile_events,
    q_quality_percentile_filter,
    q_reciprocal_links,
    q_token_freq_spectrum,
    q_top_orders_per_cust,
    q_triangles,
    q_user_type_melt,
    q_user_type_pivot,
    q_value_mad,
    q_value_quartile_buckets,
    q_value_share,
)
from .queries_media import (
    q_canonical_images,
    q_daily_digest,
    q_hll_users,
    q_image_dedup_corpus,
    q_image_dup_clusters,
    q_image_features,
    q_image_knn,
    q_image_meta_audit,
    q_ip_block_rules,
    q_phash_near_dup,
    q_resize_images,
    q_tile_dup_pairs,
)
from .queries_rel import (
    ORACLE_SQL,
    q_customers_without_orders,
    q_distinct_event_types,
    q_events_by_type,
    q_events_day,
    q_exact_dedup_docs,
    q_fingerprints,
    q_keyword_filter,
    q_knn_cosine,
    q_lineitem_agg,
    q_orders_per_nation,
    q_parts_with_lineitems,
    q_props_extract,
    q_quality_counts,
    q_stable_event_type_ids,
    q_token_stats,
    q_top_orders,
    q_user_day_stats,
    q_user_event_stats,
)
from .queries_text import (
    q_bigram_pmi,
    q_bm25_search,
    q_ccnet_ppl_buckets,
    q_distinct_users_per_type,
    q_doc_length_histogram,
    q_event_lag_lead,
    q_event_rank_ties,
    q_event_ranks,
    q_events_cube,
    q_events_hourly,
    q_events_hourly_dense,
    q_events_sliding,
    q_fuzzy_search,
    q_kn_bigram_lm,
    q_lexical_diversity,
    q_local_supplier_revenue,
    q_max_value_event_per_type,
    q_normalize_text,
    q_pld_rollup,
    q_shipping_priority,
    q_top_bigrams,
    q_top_users_per_type,
    q_user_first_last,
    q_user_modal_type,
    q_value_fill_forward,
    q_value_histogram,
    q_value_outliers,
    q_value_quantiles,
    q_value_quantiles_cont,
)

def _trap_oracle_sql() -> str:
    """Real-SQL trap oracle: the fixture URLs inlined as VALUES, the
    depth/repeat/qs flags re-derived independently in DuckDB string
    SQL (not a replayed expected table)."""
    from ..fixtures.synth import make_trap_urls

    urls = make_trap_urls()["url"].to_pylist()
    vals = ", ".join(f"('{u}')" for u in urls)  # ASCII, no quotes inside
    return (
        f"WITH u(url) AS (VALUES {vals}), "
        "p AS (SELECT url, "
        "coalesce(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '') AS path, "
        "CASE WHEN strpos(url, '?') > 0 THEN length(url) - strpos(url, '?') "
        "ELSE 0 END AS qs_len FROM u), "
        "ne AS (SELECT url, seg FROM (SELECT url, "
        "unnest(string_split(path, '/')) AS seg FROM p) WHERE seg <> ''), "
        "cnt AS (SELECT url, seg, count(*) AS c FROM ne GROUP BY url, seg), "
        "agg AS (SELECT url, CAST(sum(c) AS BIGINT) AS depth, "
        "CAST(max(c) AS BIGINT) AS max_seg_repeat FROM cnt GROUP BY url) "
        "SELECT p.url, coalesce(agg.depth, 0) AS depth, "
        "coalesce(agg.max_seg_repeat, 0) AS max_seg_repeat, "
        "CAST(p.qs_len AS BIGINT) AS qs_len, "
        "(coalesce(agg.depth, 0) > 8 OR coalesce(agg.max_seg_repeat, 0) > 2 "
        "OR p.qs_len > 64) AS is_trap "
        "FROM p LEFT JOIN agg USING (url)"
    )


def _redirects_oracle_sql() -> str:
    """Recursive-CTE redirect oracle: the fixture edges inlined as
    VALUES, the chain closure re-derived independently by DuckDB's
    WITH RECURSIVE (terminal = a cur that is never a src; a src with
    no terminal row within the hop cap is a loop)."""
    from ..fixtures.synth import make_redirects

    t = make_redirects()
    vals = ", ".join(
        f"('{s}', '{d}')"
        for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist())
    )
    return (
        f"WITH RECURSIVE edges(src, dst) AS (VALUES {vals}), "
        "walk(src, cur, hops) AS ("
        "SELECT src, dst, CAST(1 AS BIGINT) FROM edges "
        "UNION ALL SELECT w.src, e.dst, w.hops + 1 FROM walk w "
        "JOIN edges e ON w.cur = e.src WHERE w.hops < 64), "
        "t AS (SELECT w.*, w.cur NOT IN (SELECT src FROM edges) AS terminal "
        "FROM walk w) "
        "SELECT src AS src_url, "
        "coalesce(min(cur) FILTER (WHERE terminal), '') AS final_url, "
        "coalesce(min(hops) FILTER (WHERE terminal), 0) AS n_hops, "
        "(count(*) FILTER (WHERE terminal) = 0) AS is_loop "
        "FROM t GROUP BY src"
    )


def _sitemap_oracle_sql() -> str:
    """Real-SQL sitemap oracle: fixture XML inlined as VALUES, the
    <url>-block explode re-derived with DuckDB string_split + regex."""
    from ..fixtures.synth import make_sitemaps

    t = make_sitemaps()
    vals = ", ".join(
        f"('{i}', '{x}')"
        for i, x in zip(t["sitemap_id"].to_pylist(), t["xml"].to_pylist())
    )
    return (
        f"WITH s(sitemap_id, xml) AS (VALUES {vals}), "
        "f AS (SELECT sitemap_id, unnest(string_split(xml, '<url>')) AS frag "
        "FROM s) "
        "SELECT sitemap_id, regexp_extract(frag, '<loc>([^<]*)</loc>', 1) AS url, "
        "coalesce(regexp_extract(frag, '<lastmod>([^<]*)</lastmod>', 1), '') "
        "AS lastmod FROM f WHERE regexp_matches(frag, '<loc>[^<]*</loc>')"
    )


def _fuzzy_entity_oracle_sql() -> str:
    """REAL SQL re-derivation of q_fuzzy_entity_join: the same
    first-character block predicate + DuckDB levenshtein over the
    shared fixture rendered as inline VALUES."""
    from ..fixtures.synth import make_entity_names
    from .expected import values_sql

    canon, dirty = make_entity_names()
    l_sql = values_sql(pa.Table.from_pylist(dirty))
    r_sql = values_sql(pa.Table.from_pylist(canon))
    return (
        f"WITH L AS ({l_sql}), R AS ({r_sql}) "
        "SELECT L.id AS left_id, R.id AS right_id, "
        "CAST(levenshtein(L.s, R.s) AS BIGINT) AS dist "
        "FROM L JOIN R ON substr(L.s, 1, 2) = substr(R.s, 1, 2) "
        "WHERE levenshtein(L.s, R.s) <= 2 ORDER BY left_id, right_id"
    )


def build_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Full oracle dict: static SQL over the sf views + the independent
    sequential-oracle statements (pipelines/expected.py) for the
    formerly rows-only queries. ``sf_dir`` must be the scale the driver
    runs correctness at (sf0.01 per the contract)."""
    from .expected import expected_oracle_sql

    out = dict(ORACLE_SQL)
    out["url_trap_flags"] = _trap_oracle_sql()
    out["resolve_redirects"] = _redirects_oracle_sql()
    out["sitemap_urls"] = _sitemap_oracle_sql()
    out["fuzzy_entity_join"] = _fuzzy_entity_oracle_sql()
    out.update(expected_oracle_sql(sf_dir))
    return out


def build_queries() -> dict:
    return {
        "keyword_filter": q_keyword_filter,
        "events_day": q_events_day,
        "distinct_event_types": q_distinct_event_types,
        "top_orders": q_top_orders,
        "events_by_type": q_events_by_type,
        "exact_dedup_docs": q_exact_dedup_docs,
        "customers_without_orders": q_customers_without_orders,
        "parts_with_lineitems": q_parts_with_lineitems,
        "stable_event_type_ids": q_stable_event_type_ids,
        "token_stats": q_token_stats,
        "fingerprints": q_fingerprints,
        "quality_counts": q_quality_counts,
        "lineitem_agg": q_lineitem_agg,
        "user_event_stats": q_user_event_stats,
        "user_day_stats": q_user_day_stats,
        "orders_per_nation": q_orders_per_nation,
        "props_extract": q_props_extract,
        "knn_cosine": q_knn_cosine,
        "sample_docs": q_sample_docs,
        "kmeans_clusters": q_kmeans_clusters,
        "pq_codes": q_pq_codes,
        "knn_pq": q_knn_pq,
        "sessionize": q_sessionize,
        "clicks_prior_view": q_clicks_prior_view,
        "views_before_click": q_views_before_click,
        "dup_components": q_dup_components,
        "canonical_docs": q_canonical_docs,
        "leakage_safe_split": q_leakage_safe_split,
        "decontaminate_docs": q_decontaminate_docs,
        "decontaminate_scaled": q_decontaminate_scaled,
        "pii_redact": q_pii_redact,
        "remove_boilerplate": q_remove_boilerplate,
        "pack_sequences": q_pack_sequences,
        "winnow_dup_pairs": q_winnow_dup_pairs,
        "html_extract": q_html_extract,
        "og_metadata": q_og_metadata,
        "anchor_texts": q_anchor_texts,
        "bpe_merges": q_bpe_merges,
        "zorder_layout": q_zorder_layout,
        "letterbox_stats": q_letterbox_stats,
        "contrastive_negatives": q_contrastive_negatives,
        "weighted_median": q_weighted_median,
        "value_quantiles_hist": q_value_quantiles_hist,
        "hard_negatives": q_hard_negatives,
        "dedup_spans": q_dedup_spans,
        "dominant_color": q_dominant_color,
        "audio_features": q_audio_features,
        "audio_near_dup": q_audio_near_dup,
        "audio_spectral": q_audio_spectral,
        "caption_retrieval": q_caption_retrieval,
        "augment_images": q_augment_images,
        "curate_audio_corpus": q_curate_audio_corpus,
        "curate_video_corpus": q_curate_video_corpus,
        "video_near_dup": q_video_near_dup,
        "video_scene_cuts": q_video_scene_cuts,
        "video_frame_stats": q_video_frame_stats,
        "sharpness": q_sharpness,
        "char_entropy": q_char_entropy,
        "caption_junk": q_caption_junk,
        "script_detect": q_script_detect,
        "source_reputation": q_source_reputation,
        "tile_dup_pairs": q_tile_dup_pairs,
        "recrawl_schedule": q_recrawl_schedule,
        "decayed_value_sum": q_decayed_value_sum,
        "top_terms": q_top_terms,
        "vocab_build": q_vocab_build,
        "tokenize_vocab": q_tokenize_vocab,
        "posting_lists": q_posting_lists,
        "doc_surprisal": q_doc_surprisal,
        "heldout_entropy": q_heldout_entropy,
        "top_terms_per_lang": q_top_terms_per_lang,
        "doc_rarity": q_doc_rarity,
        "repetition_stats": q_repetition_stats,
        "term_search": q_term_search,
        "events_hourly": q_events_hourly,
        "value_quantiles": q_value_quantiles,
        "value_quantiles_cont": q_value_quantiles_cont,
        "top_bigrams": q_top_bigrams,
        "bigram_pmi": q_bigram_pmi,
        "kn_bigram_lm": q_kn_bigram_lm,
        "normalize_text": q_normalize_text,
        "dedup_corpus": q_dedup_corpus,
        # rows-only (non-SQL-expressible)
        "minhash_dedup_pairs": q_minhash_dedup_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "knn_ivf": q_knn_ivf,
        "langid": q_langid,
        "langid_confusion": q_langid_confusion,
        "corpus_report": q_corpus_report,
        "token_budget_sample": q_token_budget_sample,
        "zipf_slope": q_zipf_slope,
        "cross_corpus_overlap": q_cross_corpus_overlap,
        "curate_web_corpus": q_curate_web_corpus,
        "ioc_extract": q_ioc_extract,
        "ip_block_rules": q_ip_block_rules,
        "image_features": q_image_features,
        "phash_near_dup": q_phash_near_dup,
        "image_dup_clusters": q_image_dup_clusters,
        "canonical_images": q_canonical_images,
        "image_meta_audit": q_image_meta_audit,
        "image_knn": q_image_knn,
        "daily_digest": q_daily_digest,
        "image_dedup_corpus": q_image_dedup_corpus,
        "hll_users": q_hll_users,
        "events_sliding": q_events_sliding,
        "chunk_docs": q_chunk_docs,
        "value_histogram": q_value_histogram,
        "tfidf_terms": q_tfidf_terms,
        "curate_corpus": q_curate_corpus,
        "events_rollup": q_events_rollup,
        "running_totals": q_running_totals,
        "top_orders_per_cust": q_top_orders_per_cust,
        "dataset_split": q_dataset_split,
        "lineitems_of_large_parts": q_lineitems_of_large_parts,
        "image_corpus_filter": q_image_corpus_filter,
        "semantic_dedup": q_semantic_dedup,
        "mixture_sample": q_mixture_sample,
        "aspect_buckets": q_aspect_buckets,
        "politeness_audit": q_politeness_audit,
        "exact_phash_dups": q_exact_phash_dups,
        "caption_pixel_corr": q_caption_pixel_corr,
        "sampled_quantiles": q_sampled_quantiles,
        "caption_consistency": q_caption_consistency,
        "outlink_degrees": q_outlink_degrees,
        "reciprocal_links": q_reciprocal_links,
        "curate_image_corpus": q_curate_image_corpus,
        "corpus_diff": q_corpus_diff,
        "lineitem_orders_join": q_lineitem_orders_join,
        "customer_orders_left_join": q_customer_orders_left_join,
        "customer_orders_full_join": q_customer_orders_full_join,
        "orders_customer_right_join": q_orders_customer_right_join,
        "event_value_stats": q_event_value_stats,
        "event_rolling": q_event_rolling,
        "dup_ngrams": q_dup_ngrams,
        "event_customer_skew_join": q_event_customer_skew_join,
        "cm_counts": q_cm_counts,
        "event_type_sample": q_event_type_sample,
        "weighted_type_sample": q_weighted_type_sample,
        "nb_classify": q_nb_classify,
        "url_canonical_dups": q_url_canonical_dups,
        "dsir_weights": q_dsir_weights,
        "tokenizer_fertility": q_tokenizer_fertility,
        "containment_pairs": q_containment_pairs,
        "line_dedup": q_line_dedup,
        "gopher_quality": q_gopher_quality,
        "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
        "bm25_search": q_bm25_search,
        "pld_rollup": q_pld_rollup,
        "lexical_diversity": q_lexical_diversity,
        "doc_length_histogram": q_doc_length_histogram,
        "triangles": q_triangles,
        "profile_events": q_profile_events,
        "events_cube": q_events_cube,
        "event_ranks": q_event_ranks,
        "top_users_per_type": q_top_users_per_type,
        "event_lag_lead": q_event_lag_lead,
        "event_rank_ties": q_event_rank_ties,
        "distinct_users_per_type": q_distinct_users_per_type,
        "user_modal_type": q_user_modal_type,
        "value_outliers": q_value_outliers,
        "shipping_priority": q_shipping_priority,
        "events_hourly_dense": q_events_hourly_dense,
        "fuzzy_search": q_fuzzy_search,
        "users_both_halves": q_users_both_halves,
        "users_first_half_only": q_users_first_half_only,
        "quantity_price_corr": q_quantity_price_corr,
        "value_trend": q_value_trend,
        "local_supplier_revenue": q_local_supplier_revenue,
        "daily_growth": q_daily_growth,
        "user_twap": q_user_twap,
        "knn_recall": q_knn_recall,
        "value_weighted_sample": q_value_weighted_sample,
        "type_drift": q_type_drift,
        "value_gini": q_value_gini,
        "value_trimmed_mean": q_value_trimmed_mean,
        "shuffle_positions": q_shuffle_positions,
        "fuzzy_entity_join": q_fuzzy_entity_join,
        "cumulative_users": q_cumulative_users,
        "view_click_overlap": q_view_click_overlap,
        "price_qty_skyline": q_price_qty_skyline,
        "user_entropy_by_type": q_user_entropy_by_type,
        "bitmap_distinct_users": q_bitmap_distinct_users,
        "audience_overlap": q_audience_overlap,
        "ab_lift": q_ab_lift,
        "value_ranksum": q_value_ranksum,
        "value_ks_test": q_value_ks_test,
        "value_mean_ci": q_value_mean_ci,
        "embedding_pca": q_embedding_pca,
        "embedding_pca_proj": q_embedding_pca_proj,
        "max_value_event_per_type": q_max_value_event_per_type,
        "crawl_budget": q_crawl_budget,
        "event_range_window": q_event_range_window,
        "value_quartile_buckets": q_value_quartile_buckets,
        "value_share": q_value_share,
        "value_mad": q_value_mad,
        "integrity_report": q_integrity_report,
        "user_event_type_list": q_user_event_type_list,
        "user_type_path": q_user_type_path,
        "event_type_cooccurrence": q_event_type_cooccurrence,
        "url_trap_flags": q_url_trap_flags,
        "events_watermark": q_events_watermark,
        "resolve_redirects": q_resolve_redirects,
        "sitemap_urls": q_sitemap_urls,
        "value_zscore": q_value_zscore,
        "retention_cohorts": q_retention_cohorts,
        "session_funnel": q_session_funnel,
        "events_upsert": q_events_upsert,
        "events_time_travel": q_events_time_travel,
        "user_key_skew": q_user_key_skew,
        "keyword_hits": q_keyword_hits,
        "event_same_day_count": q_event_same_day_count,
        "jsonl_ingest": q_jsonl_ingest,
        "partitioned_read": q_partitioned_read,
        "csv_ingest": q_csv_ingest,
        "ipc_ingest": q_ipc_ingest,
        "orc_ingest": q_orc_ingest,
        "evolving_ingest": q_evolving_ingest,
        "wet_ingest": q_wet_ingest,
        "user_first_last": q_user_first_last,
        "value_fill_forward": q_value_fill_forward,
        "payload_psnr": q_payload_psnr,
        "quality_percentile_filter": q_quality_percentile_filter,
        "token_freq_spectrum": q_token_freq_spectrum,
        "user_type_pivot": q_user_type_pivot,
        "user_type_melt": q_user_type_melt,
        "event_sessions": q_event_sessions,
        "event_type_transitions": q_event_type_transitions,
        "hll_users_by_type": q_hll_users_by_type,
        "channel_histogram": q_channel_histogram,
        "suppliers_per_region": q_suppliers_per_region,
        "revenue": q_revenue,
        "pagerank": q_pagerank,
        "tensor_prep": q_tensor_prep,
        "resize_images": q_resize_images,
        "news_pipeline": q_news_pipeline,
        "rss_advisories": q_rss_advisories,
        "crawl_flagship": q_crawl_flagship,
    }
