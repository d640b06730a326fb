"""Bulk ORACLE_SQL statements for the families above (kept together: pure data).

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

from .queries_analytics import (
    CRAWL_BUDGET_TOTAL,
    HIT_KEYWORDS,
    SETOP_SPLIT_DAY,
    SETOP_VALUE_MIN,
    TRIM_PCT,
)
from .queries_corpus import (
    RARE_MAX,
    SEARCH_K,
    SEARCH_TERMS,
    TOP_TERMS_K,
    VOCAB_MIN_COUNT,
)
from .queries_embed import (
    SAMPLED_Q_FRACTION,
)
from .queries_join_window import (
    CM_PROBES,
    CM_W,
    GROUP_SAMPLE_K,
    PIVOT_TYPES,
    TRIANGLE_MOD,
)
from .queries_rel import (
    ORACLE_SQL,
    STOPWORDS_SQL,
    _TOK_SQL,
)
from .queries_text import (
    FUZZY_MAX_DIST,
    FUZZY_PREFIX,
    KN_DISCOUNT,
    PMI_MIN_COUNT,
    PMI_TOP_K,
    Q3_CUTOFF,
    Q3_SEGMENT,
)

ORACLE_SQL.update(
    {
        "value_quantiles_cont": (
            "SELECT event_type, CAST(unnest([25, 50, 90]) AS BIGINT) AS pct, "
            "unnest(quantile_cont(value, [0.25, 0.5, 0.9])) AS value "
            "FROM events GROUP BY event_type"
        ),
        "value_quantiles": (
            "SELECT event_type, CAST(unnest([25, 50, 75]) AS BIGINT) AS pct, "
            "unnest(quantile_disc(value, [0.25, 0.5, 0.75])) AS value "
            "FROM events GROUP BY event_type"
        ),
        "top_terms": (
            f"SELECT term, count(*) AS n FROM ({_TOK_SQL}) WHERE term <> '' "
            f"GROUP BY term ORDER BY n DESC, term LIMIT {TOP_TERMS_K}"
        ),
        "value_zscore": (
            "WITH v AS (SELECT event_id, event_type, "
            "CAST(round(value*100) AS BIGINT) AS c FROM events), "
            "m AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c*c) AS ss "
            "FROM v GROUP BY event_type) "
            "SELECT v.event_id, "
            "CAST(CAST(v.c AS HUGEINT)*m.n - m.s AS DOUBLE) / "
            "(CAST(m.n AS DOUBLE) * "
            "sqrt(CAST(m.ss*m.n - m.s*m.s AS DOUBLE)/CAST(m.n*m.n AS DOUBLE))) "
            "AS z FROM v JOIN m USING (event_type) "
            "WHERE m.ss*m.n - m.s*m.s > 0"
        ),
        "events_watermark": (
            "WITH w AS (SELECT ts, max(ts) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events) "
            "SELECT date_trunc('hour', ts) AS window_start, "
            "CAST(count(*) FILTER (WHERE wm IS NULL OR "
            "ts >= wm - INTERVAL 1 HOUR) AS BIGINT) AS n_kept, "
            "CAST(count(*) FILTER (WHERE wm IS NOT NULL AND "
            "ts < wm - INTERVAL 1 HOUR) AS BIGINT) AS n_late "
            "FROM w GROUP BY 1"
        ),
        "vocab_build": (
            f"SELECT term, n, CAST(row_number() OVER (ORDER BY n DESC, term) - 1 "
            f"AS BIGINT) AS token_id FROM ("
            f"SELECT term, count(*) AS n FROM ({_TOK_SQL}) WHERE term <> '' "
            f"GROUP BY term HAVING count(*) >= {VOCAB_MIN_COUNT})"
        ),
        "tokenize_vocab": (
            "WITH v AS (SELECT term, CAST(row_number() OVER (ORDER BY n DESC, term) - 1 "
            "  AS BIGINT) AS token_id FROM ("
            f"  SELECT term, count(*) AS n FROM ({_TOK_SQL}) WHERE term <> '' "
            f"  GROUP BY term HAVING count(*) >= {VOCAB_MIN_COUNT})), "
            r"tk AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term, "
            r"  generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord "
            "  FROM documents) "
            "SELECT tk.doc_id, "
            "  string_agg(CAST(COALESCE(v.token_id, -1) AS VARCHAR), ' ' ORDER BY tk.ord) "
            "    AS token_ids, "
            "  CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov "
            "FROM tk LEFT JOIN v USING (term) GROUP BY tk.doc_id"
        ),
        "top_terms_per_lang": (
            "WITH tok AS (SELECT lang, unnest(regexp_split_to_array("
            "coalesce(text, ''), '\\s+')) AS term FROM documents), "
            "c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n "
            "FROM tok WHERE term <> '' GROUP BY lang, term) "
            "SELECT lang, term, n, CAST(rn AS BIGINT) AS rn FROM ("
            "SELECT *, row_number() OVER ("
            "PARTITION BY lang ORDER BY n DESC, term) AS rn FROM c) "
            "WHERE rn <= 3 ORDER BY lang, n DESC, term"
        ),
        "posting_lists": (
            f"WITH tok AS (SELECT DISTINCT doc_id, term FROM ({_TOK_SQL}) "
            "WHERE term <> '') "
            "SELECT term, CAST(count(*) AS BIGINT) AS df, "
            "list(doc_id ORDER BY doc_id) AS postings "
            "FROM tok GROUP BY term ORDER BY term"
        ),
        "doc_surprisal": (
            f"WITH tok AS (SELECT doc_id, term FROM ({_TOK_SQL}) "
            "WHERE term <> ''), "
            "tot AS (SELECT term, CAST(count(*) AS HUGEINT) AS n FROM tok "
            "GROUP BY term), "
            "nt AS (SELECT CAST(sum(n) AS DOUBLE) AS nf FROM tot), "
            "q AS (SELECT term, CAST(floor(log2(CAST(n AS DOUBLE)/nf) "
            "* 1048576.0 + 0.5) AS HUGEINT) AS qterm FROM tot, nt) "
            "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "-(CAST(sum(q.qterm) AS DOUBLE)/1048576.0) AS surprisal_bits, "
            "(-(CAST(sum(q.qterm) AS DOUBLE)/1048576.0)) / "
            "CAST(count(*) AS DOUBLE) AS bits_per_token "
            "FROM tok t JOIN q USING (term) GROUP BY t.doc_id"
        ),
        "heldout_entropy": (
            f"WITH tok AS (SELECT doc_id, term FROM ({_TOK_SQL}) "
            "WHERE term <> ''), "
            "tr AS (SELECT term, CAST(count(*) AS HUGEINT) AS c FROM tok "
            "WHERE doc_id % 2 = 0 GROUP BY term), "
            "m AS (SELECT CAST(sum(c) AS HUGEINT) AS n, "
            "CAST(count(*) AS HUGEINT) AS v FROM tr), "
            "ho AS (SELECT doc_id, term FROM tok WHERE doc_id % 2 = 1), "
            "q AS (SELECT ho.doc_id, CAST(floor(log2("
            "CAST(coalesce(tr.c, 0) + 1 AS DOUBLE) / "
            "CAST(m.n + m.v + 1 AS DOUBLE)) * 1048576.0 + 0.5) AS HUGEINT) "
            "AS qt FROM ho LEFT JOIN tr USING (term) CROSS JOIN m) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "-(CAST(sum(qt) AS DOUBLE)/1048576.0) AS heldout_bits, "
            "(-(CAST(sum(qt) AS DOUBLE)/1048576.0)) / "
            "CAST(count(*) AS DOUBLE) AS bits_per_token "
            "FROM q GROUP BY doc_id"
        ),
        "doc_rarity": (
            f"WITH tok AS (SELECT doc_id, term FROM ({_TOK_SQL}) WHERE term <> ''), "
            "tot AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok "
            "GROUP BY term) "
            "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            f"CAST(coalesce(sum(CASE WHEN tot.n <= {RARE_MAX} THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) AS n_rare, "
            "CAST(sum(tot.n) AS BIGINT) AS sum_term_freq "
            "FROM tok t JOIN tot USING (term) GROUP BY t.doc_id"
        ),
        "top_bigrams": (
            "WITH l AS (SELECT list_filter(regexp_split_to_array("
            "coalesce(text, ''), '\\s+'), x -> x <> '') AS toks FROM documents), "
            "b AS (SELECT unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS term FROM l) "
            f"SELECT term, count(*) AS n FROM b GROUP BY term "
            f"ORDER BY n DESC, term LIMIT {TOP_TERMS_K}"
        ),
        "kn_bigram_lm": (
            "WITH l AS (SELECT list_filter(regexp_split_to_array("
            "coalesce(text, ''), '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "b AS (SELECT unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS term FROM l), "
            "cb AS (SELECT term, count(*) AS n FROM b GROUP BY term), "
            "s1 AS (SELECT split_part(term, ' ', 1) AS w1, sum(n) AS c1, "
            "count(*) AS n1f FROM cb GROUP BY 1), "
            "s2 AS (SELECT split_part(term, ' ', 2) AS w2, count(*) AS n1b "
            "FROM cb GROUP BY 1), "
            "tot AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM cb) "
            "SELECT split_part(term, ' ', 1) AS w1, "
            "split_part(term, ' ', 2) AS w2, CAST(n AS BIGINT) AS n, "
            f"(greatest(CAST(n AS DOUBLE) - {KN_DISCOUNT}, 0) + "
            f"{KN_DISCOUNT} * CAST(n1f AS DOUBLE) * CAST(n1b AS DOUBLE) / b) "
            "/ CAST(c1 AS DOUBLE) AS p_kn "
            "FROM cb CROSS JOIN tot "
            "JOIN s1 ON s1.w1 = split_part(term, ' ', 1) "
            "JOIN s2 ON s2.w2 = split_part(term, ' ', 2)"
        ),
        "bigram_pmi": (
            "WITH l AS (SELECT list_filter(regexp_split_to_array("
            "coalesce(text, ''), '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "b AS (SELECT unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS term FROM l), "
            f"cb AS (SELECT term, CAST(count(*) AS HUGEINT) AS c_xy FROM b "
            f"GROUP BY term HAVING count(*) >= {PMI_MIN_COUNT}), "
            "u AS (SELECT unnest(toks) AS w FROM l), "
            "cu AS (SELECT w, CAST(count(*) AS HUGEINT) AS c FROM u "
            "GROUP BY w), "
            "tot AS (SELECT (SELECT CAST(count(*) AS HUGEINT) FROM u) AS "
            "n_uni, (SELECT CAST(count(*) AS HUGEINT) FROM b) AS n_bi) "
            "SELECT term AS bigram, CAST(c_xy AS BIGINT) AS c_xy, "
            "log2(CAST(c_xy * n_uni * n_uni AS DOUBLE) / "
            "CAST(n_bi * u1.c * u2.c AS DOUBLE)) AS pmi "
            "FROM cb CROSS JOIN tot "
            "JOIN cu u1 ON u1.w = split_part(term, ' ', 1) "
            "JOIN cu u2 ON u2.w = split_part(term, ' ', 2) "
            f"ORDER BY pmi DESC, bigram LIMIT {PMI_TOP_K}"
        ),
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize("
            "coalesce(text, ''))), '\\s+', ' ', 'g'), ' ') AS text_norm "
            "FROM documents"
        ),
        "repetition_stats": (
            f"WITH tf AS (SELECT doc_id, term, count(*) AS c FROM ({_TOK_SQL}) "
            "  WHERE term <> '' GROUP BY doc_id, term) "
            "SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens, "
            "  coalesce(s.n_unique_tokens, 0) AS n_unique_tokens, "
            "  coalesce(s.top_token_count, 0) AS top_token_count "
            "FROM documents d LEFT JOIN ("
            "  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
            "    count(*) AS n_unique_tokens, max(c) AS top_token_count "
            "  FROM tf GROUP BY doc_id) s USING (doc_id)"
        ),
        "term_search": (
            "WITH tf AS (SELECT doc_id, term, count(*) AS c FROM ("
            + _TOK_SQL
            + ") WHERE term IN ("
            + ", ".join(f"'{t}'" for t in SEARCH_TERMS)
            + ") GROUP BY doc_id, term) "
            "SELECT term, doc_id, c AS tf FROM ("
            "  SELECT term, doc_id, c, row_number() OVER ("
            "    PARTITION BY term ORDER BY c DESC, doc_id) AS rn FROM tf) "
            f"WHERE rn <= {SEARCH_K}"
        ),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type, "
            "count(*) AS n_events, min(value) AS min_value, "
            "max(value) AS max_value FROM events "
            "GROUP BY date_trunc('hour', ts), event_type"
        ),
        "suppliers_per_region": (
            "SELECT r_name, count(*) AS n_suppliers FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "revenue": (
            "SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) "
            "AS BIGINT)) AS BIGINT) "
            "AS revenue_cents, count(*) AS n_lines FROM lineitem "
            "WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "running_totals": (
            "SELECT event_id, CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING"
            ") AS BIGINT) AS running_cents FROM events"
        ),
        "lineitems_of_large_parts": (
            "SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem "
            "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)"
        ),
        "dataset_split": (
            "SELECT doc_id, "
            + sp.split_case_sql("doc_id", val_fraction=0.1, test_fraction=0.1)
            + " AS split FROM documents"
        ),
        "customer_orders_full_join": (
            "SELECT coalesce(c.c_custkey, o.o_custkey) AS c_custkey, "
            "o.o_orderkey, o.o_totalprice FROM "
            "(SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c "
            "FULL OUTER JOIN "
            "(SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
            "WHERE o_custkey % 3 = 0) o ON c.c_custkey = o.o_custkey"
        ),
        "customer_orders_left_join": (
            "SELECT c_custkey, o_orderkey, o_totalprice FROM customer "
            "LEFT JOIN orders ON c_custkey = o_custkey"
        ),
        "orders_customer_right_join": (
            "SELECT coalesce(o_custkey, c_custkey) AS o_custkey, "
            "o_orderkey, o_totalprice FROM orders "
            "RIGHT JOIN customer ON o_custkey = c_custkey"
        ),
        "profile_events": (
            "SELECT * FROM ("
            + " UNION ALL ".join(
                f"SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM events"
                for c in ["event_type", "props", "user_id", "value"]
            )
            + ") ORDER BY col"
        ),
        "triangles": (
            f"WITH e0 AS (SELECT DISTINCT least(l_orderkey % {TRIANGLE_MOD}, "
            f"l_partkey % {TRIANGLE_MOD}) AS a, greatest(l_orderkey % "
            f"{TRIANGLE_MOD}, l_partkey % {TRIANGLE_MOD}) AS b FROM lineitem "
            f"WHERE l_orderkey % {TRIANGLE_MOD} <> l_partkey % {TRIANGLE_MOD}) "
            "SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM e0 e1 "
            "JOIN e0 e2 ON e1.b = e2.a JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b"
        ),
        "event_type_sample": (
            "SELECT event_type, event_id, CAST(row_number() OVER ("
            "PARTITION BY event_type ORDER BY "
            "substr(md5(CAST(event_id AS VARCHAR)), 1, 8), event_id"
            f") AS BIGINT) AS rn FROM events QUALIFY rn <= {GROUP_SAMPLE_K}"
        ),
        "cm_counts": (
            "WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array("
            "coalesce(text, ''), '\\s+'), x -> x <> '')) AS term FROM documents), "
            "js(j) AS (VALUES (0), (1), (2)), "
            "probes(pterm) AS (VALUES "
            + ", ".join(f"('{t}')" for t in CM_PROBES)
            + "), "
            "bk AS (SELECT j, CAST(CONCAT('0x', substr(md5(CAST(j AS VARCHAR) "
            f"|| ':' || term), 1, 8)) AS BIGINT) % {CM_W} AS b, count(*) AS n "
            "FROM toks CROSS JOIN js GROUP BY 1, 2), "
            "pe AS (SELECT pterm, js.j, CAST(CONCAT('0x', substr(md5("
            "CAST(js.j AS VARCHAR) || ':' || pterm), 1, 8)) AS BIGINT) "
            f"% {CM_W} AS b FROM probes CROSS JOIN js) "
            "SELECT pterm AS term, CAST(min(coalesce(bk.n, 0)) AS BIGINT) "
            "AS cm_count FROM pe LEFT JOIN bk ON pe.j = bk.j AND pe.b = bk.b "
            "GROUP BY pterm ORDER BY term"
        ),
        "event_customer_skew_join": (
            "SELECT user_id, event_id, c_nationkey FROM events "
            "JOIN customer ON user_id = c_custkey"
        ),
        "dup_ngrams": (
            "WITH l AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "coalesce(text, ''), '\\s+'), x -> x <> '') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || "
            "toks[i+3] || ' ' || toks[i+4])) AS gram FROM l), "
            "c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram), "
            "p AS (SELECT g.doc_id, count(*) AS n, "
            "count(*) FILTER (c.cnt > 1) AS nd FROM g JOIN c USING (gram) "
            "GROUP BY g.doc_id) "
            "SELECT l.doc_id, "
            "CAST(greatest(len(l.toks) - 4, 0) AS BIGINT) AS n_grams, "
            "CAST(coalesce(p.nd, 0) AS BIGINT) AS n_dup_grams, "
            "CASE WHEN coalesce(p.n, 0) = 0 THEN 0.0 ELSE "
            "CAST(p.nd AS DOUBLE)/CAST(p.n AS DOUBLE) END AS dup_gram_ratio "
            "FROM l LEFT JOIN p ON l.doc_id = p.doc_id"
        ),
        "event_rolling": (
            "WITH v AS (SELECT event_id, user_id, ts, "
            "CAST(round(value*100) AS BIGINT) AS c FROM events) "
            "SELECT event_id, COUNT(*) OVER w AS rolling_n, "
            "CAST(SUM(c) OVER w AS BIGINT) AS rolling_sum, "
            "CAST(SUM(c) OVER w AS DOUBLE)/CAST(COUNT(*) OVER w AS DOUBLE) "
            "AS rolling_avg FROM v WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        "event_value_stats": (
            "WITH v AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS c "
            "FROM events), m AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s, "
            "SUM(c*c) AS ss FROM v GROUP BY event_type) "
            "SELECT event_type, n AS n_values, CAST(s AS BIGINT) AS sum_cents, "
            "CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mean_cents, "
            "CAST(ss*n - s*s AS DOUBLE)/CAST(n*n AS DOUBLE) AS var_cents, "
            "sqrt(CAST(ss*n - s*s AS DOUBLE)/CAST(n*n AS DOUBLE)) AS std_cents "
            "FROM m ORDER BY event_type"
        ),
        "lineitem_orders_join": (
            "SELECT l_orderkey, l_linenumber, l_quantity, o_orderdate, "
            "o_totalprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        ),
        "corpus_diff": (
            "WITH a AS (SELECT doc_id, md5(coalesce(text, '')) AS fp FROM documents), "
            "b0 AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN "
            "md5(coalesce(text, '') || ' v2') ELSE md5(coalesce(text, '')) END AS fp "
            "FROM documents WHERE doc_id % 7 <> 0), "
            "badd AS (SELECT doc_id + 1000000 AS doc_id, "
            "md5('new doc ' || CAST(doc_id AS VARCHAR)) AS fp FROM documents "
            "WHERE doc_id % 13 = 0), "
            "b AS (SELECT * FROM b0 UNION ALL SELECT * FROM badd) "
            "SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, "
            "CASE WHEN a.doc_id IS NULL THEN 'added' "
            "WHEN b.doc_id IS NULL THEN 'removed' ELSE 'changed' END AS status "
            "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id "
            "WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp"
        ),
        "sampled_quantiles": (
            "SELECT event_type, CAST(unnest([25, 50, 75]) AS BIGINT) AS pct, "
            "unnest(quantile_disc(value, [0.25, 0.5, 0.75])) AS value FROM ("
            "SELECT event_type, value FROM events WHERE "
            "substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < "
            f"'{sp.fraction_threshold_hex(SAMPLED_Q_FRACTION)}'"
            ") GROUP BY event_type"
        ),
        "top_orders_per_cust": (
            "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
            ") AS rn FROM orders) WHERE rn <= 3"
        ),
        "events_rollup": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events, "
            "max(value) AS max_value FROM events "
            "GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))"
        ),
        "event_type_transitions": (
            "WITH g AS (SELECT event_id, user_id, ts, event_type, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events), "
            "s AS (SELECT *, SUM(CASE WHEN prev_ts IS NULL "
            "OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS session_num FROM g), "
            "p AS (SELECT event_type, lag(event_type) OVER ("
            "PARTITION BY user_id, session_num ORDER BY ts, event_id"
            ") AS prev_type FROM s) "
            "SELECT prev_type, event_type, count(*) AS n FROM p "
            "WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
        ),
        "event_sessions": (
            "WITH g AS (SELECT event_id, user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
            "FROM events) "
            "SELECT event_id, CAST(SUM(CASE WHEN prev_ts IS NULL "
            "OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num FROM g"
        ),
        "user_type_melt": (
            "SELECT user_id, event_type, count(*) AS n FROM events "
            "GROUP BY user_id, event_type"
        ),
        "user_type_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(count(*) FILTER (WHERE event_type = '{ty}') AS BIGINT) "
                f"AS n_{ty}"
                for ty in PIVOT_TYPES
            )
            + " FROM events GROUP BY user_id"
        ),
        "token_freq_spectrum": (
            f"WITH tf AS (SELECT term, count(*) AS n FROM ({_TOK_SQL}) "
            "WHERE term <> '' GROUP BY term) "
            "SELECT n, count(*) AS n_terms FROM tf GROUP BY n"
        ),
        "quality_percentile_filter": (
            r"WITH s AS (SELECT doc_id, len(regexp_extract_all("
            r"coalesce(text, ''), '\S+')) AS n_tokens FROM documents), "
            "t AS (SELECT quantile_disc(n_tokens, 0.75) AS th FROM s) "
            "SELECT doc_id, n_tokens FROM s, t WHERE n_tokens >= th"
        ),
        "event_lag_lead": (
            "SELECT event_id, lag(value) OVER w AS prev_value, "
            "lead(value) OVER w AS next_value FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "partitioned_read": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents FROM events "
            "WHERE event_type IN ('click', 'purchase') "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "event_same_day_count": (
            "SELECT event_id, CAST(count(*) OVER (PARTITION BY user_id, "
            "CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400) "
            "AS BIGINT) AS n_in_group FROM events"
        ),
        "keyword_hits": (
            "SELECT * FROM ("
            + " UNION ALL ".join(
                f"SELECT '{k}' AS keyword, CAST(count(*) FILTER (WHERE "
                f"contains(lower(coalesce(text, '')), '{k}')) AS BIGINT) "
                "AS n_docs FROM documents"
                for k in HIT_KEYWORDS
            )
            + ")"
        ),
        "events_time_travel": (
            "WITH base AS (SELECT event_id, 1 AS v, value FROM events), "
            "c2 AS (SELECT event_id, 2 AS v, value + 1000 AS value "
            "  FROM events WHERE event_id % 10 = 3), "
            "c3 AS (SELECT event_id, 3 AS v, value + 5000 AS value "
            "  FROM events WHERE event_id % 7 = 0), "
            "u AS (SELECT * FROM base UNION ALL SELECT * FROM c2 "
            "      UNION ALL SELECT * FROM c3), "
            "f AS (SELECT * FROM u WHERE v <= 2) "
            "SELECT event_id, CAST(version AS BIGINT) AS version, value "
            "FROM (SELECT event_id, v AS version, value, row_number() OVER ("
            "PARTITION BY event_id ORDER BY v DESC) AS rn FROM f) "
            "WHERE rn = 1"
        ),
        "events_upsert": (
            "WITH base AS (SELECT event_id, 1 AS v, value FROM events), "
            "ch AS (SELECT event_id, 2 AS v, value + 1000 AS value "
            "FROM events WHERE event_id % 10 = 3), "
            "u AS (SELECT * FROM base UNION ALL SELECT * FROM ch) "
            "SELECT event_id, CAST(version AS BIGINT) AS version, value "
            "FROM (SELECT event_id, v AS version, value, row_number() OVER ("
            "PARTITION BY event_id ORDER BY v DESC) AS rn FROM u) "
            "WHERE rn = 1"
        ),
        "user_key_skew": (
            "WITH c AS (SELECT user_id, count(*) AS n FROM events "
            "GROUP BY user_id) "
            "SELECT CAST(sum(n) AS BIGINT) AS n_rows, "
            "CAST(count(*) AS BIGINT) AS n_keys, "
            "CAST(max(n) AS BIGINT) AS max_count, "
            "CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50_count, "
            "CAST(quantile_disc(n, 0.90) AS BIGINT) AS p90_count, "
            "CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_count FROM c"
        ),
        "session_funnel": (
            "WITH g AS (SELECT event_id, user_id, ts, event_type, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev_ts FROM events), "
            "s AS (SELECT user_id, ts, event_type, "
            "SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > "
            "INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sn FROM g), "
            "v AS (SELECT user_id, sn, min(ts) AS t1 FROM s "
            "WHERE event_type = 'view' GROUP BY 1, 2), "
            "c AS (SELECT s.user_id, s.sn, min(s.ts) AS t2 FROM s "
            "JOIN v ON s.user_id = v.user_id AND s.sn = v.sn "
            "WHERE s.event_type = 'click' AND s.ts > v.t1 GROUP BY 1, 2), "
            "p AS (SELECT s.user_id, s.sn, min(s.ts) AS t3 FROM s "
            "JOIN c ON s.user_id = c.user_id AND s.sn = c.sn "
            "WHERE s.event_type = 'purchase' AND s.ts > c.t2 GROUP BY 1, 2) "
            "SELECT * FROM ("
            "SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM v UNION ALL SELECT 'view>click', "
            "CAST(count(*) AS BIGINT) FROM c "
            "UNION ALL SELECT 'view>click>purchase', "
            "CAST(count(*) AS BIGINT) FROM p)"
        ),
        "retention_cohorts": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day "
            "FROM events), "
            "c AS (SELECT user_id, min(day) AS cohort_day FROM d "
            "GROUP BY user_id) "
            "SELECT c.cohort_day, d.day - c.cohort_day AS day_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM d JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "user_event_type_list": (
            "SELECT user_id, list(event_type ORDER BY ts, event_id) "
            'AS "values" FROM events GROUP BY user_id'
        ),
        "user_type_path": (
            "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) "
            "AS type_path FROM events GROUP BY user_id"
        ),
        "event_type_cooccurrence": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS n_users FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2"
        ),
        "value_mad": (
            "WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS med "
            "FROM events GROUP BY event_type) "
            "SELECT e.event_type, quantile_disc(abs(e.value - m.med), 0.5) "
            "AS mad FROM events e JOIN m USING (event_type) "
            "GROUP BY e.event_type"
        ),
        "integrity_report": (
            "SELECT 'duplicate_event_ids' AS check_name, "
            "CAST(count(*) AS BIGINT) AS n_violations FROM ("
            "SELECT event_id FROM events GROUP BY event_id "
            "HAVING count(*) > 1) "
            "UNION ALL SELECT 'order_total_mismatch', "
            "CAST(count(*) AS BIGINT) FROM ("
            "SELECT o_orderkey FROM orders JOIN ("
            "SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice * 100) "
            "AS BIGINT)) AS BIGINT) AS c FROM lineitem GROUP BY l_orderkey) "
            "ON o_orderkey = l_orderkey "
            "WHERE CAST(round(o_totalprice * 100) AS BIGINT) <> c) "
            "UNION ALL SELECT 'orders_without_lineitems', "
            "CAST(count(*) AS BIGINT) FROM orders "
            "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem) "
            "UNION ALL SELECT 'orphan_lineitems', "
            "CAST(count(*) AS BIGINT) FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"
        ),
        "value_quartile_buckets": (
            "WITH q AS (SELECT event_type, "
            "quantile_disc(value, 0.25) AS q1, "
            "quantile_disc(value, 0.50) AS q2, "
            "quantile_disc(value, 0.75) AS q3 FROM events "
            "GROUP BY event_type) "
            "SELECT e.event_id, CAST(1 + CAST(e.value > q1 AS INT) + "
            "CAST(e.value > q2 AS INT) + CAST(e.value > q3 AS INT) "
            "AS BIGINT) AS bucket FROM events e JOIN q USING (event_type)"
        ),
        "value_share": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "t AS (SELECT event_type, sum(cents) AS tot FROM c "
            "GROUP BY event_type) "
            "SELECT c.event_id, CAST(c.cents AS DOUBLE) / "
            "CAST(t.tot AS DOUBLE) AS share FROM c JOIN t USING (event_type)"
        ),
        "event_range_window": (
            "SELECT event_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) "
            "OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS range_sum FROM events"
        ),
        "crawl_budget": (
            f"WITH w AS (SELECT source, CAST(sum(n_chars) AS HUGEINT) AS wt "
            "FROM documents GROUP BY source), "
            f"t AS (SELECT sum(wt) AS tot FROM w), "
            f"q AS (SELECT source, wt, "
            f"(CAST({CRAWL_BUDGET_TOTAL} AS HUGEINT) * wt) // tot AS base, "
            f"(CAST({CRAWL_BUDGET_TOTAL} AS HUGEINT) * wt) % tot AS rem "
            "FROM w, t), "
            "r AS (SELECT sum(base) AS fsum FROM q) "
            "SELECT source, CAST(wt AS BIGINT) AS weight, "
            "CAST(base + CASE WHEN row_number() OVER "
            "(ORDER BY rem DESC, source) <= "
            f"{CRAWL_BUDGET_TOTAL} - fsum THEN 1 ELSE 0 END AS BIGINT) "
            "AS quota FROM q, r ORDER BY source"
        ),
        "users_both_halves": (
            f"SELECT user_id FROM events WHERE value > {SETOP_VALUE_MIN} "
            f"AND day(ts) <= {SETOP_SPLIT_DAY} INTERSECT "
            f"SELECT user_id FROM events WHERE value > {SETOP_VALUE_MIN} "
            f"AND day(ts) > {SETOP_SPLIT_DAY}"
        ),
        "users_first_half_only": (
            f"SELECT user_id FROM events WHERE value > {SETOP_VALUE_MIN} "
            f"AND day(ts) <= {SETOP_SPLIT_DAY} EXCEPT "
            f"SELECT user_id FROM events WHERE value > {SETOP_VALUE_MIN} "
            f"AND day(ts) > {SETOP_SPLIT_DAY}"
        ),
        "quantity_price_corr": (
            "WITH m AS (SELECT l_returnflag, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(l_quantity AS HUGEINT)) AS sx, "
            "sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy, "
            "sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) "
            "AS sxx, "
            "sum(CAST(round(l_extendedprice * 100) AS HUGEINT) * "
            "CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy, "
            "sum(CAST(l_quantity AS HUGEINT) * "
            "CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy "
            "FROM lineitem GROUP BY l_returnflag) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n_values, "
            "CAST(n * sxy - sx * sy AS DOUBLE) / "
            "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * "
            "sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_xy FROM m"
        ),
        "value_weighted_sample": (
            "SELECT event_id, value FROM events WHERE "
            + sp.weight_sample_sql(
                "event_id",
                "least(CAST(round(value*100) AS DOUBLE)/20000, 1.0)",
            )
        ),
        "shuffle_positions": (
            "SELECT CAST(row_number() OVER (ORDER BY "
            "md5(CAST(doc_id AS VARCHAR) || '-ep0'), doc_id) - 1 AS BIGINT) "
            "AS shuffle_pos, doc_id FROM documents"
        ),
        "price_qty_skyline": (
            "WITH s AS (SELECT l_orderkey, l_linenumber, "
            "CAST(l_quantity AS BIGINT) AS qty, "
            "CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents "
            "FROM lineitem), "
            "levels AS (SELECT price_cents, min(qty) AS lvl_min FROM s "
            "GROUP BY price_cents), "
            "lm AS (SELECT price_cents, lvl_min, min(lvl_min) OVER ("
            "ORDER BY price_cents DESC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m "
            "FROM levels) "
            "SELECT s.l_orderkey, s.l_linenumber, s.qty, s.price_cents "
            "FROM s JOIN lm USING (price_cents) "
            "WHERE s.qty = lm.lvl_min AND (lm.m IS NULL OR lm.lvl_min < lm.m)"
        ),
        "view_click_overlap": (
            "WITH v AS (SELECT user_id, event_id AS left_id, "
            "epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e "
            "FROM events WHERE event_type = 'view'), "
            "c AS (SELECT user_id, event_id AS right_id, "
            "epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e "
            "FROM events WHERE event_type = 'click') "
            "SELECT v.user_id, v.left_id, c.right_id FROM v JOIN c "
            "ON v.user_id = c.user_id AND v.s < c.e AND c.s < v.e "
            "ORDER BY v.user_id, v.left_id, c.right_id"
        ),
        "cumulative_users": (
            "WITH f AS (SELECT user_id, "
            "min(CAST(floor(epoch(ts)/86400) AS BIGINT)) AS first_day "
            "FROM events GROUP BY user_id), "
            "d AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS "
            "n_new_users FROM f GROUP BY first_day) "
            "SELECT day, n_new_users, CAST(sum(n_new_users) OVER ("
            "ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users "
            "FROM d ORDER BY day"
        ),
        "value_trimmed_mean": (
            "WITH s AS (SELECT event_id, "
            "CAST(round(value*100) AS BIGINT) AS c FROM events), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c, event_id) - 1 "
            "AS i0, (SELECT count(*) FROM s) AS n FROM s), "
            f"k AS (SELECT n, n * {TRIM_PCT} // 100 AS k FROM r LIMIT 1) "
            "SELECT CAST(k.n AS BIGINT) AS n_total, "
            "CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(CAST(r.c AS HUGEINT)) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) AS trimmed_mean_cents "
            "FROM r CROSS JOIN k "
            "WHERE r.i0 >= k.k AND r.i0 < k.n - k.k GROUP BY k.n"
        ),
        "value_gini": (
            "WITH u AS (SELECT user_id, "
            "sum(CAST(round(value*100) AS BIGINT)) AS c FROM events "
            "GROUP BY user_id), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i "
            "FROM u), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(c AS HUGEINT)) AS s, "
            "sum((2*CAST(i AS HUGEINT) - 1) * CAST(c AS HUGEINT)) AS w "
            "FROM r) "
            "SELECT CAST(n AS BIGINT) AS n_users, "
            "CAST(w - n*s AS DOUBLE) / CAST(n*s AS DOUBLE) AS gini FROM m"
        ),
        "user_twap": (
            "WITH s AS (SELECT user_id, epoch_us(ts) AS t, "
            "CAST(round(value*100) AS BIGINT) AS c, event_id FROM events), "
            "w AS (SELECT user_id, c, t, lead(t) OVER ("
            "PARTITION BY user_id ORDER BY t, event_id) AS nxt FROM s), "
            "m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "sum(CAST(c AS HUGEINT) * CAST(coalesce(nxt - t, 0) AS HUGEINT)) "
            "AS num, CAST(max(t) - min(t) AS HUGEINT) AS dur "
            "FROM w GROUP BY user_id) "
            "SELECT user_id, n_events, "
            "CAST(num AS DOUBLE)/CAST(nullif(dur, 0) AS DOUBLE) AS twap "
            "FROM m ORDER BY user_id"
        ),
        "daily_growth": (
            "WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY event_type, CAST(ts AS DATE)), "
            "l AS (SELECT event_type, day, n, "
            "lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n "
            "FROM c) "
            "SELECT event_type, day, n, prev_n, n - prev_n AS delta, "
            "CAST(n - prev_n AS DOUBLE)/CAST(prev_n AS DOUBLE) AS pct_change "
            "FROM l ORDER BY event_type, day"
        ),
        "local_supplier_revenue": (
            "SELECT n_name, CAST(sum(CAST(round("
            "l_extendedprice*(1-l_discount)*100) AS HUGEINT)) AS BIGINT) "
            "AS revenue_cents "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1997-01-01' "
            "GROUP BY n_name ORDER BY revenue_cents DESC, n_name"
        ),
        "ab_lift": (
            "WITH u AS (SELECT user_id, user_id % 2 AS grp, "
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS conv FROM events GROUP BY user_id), "
            "m AS (SELECT "
            "CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, "
            "CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, "
            "CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a, "
            "CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b "
            "FROM u), "
            "r AS (SELECT *, CAST(conv_a AS DOUBLE)/CAST(n_a AS DOUBLE) AS rate_a, "
            "CAST(conv_b AS DOUBLE)/CAST(n_b AS DOUBLE) AS rate_b, "
            "CAST(conv_a + conv_b AS DOUBLE)/CAST(n_a + n_b AS DOUBLE) AS p "
            "FROM m) "
            "SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b, "
            "rate_b - rate_a AS lift, "
            "(rate_b - rate_a) / sqrt(p * (1.0 - p) * "
            "(1.0/CAST(n_a AS DOUBLE) + 1.0/CAST(n_b AS DOUBLE))) AS z_score "
            "FROM r"
        ),
        "value_ranksum": (
            "WITH s AS (SELECT user_id % 2 AS grp, "
            "CAST(round(value*100) AS BIGINT) AS c FROM events), "
            "r AS (SELECT grp, CAST(rank() OVER (ORDER BY c) AS HUGEINT) "
            "AS mn, CAST(count(*) OVER (PARTITION BY c) AS HUGEINT) AS t "
            "FROM s), "
            "m AS (SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) "
            "AS HUGEINT) AS n_a, "
            "CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) "
            "AS n_b, "
            "sum(CASE WHEN grp = 0 THEN 2*mn + t - 1 ELSE 0 END) AS r2a "
            "FROM r), "
            "ties AS (SELECT sum(t*t*t - t) AS tie3 FROM ("
            "SELECT CAST(count(*) AS HUGEINT) AS t FROM s GROUP BY c)) "
            "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
            "(CAST(r2a AS DOUBLE) - CAST(n_a*(n_a+1) AS DOUBLE))/2.0 AS u_a, "
            "((CAST(r2a AS DOUBLE) - CAST(n_a*(n_a+1) AS DOUBLE))/2.0 - "
            "CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)/2.0) / "
            "sqrt(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)/12.0 * "
            "(CAST(n_a+n_b+1 AS DOUBLE) - CAST(tie3 AS DOUBLE)/"
            "(CAST(n_a+n_b AS DOUBLE)*CAST(n_a+n_b-1 AS DOUBLE)))) "
            "AS z_score FROM m, ties"
        ),
        "bitmap_distinct_users": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_distinct FROM events GROUP BY event_type "
            "ORDER BY event_type"
        ),
        "value_trend": (
            "WITH v AS (SELECT event_type, "
            "CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) "
            "AS HUGEINT) AS x, "
            "CAST(round(value*100) AS HUGEINT) AS y FROM events), "
            "m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, "
            "sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, "
            "sum(y*y) AS syy, sum(x*y) AS sxy FROM v GROUP BY event_type) "
            "SELECT event_type, CAST(n AS BIGINT) AS n_values, "
            "CAST(n*sxy - sx*sy AS DOUBLE) / "
            "NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0) AS slope, "
            "(CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / "
            "NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0)) * CAST(sx AS DOUBLE)) "
            "/ CAST(n AS DOUBLE) AS intercept, "
            "(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) "
            "/ NULLIF(CAST(n*sxx - sx*sx AS DOUBLE) * "
            "CAST(n*syy - sy*sy AS DOUBLE), 0) AS r2 "
            "FROM m ORDER BY event_type"
        ),
        "max_value_event_per_type": (
            "SELECT event_type, event_id, value FROM ("
            "SELECT event_type, event_id, value, row_number() OVER ("
            "PARTITION BY event_type ORDER BY value DESC, event_id) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "fuzzy_search": (
            "WITH p0 AS (SELECT CAST(0 AS BIGINT) AS pattern_id, "
            f"substr(text, 1, {FUZZY_PREFIX}) AS q FROM documents "
            "WHERE doc_id = 0 UNION ALL "
            f"SELECT 1, substr(text, 1, {FUZZY_PREFIX}) FROM documents "
            "WHERE doc_id = 1), "
            "pm AS (SELECT pattern_id, substr(q, 1, 2) || substr(q, 4, 1) || "
            "substr(q, 3, 1) || substr(q, 5) AS q FROM p0) "
            "SELECT doc_id, pattern_id, dist FROM ("
            "SELECT d.doc_id, pm.pattern_id, CAST(levenshtein("
            f"substr(d.text, 1, {FUZZY_PREFIX}), pm.q) AS BIGINT) AS dist "
            "FROM documents d CROSS JOIN pm) "
            f"WHERE dist <= {FUZZY_MAX_DIST}"
        ),
        "events_hourly_dense": (
            "WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, "
            "date_trunc('hour', max(ts)) AS h1 FROM events), "
            "g AS (SELECT t.event_type, h.h FROM "
            "(SELECT DISTINCT event_type FROM events) t CROSS JOIN "
            "(SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h "
            "FROM b) h), "
            "c AS (SELECT event_type, date_trunc('hour', ts) AS h, "
            "count(*) AS n FROM events GROUP BY 1, 2) "
            "SELECT g.event_type, g.h AS hour_start, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n_events "
            "FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, o_orderdate, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM customer, orders, lineitem "
            f"WHERE c_mktsegment = '{Q3_SEGMENT}' "
            "AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
            f"AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}' "
            f"AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}' "
            "GROUP BY l_orderkey, o_orderdate "
            "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
        ),
        "value_outliers": (
            "WITH q AS (SELECT event_type, "
            "quantile_disc(value, 0.25) AS q1, "
            "quantile_disc(value, 0.75) AS q3 FROM events "
            "GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, e.value FROM events e "
            "JOIN q USING (event_type) "
            "WHERE e.value < q1 - 1.5 * (q3 - q1) "
            "OR e.value > q3 + 1.5 * (q3 - q1)"
        ),
        "distinct_users_per_type": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_distinct FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "user_modal_type": (
            "SELECT user_id, event_type, n_events FROM ("
            "SELECT user_id, event_type, count(*) AS n_events, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "event_rank_ties": (
            "SELECT event_id, row_number() OVER "
            "(PARTITION BY event_type ORDER BY user_id, event_id) AS rn, "
            'rank() OVER w AS "rank", '
            'dense_rank() OVER w AS "dense_rank", '
            'cume_dist() OVER w AS "cume_dist" FROM events '
            "WINDOW w AS (PARTITION BY event_type ORDER BY user_id)"
        ),
        "user_first_last": (
            "WITH w AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS rn, count(*) OVER (PARTITION BY user_id) AS n FROM events) "
            "SELECT a.user_id, a.event_type AS first_value, "
            "b.event_type AS last_value, a.n AS n_rows "
            "FROM w a JOIN w b USING (user_id) WHERE a.rn = 1 AND b.rn = b.n"
        ),
        "value_fill_forward": (
            "WITH e AS (SELECT event_id, user_id, ts, "
            "CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS v "
            "FROM events) SELECT event_id, "
            "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS filled FROM e"
        ),
        "top_users_per_type": (
            "SELECT event_type, user_id, n_events, rn FROM ("
            "SELECT event_type, user_id, n_events, row_number() OVER ("
            "PARTITION BY event_type ORDER BY n_events DESC, user_id) AS rn "
            "FROM (SELECT event_type, user_id, count(*) AS n_events "
            "FROM events GROUP BY event_type, user_id)) WHERE rn <= 3"
        ),
        "event_ranks": (
            "SELECT event_id, row_number() OVER w AS rn, "
            "percent_rank() OVER w AS pct_rank, ntile(4) OVER w AS tile "
            "FROM events WINDOW w AS ("
            "PARTITION BY event_type ORDER BY value, event_id)"
        ),
        "events_cube": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events, "
            "max(value) AS max_value FROM events "
            "GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))"
        ),
        "curate_corpus": (
            r"WITH q AS (SELECT doc_id, text, "
            r"  len(regexp_extract_all(text, '\S+')) AS n_tokens, "
            r"  len(list_filter(regexp_extract_all(lower(text), '\S+'), x -> x IN "
            + STOPWORDS_SQL
            + ")) AS n_stop FROM documents), "
            "f AS (SELECT doc_id, text FROM q WHERE n_tokens >= 20 AND n_stop >= 1), "
            r"n AS (SELECT doc_id, trim(regexp_replace(lower(nfc_normalize("
            r"coalesce(text, ''))), '\s+', ' ', 'g'), ' ') AS text_norm FROM f), "
            "w AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY text_norm), "
            "s AS (SELECT n.doc_id, text_norm FROM n JOIN w USING (doc_id)), "
            r"t AS (SELECT doc_id, list_filter(regexp_split_to_array(text_norm, "
            r"'\s+'), x -> x <> '') AS toks FROM s), "
            "x AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start "
            "  FROM t WHERE len(toks) > 0) "
            "SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id, "
            "array_to_string(list_slice(toks, start + 1, least(start + 32, "
            "len(toks))), ' ') AS chunk FROM x"
        ),
        "value_histogram": (
            "WITH b AS (SELECT CAST(least(greatest(floor(value / 25.0), 0), 19) "
            "AS BIGINT) AS bin FROM events WHERE value IS NOT NULL) "
            "SELECT bin, bin * 25.0 AS bin_lo, count(*) AS n FROM b GROUP BY bin"
        ),
        "chunk_docs": (
            r"WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array("
            r"coalesce(text, ''), '\s+'), x -> x <> '') AS toks FROM documents), "
            "x AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start "
            "  FROM t WHERE len(toks) > 0) "
            "SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id, "
            "array_to_string(list_slice(toks, start + 1, least(start + 32, "
            "len(toks))), ' ') AS chunk FROM x"
        ),
        "events_sliding": (
            "WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events), "
            "w AS (SELECT event_type, value, "
            "  (us // 1800000000) * 1800000000 - k.k * 1800000000 AS start_us "
            "  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) k) "
            "SELECT make_timestamp(start_us) AS window_start, event_type, "
            "count(*) AS n_events, max(value) AS max_value "
            "FROM w GROUP BY start_us, event_type"
        ),
        "daily_digest": (
            "SELECT CAST(ts AS DATE) AS day, "
            "'# digest ' || strftime(CAST(ts AS DATE), '%Y-%m-%d') || chr(10) || "
            "string_agg('- ' || strftime(ts, '%H:%M') || ' [' || event_type || "
            "'] #' || CAST(event_id AS VARCHAR), chr(10) ORDER BY ts, event_id) "
            "AS digest, count(*) AS n_items "
            "FROM events GROUP BY CAST(ts AS DATE)"
        ),
    }
)


