"""Relational / TPC-H-style SQL-oracled basics + shared fixture constants.

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


KEYWORD_RE = "(spark|vector|window)"  # M7 keyword any-match analog
EVENT_DAY = "2024-01-02"  # M6 today-filter analog
STOPWORDS_SQL = "('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','this','that','be','from')"


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def _ds_from_table(tbl: pa.Table, target_blocks: int = 64):
    """In-memory table → Dataset with REAL read parallelism.

    ``from_arrow(tbl)`` yields ONE block, so every map stage downstream
    runs as a single task until the first exchange — measured to
    serialize the whole MinHash signature stage. Slice zero-copy into
    ~target_blocks chunks first.
    """
    n = tbl.num_rows
    if n == 0:
        return ray.data.from_arrow(tbl)
    step = max(256, -(-n // target_blocks))
    parts = [tbl.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(parts)


# ------------------------------------------------------------------ SQL-oracled


def q_keyword_filter(sf_dir: str):
    """M7: keep docs whose text matches any keyword (regex alternation)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["text"], KEYWORD_RE)).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_events_day(sf_dir: str):
    """M6: watermark/day cutoff on the events stream."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])
    day = pa.scalar(np.datetime64(EVENT_DAY, "D").item(), pa.date32())
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.cast(t["ts"], pa.date32()), day)).select(
            ["event_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_distinct_event_types(sf_dir: str):
    """A7: global distinct. Event types are a small fixed domain, so the
    combiner path (per-block distinct + driver merge) needs no exchange."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type"])
    return partial_group_agg(ds, ["event_type"], [])


def q_top_orders(sf_dir: str):
    """A1+A3: global top-k = sort + limit (deterministic tiebreak)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(50)


def q_events_by_type(sf_dir: str):
    """A10: grouped counts. Event types are a small fixed domain, so the
    combiner path (per-block partial + driver merge) replaces the hash
    shuffle."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "events", ["event_type"])
    return partial_group_agg(
        ds, ["event_type"], [("n_events", "count_all", None)]
    )


def q_exact_dedup_docs(sf_dir: str):
    """A2/A4 exact dedup identity: min-id per distinct content."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.exact_dedup(ds).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )


HIGH_ORDER_CUTOFF = 300000.0


def q_customers_without_orders(sf_dir: str):
    """J1/J2 anti-join: customers with no high-value orders (the plain
    no-orders set is empty in TPC-H-ish data — every customer orders).

    Both sides are data-scale, so this is the engine's sort-merge anti
    join (ops/join.py): one task-based sort exchange, no hash-shuffle
    aggregator pool, no pre-aggregation of the right side needed."""
    from ..ops.join import sort_merge_anti_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    high = orders.map_batches(
        lambda t: _rename(
            t.filter(pc.greater(t["o_totalprice"], HIGH_ORDER_CUTOFF)).select(
                ["o_custkey"]
            ),
            {"o_custkey": "c_custkey"},
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sort_merge_anti_join(cust, high, "c_custkey")


def q_parts_with_lineitems(sf_dir: str):
    """Semi join at data scale on both sides: parts that appear in any
    lineitem (ops/join.sort_merge_semi_join — one task-based sort
    exchange, boundary keys decided by a distributed bit-reduce)."""
    from ..ops.join import sort_merge_semi_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    li = _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
        lambda t: _rename(t, {"l_partkey": "p_partkey"}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sort_merge_semi_join(part, li, "p_partkey")


def q_stable_event_type_ids(sf_dir: str):
    """A8: distinct values -> sort -> stable id = BASE + position."""
    ds = _read(sf_dir, "events", ["event_type"])
    return assign_stable_ids(ds, "event_type", base=7000000)


def q_token_stats(sf_dir: str):
    """Token counting (whitespace + BPE-ish regex)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.token_stats(ds)


def q_fingerprints(sf_dir: str):
    """M15 keying analog: md5 content fingerprint (drop the 64-bit
    in-pipeline hash — not reproducible in SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.fingerprint(ds).map_batches(
        lambda t: t.select(["doc_id", "md5"]), batch_format="pyarrow"
    )


def q_quality_counts(sf_dir: str):
    """Quality scoring — exact-integer feature subset."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.quality_score(ds).map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "n_stopwords"]),
        batch_format="pyarrow",
    )


def q_lineitem_agg(sf_dir: str):
    """A6-style partial+final aggregation (TPC-H Q1 skeleton); sums are
    integer-valued doubles so distributed order cannot change them.

    ~6 groups (flag × status) — the combiner path (`ops.agg`: one
    vectorized per-block partial, tiny driver merge) instead of paying a
    full hash shuffle to compute six cells."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return partial_group_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [("sum_qty", "sum", "l_quantity"), ("n", "count_all", None)],
    )


def q_user_event_stats(sf_dir: str):
    """Per-user stats: DATA-SCALE group cardinality → sorted_group_agg
    (one task-based sort exchange; same data movement as the hash
    shuffle without its per-op aggregator-pool startup)."""
    from ..ops.agg import sorted_group_agg

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return sorted_group_agg(
        ds,
        ["user_id"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 for query vectors vec_id < 5 (score
    dropped: rank order is the contract, float repr is not)."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    mask = pc.less(tbl["vec_id"], 5)
    qt = tbl.filter(mask)
    q_ids = np.asarray(qt["vec_id"], dtype=np.int64)
    Q = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = sim.knn_brute_force(ds, q_ids, Q, k=10)
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


def q_user_day_stats(sf_dir: str):
    """Tumbling 1-day window per user (the engine's §2.8 window semantics
    as a groupby over (user, day))."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.cast(t["ts"], pa.date32()),
                "value": t["value"],
            }
        )

    keyed = ds.map_batches(add_day, batch_format="pyarrow", zero_copy_batch=True)
    from ..ops.agg import sorted_group_agg

    return sorted_group_agg(
        keyed,
        ["user_id", "day"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


# broadcast-side budget for dimension lookups: past this, fall back to
# the shuffle join (at 100 TB a 10^9-customer key→nation map is ~16 GB)
BROADCAST_DIM_BYTES = 1 << 30


def q_orders_per_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation → counts per nation name.

    Star-schema shape: orders is the fact table, customer and nation are
    dimensions. The scale-correct plan (build brief: "broadcast small
    sides with ray.put + lookup inside map_batches instead of a shuffle
    join") broadcasts the custkey→nationkey int map once, reduces orders
    with a shuffle-free per-block partial count over the 25-value nation
    domain (ops/agg.partial_group_agg), and resolves names driver-side —
    ZERO exchanges over the fact table. Falls back to the two-hop hash
    join chain when the customer map exceeds the broadcast budget."""
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    if cust_tbl.nbytes > BROADCAST_DIM_BYTES:
        return _orders_per_nation_join(sf_dir)
    ck = np.asarray(cust_tbl["c_custkey"], dtype=np.int64)
    nk = np.asarray(cust_tbl["c_nationkey"], dtype=np.int64)
    order = np.argsort(ck, kind="stable")
    dim_ref = ray.put((ck[order], nk[order]))

    def to_nationkey(t: pa.Table) -> pa.Table:
        ck_s, nk_s = ray.get(dim_ref)  # plasma-local after first batch
        oc = np.asarray(t["o_custkey"], dtype=np.int64)
        pos = np.searchsorted(ck_s, oc)
        pos = np.minimum(pos, len(ck_s) - 1)
        hit = ck_s[pos] == oc  # inner-join semantics: drop unmatched FKs
        return pa.table({"n_nationkey": pa.array(nk_s[pos][hit], pa.int64())})

    from ..ops.agg import partial_group_agg

    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = partial_group_agg(
        orders.map_batches(to_nationkey, batch_format="pyarrow", zero_copy_batch=True),
        ["n_nationkey"],
        [("n_orders", "count_all", None)],
    )
    nation_tbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    name_by_key = dict(
        zip(nation_tbl["n_nationkey"].to_pylist(), nation_tbl["n_name"].to_pylist())
    )
    names = [name_by_key[k] for k in counts["n_nationkey"].to_pylist()]
    return pa.table(
        {"n_name": pa.array(names, pa.string()), "n_orders": counts["n_orders"]}
    )


def _orders_per_nation_join(sf_dir: str):
    """Shuffle-join fallback for a customer dimension past the broadcast
    budget: two-hop hash join chain (kept for scale honesty; the
    broadcast path above is the in-sandbox default)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = (
        orders.groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: _rename(t, {"o_custkey": "c_custkey", "count()": "_n"}),
            batch_format="pyarrow",
        )
    )
    cust_n = cust.join(per_cust, join_type="inner", num_partitions=8, on=("c_custkey",))
    cust_tag = cust_n.map_batches(
        lambda t: _rename(t, {"c_nationkey": "n_nationkey"}).select(
            ["n_nationkey", "_n"]
        ),
        batch_format="pyarrow",
    )
    joined = cust_tag.join(nation, join_type="inner", num_partitions=8, on=("n_nationkey",))
    agg = joined.groupby("n_name").aggregate(
        ray.data.aggregate.Sum("_n", alias_name="n_orders"),
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_orders"),
            "n_orders",
            pc.cast(t["n_orders"], pa.int64()),
        ),
        batch_format="pyarrow",
    )


def q_props_extract(sf_dir: str):
    """Regex field extraction from the JSON props column (M8 analog on
    structured payloads): event_id, k."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.coalesce(t["props"], ""), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL: dict[str, str] = {
    "keyword_filter": f"SELECT doc_id FROM documents WHERE regexp_matches(text, '{KEYWORD_RE}')",
    "events_day": f"SELECT event_id FROM events WHERE CAST(ts AS DATE) = DATE '{EVENT_DAY}'",
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "top_orders": "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50",
    "events_by_type": "SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type",
    "exact_dedup_docs": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "customers_without_orders": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)"
    ),
    "parts_with_lineitems": (
        "SELECT p_partkey, p_name FROM part WHERE p_partkey IN "
        "(SELECT l_partkey FROM lineitem)"
    ),
    "stable_event_type_ids": (
        "SELECT event_type, 7000000 + row_number() OVER (ORDER BY event_type) - 1 AS sid "
        "FROM (SELECT DISTINCT event_type FROM events)"
    ),
    "token_stats": (
        r"SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens, "
        r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens, "
        "length(text) AS n_chars_measured FROM documents"
    ),
    "fingerprints": "SELECT doc_id, md5(text) AS md5 FROM documents",
    "quality_counts": (
        r"SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens, "
        r"len(list_filter(regexp_extract_all(lower(text), '\S+'), x -> x IN "
        + STOPWORDS_SQL
        + ")) AS n_stopwords FROM documents"
    ),
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "user_event_stats": (
        "SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value "
        "FROM events GROUP BY user_id"
    ),
    "user_day_stats": (
        "SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events, "
        "MAX(value) AS max_value FROM events GROUP BY user_id, CAST(ts AS DATE)"
    ),
    "orders_per_nation": (
        "SELECT n_name, COUNT(*) AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "props_extract": (
        r"SELECT event_id, CAST(regexp_extract(props, '\"k\": (\d+)', 1) AS BIGINT) AS k FROM events"
    ),
    "knn_cosine": (
        "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5), "
        "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
        "       list_cosine_similarity(q.qe, e.embedding) AS score "
        "      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid) "
        "SELECT query_id, neighbor_id FROM ("
        "  SELECT query_id, neighbor_id, "
        "         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn "
        "  FROM s) WHERE rn <= 10"
    ),
}

# --- stratified hash sampling: thresholds shared with the op, so the
# query and its oracle cannot drift (ops/sampling.fraction_threshold_hex)
SAMPLE_FRACTIONS = {"en": 0.5, "zh": 0.25, "de": 1.0}
SAMPLE_DEFAULT = 0.1

# --- distributed k-means: block plan shared with the sequential oracle
# (pipelines/expected.expected_kmeans) so float summation order matches
KMEANS_K, KMEANS_ITERS, KMEANS_BLOCKS = 8, 4, 16


def _pii_replace_sql(expr: str) -> str:
    """Nested DuckDB regexp_replace over the SAME ordered pattern list
    the Ray op applies (ops/text.PII_PATTERNS) — single source of truth."""
    for pat, repl in tx.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_TOK_SQL = (
    "SELECT doc_id, unnest(regexp_split_to_array(coalesce(text, ''), '\\s+')) AS term "
    "FROM documents"
)


def _html_strip_sql(expr: str) -> str:
    """Nested DuckDB regexp_replace over the SAME ordered pattern list
    the Ray op applies (ops/text.HTML_STRIP_PATTERNS)."""
    for pat, repl in tx.HTML_STRIP_PATTERNS:
        p, r = pat.replace("'", "''"), repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def _part1by1_sql(expr: str) -> str:
    """SQL mirror of ops/hashing.morton_interleave16's bit spread."""
    e = f"(({expr}) & 65535)"
    for shift, mask in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
        e = f"((({e}) | (({e}) << {shift})) & {mask})"
    return e


_CAPTION_PLANT_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN 'IMG_' || CAST(doc_id AS VARCHAR) || '.jpg' "
    "WHEN doc_id % 5 = 1 THEN text || ' see https://ex.example/p?id=' || CAST(doc_id AS VARCHAR) "
    "WHEN doc_id % 5 = 2 THEN 'Untitled photo ' || text "
    "ELSE text END"
)


TOKEN_BUDGET = 2000

_WEB_PLANT_SQL = (
    "'<html><head><script>var x = 1;</script><style>.nav {c: red}</style>"
    "</head><body><p>' || text || ' &amp; tail</p>"
    "<div>menu&nbsp;end</div></body></html>'"
)
WEB_MIN_TOKENS = 30


_HTML_PLANT_SQL = (
    "'<html><head><script>var x = 1;' || chr(10) || 'if (x) { x += 2; }"
    "</script><style>.nav {color: red}</style><title>Doc ' "
    "|| CAST(doc_id AS VARCHAR) || '</title></head><body><!-- hidden' "
    "|| chr(10) || 'comment --><p>' || text "
    "|| ' &amp; more &lt;tags&gt;</p><div>menu&nbsp;item</div></body></html>'"
)


_PII_PLANT_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com tel 555-0142 ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)"
)

# --- corpus boilerplate-line removal: thresholds + plant shared between
# the Ray query and its oracle so the two sides cannot drift. The plant
# gives every doc a universal header (always hot), docs % 3 a mod-7
# footer family (count ~N/21 each, >= threshold at every sf), and docs
# % 2 a SHORT repeated line ('ok', below min_len — must SURVIVE).
BOILER_MIN_COUNT, BOILER_MIN_LEN = 20, 4

# --- GPT-style sequence packing: window length shared with the oracle
PACK_SEQ_LEN = 512

# --- contrastive negative sampling: slots + quantization shared with SQL
CONTRAST_K, CONTRAST_Q = 4, 1024

_CONTRASTIVE_SQL = (
    "WITH p AS (SELECT a.vec_id, s.slot, "
    "  (a.vec_id * 2654435761 + (s.slot + 1) * 40503) % "
    "  (SELECT count(*) FROM embeddings) AS raw "
    f"  FROM embeddings a, LATERAL (SELECT unnest(generate_series(0, {CONTRAST_K - 1})) AS slot) s), "
    "pr AS (SELECT vec_id, slot, CASE WHEN raw = vec_id THEN "
    "  (raw + 1) % (SELECT count(*) FROM embeddings) ELSE raw END AS neg_id FROM p), "
    "z AS (SELECT pr.vec_id, pr.slot, pr.neg_id, "
    "  unnest(a.embedding) AS xa, unnest(b.embedding) AS xb "
    "  FROM pr JOIN embeddings a ON a.vec_id = pr.vec_id "
    "  JOIN embeddings b ON b.vec_id = pr.neg_id) "
    "SELECT vec_id, slot, neg_id, "
    # CAST the SUM back to BIGINT: DuckDB SUM(BIGINT) returns HUGEINT,
    # which pandas converts to float64 — the driver's exact value hash
    # would then see 1.0 vs the Ray side's int64 1 (r02 hash mismatch).
    f"CAST(SUM(CAST(floor(CAST(xa AS DOUBLE) * {CONTRAST_Q} + 0.5) AS BIGINT) * "
    f"    CAST(floor(CAST(xb AS DOUBLE) * {CONTRAST_Q} + 0.5) AS BIGINT)) AS BIGINT) AS dot_q "
    "FROM z GROUP BY vec_id, slot, neg_id"
)

# --- MOSS winnowing: shingle k, window w, pair threshold — shared with
# the sequential-replica oracle (pipelines/expected.expected_winnow_pairs)
WINNOW_K, WINNOW_W, WINNOW_MIN_SHARED = 5, 4, 2
_BOILER_PLANT_SQL = (
    "'subscribe to our newsletter' || chr(10) || text || "
    "CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'all rights reserved form ' "
    "|| CAST(doc_id % 7 AS VARCHAR) ELSE '' END || "
    "CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'ok' ELSE '' END"
)

ORACLE_SQL.update(
    {
        "sample_docs": (
            "SELECT doc_id, lang FROM documents WHERE "
            + sp.sample_case_sql("doc_id", "lang", SAMPLE_FRACTIONS, SAMPLE_DEFAULT)
        ),
        "decontaminate_docs": (
            "SELECT d.doc_id, EXISTS("
            "  SELECT 1 FROM documents b WHERE b.doc_id % 50 = 0 AND "
            "  contains(d.text, array_to_string(list_slice(string_split(b.text, ' '), 1, 8), ' '))"
            ") AS contaminated FROM documents d"
        ),
        "pii_redact": (
            f"SELECT doc_id, {_pii_replace_sql('(' + _PII_PLANT_SQL + ')')} AS text_redacted "
            "FROM documents"
        ),
        "value_quantiles_hist": (
            "SELECT event_type, CAST(unnest([25, 50, 75]) AS BIGINT) AS pct, "
            "unnest(quantile_disc(CAST(round(value * 100) AS BIGINT), "
            "  [0.25, 0.5, 0.75])) AS value_cents "
            "FROM events GROUP BY event_type"
        ),
        "weighted_median": (
            "WITH s AS (SELECT l_returnflag, "
            "  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c, "
            "  CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
            "c AS (SELECT l_returnflag, price_c, "
            "  SUM(qty) OVER (PARTITION BY l_returnflag ORDER BY price_c "
            "    ROWS UNBOUNDED PRECEDING) AS cw, "
            "  SUM(qty) OVER (PARTITION BY l_returnflag) AS tw FROM s) "
            "SELECT l_returnflag, MIN(price_c) AS wmedian_cents FROM c "
            "WHERE 2 * cw >= tw GROUP BY l_returnflag"
        ),
        "contrastive_negatives": _CONTRASTIVE_SQL,
        "hard_negatives": (
            f"SELECT vec_id, slot, neg_id, dot_q FROM ({_CONTRASTIVE_SQL}) "
            "QUALIFY row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dot_q DESC, neg_id) = 1"
        ),
        "zorder_layout": (
            "WITH k AS (SELECT event_id, "
            + _part1by1_sql("CAST(user_id AS BIGINT)")
            + " | ("
            + _part1by1_sql("CAST(round(value * 100) AS BIGINT)")
            + " << 1) AS zkey FROM events) "
            "SELECT event_id, zkey, "
            "row_number() OVER (ORDER BY zkey, event_id) - 1 AS zrank FROM k"
        ),
        "bpe_merges": (
            r"WITH w AS (SELECT term, count(*) AS n FROM ("
            r"  SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents)"
            "  GROUP BY term), "
            "p AS (SELECT substr(term, i, 1) AS l, substr(term, i + 1, 1) AS r, n "
            "  FROM w, LATERAL (SELECT unnest(generate_series(1, length(term) - 1)) AS i) "
            "  WHERE length(term) >= 2) "
            "SELECT l, r, CAST(SUM(n) AS BIGINT) AS n_pairs FROM p GROUP BY l, r "
            "ORDER BY n_pairs DESC, l, r LIMIT 50"
        ),
        "curate_web_corpus": (
            "WITH src AS (SELECT d.doc_id, d.lang, CASE WHEN d.doc_id % 8 = 0 "
            "  THEN coalesce(n.text, d.text) ELSE d.text END AS text "
            "  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1), "
            f"page AS (SELECT doc_id, lang, {_WEB_PLANT_SQL} AS html FROM src), "
            "ext AS (SELECT doc_id, lang, "
            + _html_strip_sql("(html)")
            + " AS text FROM page), "
            r"tok AS (SELECT doc_id, lang, text, len(regexp_extract_all(text, '\S+')) "
            f"  AS n_tokens FROM ext), "
            f"q AS (SELECT * FROM tok WHERE n_tokens >= {WEB_MIN_TOKENS}), "
            "w AS (SELECT text, min(doc_id) AS keep_id FROM q GROUP BY text), "
            "ded AS (SELECT q.doc_id, q.lang, q.n_tokens FROM q "
            "  JOIN w ON q.doc_id = w.keep_id AND q.text = w.text), "
            "c AS (SELECT doc_id, lang, n_tokens, SUM(n_tokens) OVER ("
            "  PARTITION BY lang ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), "
            "  doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM ded) "
            f"SELECT doc_id, lang, n_tokens FROM c WHERE cum <= {TOKEN_BUDGET}"
        ),
        "cross_corpus_overlap": (
            "WITH a AS (SELECT d.doc_id, CASE WHEN d.doc_id % 8 = 0 "
            "  THEN coalesce(n.text, d.text) ELSE d.text END AS text "
            "  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1 "
            "  WHERE d.doc_id % 2 = 0), "
            "b AS (SELECT text FROM documents WHERE doc_id % 2 = 1) "
            "SELECT doc_id FROM a WHERE text IN (SELECT text FROM b)"
        ),
        "zipf_slope": (
            f"WITH vo AS (SELECT term, count(*) AS n FROM ({_TOK_SQL}) "
            "  WHERE term <> '' GROUP BY term), "
            "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM vo), "
            "v AS (SELECT 'all' AS grp, "
            "  CAST(floor(log2(CAST(rnk AS DOUBLE)) * 1048576 + 0.5) AS HUGEINT) AS x, "
            "  CAST(floor(log2(CAST(n AS DOUBLE)) * 1048576 + 0.5) AS HUGEINT) AS y FROM r), "
            "m AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n, "
            "sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, "
            "sum(y*y) AS syy, sum(x*y) AS sxy FROM v GROUP BY grp) "
            "SELECT grp, CAST(n AS BIGINT) AS n_values, "
            "CAST(n*sxy - sx*sy AS DOUBLE) / "
            "NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0) AS slope, "
            "(CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / "
            "NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0)) * CAST(sx AS DOUBLE)) "
            "/ CAST(n AS DOUBLE) AS intercept, "
            "(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) "
            "/ NULLIF(CAST(n*sxx - sx*sx AS DOUBLE) * "
            "CAST(n*syy - sy*sy AS DOUBLE), 0) AS r2 "
            "FROM m"
        ),
        "token_budget_sample": (
            r"WITH t AS (SELECT doc_id, lang, len(regexp_extract_all(text, '\S+')) AS n_tokens, "
            "  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM documents), "
            "c AS (SELECT doc_id, lang, SUM(n_tokens) OVER (PARTITION BY lang "
            "  ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t) "
            "SELECT doc_id, lang FROM c WHERE cum <= 2000"
        ),
        "corpus_report": (
            r"SELECT count(*) AS n_docs, "
            r"CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars, "
            r"MAX(len(regexp_extract_all(text, '\S+'))) AS max_doc_tokens, "
            "count(DISTINCT lang) AS n_langs FROM documents"
        ),
        "decayed_value_sum": (
            "WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, "
            "  CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT user_id, max(us) AS last_us FROM e GROUP BY user_id) "
            "SELECT e.user_id, m.last_us, "
            "  CAST(SUM(e.cents >> least((m.last_us - e.us) // 3600000000, 62)) "
            "    AS BIGINT) AS decayed_cents "
            "FROM e JOIN m USING (user_id) GROUP BY e.user_id, m.last_us"
        ),
        "recrawl_schedule": (
            "SELECT user_id, count(*) AS n_fetches, "
            "  count(DISTINCT value) AS n_versions, "
            "  CAST(epoch_us(max(ts)) AS BIGINT) AS last_us, "
            "  CAST(epoch_us(max(ts)) AS BIGINT) + "
            "  (3600000000 << least(count(*) - count(DISTINCT value), 6)) "
            "    AS next_fetch_us "
            "FROM events GROUP BY user_id"
        ),
        "caption_junk": (
            f"WITH planted AS (SELECT doc_id, {_CAPTION_PLANT_SQL} AS text FROM documents) "
            "SELECT doc_id, "
            + ", ".join(
                f"regexp_matches(text, '{pat}') AS {name}"
                for name, pat in tx.CAPTION_JUNK_PATTERNS.items()
            )
            + ", CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits"
            "  , CAST(length(text) AS BIGINT) AS n_chars "
            "FROM planted"
        ),
        "char_entropy": (
            "WITH ch AS (SELECT doc_id, substr(text, i, 1) AS ch FROM documents, "
            "  LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)), "
            "cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch), "
            "tot AS (SELECT doc_id, SUM(c) AS n FROM cc GROUP BY doc_id) "
            "SELECT cc.doc_id, CAST(tot.n AS BIGINT) AS n_chars, "
            "  CAST(SUM(CAST(floor(CAST(c AS DOUBLE) * (log2(CAST(n AS DOUBLE)) - "
            "    log2(CAST(c AS DOUBLE))) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) "
            "    AS entropy_q "
            "FROM cc JOIN tot USING (doc_id) GROUP BY cc.doc_id, tot.n"
        ),
        "html_extract": (
            f"SELECT doc_id, {_html_strip_sql('(' + _HTML_PLANT_SQL + ')')} "
            "AS text_extracted FROM documents"
        ),
        "pack_sequences": (
            r"WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens"
            "  FROM documents), "
            "s AS (SELECT doc_id, n_tokens, "
            "  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start FROM t) "
            "SELECT doc_id, n_tokens, tok_start, "
            f"  tok_start // {PACK_SEQ_LEN} AS first_seq, "
            f"  CASE WHEN n_tokens = 0 THEN tok_start // {PACK_SEQ_LEN} "
            f"       ELSE (tok_start + n_tokens - 1) // {PACK_SEQ_LEN} END AS last_seq "
            "FROM s"
        ),
        "remove_boilerplate": (
            f"WITH planted AS (SELECT doc_id, {_BOILER_PLANT_SQL} AS text FROM documents), "
            "lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
            "          generate_subscripts(string_split(text, chr(10)), 1) AS ord FROM planted), "
            f"hot AS (SELECT line FROM lines WHERE length(line) >= {BOILER_MIN_LEN} "
            f"        GROUP BY line HAVING count(*) >= {BOILER_MIN_COUNT}) "
            "SELECT l.doc_id, "
            "  coalesce(string_agg(CASE WHEN h.line IS NULL THEN l.line END, chr(10) "
            "                      ORDER BY l.ord), '') AS clean_text, "
            "  count(h.line) AS n_removed "
            "FROM lines l LEFT JOIN hot h USING (line) GROUP BY l.doc_id"
        ),
        "clicks_prior_view": (
            "WITH v AS ("
            "  SELECT user_id, ts, max(event_id) AS prior_view_id FROM events"
            "  WHERE event_type = 'view' GROUP BY user_id, ts"
            "), c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')"
            " SELECT c.event_id, v.prior_view_id"
            " FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts"
        ),
        "views_before_click": (
            "WITH v AS (SELECT user_id, ts, event_id AS view_id FROM events"
            "           WHERE event_type = 'view'),"
            "c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')"
            " SELECT c.event_id, v.view_id FROM c JOIN v ON c.user_id = v.user_id"
            " AND v.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts"
        ),
        "sessionize": (
            "WITH f AS ("
            "  SELECT user_id, event_id, ts,"
            "    CASE WHEN lag(ts) OVER w IS NULL"
            "      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s"
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS ("
            "  SELECT user_id, ts,"
            "    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            "                     ROWS UNBOUNDED PRECEDING) AS session_num"
            "  FROM f"
            ") SELECT user_id, CAST(session_num AS BIGINT) AS session_num,"
            "   count(*) AS n_events,"
            "   CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,"
            "   CAST(epoch_us(max(ts)) AS BIGINT) AS session_end_us"
            "  FROM s GROUP BY user_id, session_num"
        ),
    }
)


# --------------------------------------------------------------- rows-only


def _drop_word3(s: str) -> str:
    """Near-dup mutation: drop the 4th word (minhash/ngram fixtures)."""
    return " ".join(w for i, w in enumerate(s.split()) if i != 3)


def _swap01(s: str) -> str:
    """Near-dup mutation: swap the first two words (simhash fixture)."""
    w = s.split()
    if len(w) >= 2:
        w[0], w[1] = w[1], w[0]
    return " ".join(w)


def _planted_embeddings_tbl(sf_dir: str) -> pa.Table:
    """Embeddings + planted noisy copies (seed 3) — shared by the query
    and its expected-pairs oracle so both see identical input."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(3)
    E2 = E + rng.standard_normal(E.shape) * 0.01
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate([ids, ids + 1_000_000]), pa.int64()),
            "embedding": pa.array(
                np.concatenate([E, E2]).tolist(), pa.list_(pa.float32())
            ),
        }
    )


def _planted_docs_tbl(sf_dir: str, mutate) -> pa.Table:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    mut = [mutate(s) for s in t["text"].to_pylist()]
    mt = pa.table(
        {
            "doc_id": pa.array(np.asarray(t["doc_id"]) + 1_000_000, pa.int64()),
            "text": pa.array(mut, pa.string()),
        }
    )
    return pa.concat_tables([t, mt])


