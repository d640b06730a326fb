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


def q_image_features(sf_dir: str):
    """Image decode + feature extraction over the synthetic page-store."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(60, seed=42))
    feats = mm.image_features(ps, concurrency=2, batch_size=32)
    return feats.map_batches(
        lambda t: t.select(["image_id", "phash_check", "decode_ok"]),
        batch_format="pyarrow",
    )


def q_ip_block_rules(sf_dir: str):
    """A8+M16 sink path: distinct valid IPs → stable SIDs → rule lines
    (deterministic; non-SQL because the IOC source is the synth fixture)."""
    from ..fixtures import synth
    from ..functions.formatters import ip_rule_lines, validate_ips
    from ..stages.index import assign_stable_ids

    pages = ray.data.from_arrow(synth.make_ioc_pages(60, seed=42))
    iocs = merged_distinct_iocs(pages)

    def valid_ips(t: pa.Table) -> pa.Table:
        ips = t.filter(pc.equal(t["kind"], "ip"))
        v = validate_ips(ips["value"])
        return pa.table({"value": v}).filter(pc.is_valid(v))

    ips = iocs.map_batches(valid_ips, batch_format="pyarrow")
    with_ids = assign_stable_ids(ips, "value", base=7000000)
    return with_ids.map_batches(
        lambda t: ip_rule_lines(t, ip_col="value", sid_col="sid"),
        batch_format="pyarrow",
    )


def q_resize_images(sf_dir: str):
    """Multimodal resize pipeline over the synthetic page-store."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_pagestore(40, seed=42))
    out = mm.resize_images(ps, 16, 16, concurrency=2, batch_size=16)
    return out.map_batches(
        lambda t: t.select(["image_id", "w", "h", "fmt"]), batch_format="pyarrow"
    )


def _neardup_iid(t: pa.Table) -> pa.Table:
    """image_id ('img{k:08d}' | 'dup{k:08d}') → int64 iid (dup = k+10^6);
    shared by the query and the sequential oracle so both derive the
    identical ordinal key (canonical a<b pair ordering needs ints)."""
    k = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    isdup = pc.cast(
        pc.equal(pc.utf8_slice_codeunits(t["image_id"], 0, 3), "dup"), pa.int64()
    )
    iid = pc.add(k, pc.multiply(isdup, pa.scalar(1_000_000, pa.int64())))
    out = t.append_column("iid", iid)
    return out


def q_phash_near_dup(sf_dir: str):
    """Image near-dup pairs over the planted block-pattern page-store:
    decode → recomputed pixel phash → banded hamming ≤ 3 pairing (the
    image-side analog of simhash_pairs; non-SQL, sequential oracle)."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    return pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )


TILE_DUP_N = 40


def _cropdup_iid(t: pa.Table) -> pa.Table:
    """image_id ('img{k:08d}' | 'crp{k:08d}') → int64 iid (crop = k+10^6);
    shared by the query and the sequential oracle."""
    k = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    iscrop = pc.cast(
        pc.equal(pc.utf8_slice_codeunits(t["image_id"], 0, 3), "crp"), pa.int64()
    )
    iid = pc.add(k, pc.multiply(iscrop, pa.scalar(1_000_000, pa.int64())))
    return t.append_column("iid", iid)


def q_tile_dup_pairs(sf_dir: str):
    """Crop-robust image near-dup pairs over planted grid-aligned crops
    (ops/multimodal.tile_dup_pairs): codec-invariant tile-hash explode →
    shared-fingerprint pairing — the case phash misses because a crop
    shifts every phash cell. Sequential all-pairs oracle."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(synth.make_cropdup_pagestore(TILE_DUP_N, seed=42))
    withid = ps.map_batches(
        lambda t: _cropdup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return mm.tile_dup_pairs(withid)


def q_image_dedup_corpus(sf_dir: str):
    """END-TO-END image corpus curation (on-axis flagship composition):
    decode → pixel phash → banded hamming pairs → connected components
    → keep each cluster's min iid → anti join drops the other copies.
    Output: the surviving image iids — the 100 TB image-dedup pass as
    one streaming plan."""
    from ..fixtures import synth
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_anti_join

    ps_tbl = synth.make_neardup_pagestore(60, seed=42)
    withid = _ds_from_table(_neardup_iid(ps_tbl).select(["iid", "bytes", "fmt"]), 8)
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )
    losers = comp.map_batches(
        lambda t: pa.table(
            {"iid": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = _ds_from_table(_neardup_iid(ps_tbl).select(["iid"]), 8)
    return sort_merge_anti_join(ids, losers, key="iid")


def q_hll_users(sf_dir: str):
    """Approximate distinct users via HyperLogLog (4 KB register partials
    per block, max-merge — the at-scale distinct counter). Deterministic;
    verified against an independent sequential register build."""
    from ..ops.agg import hll_distinct

    return hll_distinct(_read(sf_dir, "events", ["user_id"]), "user_id", p=12)


def q_daily_digest(sf_dir: str):
    """K1 digest assembly: one markdown digest document per day over the
    events table, items in (ts, event_id) order (ordered string concat
    on the key-complete exchange; SQL string_agg oracle)."""
    from ..stages.sinks import daily_digest

    return daily_digest(_read(sf_dir, "events", ["event_id", "event_type", "ts"]))


def q_image_dup_clusters(sf_dir: str):
    """Image dedup CLUSTERS: decode → pixel phash → banded hamming pairs
    → exact connected components; every near-dup image mapped to its
    cluster's minimum iid (the canonical copy a 100 TB image-dedup pass
    would keep)."""
    from ..fixtures import synth
    from ..ops.graph import connected_components

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    return connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )


def q_canonical_images(sf_dir: str):
    """Image near-dup cluster resolution by QUALITY — keep the SHARPEST
    member per phash cluster (the LAION-style keep-best policy; the
    image analog of canonical_docs). decode → banded phash pairs →
    connected components LEFT-joined onto every image (singletons
    self-cluster via coalesce), sharpness = Laplacian variance from the
    exact integer moments (ONE correctly-rounded float division per
    image — both operands < 2^53 so the replica's scalar division is
    bit-identical), then one key-complete group_top_k. Sequential
    oracle expected_canonical_images (all-pairs hamming + union-find +
    the double-loop Laplacian replica)."""
    from ..fixtures import synth
    from ..ops.agg import group_top_k
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join

    ps = ray.data.from_arrow(synth.make_neardup_pagestore(60, seed=42))
    withid = ps.map_batches(
        lambda t: _neardup_iid(t).select(["iid", "bytes", "fmt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = mm.image_near_dup_pairs(withid, concurrency=2, batch_size=32)
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"iid": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"iid": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def sharp_key(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_interior"], np.int64)
        s1 = np.asarray(t["lap_sum"], np.int64)
        s2 = np.asarray(t["lap_sq_sum"], np.int64)
        num = n * s2 - s1 * s1
        den = np.maximum(n, 1) * np.maximum(n, 1)
        return pa.table(
            {
                "iid": t["iid"],
                "sharp_key": pa.array(
                    num.astype(np.float64) / den.astype(np.float64), pa.float64()
                ),
            }
        )

    sharp = mm.sharpness_score(withid).map_batches(
        sharp_key, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(
        sharp, comp, "iid", ["sharp_key"], ["component"], how="left"
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "iid": pa.array([], pa.int64()),
                 "sharp_key": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "component": pc.coalesce(t["component"], t["iid"]),
                "iid": t["iid"],
                "sharp_key": t["sharp_key"],
            }
        )

    full = joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    top = group_top_k(full, "component", ["sharp_key", "iid"], [True, False], k=1)
    return top.map_batches(
        lambda t: pa.table(
            {"component": t["component"], "canonical_id": t["iid"],
             "sharp_key": t["sharp_key"]}
        ),
        batch_format="pyarrow",
    )


META_AUDIT_N = 60


def _meta_audit_store() -> pa.Table:
    """Pagestore with PLANTED manifest corruption: stored w bumped for
    iid%7==0 rows, stored phash bit-flipped for iid%5==0 rows — payload
    bytes untouched (the corruption an ingest actually sees: stale or
    miscopied manifest columns)."""
    from ..fixtures import synth

    t = synth.make_pagestore(META_AUDIT_N, seed=42)
    iid = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64())
    ids = iid.to_numpy(zero_copy_only=False)
    w = pc.if_else(
        pa.array(ids % 7 == 0),
        pc.add(t["w"], pa.scalar(1, pa.int32())),
        t["w"],
    )
    ph = pc.if_else(
        pa.array(ids % 5 == 0),
        pc.bit_wise_xor(t["phash"], pa.scalar(1, pa.int64())),
        t["phash"],
    )
    return pa.table(
        {
            "iid": iid,
            "bytes": t["bytes"],
            "w": w,
            "h": t["h"],
            "fmt": t["fmt"],
            "phash": ph,
        }
    )


def q_image_meta_audit(sf_dir: str):
    """Manifest-consistency audit over the image store (ops/multimodal.
    image_meta_audit): header dims vs stored (w,h), pixel-recomputed
    phash vs the stored phash column, decode health — the gate that
    must pass before metadata-only ops (aspect_buckets,
    image_corpus_filter, exact_phash_dups) can trust the manifest.
    Corruption is planted in the METADATA only; sequential replica
    oracle expected_image_meta_audit decodes every image independently."""
    from ..ops.multimodal import image_meta_audit

    return image_meta_audit(_ds_from_table(_meta_audit_store(), 8))


def q_image_knn(sf_dir: str):
    """Image similarity search: decode → 64-dim block-mean embedding →
    exact cosine top-5 (broadcast queries, per-block partial top-k,
    combiner merge — the image analog of knn_cosine)."""
    from ..fixtures import codec, synth

    ps_tbl = synth.make_pagestore(80, seed=42)
    withid = _ds_from_table(ps_tbl, target_blocks=8).map_batches(
        lambda t: pa.table(
            {
                "iid": pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 11), pa.int64()),
                "bytes": t["bytes"],
                "fmt": t["fmt"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vecs = mm.image_cell_vectors(withid, id_col="iid", batch_size=32)
    # query side: the first 5 images, decoded once on the driver (5 rows)
    qmat = np.stack(
        [
            codec.cell_vector64(codec.decode(b, f))
            for b, f in zip(
                ps_tbl["bytes"].to_pylist()[:5], ps_tbl["fmt"].to_pylist()[:5]
            )
        ]
    )
    out = sim.knn_brute_force(
        vecs, np.arange(5, dtype=np.int64), qmat, k=5, id_col="iid"
    )
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


def q_news_pipeline(sf_dir: str):
    """The reference's ``news.get()`` end-to-end (E1 trace re-expressed):
    HTML listing parse (M1) → absolutize (M2) → Korean date parse (M3) →
    day cutoff (M6) → keyword filter (M7) → sort newest-first (A1) →
    dedup-by-link keep-first (A2) → limit (A3). Non-SQL (fixture-
    sourced); deterministic."""
    from ..fixtures import synth
    from ..functions.dates import parse_korean_dates
    from ..stages.parse import extract_news_items, keyword_any_match

    pages = ray.data.from_arrow(synth.make_html_listing(6, 10, seed=42))
    items = extract_news_items(pages)

    def add_published(t: pa.Table) -> pa.Table:
        return t.append_column("published", parse_korean_dates(t["writer_line"]))

    dated = items.map_batches(add_published, batch_format="pyarrow", zero_copy_batch=True)
    kw = keyword_any_match(dated, synth.keywords(), col="title")
    cut = kw.map_batches(
        lambda t: t.filter(pc.is_valid(t["published"])),
        batch_format="pyarrow",
    )
    # dedup by link keep-NEWEST (rank inside each link group by
    # published desc, title asc — order is computed per group, never
    # inherited across a shuffle), then newest-first sort + limit.
    # partitioned_group_rank replaces groupby().map_groups (~1 ms/group
    # overhead with one group per link) with one key shuffle + a
    # vectorized per-partition rank kernel.
    from ..stages.index import partitioned_group_rank

    ranked = partitioned_group_rank(
        cut, "link", ["published", "title"], [True, False], rank_col="_r"
    )
    first_per_link = ranked.map_batches(
        lambda t: t.filter(pc.equal(t["_r"], 0)).drop_columns(["_r"]),
        batch_format="pyarrow",
    )
    top = first_per_link.sort(["published", "link"], descending=[True, False]).limit(20)
    return top.map_batches(
        lambda t: t.select(["link", "title", "published"]), batch_format="pyarrow"
    )


RSS_TODAY = "2025-06-20"


def q_rss_advisories(sf_dir: str):
    """S2+M4+M5: feed entries → head-limit (seq < 30) → projection with
    UTC→Seoul(+9h) date normalization + regex/default fallbacks →
    today-filter. Deterministic fixture; real-SQL oracle re-derives the
    tz arithmetic in DuckDB (expected.py)."""
    from ..fixtures import synth
    from ..stages.rss import parse_rss_entries

    feed = ray.data.from_arrow(synth.make_rss_feed(40, seed=42, today=RSS_TODAY))
    return parse_rss_entries(
        feed, tz_offset_hours=9, default_day=RSS_TODAY, limit=30, day_filter=RSS_TODAY
    )


def q_ipc_ingest(sf_dir: str):
    """Raw-feed ingestion from Arrow IPC (Feather v2) shards — the
    zero-parse interchange format (sources/ipc.read_ipc: one decode
    task per file, the 'decode' is buffer slicing). Same records and
    generator-recomputed oracle as jsonl/csv_ingest, so all three
    readers are pinned to land the identical table."""
    from ..fixtures.synth import make_jsonl_docs
    from ..ops.agg import partial_group_agg
    from ..sources.ipc import read_ipc, write_ipc_shards

    out = "/tmp/nc_ipc_fixture"
    rows = make_jsonl_docs()
    tbl = pa.Table.from_pylist(rows)
    write_ipc_shards(tbl, out, num_shards=4)  # deterministic, idempotent
    ds = read_ipc(out)
    return partial_group_agg(
        ds.map_batches(
            lambda t: t.select(["kind", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["kind"],
        [("n_records", "count_all", None), ("sum_tokens", "sum", "n_tokens")],
    )


def q_orc_ingest(sf_dir: str):
    """Raw-feed ingestion from ORC shards (sources/orcsrc.read_orc:
    one decode task per file, column pruning pushed into the ORC
    reader). Same records and generator-recomputed oracle as
    jsonl/csv/ipc_ingest — all FOUR readers pinned to land the
    identical table."""
    from ..fixtures.synth import make_jsonl_docs
    from ..ops.agg import partial_group_agg
    from ..sources.orcsrc import read_orc, write_orc_shards

    out = "/tmp/nc_orc_fixture"
    rows = make_jsonl_docs()
    tbl = pa.Table.from_pylist(rows)
    write_orc_shards(tbl, out, num_shards=4)  # deterministic, idempotent
    ds = read_orc(out, columns=["kind", "n_tokens"])
    return partial_group_agg(
        ds,
        ["kind"],
        [("n_records", "count_all", None), ("sum_tokens", "sum", "n_tokens")],
    )


def q_evolving_ingest(sf_dir: str):
    """Schema-evolution ingest (sources/evolving.read_union_by_name):
    two shard generations — gen-0 carries n_tokens, gen-1 dropped it
    and added lang — land as ONE union-by-name Dataset (typed-null
    fills, footer-only schema resolution), then a zero-exchange
    combiner aggregate over the unified columns. Oracle recomputes the
    same generations from the shared deterministic generator."""
    from ..fixtures.synth import make_jsonl_docs
    from ..ops.agg import partial_group_agg
    from ..sources.evolving import read_union_by_name

    out = "/tmp/nc_evolving_fixture"
    rows = make_jsonl_docs()
    os.makedirs(out, exist_ok=True)
    g0 = pa.Table.from_pylist(
        [{k: r[k] for k in ("rec_id", "kind", "n_tokens")} for r in rows[:200]]
    )
    g1 = pa.Table.from_pylist(
        [
            {
                "rec_id": r["rec_id"],
                "kind": r["kind"],
                "lang": ["en", "ko", "de"][r["rec_id"] % 3],
            }
            for r in rows[200:]
        ]
    )
    for name, t in (("gen-0", g0), ("gen-1", g1)):
        p = os.path.join(out, f"{name}.parquet")
        pq.write_table(t, p + ".tmp")
        os.replace(p + ".tmp", p)

    def indicators(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": t["kind"],
                "tok0": pc.coalesce(t["n_tokens"], pa.scalar(0, pa.int64())),
                "has_lang": pc.cast(pc.is_valid(t["lang"]), pa.int64()),
            }
        )

    ds = read_union_by_name(out).map_batches(
        indicators, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial_group_agg(
        ds,
        ["kind"],
        [
            ("n_records", "count_all", None),
            ("sum_tokens", "sum", "tok0"),
            ("n_lang_known", "sum", "has_lang"),
        ],
    )


WET_HOSTS = 50


def q_wet_ingest(sf_dir: str):
    """Archive-shard ingestion (sources/wet.py): the sf documents table
    is serialized into WET-style Content-Length-framed record shards
    (the Common Crawl WET shape a 100 TB text pipeline actually starts
    from), read back with one file per task and a framed per-record
    scan, then rolled up per target host with a zero-exchange combiner.
    REAL SQL oracle over documents re-derives url/host/byte-length
    arithmetic — a framing or decode bug cannot hash-match."""
    from ..ops.agg import partial_group_agg
    from ..sources.wet import read_wet, write_wet_shards

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_numpy()
    hosts = pc.cast(pa.array(ids % WET_HOSTS, pa.int64()), pa.string())
    tbl = pa.table(
        {
            "rec_id": docs["doc_id"],
            "url": pc.binary_join_element_wise(
                "https://h", hosts, ".example/p",
                pc.cast(docs["doc_id"], pa.string()), "",
            ),
            "text": docs["text"],
        }
    )
    # Cache key includes a content fingerprint (mtime+size of the source
    # parquet), not just basename+row count: regenerating the fixture
    # with the same row count but different content must not silently
    # reuse stale shards while the SQL oracle reads the fresh parquet.
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    fp = f"{st.st_mtime_ns:x}_{st.st_size:x}"
    out = (
        f"/tmp/nc_wet_fixture/"
        f"{os.path.basename(os.path.normpath(sf_dir))}_n{len(ids)}_{fp}"
    )
    marker = os.path.join(out, "_done")
    if not os.path.exists(marker):
        write_wet_shards(tbl, out, num_shards=8)
        open(marker, "w").close()

    def host_rows(t: pa.Table) -> pa.Table:
        hm = pc.extract_regex(t["url"], r"^https?://(?P<h>[^/]+)")
        return pa.table(
            {
                "host": pc.struct_field(hm, "h"),
                "n_bytes": t["n_bytes"],
            }
        )

    return partial_group_agg(
        read_wet(out).map_batches(
            host_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["host"],
        [("n_docs", "count_all", None), ("sum_bytes", "sum", "n_bytes")],
    )


ORACLE_SQL["wet_ingest"] = (
    f"WITH r AS (SELECT 'h' || CAST(doc_id % {WET_HOSTS} AS VARCHAR) "
    "  || '.example' AS host, "
    "  octet_length(encode(coalesce(text, ''))) AS n_bytes FROM documents) "
    "SELECT host, count(*) AS n_docs, "
    "  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes FROM r GROUP BY host"
)


SESSION_GAP_MIN = 30.0


def q_clicks_prior_view(sf_dir: str):
    """As-of join (backward, inclusive): each click event gets the
    user's latest view event at-or-before it. Right side is made unique
    per (user, ts) first (max event_id) so the survivor is
    deterministic — mirrored in the DuckDB ASOF JOIN oracle."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda t: t.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = sorted_group_agg(
        ev.filter(expr="event_type == 'view'"),
        ["user_id", "ts"],
        [("prior_view_id", "max", "event_id")],
    )
    joined = sort_merge_asof_join(
        clicks, views, key="user_id", ts_col="ts", right_cols=["prior_view_id"]
    )
    return joined.map_batches(
        lambda t: t.select(["event_id", "prior_view_id"]), batch_format="pyarrow"
    )


def q_sessionize(sf_dir: str):
    """Gap-based sessionization of the events stream (the streaming-
    window custom operator): per-user sessions split at >30-minute gaps,
    one row per session with exact bounds. One task-based sort exchange
    (ops/window.sessionize), no hash shuffle."""
    from ..ops import window as win

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return win.sessionize(ds, gap_minutes=SESSION_GAP_MIN)


def q_views_before_click(sf_dir: str):
    """Bounded range join: every (click, view) pair of the same user
    with the view inside the 30 minutes before the click (inclusive)."""
    from ..ops.join import sort_merge_range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda t: t.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = ev.filter(expr="event_type == 'view'").map_batches(
        lambda t: t.select(["ts", "user_id"]).append_column("view_id", t["event_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = sort_merge_range_join(
        clicks, views, key="user_id", ts_col="ts", right_cols=["view_id"],
        low=-30 * 60_000_000, high=0,
    )
    return joined.map_batches(
        lambda t: t.select(["event_id", "view_id"]), batch_format="pyarrow"
    )


def q_canonical_docs(sf_dir: str):
    """Near-dup cluster resolution by QUALITY (the SemDeDup/near-dup
    policy a curation pass actually applies — keep the best member, not
    the smallest id): MinHash components LEFT-joined onto every planted
    doc (singletons are their own cluster), then one key-complete
    group_top_k picks the member with most tokens (ties → min id).
    Oracle: recursive-CTE closure + the same window rank."""
    from ..ops.agg import group_top_k
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join

    planted_tbl = _planted_docs_tbl(sf_dir, _drop_word3)
    planted = _ds_from_table(planted_tbl)
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def quality(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(pc.coalesce(t["text"], ""), r"\S+"), pa.int64()
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n_tok})

    q = planted.map_batches(quality, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        q, comp, "doc_id", ["n_tokens"], ["component"], how="left"
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "component": pc.coalesce(t["component"], t["doc_id"]),
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
            }
        )

    full = joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    top = group_top_k(full, "component", ["n_tokens", "doc_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: pa.table(
            {"component": t["component"], "canonical_id": t["doc_id"],
             "n_tokens": t["n_tokens"]}
        ),
        batch_format="pyarrow",
    )


def q_leakage_safe_split(sf_dir: str):
    """Near-dup-leakage-safe train/val/test split: the split key is the
    near-dup COMPONENT, not the doc, so a cluster of near-duplicates can
    never straddle train and eval (the split-leakage failure a plain
    per-doc hash split has). MinHash components LEFT-joined onto every
    planted doc (singletons self-key via coalesce), then the SAME shared
    md5 split thresholds as dataset_split applied to the component id.
    Oracle: recursive-CTE closure + split_case_sql('component')."""
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_inner_join
    from ..ops.sampling import split_column_batch

    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    ).map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["component"]})
        if t.num_rows
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = planted.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = sort_merge_inner_join(ids, comp, "doc_id", [], ["component"], how="left")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "component" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "component": pa.array([], pa.int64()),
                 "split": pa.array([], pa.string())}
            )
        base = pa.table(
            {"doc_id": t["doc_id"],
             "component": pc.coalesce(t["component"], t["doc_id"])}
        )
        return split_column_batch(base, "component", 0.1, 0.1)

    return joined.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_components(sf_dir: str):
    """Near-dup CLUSTERS: exact connected components (iterative hash-min
    label propagation, ops/graph) over the MinHash+LSH candidate pairs —
    every doc mapped to its cluster's minimum doc_id."""
    from ..ops.graph import connected_components

    planted = _ds_from_table(_planted_docs_tbl(sf_dir, _drop_word3))
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    return connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )


def q_dedup_corpus(sf_dir: str):
    """END-TO-END near-dup removal: MinHash+LSH pairs → exact connected
    components → keep each cluster's min doc_id → sort-merge ANTI join
    drops the other members. Output: the surviving corpus ids. The full
    composition a 100 TB pretraining-dedup run executes, as one
    streaming plan (pairs/components as in dup_components; the anti
    join is ops/join.sort_merge_anti_join — task-based, no hash
    shuffle)."""
    from ..ops.graph import connected_components
    from ..ops.join import sort_merge_anti_join

    planted_tbl = _planted_docs_tbl(sf_dir, _drop_word3)
    planted = _ds_from_table(planted_tbl)
    pairs = dd.minhash_lsh_pairs(
        planted, num_perm=64, bands=16, shingle_k=5, threshold=0.5
    )
    comp = connected_components(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    )
    losers = comp.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ids = _ds_from_table(planted_tbl.select(["doc_id"]))
    return sort_merge_anti_join(ids, losers, key="doc_id")


def q_pq_codes(sf_dir: str):
    """Product-quantization encoding of the embeddings table: 8
    subspaces x 16 spherical centroids, codes packed into one int64 —
    256B/vec to 8B/vec (ops/similarity.pq_encode; deterministic
    kmeans block plan). Sequential oracle expected_pq_codes replays the
    same kernels over the same plan, bit-for-bit."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:16], dtype=np.float64)
    return sim.pq_encode(ds, init=init, m=8, k=16, iters=2)


def q_knn_pq(sf_dir: str):
    """PQ-ADC approximate top-10 neighbors for the first 5 vectors:
    the scan reads 8-byte packed codes, scores via broadcast lookup
    tables (ops/similarity.pq_knn), partial top-k + combiner merge.
    Sequential oracle expected_pq_knn replays identical kernels."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:16], dtype=np.float64)
    cb = sim.pq_fit(ds, init, m=8, k=16, iters=2)
    codes = sim.pq_encode(ds, codebooks=cb)
    qm = np.array(tbl["embedding"].to_pylist()[:5], dtype=np.float64)
    out = sim.pq_knn(codes, cb, np.arange(5), qm, k=10)
    return out.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"]), batch_format="pyarrow"
    )


def q_kmeans_clusters(sf_dir: str):
    """Distributed spherical k-means over the embeddings table: per-block
    partial sums + driver reduce per iteration (one streaming pass, no
    shuffle), then a broadcast-centroid assignment pass. Deterministic
    at any parallelism — verified bit-for-bit against the sequential
    oracle (expected.expected_kmeans)."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    init = np.array(tbl["embedding"].to_pylist()[:KMEANS_K], dtype=np.float64)
    C = sim.kmeans_fit(ds, init=init, iters=KMEANS_ITERS)
    return sim.kmeans_assign(ds, C).map_batches(
        lambda t: t.select(["vec_id", "cluster"]), batch_format="pyarrow"
    )


PCA_K = 4


def q_embedding_pca(sf_dir: str):
    """Exact distributed PCA over the embeddings table
    (ops/similarity.pca_fit): per-block integer partials (n, ΣQ, QᵀQ)
    of the 2²⁰-quantized vectors — an order-invariant combiner, one
    streaming pass, no shuffle — then the covariance eigendecomposition
    driver-side on the d×d matrix. Output: one row per
    (component, dim) loading plus the component's eigenvalue and
    explained-variance ratio; bit-identical to the sequential oracle
    (expected.expected_embedding_pca)."""
    from ..ops.similarity import pca_fit

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    vals, comps, ratio, _n = pca_fit(ds, "embedding", k=PCA_K)
    k, d = comps.shape
    return pa.table(
        {
            "component": pa.array(np.repeat(np.arange(k), d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d), k), pa.int64()),
            "loading": pa.array(comps.ravel(), pa.float64()),
            "eigval": pa.array(np.repeat(vals, d), pa.float64()),
            "var_ratio": pa.array(np.repeat(ratio, d), pa.float64()),
        }
    )


def q_knn_recall(sf_dir: str):
    """ANN quality evaluation — recall@10 of the IVF scale path against
    the exact brute-force scan, SAME queries/centroids as knn_ivf: both
    sides run distributed (broadcast queries, per-block partial top-k),
    the Q×k result tables land driver-side (config-scale), recall is
    one integer intersection per query + one float division. The eval
    harness an ANN deployment gates on before swapping in a pruned
    index."""
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
    approx = sim.knn_ivf(ds, q_ids, E[:5], C, k=10, nprobe=8).take_all()
    exact = sim.knn_brute_force(ds, q_ids, E[:5], k=10).take_all()
    ap: dict[int, set] = {}
    ex: dict[int, set] = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = []
    for qid in sorted(ex):
        hits = len(ex[qid] & ap.get(qid, set()))
        k = len(ex[qid])
        rows.append(
            {
                "query_id": qid,
                "n_hits": hits,
                "recall": float(hits) / float(k),
            }
        )
    return pa.Table.from_pylist(rows)


def q_embedding_pca_proj(sf_dir: str):
    """PCA fit→transform pipeline (ops/similarity.pca_fit +
    pca_transform): fit the top-4 components from integer Gram partials,
    then project EVERY vector via broadcast quantized components and an
    exact integer matmul (BLAS float dgemm is not row-slice
    deterministic; the int matmul is bitwise layout-proof). Output one
    row per (vec_id, component) coordinate."""
    from ..ops.similarity import pca_fit, pca_transform

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = _ds_from_table(tbl, target_blocks=KMEANS_BLOCKS)
    _vals, comps, _ratio, _n = pca_fit(ds, "embedding", k=PCA_K)
    proj = pca_transform(ds, comps)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                    "coord": pa.array([], pa.float64()),
                }
            )
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        P = np.asarray(
            t["proj"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(ids), -1)
        k = P.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
                "component": pa.array(
                    np.tile(np.arange(k), len(ids)), pa.int64()
                ),
                "coord": pa.array(P.ravel(), pa.float64()),
            }
        )

    return proj.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_sample_docs(sf_dir: str):
    """Deterministic stratified sampling: content-stable Bernoulli by
    md5(doc_id) with per-language fractions (downsample dominant
    languages, keep rare ones whole). One streaming filter, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return sp.hash_sample(
        ds, "doc_id", strata_col="lang",
        fractions=SAMPLE_FRACTIONS, default_fraction=SAMPLE_DEFAULT,
    )


def q_value_weighted_sample(sf_dir: str):
    """Per-row IMPORTANCE sampling: each event kept with probability
    ∝ its value (p = cents/20000, clamped) — the upweight-the-rare
    selection a curation pass uses for high-signal rows. Content-stable
    md5 decision per row (ops/sampling.weight_sample_batch), one
    streaming filter, no shuffle; the oracle reproduces the exact
    sample via the shared quantized-cutoff predicate."""
    from ..ops.sampling import weight_sample_batch

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def keep(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100)
        p = np.minimum(c / 20000.0, 1.0)
        return weight_sample_batch(t, "event_id", p)

    return ev.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


_URL_PLANT_SQL = (
    "'https://s' || CAST(doc_id % 10 AS VARCHAR) || '.example/p/' || "
    "CAST(doc_id % 25 AS VARCHAR) || "
    "CASE WHEN doc_id % 2 = 0 "
    "THEN '?a=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_source=t' || "
    "  CAST(doc_id AS VARCHAR) "
    "ELSE '?utm_campaign=z&b=2&a=' || CAST(doc_id % 50 AS VARCHAR) END"
)


@ray.remote
def _canon_rollup_block(*parts: pa.Table) -> pa.Table:
    """Per-canon rollup over one key-complete (canon, url, doc_id)-sorted
    group set: n_urls = run length, n_raw = distinct-url boundaries in
    the run, first_doc = min doc_id — all via reduceat, no per-run
    Python."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {
                "canonical_url": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "n_raw": pa.array([], pa.int64()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(tables).combine_chunks()
    canon = t["canon"].combine_chunks()
    url = t["url"].combine_chunks()
    doc = np.asarray(t["doc_id"], dtype=np.int64)
    m = t.num_rows
    new_canon = np.ones(m, dtype=bool)
    new_url = np.ones(m, dtype=bool)
    if m > 1:
        new_canon[1:] = pc.not_equal(canon.slice(1), canon.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        new_url[1:] = new_canon[1:] | pc.not_equal(
            url.slice(1), url.slice(0, m - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(new_canon)
    ends = np.concatenate([starts[1:], [m]])
    n_urls = ends - starts
    n_raw = np.add.reduceat(new_url.astype(np.int64), starts)
    first_doc = np.minimum.reduceat(doc, starts)
    return pa.table(
        {
            "canonical_url": canon.take(pa.array(starts, pa.int64())),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_raw": pa.array(n_raw, pa.int64()),
            "first_doc": pa.array(first_doc, pa.int64()),
        }
    )


def q_url_canonical_dups(sf_dir: str):
    """Canonical-URL dup groups — the frontier-hygiene pass that stops a
    crawler re-fetching utm-tagged / param-permuted copies of one page
    (the reference dedups on the RAW string, scheduler.py:52-53, and
    would re-fetch every tagged variant). Planted URLs scramble param
    order and attach tracking params; functions/urlnorm.
    dedup_canonical_batch strips + sorts block-locally (zero exchange),
    then ONE canon-complete exchange's rollup kernel gives per-canonical
    n_urls / distinct raw forms / first doc together (reduceat over the
    (canon, url, doc_id) sort — the previous plan paid four exchanges).
    REAL SQL oracle: list_filter + list_sort over the same split, same
    TRACKING_PARAM_RE."""
    from ..functions.urlnorm import dedup_canonical_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        did = pc.cast(t["doc_id"], pa.string())
        a = pc.cast(pa.array(ids % 50, pa.int64()), pa.string())
        even = pc.binary_join_element_wise(
            "?a=", a, "&utm_source=t", did, ""
        )
        odd = pc.binary_join_element_wise("?utm_campaign=z&b=2&a=", a, "")
        url = pc.binary_join_element_wise(
            "https://s",
            pc.cast(pa.array(ids % 10, pa.int64()), pa.string()),
            ".example/p/",
            pc.cast(pa.array(ids % 25, pa.int64()), pa.string()),
            pc.if_else(pa.array(ids % 2 == 0), even, odd),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "url": url})

    c_ds = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        dedup_canonical_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # ONE canon-complete exchange computes all three aggregates per run
    # (row count, distinct-url boundary count, min doc) — the previous
    # plan paid four exchanges (group agg + distinct + agg + join)
    from ..stages.index import key_complete_parts

    groups = key_complete_parts(c_ds, "canon", order=["url", "doc_id"])
    if not groups:
        return pa.table(
            {
                "canonical_url": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "n_raw": pa.array([], pa.int64()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
    return ray.data.from_arrow_refs(
        [_canon_rollup_block.remote(*parts) for parts in groups]
    )


def _url_canonical_dups_oracle_sql() -> str:
    from ..functions.urlnorm import TRACKING_PARAM_RE

    return (
        f"WITH u AS (SELECT doc_id, {_URL_PLANT_SQL} AS url FROM documents), "
        "p AS (SELECT doc_id, url, regexp_extract(url, '^[^?#]*') AS base, "
        r"  string_split(coalesce(regexp_extract(url, '^[^?#]*\?([^#]*)', 1), ''), '&') "
        "    AS params FROM u), "
        "k AS (SELECT doc_id, url, base, list_sort(list_filter(params, "
        f"  x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))) "
        "  AS kept FROM p), "
        "c AS (SELECT doc_id, url, base || CASE WHEN len(kept) > 0 "
        "  THEN '?' || array_to_string(kept, '&') ELSE '' END AS canon FROM k) "
        "SELECT canon AS canonical_url, count(*) AS n_urls, "
        "  count(DISTINCT url) AS n_raw, min(doc_id) AS first_doc "
        "FROM c GROUP BY canon"
    )


ORACLE_SQL["url_canonical_dups"] = _url_canonical_dups_oracle_sql()


def q_nb_classify(sf_dir: str):
    """Multinomial naive-Bayes language classifier, train on even-id
    docs → classify odd-id docs (ops/text.naive_bayes_classify) — the
    fastText/CCNet classifier slot of a curation pipeline with
    exact-integer quantized-log scoring, so the distributed argmax is
    bit-identical to the SQL oracle's at any layout."""
    from ..ops.text import naive_bayes_classify

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def half(train: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            want = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(0 if train else 1, pa.int64()),
            )
            return t.filter(want)

        return fn

    return naive_bayes_classify(
        docs.map_batches(half(True), batch_format="pyarrow", zero_copy_batch=True),
        docs.map_batches(half(False), batch_format="pyarrow", zero_copy_batch=True),
    )


_NB_LQ = "CAST(floor(log2(CAST({x} AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)"

ORACLE_SQL["nb_classify"] = (
    "WITH tok AS (SELECT doc_id, lang, "
    r"    unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term "
    "  FROM documents), "
    "tr AS (SELECT * FROM tok WHERE doc_id % 2 = 0), "
    "c AS (SELECT lang, term, count(*) AS c FROM tr GROUP BY lang, term), "
    "ls AS (SELECT lang, count(*) AS n_lang FROM tr GROUP BY lang), "
    "dl AS (SELECT lang, count(*) AS d_lang FROM documents "
    "  WHERE doc_id % 2 = 0 GROUP BY lang), "
    "vv AS (SELECT count(DISTINCT term) AS v FROM tr), "
    "dd AS (SELECT count(*) AS d FROM documents WHERE doc_id % 2 = 0), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
    "  WHERE doc_id % 2 = 1 GROUP BY doc_id, term), "
    "nt AS (SELECT doc_id, sum(tf) AS n_tok FROM tf GROUP BY doc_id), "
    "part AS (SELECT tf.doc_id, c.lang, "
    "    SUM(tf.tf * " + _NB_LQ.format(x="c.c + 1") + ") AS pq "
    "  FROM tf JOIN c USING (term) GROUP BY tf.doc_id, c.lang), "
    "score AS (SELECT nt.doc_id, ls.lang, "
    "    " + _NB_LQ.format(x="dl.d_lang") + " - " + _NB_LQ.format(x="dd.d")
    + " - nt.n_tok * " + _NB_LQ.format(x="ls.n_lang + vv.v")
    + " + coalesce(part.pq, 0) AS score_q "
    "  FROM nt CROSS JOIN ls JOIN dl USING (lang) CROSS JOIN vv CROSS JOIN dd "
    "  LEFT JOIN part ON part.doc_id = nt.doc_id AND part.lang = ls.lang) "
    "SELECT doc_id, lang AS pred_label, CAST(score_q AS BIGINT) AS score_q FROM score "
    "QUALIFY row_number() OVER (PARTITION BY doc_id "
    "  ORDER BY score_q DESC, lang) = 1"
)


def q_tokenizer_fertility(sf_dir: str):
    """Tokenizer-fertility report per language: chars/token and
    bytes/token over the whitespace pre-tokenization — the eval a
    multilingual tokenizer build runs to spot languages the vocab
    under-serves (high bytes-per-token = more splits at train time).
    ONE zero-exchange combiner pass (exact integer sums per lang);
    each ratio is a single IEEE division of exact ints, bit-identical
    to the SQL CAST division."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(t["text"], "")
        return pa.table(
            {
                "lang": t["lang"],
                "n_tok": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(txt), pa.int64()),
            }
        )

    per = partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        [
            ("n_docs", "count_all", None),
            ("n_tokens", "sum", "n_tok"),
            ("n_chars", "sum", "n_chars"),
            ("n_bytes", "sum", "n_bytes"),
        ],
    )
    toks = np.maximum(np.asarray(per["n_tokens"], np.int64), 1).astype(np.float64)
    return pa.table(
        {
            "lang": per["lang"],
            "n_docs": per["n_docs"],
            "n_tokens": per["n_tokens"],
            "n_chars": per["n_chars"],
            "n_bytes": per["n_bytes"],
            "chars_per_token": pa.array(
                np.asarray(per["n_chars"], np.int64).astype(np.float64) / toks,
                pa.float64(),
            ),
            "bytes_per_token": pa.array(
                np.asarray(per["n_bytes"], np.int64).astype(np.float64) / toks,
                pa.float64(),
            ),
        }
    )


ORACLE_SQL["tokenizer_fertility"] = (
    r"WITH d AS (SELECT lang, "
    r"  CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT) AS n_tok, "
    "  CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars, "
    "  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes "
    "  FROM documents) "
    "SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
    "  CAST(sum(n_chars) AS BIGINT) AS n_chars, "
    "  CAST(sum(n_bytes) AS BIGINT) AS n_bytes, "
    "  CAST(sum(n_chars) AS DOUBLE) / "
    "    CAST(greatest(sum(n_tok), 1) AS DOUBLE) AS chars_per_token, "
    "  CAST(sum(n_bytes) AS DOUBLE) / "
    "    CAST(greatest(sum(n_tok), 1) AS DOUBLE) AS bytes_per_token "
    "FROM d GROUP BY lang"
)


def q_dsir_weights(sf_dir: str):
    """DSIR data-selection importance weights (ops/text.dsir_importance):
    target domain = lang='en' docs, raw pool = the whole corpus; every
    doc scored by the quantized-integer unigram log-ratio
    log2 p_target − log2 p_raw. Resampling by these weights is the
    standard pretraining-corpus domain-shift step (Xie et al. 2023)."""
    from ..ops.text import dsir_importance

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "is_target": pc.equal(pc.coalesce(t["lang"], ""), "en"),
            }
        )

    return dsir_importance(
        docs.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    )


ORACLE_SQL["dsir_weights"] = (
    "WITH tok AS (SELECT doc_id, lang, "
    r"    unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term "
    "  FROM documents), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term), "
    "tt AS (SELECT term, count(*) AS cr, "
    "    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct "
    "  FROM tok GROUP BY term), "
    "s AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM tt), "
    "j AS (SELECT tf.doc_id, SUM(tf.tf) AS n_tokens, "
    "    SUM(tf.tf * (" + _NB_LQ.format(x="tt.ct + 1") + " - "
    + _NB_LQ.format(x="tt.cr + 1") + ")) AS sv "
    "  FROM tf JOIN tt USING (term) GROUP BY tf.doc_id) "
    "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
    "CAST(sv + n_tokens * ("
    + _NB_LQ.format(x="nr + v") + " - " + _NB_LQ.format(x="nt + v")
    + ") AS BIGINT) AS logratio_q FROM j CROSS JOIN s"
)


ES_SAMPLE_K = 5


def q_weighted_type_sample(sf_dir: str):
    """Weighted sample WITHOUT replacement, k per group — the
    'pick K docs per stratum proportional to quality' selection
    (Efraimidis–Spirakis keys, ops/sampling.es_weighted_keys): rank =
    log2(u)/w desc with a content-stable md5 uniform, so the sample is
    exact-weighted, rerun-stable, and parallelism-proof. Weight =
    value-cents + 1. One hash-derive map + the group_top_k
    key-complete exchange; the oracle recomputes the identical key
    (bit-exact incl. the log2 float) and ranks in SQL."""
    from ..ops.agg import group_top_k
    from ..ops.sampling import es_weighted_keys

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        # floor(x+0.5) = DuckDB round() (half-away-from-zero) for the
        # non-negative cents here; np.rint is half-to-even and diverges
        # on exact .5 boundaries (value=0.125 -> 13 vs 14). Negative
        # values would round half-UP here (floor(-12.5+0.5) = -12 vs
        # DuckDB -13) and violate the es w >= 1 contract — fail loudly
        # if the fixture ever drifts.
        v = np.asarray(t["value"], dtype=np.float64)
        if v.size and v.min() < 0:
            raise ValueError(
                "weighted_type_sample: negative event values break the "
                "half-away-from-zero rounding match and the ES w>=1 "
                "contract"
            )
        w = np.floor(v * 100 + 0.5) + 1.0
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "es_key": pa.array(es_weighted_keys(t["event_id"], w), pa.float64()),
            }
        )

    return group_top_k(
        ev.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        ["es_key", "event_id"],
        [True, False],
        ES_SAMPLE_K,
    )


def _weighted_type_sample_oracle_sql() -> str:
    from ..ops.sampling import es_key_sql

    key = es_key_sql("event_id", "CAST(round(value * 100) AS BIGINT) + 1")
    return (
        f"WITH k AS (SELECT event_type, event_id, {key} AS es_key FROM events) "
        "SELECT event_type, event_id, es_key, "
        "  CAST(row_number() OVER (PARTITION BY event_type "
        "    ORDER BY es_key DESC, event_id) AS BIGINT) AS rn "
        f"FROM k QUALIFY rn <= {ES_SAMPLE_K}"
    )


ORACLE_SQL["weighted_type_sample"] = _weighted_type_sample_oracle_sql()


SAMPLED_Q_FRACTION = 0.25


def q_sampled_quantiles(sf_dir: str):
    """Sketch-by-sampling quantiles: exact per-group quantiles of a
    content-stable 25% hash sample — order-insensitive and
    parallelism-proof where mergeable quantile sketches (KLL/t-digest)
    are merge-order-sensitive, so the SQL oracle can share the exact
    subset via the same md5 threshold. The scale path when the full
    sort exchange of group_quantiles is too wide."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    sampled = sp.hash_sample(ev, "event_id", fraction=SAMPLED_Q_FRACTION)
    return group_quantiles(sampled, "event_type", "value", (25, 50, 75))


MIXTURE_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.1, "fr": 0.1, "es": 0.1}
MIXTURE_BUDGET = 300


def q_mixture_sample(sf_dir: str):
    """Target-mixture corpus assembly: rebalance languages to a recipe
    (50/20/10/10/10) within a ~300-row budget — one combiner counting
    pass, driver-side fractions (ops/sampling.mixture_fractions), then
    the content-stable stratified filter streams block-local."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return sp.mixture_sample(ds, "doc_id", "lang", MIXTURE_WEIGHTS, MIXTURE_BUDGET)


def _benchmark_needles(sf_dir: str) -> list[str]:
    """Deterministic 8-gram 'benchmark' needles: the opening 8 words of
    every 50th document — tiny by construction (real decontamination
    needle sets are small external benchmark files)."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    mask = (np.asarray(t["doc_id"]) % 50) == 0
    return [
        " ".join((t["text"][int(i)].as_py() or "").split(" ")[:8])
        for i in np.flatnonzero(mask)
    ]


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag docs containing any benchmark
    8-gram (broadcast needle scan; shingle-hash semi-join at needle
    scale — see ops/text.flag_contaminated_batch)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.flag_contaminated(ds, _benchmark_needles(sf_dir))


def q_pii_redact(sf_dir: str):
    """PII redaction: plant deterministic e-mail/phone/IP literals per
    doc, then strip them with the ordered RE2 pass (ops/text.redact_pii).
    Planting happens identically in the oracle SQL so both sides see the
    same input."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        dmod = pc.cast(pa.array(np.asarray(t["doc_id"]) % 255), pa.string())
        planted = pc.binary_join_element_wise(
            pc.coalesce(t["text"], ""),
            " reach user", did,
            "@mail.example.com tel 555-0142 ip 10.0.0.", dmod,
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": planted})

    return tx.redact_pii(
        ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


LETTERBOX_N = 120


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining (the pair-quality upgrade every contrastive
    run applies): among each anchor's sampled negatives, keep the one
    with the highest exact integer-quantized similarity — the sampled
    pool from ops/similarity.contrastive_negatives ranked per anchor by
    ops/agg.group_top_k on the key-complete exchange."""
    from ..ops.agg import group_top_k
    from ..ops.similarity import contrastive_negatives

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = contrastive_negatives(
        ds, n_total=ds.count(), k_neg=CONTRAST_K, q_scale=CONTRAST_Q
    )
    top = group_top_k(pairs, "vec_id", ["dot_q", "neg_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: t.select(["vec_id", "slot", "neg_id", "dot_q"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_value_quantiles_hist(sf_dir: str):
    """Exact per-type value quantiles on the HISTOGRAM shape: count
    combiner per (type, cents) → weighted boundary picks
    (ops/agg.weighted_group_quantiles) — two narrow exchanges, the raw
    rows are never sorted (the 100 TB path for bounded value domains).
    Same quantile_disc convention as value_quantiles; REAL SQL oracle."""
    from ..ops.agg import sorted_group_agg, weighted_group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        g = (
            pa.table({"event_type": t["event_type"],
                      "cents": pa.array(cents, pa.int64())})
            .group_by(["event_type", "cents"])
            .aggregate([("cents", "count")])
        )
        return pa.table(
            {"event_type": g["event_type"], "cents": g["cents"],
             "n": pc.cast(g["cents_count"], pa.int64())}
        )

    hist = sorted_group_agg(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "cents"],
        [("n", "sum", "n")],
    )
    return weighted_group_quantiles(
        hist, "event_type", "cents", "n", percents=(25, 50, 75),
        out_col="value_cents",
    )


def q_weighted_median(sf_dir: str):
    """Quantity-weighted median extended price per return flag — the
    exact distributed weighted median (ops/agg.weighted_group_median:
    sort exchange + per-block weight-prefix boundary pick; no group
    materializes in one task). REAL SQL window-cumsum oracle."""
    from ..ops.agg import weighted_group_median

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            np.asarray(t["l_extendedprice"], dtype=np.float64) * 100
        ).astype(np.int64)
        qty = np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "price_c": pa.array(price_c, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
            }
        )

    return weighted_group_median(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "l_returnflag",
        "price_c",
        "qty",
        out_col="wmedian_cents",
    )


def q_contrastive_negatives(sf_dir: str):
    """Contrastive negative sampling + exact integer-quantized scoring
    over the embeddings table (ops/similarity.contrastive_negatives:
    content-stable LCG negatives, one neg_id-colocating join, int dot).
    REAL SQL oracle: same integer formula, unnest-zip dot."""
    from ..ops.similarity import contrastive_negatives

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return contrastive_negatives(
        ds, n_total=ds.count(), k_neg=CONTRAST_K, q_scale=CONTRAST_Q
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


def q_lineitem_orders_join(sf_dir: str):
    """General inner equi-join of two DATA-SCALE fact tables
    (lineitem ⋈ orders on orderkey) on the key-complete exchange —
    both sides ship once, per-key outputs assemble by offset
    arithmetic, hot keys raise loudly instead of exploding
    (ops/join.sort_merge_inner_join)."""
    from ..ops.join import sort_merge_inner_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    return sort_merge_inner_join(
        li,
        orders,
        "l_orderkey",
        left_cols=["l_linenumber", "l_quantity"],
        right_cols=["o_orderdate", "o_totalprice"],
        right_key="o_orderkey",
    )


def q_customer_orders_left_join(sf_dir: str):
    """Left-outer variant of the data-scale equi-join: every customer
    row survives, the ~2% with no orders carry nulled order columns
    (the unmatched path of ops/join.sort_merge_inner_join how='left')."""
    from ..ops.join import sort_merge_inner_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return sort_merge_inner_join(
        cust,
        orders,
        "c_custkey",
        left_cols=[],
        right_cols=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
        how="left",
    )


PSNR_AUDIT_N = 120


def q_payload_psnr(sf_dir: str):
    """The input_hint's per-row payload invariant (decoded-pixel
    fidelity vs the TRUE reference pixels; PSNR ≥ 40 dB for lossy
    formats) as a queryable audit over the page-store
    (ops/multimodal.payload_psnr_audit)."""
    from ..fixtures import synth

    tab = synth.make_pagestore(PSNR_AUDIT_N, seed=42).select(
        ["image_id", "bytes", "fmt", "w", "h"]
    )
    refs = [
        synth.reference_pixels(k, seed=42).tobytes() for k in range(PSNR_AUDIT_N)
    ]
    tab = tab.append_column("ref_px", pa.array(refs, pa.large_binary()))
    return mm.payload_psnr_audit(ray.data.from_arrow(tab))


def q_customer_orders_full_join(sf_dir: str):
    """Full-outer equi-join (both unmatched directions null-padded,
    key from whichever side is present): even customers × orders of
    third customers — the filters guarantee unmatched rows on BOTH
    sides, exercising the complete join matrix."""
    from ..ops.join import sort_merge_inner_join

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["c_custkey"], 1), 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def third(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["o_custkey"],
                pc.multiply(pc.divide(t["o_custkey"], 3), pa.scalar(3, pa.int64())),
            ),
            0,
        )
        return t.filter(keep)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return sort_merge_inner_join(
        cust,
        orders.map_batches(third, batch_format="pyarrow", zero_copy_batch=True),
        "c_custkey",
        left_cols=[],
        right_cols=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
        how="outer",
    )


PROFILE_COLS = ["event_type", "props", "user_id", "value"]


def q_profile_events(sf_dir: str):
    """Per-column ingest profile of the events table
    (ops/agg.profile_table): null/row counts as one zero-exchange
    combiner, exact distinct per column on the sort exchange."""
    from ..ops.agg import profile_table

    ev = _read(sf_dir, "events", PROFILE_COLS)
    return profile_table(ev, PROFILE_COLS)


TRIANGLE_MOD = 97


def q_triangles(sf_dir: str):
    """Exact triangle count (ops/graph.triangle_count) over a
    deterministic graph derived from lineitem (orderkey/partkey folded
    mod 97, canonical a<b, distinct): wedge generation on the
    a-complete exchange + semi join of packed wedge keys against the
    edge set."""
    from ..ops.agg import sorted_distinct
    from ..ops.graph import triangle_count

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    m = pa.scalar(TRIANGLE_MOD, pa.int64())

    def fold(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_orderkey"], pa.int64())
        y = pc.cast(t["l_partkey"], pa.int64())
        u = pc.subtract(x, pc.multiply(pc.divide(x, m), m))
        v = pc.subtract(y, pc.multiply(pc.divide(y, m), m))
        a = pc.min_element_wise(u, v)
        b = pc.max_element_wise(u, v)
        keep = pc.not_equal(a, b)
        return pa.table({"a": a.filter(keep), "b": b.filter(keep)})

    edges = sorted_distinct(
        li.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    )
    return triangle_count(edges, node_cap=TRIANGLE_MOD)


GROUP_SAMPLE_K = 20


def q_event_type_sample(sf_dir: str):
    """Deterministic per-group sample — the scale-safe 'reservoir':
    keep the K rows per event_type with the smallest md5(event_id)
    prefix (content-stable, so reruns and any partitioning agree;
    uniform because md5 is key-equidistributed). Just a hash-derive +
    ops/agg.group_top_k — no new exchange machinery."""
    import hashlib

    from ..ops.agg import group_top_k

    ev = _read(sf_dir, "events", ["event_id", "event_type"])

    def hk(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(str(v).encode()).hexdigest()[:8]
            for v in t["event_id"].to_pylist()
        ]
        return t.append_column("hk", pa.array(h, pa.string()))

    top = group_top_k(
        ev.map_batches(hk, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        ["hk", "event_id"],
        [False, False],
        GROUP_SAMPLE_K,
    )
    return top.map_batches(
        lambda t: t.select(["event_type", "event_id", "rn"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


CM_PROBES = ["batch", "hash", "join", "row", "scan", "zz-absent-term"]
CM_W, CM_D = 1024, 3


def q_cm_counts(sf_dir: str):
    """Count-min sketch term estimates (ops/agg.cm_sketch_counts):
    counters are sums, so the sketch merges exactly at any block
    layout — a zero-exchange combiner where exact top_terms needs the
    full term exchange. The SQL oracle rebuilds the identical sketch
    (same md5 bucket convention) in DuckDB."""
    from ..ops.agg import cm_sketch_counts

    docs = _read(sf_dir, "documents", ["text"])
    return cm_sketch_counts(docs, CM_PROBES, text_col="text", w=CM_W, d=CM_D)


def q_event_customer_skew_join(sf_dir: str):
    """Skew-aware equi-join (ops/join.skew_join): power users past the
    hot threshold bypass the exchange — their customer rows broadcast
    once via ray.put and join map-side; the cold tail takes the normal
    sort-merge exchange. Row-identical to the plain JOIN (the oracle);
    threshold 80 makes BOTH paths real at sf0.01."""
    from ..ops.join import skew_join

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return skew_join(
        ev,
        cust,
        "user_id",
        left_cols=["event_id"],
        right_cols=["c_nationkey"],
        right_key="c_custkey",
        hot_threshold=80,
    )


def q_dup_ngrams(sf_dir: str):
    """Exact duplicate-5-gram span stats per document (the substring-
    dedup signal of Lee et al. 2022): explode grams → gram-complete
    exchange → per-doc dup partials → doc sum + left join
    (ops/text.dup_ngram_stats)."""
    from ..ops.text import dup_ngram_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_ngram_stats(docs, text_col="text", id_col="doc_id", n=5)


def q_event_rolling(sf_dir: str):
    """Bounded row-window aggregate — SUM/COUNT/AVG OVER (PARTITION BY
    user ORDER BY ts, id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) in
    integer cents on the key-complete exchange
    (ops/window.rolling_window)."""
    from ..ops.window import rolling_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return t.drop_columns(["value"]).append_column(
            "v_int", pa.array(v, pa.int64())
        )

    return rolling_window(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        val_col="v_int",
        k_preceding=3,
    )


def q_event_value_stats(sf_dir: str):
    """Exact per-type mean / population variance / stddev of event
    value in integer cents (ops/agg.group_var_stats): integer moment
    partials per block, arbitrary-precision driver merge, one
    correctly-rounded cast per output float — bit-identical to the SQL
    exact-integer formula at any parallelism."""
    from ..ops.agg import group_var_stats

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"], "v": pa.array(v, pa.int64())}
        )

    tab = group_var_stats(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        "v",
    )
    return tab.rename_columns(
        ["event_type", "n_values", "sum_cents", "mean_cents", "var_cents", "std_cents"]
    )


def q_orders_customer_right_join(sf_dir: str):
    """Right-outer mode completing the data-scale join matrix
    (inner/left/right/full on one kernel): orders ⋈ customer keyed on
    custkey with orders as the LEFT side, so the ~2% of customers with
    no orders exercise the unmatched-right null-padding branch of
    ops/join.sort_merge_inner_join how='right'."""
    from ..ops.join import sort_merge_inner_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return sort_merge_inner_join(
        orders,
        cust,
        "o_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=[],
        right_key="c_custkey",
        how="right",
    )


def q_corpus_diff(sf_dir: str):
    """Snapshot diff between crawl epochs (incremental-ingest
    primitive): snapshot B derives from documents by a deterministic
    rule — every 7th doc removed, every 10th mutated, every 13th gains
    a new doc — and ops/join.snapshot_diff reports added / removed /
    changed by md5 fingerprint over ONE narrow-row key-complete
    exchange. The SQL oracle applies the same rule with a FULL OUTER
    JOIN."""
    from ..ops.join import snapshot_diff

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp_a(t: pa.Table) -> pa.Table:
        from ..ops.text import fingerprint_batch

        f = fingerprint_batch(t)
        return pa.table({"doc_id": f["doc_id"], "fp": f["md5"]})

    def make_b(t: pa.Table) -> pa.Table:
        import hashlib

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        texts = t["text"].to_pylist()
        out_ids, out_fps = [], []
        for i, txt in zip(ids.tolist(), texts):
            if i % 7 != 0:
                s = (txt or "") + " v2" if i % 10 == 0 else (txt or "")
                out_ids.append(i)
                out_fps.append(hashlib.md5(s.encode()).hexdigest())
            if i % 13 == 0:
                out_ids.append(i + 1_000_000)
                out_fps.append(hashlib.md5(f"new doc {i}".encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "fp": pa.array(out_fps, pa.string()),
            }
        )

    a = docs.map_batches(fp_a, batch_format="pyarrow", zero_copy_batch=True)
    b = docs.map_batches(make_b, batch_format="pyarrow", zero_copy_batch=True)
    return snapshot_diff(a, b, "doc_id", "fp")


def q_caption_consistency(sf_dir: str):
    """Caption↔image consistency scoring over the page-store (the
    CLIP-filter slot, deterministic-fake embeddings per the contract):
    real decode → cell embedding vs signed-feature-hashed caption,
    cosine per row. Sequential oracle shares the embed kernels."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(CLIP_SCORE_N, seed=42).select(
            ["image_id", "bytes", "fmt", "caption"]
        )
    )
    return mm.caption_image_consistency(ps)


def q_outlink_degrees(sf_dir: str):
    """In-degree per host of the outlink graph embedded in captions:
    flat_map link harvest (S3/M9 semantics) → combiner count by host —
    zero exchange at host-registry cardinality. Real-SQL oracle
    re-parses the same inlined captions with regexps."""
    from ..fixtures import synth
    from ..ops.agg import partial_group_agg
    from ..stages.parse import extract_outlinks

    ps = ray.data.from_arrow(
        synth.make_pagestore(OUTLINK_DEG_N, seed=42).select(["caption"])
    )
    return partial_group_agg(
        extract_outlinks(ps), ["host"], [("n_links", "count_all", None)]
    )


def q_reciprocal_links(sf_dir: str):
    """Link-farm signal: reciprocal host-pair link counts over the
    outlink graph (pages exchanging links both ways rank as farms in a
    crawl-quality pass). One narrow (lo,hi,dir) combiner + sorted
    exchange; edges never leave their block unaggregated. REAL SQL
    oracle: same regexp harvest + least/greatest conditional sums."""
    from ..fixtures import synth
    from ..ops.agg import sorted_group_agg

    ps = synth.make_pagestore(OUTLINK_DEG_N, seed=42).select(["caption"])
    src = pa.array(
        [synth.host_of(k) for k in range(OUTLINK_DEG_N)], pa.string()
    )
    ds = ray.data.from_arrow(ps.append_column("src_host", src))

    def edges(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"host_a": pa.array([], pa.string()),
             "host_b": pa.array([], pa.string()),
             "fwd": pa.array([], pa.int64()),
             "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        caps = pc.coalesce(t["caption"], "")
        lst = pc.split_pattern_regex(caps, r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        flat = pc.list_flatten(lst)
        offs = np.asarray(lst.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offs))
        is_link = pc.starts_with(flat, "link:").to_numpy(zero_copy_only=False)
        urls = pc.utf8_slice_codeunits(flat.filter(pa.array(is_link)), start=5)
        dst = pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)")
        dvals = pc.struct_field(dst, "h")
        svals = t["src_host"].take(pa.array(row_of[is_link]))
        sv = np.asarray(svals, dtype=object)
        dv = np.asarray(dvals, dtype=object)
        ok = np.array([d is not None for d in dv])
        sv, dv = sv[ok], dv[ok]
        ne = sv != dv
        sv, dv = sv[ne], dv[ne]
        lo = np.minimum(sv, dv)
        hi = np.maximum(sv, dv)
        fwd = (sv < dv).astype(np.int64)
        g = (
            pa.table(
                {"host_a": pa.array(lo, pa.string()),
                 "host_b": pa.array(hi, pa.string()),
                 "fwd": pa.array(fwd, pa.int64()),
                 "rev": pa.array(1 - fwd, pa.int64())}
            )
            .group_by(["host_a", "host_b"])
            .aggregate([("fwd", "sum"), ("rev", "sum")])
        )
        return pa.table(
            {"host_a": g["host_a"], "host_b": g["host_b"],
             "fwd": pc.cast(g["fwd_sum"], pa.int64()),
             "rev": pc.cast(g["rev_sum"], pa.int64())}
        )

    agg = sorted_group_agg(
        ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True),
        ["host_a", "host_b"],
        [("n_ab", "sum", "fwd"), ("n_ba", "sum", "rev")],
    )

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_ab" not in t.column_names:
            return pa.table(
                {"host_a": pa.array([], pa.string()),
                 "host_b": pa.array([], pa.string()),
                 "n_ab": pa.array([], pa.int64()),
                 "n_ba": pa.array([], pa.int64()),
                 "reciprocal": pa.array([], pa.bool_())}
            )
        return t.append_column(
            "reciprocal",
            pc.and_(pc.greater(t["n_ab"], 0), pc.greater(t["n_ba"], 0)),
        )

    return agg.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


PHASH_DUP_N, PHASH_DUP_POOL = 200, 60


def q_curate_image_corpus(sf_dir: str):
    """End-to-end image-corpus curation, the on-axis flagship
    composition: admission predicates gate the decode, caption↔image
    scoring + aspect bucketing run fused in ONE payload pass, then
    exact phash dedup keeps the min admitted id per hash over the
    narrow manifest (ops/multimodal.curate_image_corpus). The pool-
    cycled fixture plants real exact dups."""
    from ..fixtures import synth

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL)
    )
    return mm.curate_image_corpus(ps)


def q_caption_pixel_corr(sf_dir: str):
    """Image-store metadata analytics: per-format Pearson correlation
    between caption length and pixel count (do bigger images carry
    longer captions?) — ops/agg.group_corr's integer cross-moment
    combiner over the store's METADATA columns only (bytes never
    load). Bit-identical to the sequential big-int oracle."""
    from ..fixtures import synth
    from ..ops.agg import group_corr

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL).select(
            ["fmt", "w", "h", "caption"]
        )
    )

    def xy(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fmt": t["fmt"],
                "cap_len": pc.cast(pc.utf8_length(t["caption"]), pa.int64()),
                "pixels": pc.multiply(
                    pc.cast(t["w"], pa.int64()), pc.cast(t["h"], pa.int64())
                ),
            }
        )

    return group_corr(
        ps.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True),
        ["fmt"],
        "cap_len",
        "pixels",
    )


def q_exact_phash_dups(sf_dir: str):
    """Exact perceptual-hash dup groups over STORE METADATA: the
    input_hint schema ships phash as a column, so byte-identical
    re-posts group without any decode — combiner partials per block
    (phash cardinality is pool-sized, not corpus-sized), keep groups
    with >1 copy, canonical = min image_id. The decode-free complement
    of phash_near_dup."""
    from ..fixtures import synth
    from ..ops.agg import partial_group_agg

    ps = ray.data.from_arrow(
        synth.make_pagestore(PHASH_DUP_N, seed=42, image_pool=PHASH_DUP_POOL).select(
            ["image_id", "phash"]
        )
    )
    g = partial_group_agg(
        ps,
        ["phash"],
        [("n_copies", "count_all", None), ("canonical_id", "min", "image_id")],
    )
    return g.filter(pc.greater(g["n_copies"], 1))


def q_lineitems_of_large_parts(sf_dir: str):
    """Bloom-prefilter semi join (ops/join.bloom_semi_join): lineitems
    whose part is size > 40. The bloom bitmap over the small right side
    broadcasts once; the big left side is prefiltered block-local so the
    exact sort-merge verify sees ~|matches| rows instead of |lineitem|
    — the 100 TB shape for mid-sized right sides."""
    from ..ops.join import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"])

    def large_part_keys(t: pa.Table) -> pa.Table:
        big = t.filter(pc.greater(t["p_size"], 40))
        return pa.table({"l_partkey": big["p_partkey"]})

    right = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        large_part_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    return bloom_semi_join(li, right, "l_partkey")


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split (10% val, 10% test) by
    content-stable md5 — disjoint + exhaustive, identical on any rerun
    or cluster shape (ops/sampling.dataset_split). Streams block-local;
    no shuffle, no RNG state."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    return sp.dataset_split(ds, "doc_id", val_fraction=0.1, test_fraction=0.1)


def q_top_orders_per_cust(sf_dir: str):
    """Per-group top-k (QUALIFY row_number() <= 3): each customer's 3
    priciest orders, on the key-complete sort exchange
    (ops/agg.group_top_k) — the ref's newest-first-truncate (news.py:
    152-162) generalized to per-key. Tiebreak on o_orderkey makes the
    kept rows and ranks total-order deterministic."""
    from ..ops.agg import group_top_k

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = group_top_k(
        ds, "o_custkey", ["o_totalprice", "o_orderkey"], [True, False], k=3
    )
    return out.map_batches(
        lambda t: t.select(["o_custkey", "o_orderkey", "o_totalprice", "rn"]),
        batch_format="pyarrow",
    )


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day): all three grouping levels in
    one streaming pass (in-task level fan-out + zero-exchange combiner,
    ops/agg.rollup_agg). Counts/max only — exact at any merge order."""
    from ..ops.agg import rollup_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    # day as an ISO string, not date32: a nullable DATE column renders
    # asymmetrically in the driver's pandas compare (NaT vs None)
    def with_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.strftime(t["ts"], format="%Y-%m-%d"))

    return rollup_agg(
        ev.map_batches(with_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_sessions(sf_dir: str):
    """Per-EVENT session assignment (the enrichment form of
    sessionize): each event tagged with its 1-based session number —
    ops/window.session_assign, 30-minute gap, same break logic the
    session-summary query uses."""
    from ..ops.window import session_assign

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return session_assign(ev, gap_minutes=30.0)


def q_event_type_transitions(sf_dir: str):
    """Within-session event-type transition counts (sequence-mining
    prep), composed from engine primitives: session assignment (with
    carry columns — the kernel already co-locates and sorts every row,
    so no join back) → LAG of the type within each (user, session) →
    zero-exchange combiner count of (prev_type, event_type) pairs.
    Session boundaries break chains (a session's first event has no
    prev)."""
    from ..ops.agg import partial_group_agg
    from ..ops.window import lag_lead, session_assign

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    enriched = session_assign(
        ev, gap_minutes=30.0, carry_cols=("user_id", "ts", "event_type")
    )

    def with_us_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()),
            pc.cast(t["session_num"], pa.string()),
            "#",
        )
        return t.append_column("us", k)

    keyed = enriched.map_batches(
        with_us_key, batch_format="pyarrow", zero_copy_batch=True
    )
    lagged = lag_lead(
        keyed, "us", ["ts", "event_id"], "event_id", "event_type", keep_value=True
    )

    def drop_null_prev(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_valid(t["prev_value"]))
        return pa.table(
            {"prev_type": out["prev_value"], "event_type": out["value"]}
        )

    long = lagged.map_batches(
        drop_null_prev, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial_group_agg(
        long, ["prev_type", "event_type"], [("n", "count_all", None)]
    )


def q_user_type_pivot(sf_dir: str):
    """Pivot (long → wide reshape): per-user counts of each event type
    as columns. One vectorized conditional-count pass per block (an
    int64 equality-mask column per type — the pivot never becomes a
    per-type shuffle), then the single sorted group-aggregate by user
    sums the wide partials. Unknown types are counted nowhere by
    design; the column set is the broadcast-small config, like the
    keyword list."""
    from ..ops.agg import sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def widen(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    wide = ev.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_group_agg(
        wide, ["user_id"], [(f"n_{ty}", "sum", f"n_{ty}") for ty in PIVOT_TYPES]
    )


def q_user_type_melt(sf_dir: str):
    """Unpivot (wide → long reshape), proven as the pivot's inverse:
    melt the per-user wide counts back to (user_id, event_type, n) and
    drop the zero cells — the result must equal a direct GROUP BY, so
    the round trip is the oracle. The melt is an in-block column
    fan-out (one take per type), no exchange at all."""
    wide = q_user_type_pivot(sf_dir)
    if isinstance(wide, pa.Table):
        wide = ray.data.from_arrow(wide)

    def melt(t: pa.Table) -> pa.Table:
        outs = []
        for ty in PIVOT_TYPES:
            n = t[f"n_{ty}"]
            part = pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": pa.array([ty] * t.num_rows, pa.string()),
                    "n": pc.cast(n, pa.int64()),
                }
            )
            outs.append(part.filter(pc.greater(part["n"], 0)))
        return pa.concat_tables(outs)

    return wide.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def q_token_freq_spectrum(sf_dir: str):
    """Zipf frequency-of-frequencies over the corpus vocabulary
    (ops/text.token_freq_spectrum): term-count exchange, then a
    zero-exchange combiner over the tiny spectrum domain."""
    from ..ops.text import token_freq_spectrum

    return token_freq_spectrum(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_quality_percentile_filter(sf_dir: str):
    """Adaptive-threshold corpus filter (two-phase): the exact global
    75th-percentile token count is computed distributed (one
    group-quantile exchange over a constant key), broadcast as a plain
    value, then the keep-filter streams block-local — the shape of any
    data-dependent cutoff (quality floors, length caps) at corpus
    scale. Integer threshold → no float drift."""
    from ..ops.agg import group_quantiles
    from ..ops.text import token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stats = token_stats(docs).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "k": pa.array(["all"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    q = group_quantiles(stats, "k", "n_tokens", (75,)).take_all()
    threshold = int(q[0]["n_tokens"])
    return stats.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_tokens": t["n_tokens"]}
        ).filter(pc.greater_equal(t["n_tokens"], threshold)),
        batch_format="pyarrow",
    )


def q_event_range_window(sf_dir: str):
    """Time-based rolling sum: per user, the exact cents-sum of values
    in the trailing 1-hour RANGE window (ops/window.range_window_sum).
    Peers at the same ts are in-frame per SQL RANGE semantics, so the
    result needs no tiebreak to be deterministic; integer cents make
    the sums merge-order-proof."""
    from ..ops.window import range_window_sum

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        c = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(c, pa.int64()),
            }
        )

    return range_window_sum(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        "ts",
        "event_id",
        "cents",
        interval_us=3_600_000_000,
    )


def q_value_quartile_buckets(sf_dir: str):
    """Quantile feature binning: each event labeled with its
    event_type's quartile bucket (1–4) — exact per-type q25/q50/q75 on
    the quantile exchange (15 rows), thresholds broadcast, the binning
    one vectorized comparison-sum per block (bucket = 1 + Σ v > qᵢ,
    the exact form the oracle uses)."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    q = group_quantiles(ev, "event_type", "value", percents=(25, 50, 75)).take_all()
    th: dict[str, dict[int, float]] = {}
    for row in q:
        th.setdefault(row["event_type"], {})[row["pct"]] = row["value"]
    types = sorted(th)
    th_mat = np.array(
        [[th[t][25], th[t][50], th[t][75]] for t in types], dtype=np.float64
    )
    type_arr = pa.array(types, pa.string())

    def bucket(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        b = 1 + (v[:, None] > th_mat[codes]).sum(axis=1)
        return pa.table(
            {
                "event_id": t["event_id"],
                "bucket": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    return ev.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)


def q_value_share(sf_dir: str):
    """Percent-of-group-total (ratio_to_report): each event's share of
    its type's total value — totals in exact integer cents via the
    zero-exchange combiner, the share ONE IEEE division of two exact
    ints per row (bit-identical to the SQL CAST/CAST division)."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": pa.array(
                    np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    cts = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    totals = partial_group_agg(
        cts, ["event_type"], [("tot", "sum", "cents")]
    )
    types = totals["event_type"].to_pylist()
    tot = np.asarray(totals["tot"], dtype=np.float64)
    type_arr = pa.array(types, pa.string())

    def share(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        c = np.asarray(t["cents"], dtype=np.int64).astype(np.float64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "share": pa.array(c / tot[codes], pa.float64()),
            }
        )

    return cts.map_batches(share, batch_format="pyarrow", zero_copy_batch=True)


def q_value_mad(sf_dir: str):
    """Median absolute deviation per event_type — the robust spread
    statistic curation filters prefer over stddev: two chained exact
    quantile exchanges (median of values → broadcast → median of
    |v − med|), every float either a quantile_disc element pick or one
    IEEE abs/subtract, so the result is bit-identical to the SQL
    two-CTE oracle."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    med_rows = group_quantiles(ev, "event_type", "value", percents=(50,)).take_all()
    types = sorted(r["event_type"] for r in med_rows)
    med = {r["event_type"]: r["value"] for r in med_rows}
    type_arr = pa.array(types, pa.string())
    med_arr = np.asarray([med[t] for t in types], dtype=np.float64)

    def absdev(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "dev": pa.array(np.abs(v - med_arr[codes]), pa.float64()),
            }
        )

    devs = ev.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True)
    out = group_quantiles(devs, "event_type", "dev", percents=(50,))
    return out.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "mad": t["dev"]}),
        batch_format="pyarrow",
    )


def q_integrity_report(sf_dir: str):
    """Cross-table data-quality audit — the constraint checks an
    ingest pipeline runs before admitting a snapshot, as ONE report
    table (check_name, n_violations): referential integrity both ways
    (sort-merge anti joins), key uniqueness (sorted group-agg count >
    1), and cross-table consistency (per-order lineitem cents sum vs
    the order header, integer-exact). Each check is a distributed
    count; only the 4-row report materializes."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    ev = _read(sf_dir, "events", ["event_id"])

    dup = sorted_group_agg(ev, ["event_id"], [("n", "count_all", None)])
    n_dup = dup.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    ).count()

    def line_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents": pa.array(
                    np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    sums = sorted_group_agg(
        li.map_batches(line_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        [("line_cents", "sum", "cents"), ("n_lines", "count_all", None)],
    )

    def order_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["o_totalprice"], dtype=np.float64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_cents": pa.array(
                    np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    # ONE full-outer join carries all three referential checks:
    # left-only rows = childless orders, right-only rows = orphan
    # lineitem keys (their n_lines sum = orphan ROWS), matched rows
    # compare cents — per-block int partials, 3 ints/block to driver
    joined = sort_merge_inner_join(
        orders.map_batches(
            order_cents, batch_format="pyarrow", zero_copy_batch=True
        ),
        sums,
        "o_orderkey",
        ["total_cents"],
        ["line_cents", "n_lines"],
        right_key="l_orderkey",
        how="outer",
    )

    def check_partial(t: pa.Table) -> pa.Table:
        have_total = pc.is_valid(t["total_cents"]).to_numpy(zero_copy_only=False)
        have_lines = pc.is_valid(t["line_cents"]).to_numpy(zero_copy_only=False)
        childless = int((have_total & ~have_lines).sum())
        orphan_mask = ~have_total & have_lines
        nl = np.asarray(
            pc.fill_null(t["n_lines"], 0).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        orphans = int(nl[orphan_mask].sum())
        both = have_total & have_lines
        tc = pc.fill_null(t["total_cents"], 0).to_numpy(zero_copy_only=False)
        lc = pc.fill_null(t["line_cents"], 0).to_numpy(zero_copy_only=False)
        mismatch = int((both & (tc != lc)).sum())
        return pa.table(
            {
                "childless": pa.array([childless], pa.int64()),
                "orphans": pa.array([orphans], pa.int64()),
                "mismatch": pa.array([mismatch], pa.int64()),
            }
        )

    parts = joined.map_batches(
        check_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n_childless = sum(p["childless"] for p in parts)
    n_orphans = sum(p["orphans"] for p in parts)
    n_mismatch = sum(p["mismatch"] for p in parts)

    return pa.table(
        {
            "check_name": pa.array(
                [
                    "duplicate_event_ids",
                    "order_total_mismatch",
                    "orders_without_lineitems",
                    "orphan_lineitems",
                ],
                pa.string(),
            ),
            "n_violations": pa.array(
                [n_dup, n_mismatch, n_childless, n_orphans], pa.int64()
            ),
        }
    )


def q_user_event_type_list(sf_dir: str):
    """Ordered ARRAY_AGG: per user the full event_type sequence in
    (ts, id) order as a list column (ops/window.group_collect_list —
    run starts become the ListArray offsets, zero-copy)."""
    from ..ops.window import group_collect_list

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return group_collect_list(ev, "user_id", ["ts", "event_id"], "event_type")


def q_user_type_path(sf_dir: str):
    """Ordered STRING_AGG: per user the event_type sequence in
    (ts, id) order as one delimited string (ops/window.group_string_agg
    — collect_list's zero-copy exchange plus a single vectorized
    pc.binary_join per block). The sequence-as-token form sequence
    miners and session-embedding featurizers ingest."""
    from ..ops.window import group_string_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return group_string_agg(
        ev, "user_id", ["ts", "event_id"], "event_type", sep=",", out_col="type_path"
    )


def q_event_type_cooccurrence(sf_dir: str):
    """Market-basket pair support: for each unordered pair of DISTINCT
    event types, how many users exhibit both (ops/agg.group_pair_counts
    — one key-complete exchange, vectorized per-key pair explosion with
    a loud quadratic guard, combiner counts). The co-occurrence matrix
    behind affinity / embedding-context features; complements
    event_type_transitions (adjacent ordered pairs) with the set view."""
    from ..ops.agg import group_pair_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    out = group_pair_counts(ev, "user_id", "event_type")
    return out.rename_columns(["type_a", "type_b", "n_users"])


def q_value_zscore(sf_dir: str):
    """Per-group z-score normalization (the ML feature-prep classic):
    z = (c − mean)/std per event against its type's moments, computed
    PARALLELISM-PROOF — integer cents moments (group_var_stats'
    zero-exchange combiner), then one float expression per row shaped
    exactly like the SQL oracle's: CAST(exact_int AS DOUBLE) /
    (n·sqrt(exact_ratio)), so the doubles match DuckDB bit-for-bit.
    Broadcast of the 5-row stats table; zero exchange end-to-end.
    Constant groups (std = 0) are dropped on both sides."""
    from ..ops.agg import group_var_stats

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "c": pa.array(c, pa.int64()),
            }
        )

    evc = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    stats = group_var_stats(evc, ["event_type"], "c")
    lut = {
        r["event_type"]: (r["n_values"], r["sum_v"], r["std_v"])
        for r in stats.to_pylist()
        if r["std_v"] > 0.0
    }
    for n, s, _ in lut.values():
        if abs(s) * 2 > (1 << 62) or n > (1 << 31):
            raise ValueError("value_zscore: c*n - s may overflow int64")

    def z(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "z": pa.array([], pa.float64())}
            )
        d = pc.dictionary_encode(t["event_type"]).combine_chunks()
        idx = np.asarray(d.indices)
        types = d.dictionary.to_pylist()
        known = np.array([x in lut for x in types], bool)[idx]
        n_arr = np.array([lut.get(x, (1, 0, 0.0))[0] for x in types], np.int64)[idx]
        s_arr = np.array([lut.get(x, (1, 0, 0.0))[1] for x in types], np.int64)[idx]
        std_arr = np.array([lut.get(x, (1, 0, 1.0))[2] for x in types], np.float64)[idx]
        c = np.asarray(t["c"])
        numer = (c * n_arr - s_arr).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            zv = numer / (n_arr.astype(np.float64) * std_arr)
        sel = pa.array(known)
        return pa.table(
            {
                "event_id": t["event_id"].filter(sel),
                "z": pa.array(zv, pa.float64()).filter(sel),
            }
        )

    return evc.map_batches(z, batch_format="pyarrow", zero_copy_batch=True)


def q_sitemap_urls(sf_dir: str):
    """Sitemap-XML frontier seeding: every <loc> (with its paired
    optional <lastmod>) exploded out of sitemap documents
    (stages/rss.parse_sitemaps — split on <url> + one extract_regex per
    field, zero exchange). The standard crawl seed source next to RSS;
    real-SQL oracle re-derives the explode in DuckDB."""
    from ..fixtures import synth
    from ..stages.rss import parse_sitemaps

    ds = ray.data.from_arrow(synth.make_sitemaps()).repartition(3)
    return parse_sitemaps(ds)


def q_resolve_redirects(sf_dir: str):
    """Redirect-chain canonicalization: every src URL resolved to its
    terminal target in O(log max_hops) pointer-DOUBLING rounds, cycles
    flagged as loops (ops/graph.resolve_redirects — each round one
    key-complete self-join; a length-L chain needs ceil(log2 L)+1
    exchanges, not L). Oracled by a genuinely recursive DuckDB
    WITH RECURSIVE walk over the same inline edge VALUES."""
    from ..fixtures import synth
    from ..ops.graph import resolve_redirects

    edges = ray.data.from_arrow(synth.make_redirects()).repartition(4)
    # fixture chains are <= 9 hops: cap 16 → 5 doubling rounds (the SQL
    # oracle's 64-hop walk cap is looser but agrees on chains this short)
    return resolve_redirects(edges, "src", "dst", max_hops=16)


def q_events_watermark(sf_dir: str):
    """Streaming late-data accounting: with arrival order = event_id,
    the watermark before each event is the running max event-time;
    events older than watermark − 1h are LATE. Per tumbling hour:
    kept vs late counts (ops/window.watermark_window_counts — one sort
    on arrival order, a 1-int-per-block carry chain, vectorized
    prefix-max + combiner counts). The audit that sizes a streaming
    pipeline's allowed-lateness budget."""
    from ..ops.window import watermark_window_counts

    ev = _read(sf_dir, "events", ["event_id", "ts"])
    return watermark_window_counts(
        ev, ts_col="ts", arrival_col="event_id",
        lateness_us=3_600_000_000, window_us=3_600_000_000,
    )


def q_url_trap_flags(sf_dir: str):
    """Crawler-trap frontier hygiene: per-URL depth / repeated-segment /
    query-string-bloat flags (functions/urlnorm.url_trap_flags — one
    extract_regex + split + offset arithmetic per block, no exchange at
    all: the scale path is embarrassingly parallel). The pre-filter
    that keeps calendar loops and session-id churn from eating the
    fetch budget; oracled by REAL SQL re-deriving the flags in DuckDB
    from the same inline URL strings."""
    from ..fixtures import synth
    from ..functions.urlnorm import url_trap_flags

    ds = ray.data.from_arrow(synth.make_trap_urls()).repartition(4)
    return ds.map_batches(
        url_trap_flags, batch_format="pyarrow", zero_copy_batch=True
    )


def q_retention_cohorts(sf_dir: str):
    """Cohort retention: users grouped by first-activity day, counted
    as active per (cohort_day, day_offset) — the engagement matrix a
    training-data freshness dashboard needs. First touch rides
    group_first_last (one key-complete exchange), cohorts join back to
    the activity stream on the same exchange
    (sort_merge_inner_join on user), and the distinct
    (cohort, offset, user) count collapses through
    group_count_distinct. Day arithmetic is pure integer epoch-days."""
    from ..ops.agg import partial_group_agg, sorted_distinct
    from ..ops.join import sort_merge_inner_join
    from ..ops.window import group_first_last

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_day(t: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        epoch_day = pc.divide(pc.cast(days, pa.int64()), 86_400_000_000)
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": epoch_day,
                "event_id": t["event_id"],
            }
        )

    daily = ev.map_batches(with_day, batch_format="pyarrow", zero_copy_batch=True)
    first = group_first_last(daily, "user_id", ["day", "event_id"], "day")
    cohorts = first.map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "cohort_day": t["first_value"]}
        ),
        batch_format="pyarrow",
    )
    user_days = sorted_distinct(daily, ["user_id", "day"])
    joined = sort_merge_inner_join(
        user_days, cohorts, "user_id", ["day"], ["cohort_day"]
    )

    def offset(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": t["cohort_day"],
                "day_offset": pc.subtract(t["day"], t["cohort_day"]),
            }
        )

    return partial_group_agg(
        joined.map_batches(offset, batch_format="pyarrow", zero_copy_batch=True),
        ["cohort_day", "day_offset"],
        [("n_users", "count_all", None)],
    )


def q_events_time_travel(sf_dir: str):
    """Lakehouse time travel: read the CDC table AS OF version 2 —
    version-1 base merged with version-2 changes; the version-3 change
    feed is pruned by the AS-OF predicate BEFORE the merge (predicate
    pushdown on the version column), then the same latest-wins
    key-complete rank as events_upsert. REAL SQL oracle."""
    from ..ops.join import upsert

    AS_OF = 2
    ev = _read(sf_dir, "events", ["event_id", "value"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"],
             "version": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
             "value": t["value"]}
        )

    def feed(version: int, mod: int, rem: int, bump: float):
        def f(t: pa.Table) -> pa.Table:
            eid = np.asarray(t["event_id"], dtype=np.int64)
            m = eid % mod == rem
            return pa.table(
                {"event_id": pa.array(eid[m], pa.int64()),
                 "version": pa.array(np.full(int(m.sum()), version, np.int64)),
                 "value": pa.array(
                     np.asarray(t["value"], np.float64)[m] + bump, pa.float64()
                 )}
            )

        return f

    changes = []
    for version, mod, rem, bump in ((2, 10, 3, 1000.0), (3, 7, 0, 5000.0)):
        if version <= AS_OF:  # AS-OF predicate prunes whole change feeds
            changes.append(
                ev.map_batches(
                    feed(version, mod, rem, bump),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
    ch = changes[0] if len(changes) == 1 else changes[0].union(*changes[1:])
    return upsert(
        ev.map_batches(base, batch_format="pyarrow", zero_copy_batch=True),
        ch,
        "event_id",
        "version",
        ["value"],
    )


def q_events_upsert(sf_dir: str):
    """CDC MERGE latest-wins (ops/join.upsert): a deterministic change
    feed (every event_id % 10 == 3 gets value + 1000 at version 2)
    applied onto the base snapshot — one tagged union + one
    key-complete rank, changes win ties."""
    from ..ops.join import upsert

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "version": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "value": t["value"],
            }
        )

    def changes(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"], dtype=np.int64)
        keep = (ids % 10) == 3
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": sub["event_id"],
                "version": pa.array(
                    np.full(sub.num_rows, 2, np.int64), pa.int64()
                ),
                "value": pc.add(sub["value"], 1000.0),
            }
        )

    return upsert(
        ev.map_batches(base, batch_format="pyarrow", zero_copy_batch=True),
        ev.map_batches(changes, batch_format="pyarrow", zero_copy_batch=True),
        "event_id",
        "version",
        ["value"],
    )


def q_user_key_skew(sf_dir: str):
    """Shuffle-skew audit of user_id as a partition key
    (ops/agg.key_skew_report): exact per-key counts on the sort
    exchange, distribution stats (max vs p50/p90/p99) in one more
    constant-key quantile pass — the pre-flight check that routes hot
    keys to skew_join / salting."""
    from ..ops.agg import key_skew_report

    ev = _read(sf_dir, "events", ["user_id"])
    return key_skew_report(ev, "user_id")


def q_event_same_day_count(sf_dir: str):
    """COUNT(*) OVER (PARTITION BY user_id, day) — a COMPOSITE
    partition key, demonstrating the engine's composite-key pattern:
    (user, epoch_day) packs reversibly into one int64
    (user·2²⁰ + day; both ranges loudly bounded), then rides the
    single-column key-complete exchange (ops/window.group_size_window;
    one exchange, run sizes by offset arithmetic)."""
    from ..ops.window import group_size_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pack(t: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        day = pc.divide(pc.cast(days, pa.int64()), 86_400_000_000).to_numpy(
            zero_copy_only=False
        )
        uid = np.asarray(t["user_id"], dtype=np.int64)
        if len(uid) and (
            uid.min() < 0 or day.min() < 0 or day.max() >= (1 << 20)
        ):
            raise ValueError("pack range exceeded: user_id<0 or day >= 2^20")
        packed = (uid << 20) | day.astype(np.int64)
        return pa.table(
            {
                "uday": pa.array(packed, pa.int64()),
                "event_id": t["event_id"],
            }
        )

    packed = ev.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    return group_size_window(packed, "uday", "event_id")


def q_jsonl_ingest(sf_dir: str):
    """Raw-feed ingestion: gzip'd JSON-lines (the pre-parquet source
    format) → sources/jsonl.read_jsonl → zero-exchange combiner
    aggregate per kind. The oracle recomputes the same aggregate from
    the record GENERATOR (never the file), so the reader path itself
    is what's verified."""
    from ..fixtures.synth import make_jsonl_docs, write_jsonl_gz
    from ..ops.agg import partial_group_agg
    from ..sources.jsonl import read_jsonl

    path = "/tmp/nc_jsonl_fixture/docs.jsonl.gz"
    write_jsonl_gz(make_jsonl_docs(), path)  # deterministic, idempotent
    ds = read_jsonl(path)
    return partial_group_agg(
        ds.map_batches(
            lambda t: t.select(["kind", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["kind"],
        [("n_records", "count_all", None), ("sum_tokens", "sum", "n_tokens")],
    )


def q_csv_ingest(sf_dir: str):
    """Raw-feed ingestion, CSV flavor (sources/csvsrc.read_csv over the
    same deterministic records as jsonl_ingest, same
    generator-recomputed oracle) — proving the two raw-feed readers
    land identical tables."""
    from ..fixtures.synth import make_jsonl_docs, write_csv_gz
    from ..ops.agg import partial_group_agg
    from ..sources.csvsrc import read_csv

    path = "/tmp/nc_csv_fixture/docs.csv.gz"
    write_csv_gz(make_jsonl_docs(), path)
    ds = read_csv(path)
    return partial_group_agg(
        ds.map_batches(
            lambda t: t.select(["kind", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["kind"],
        [("n_records", "count_all", None), ("sum_tokens", "sum", "n_tokens")],
    )


PART_KEEP_TYPES = ("click", "purchase")


def q_partitioned_read(sf_dir: str):
    """Partition-pruned read: events laid out hive-style by event_type
    (one-time fixture write), then ONLY the click/purchase partitions
    are read — unselected partitions cost zero I/O and zero tasks
    (sources/partitioned.read_hive_partitioned; pruning at the path
    level, the 'prune at the read' rule as a source primitive) —
    followed by a combiner aggregate."""
    import hashlib as _hl

    from ..ops.agg import partial_group_agg
    from ..sources.partitioned import read_hive_partitioned, write_hive_partitioned

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/nc_part_events_{tag}"
    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "value"],
    )
    write_hive_partitioned(tbl, base, "event_type")
    ds = read_hive_partitioned(
        base, "event_type", lambda v: v in PART_KEEP_TYPES, columns=["value"]
    )

    def cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(
                    np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return partial_group_agg(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        [("n_events", "count_all", None), ("sum_cents", "sum", "cents")],
    )


HIT_KEYWORDS = ["key", "agg", "table", "scan", "zzz-absent"]


def q_keyword_hits(sf_dir: str):
    """Per-keyword document frequency over the corpus
    (ops/text.keyword_hit_counts — the reference's M7 keyword list as
    a monitoring count; one match_substring pass per keyword, combiner
    merge)."""
    from ..ops.text import keyword_hit_counts

    docs = _read(sf_dir, "documents", ["text"])
    return keyword_hit_counts(docs, HIT_KEYWORDS)


FUNNEL_STAGES = ["view", "click", "purchase"]


def q_session_funnel(sf_dir: str):
    """Session conversion funnel view → click → purchase (strictly
    ordered within a 30-min-gap session; ops/window.funnel_counts) —
    one key-complete exchange, one mask + minimum.reduceat per stage
    per block, only 3 ints per block to the driver."""
    from ..ops.window import funnel_counts

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return funnel_counts(ev, FUNNEL_STAGES, gap_minutes=30.0)


CRAWL_BUDGET_TOTAL = 1000


def q_crawl_budget(sf_dir: str):
    """Per-source crawl-quota allocation: CRAWL_BUDGET_TOTAL fetch
    slots split proportionally to each source's character mass by the
    integer largest-remainder method (ops/sampling.budget_allocate) —
    Σquota == budget exactly, ties deterministic. The weight sums are
    the zero-exchange combiner; allocation runs on the config-scale
    per-source table."""
    from ..ops.sampling import budget_allocate

    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return budget_allocate(docs, "source", "n_chars", CRAWL_BUDGET_TOTAL)


SETOP_VALUE_MIN = 200.0
SETOP_SPLIT_DAY = 15


def _half_users(sf_dir: str, first_half: bool):
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def keep(t: pa.Table) -> pa.Table:
        day = pc.day(t["ts"])
        cond = (
            pc.less_equal(day, SETOP_SPLIT_DAY)
            if first_half
            else pc.greater(day, SETOP_SPLIT_DAY)
        )
        mask = pc.and_(cond, pc.greater(t["value"], SETOP_VALUE_MIN))
        return pa.table({"user_id": t.filter(mask)["user_id"]})

    return ev.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def q_users_both_halves(sf_dir: str):
    """SQL INTERSECT: users with a high-value event in BOTH halves of
    the month — one tagged union + one sorted group-aggregate, the
    both-sides test a block-local min/max filter
    (ops/join.set_intersect)."""
    from ..ops.join import set_intersect

    return set_intersect(
        _half_users(sf_dir, True), _half_users(sf_dir, False), ["user_id"]
    )


def q_users_first_half_only(sf_dir: str):
    """SQL EXCEPT: high-value users of the first half with no
    high-value event in the second (ops/join.set_except; same single
    exchange as the intersect)."""
    from ..ops.join import set_except

    return set_except(
        _half_users(sf_dir, True), _half_users(sf_dir, False), ["user_id"]
    )


def q_quantity_price_corr(sf_dir: str):
    """Exact per-flag Pearson correlation of quantity vs price-in-cents
    (ops/agg.group_corr): integer cross-moment partials per block
    (zero-exchange combiner), arbitrary-precision driver merge, one
    correctly-rounded cast per float — bit-identical to the oracle's
    HUGEINT-sum formula at any block layout."""
    from ..ops.agg import group_corr

    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def to_ints(t: pa.Table) -> pa.Table:
        q = np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64)
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "qty": pa.array(q, pa.int64()),
                "price_cents": pa.array(cents, pa.int64()),
            }
        )

    return group_corr(
        li.map_batches(to_ints, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag"],
        "qty",
        "price_cents",
    )


def q_value_trend(sf_dir: str):
    """Exact per-type OLS trend of event value over time
    (ops/agg.group_linreg): y = value in integer cents regressed on
    x = epoch day — integer cross-moment partials per block
    (zero-exchange combiner), arbitrary-precision driver merge, one
    correctly-rounded cast per float — bit-identical to the oracle's
    HUGEINT-sum REGR_SLOPE/INTERCEPT/R2 formulas at any block layout."""
    from ..ops.agg import group_linreg

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def xy(t: pa.Table) -> pa.Table:
        # epoch day = floor(epoch_us / 86400e6); all ts are post-1970 so
        # integer floor-division == the oracle's CAST(ts AS DATE) diff
        us = pc.cast(t["ts"].combine_chunks(), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        cents = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "x": day,
                "y": pa.array(cents, pa.int64()),
            }
        )

    return group_linreg(
        ev.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        "x",
        "y",
    )


def q_user_twap(sf_dir: str):
    """Per-user TIME-weighted mean of value in cents
    (ops/window.time_weighted_avg): LOCF integral over irregular
    samples — Σ c·Δt / total-duration on ONE key-complete exchange,
    integer-exact numerator/denominator, one float division at the
    end; bit-identical to the SQL lead()-weighted HUGEINT oracle."""
    from ..ops.window import time_weighted_avg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "c": pa.array(c, pa.int64()),
            }
        )

    return time_weighted_avg(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        "ts",
        "event_id",
        "c",
    )


def q_daily_growth(sf_dir: str):
    """Period-over-period report: per type the day-over-day event-count
    delta and percent change. Counts via the zero-exchange combiner
    (ops/window.tumbling_window_agg, unit=day); the series itself is
    config-scale (days × types) by construction, so the lag/delta pass
    runs driver-side vectorized — the same altitude call as
    events_hourly_dense's dense grid. pct_change is ONE float division
    of exact ints, bit-identical to the oracle's CAST division; first
    day per type is null like SQL LAG."""
    from ..ops.window import tumbling_window_agg

    ev = _read(sf_dir, "events", ["ts", "event_type"])
    counts = tumbling_window_agg(
        ev, "ts", ["event_type"], [("n", "count_all", None)], unit="day"
    )
    idx = pc.sort_indices(
        counts,
        sort_keys=[("event_type", "ascending"), ("window_start", "ascending")],
    )
    s = counts.take(idx)
    types = np.asarray(s["event_type"].to_pylist())
    n = np.asarray(s["n"], dtype=np.int64)
    same = np.zeros(len(n), dtype=bool)
    same[1:] = types[1:] == types[:-1]
    prev = np.zeros_like(n)
    prev[1:] = n[:-1]
    delta = n - prev
    pct = np.zeros(len(n), dtype=np.float64)
    nz = same & (prev != 0)
    pct[nz] = (n[nz] - prev[nz]).astype(np.float64) / prev[nz].astype(
        np.float64
    )
    return pa.table(
        {
            "event_type": s["event_type"],
            "day": pc.cast(s["window_start"], pa.date32()),
            "n": pa.array(n, pa.int64()),
            "prev_n": pa.array(
                [int(p) if ok else None for p, ok in zip(prev, same)],
                pa.int64(),
            ),
            "delta": pa.array(
                [int(d) if ok else None for d, ok in zip(delta, same)],
                pa.int64(),
            ),
            "pct_change": pa.array(
                [float(x) if ok else None for x, ok in zip(pct, nz)],
                pa.float64(),
            ),
        }
    )


def q_shuffle_positions(sf_dir: str):
    """Seeded DETERMINISTIC global shuffle — training-order
    randomization that is reproducible across reruns and cluster
    shapes: order = md5(doc_id || seed), realized as ONE range-partition
    sort on the digest + zip_with_index; no RNG state, so resharding or
    resuming an epoch reproduces byte-identical order. Output:
    (shuffle_pos, doc_id)."""
    from ..stages.index import zip_with_index

    ds = _read(sf_dir, "documents", ["doc_id"])
    seed = "ep0"

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        h = [
            hashlib.md5(f"{i}-{seed}".encode()).hexdigest() for i in ids
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "h": pa.array(h, pa.string())}
        )

    hashed = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
    ranked = zip_with_index(hashed, ["h", "doc_id"], [False, False], rank_col="shuffle_pos")
    return ranked.map_batches(
        lambda t: t.select(["shuffle_pos", "doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_fuzzy_entity_join(sf_dir: str):
    """Record-linkage fuzzy join (ops/text.fuzzy_match_join): dirty
    entity names matched to canonical ones at Levenshtein ≤ 2 after
    first-character blocking — candidate generation is ONE
    key-complete exchange on the block, verify is the bit-parallel
    Myers kernel. Oracle: REAL SQL (same blocking predicate + DuckDB
    levenshtein) over the shared deterministic fixture."""
    from ..fixtures.synth import make_entity_names
    from ..ops.text import fuzzy_match_join

    canon, dirty = make_entity_names()
    left = ray.data.from_arrow(pa.Table.from_pylist(dirty))
    right = ray.data.from_arrow(pa.Table.from_pylist(canon))
    return fuzzy_match_join(
        left, right, id_col="id", s_col="s", max_dist=2, block_chars=2
    )


TRIM_PCT = 5


def q_value_trimmed_mean(sf_dir: str):
    """Robust (trimmed) mean of event value: drop the lowest and
    highest 5% BY GLOBAL RANK (exact integer cutoffs — floor(n·p/100)
    rows each side), average the kept middle in integer cents. ONE
    range-partition sort + zip_with_index; the kept-range filter and
    partial sums are block-local. Bit-identical to the SQL row_number
    oracle."""
    from ..stages.index import zip_with_index

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        return pa.table(
            {"event_id": t["event_id"], "c": pa.array(c, pa.int64())}
        )

    cds = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    ranked = zip_with_index(cds, ["c", "event_id"], [False, False], rank_col="i0")
    n_rows = sum(
        r["n"]
        for r in cds.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    k = n_rows * TRIM_PCT // 100
    lo, hi = k, n_rows - k  # keep ranks [lo, hi)

    def partial(t: pa.Table) -> pa.Table:
        i0 = np.asarray(t["i0"], dtype=np.int64)
        keep = (i0 >= lo) & (i0 < hi)
        c = np.asarray(t["c"], dtype=np.int64)[keep]
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "s": pa.array([int(c.sum())], pa.int64()),
            }
        )

    parts = ranked.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    nk = sum(r["n"] for r in parts)
    s = sum(r["s"] for r in parts)
    mean = float(np.float64(s) / np.float64(nk)) if nk else None
    return pa.table(
        {
            "n_total": pa.array([n_rows], pa.int64()),
            "n_kept": pa.array([nk], pa.int64()),
            "trimmed_mean_cents": pa.array([mean], pa.float64()),
        }
    )


def q_value_gini(sf_dir: str):
    """Concentration audit — Gini coefficient of per-user total value:
    the one-number skew check (is 1% of users 90% of the volume?) a
    curation/crawl-budget pass runs before partitioning by that key.
    Per-user totals on the sorted exchange → ONE global rank sort
    (stages/index.zip_with_index) → per-block integer partials of
    Σ(2i−1)·c with a loud overflow guard, arbitrary-precision driver
    merge; gini = (w − n·s)/(n·s) with one correctly-rounded cast per
    float — bit-identical to the SQL HUGEINT row_number oracle."""
    from ..ops.agg import sorted_group_agg
    from ..stages.index import zip_with_index

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        return pa.table(
            {"user_id": t["user_id"], "cents": pa.array(c, pa.int64())}
        )

    totals = sorted_group_agg(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("c", "sum", "cents")],
    )
    ranked = zip_with_index(totals, ["c", "user_id"], [False, False], rank_col="i0")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        c = np.asarray(t["c"], dtype=np.int64)
        i0 = np.asarray(t["i0"], dtype=np.int64)
        coef = 2 * i0 + 1
        prod = np.abs(c).astype(np.float64) * coef.astype(np.float64)
        if prod.max() * t.num_rows > float(1 << 62):
            raise ValueError(
                "value_gini: per-block Σ(2i−1)·c may overflow int64; "
                "shrink the block size or scale the value down"
            )
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(c.sum())], pa.int64()),
                "w": pa.array([int((coef * c).sum())], pa.int64()),
            }
        )

    parts = ranked.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(r["n"] for r in parts)
    s = sum(r["s"] for r in parts)
    w = sum(r["w"] for r in parts)
    gini = float(w - n * s) / float(n * s) if n and s else None
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def q_price_qty_skyline(sf_dir: str):
    """Skyline / Pareto-preference query (ops/agg.skyline2d): lineitems
    not dominated on (price_cents MAX, qty MIN) — the preference-query
    operator (VLDB'21 taxonomic-preference family; PAPERS.md). Two
    phases, ZERO exchanges: block-local skylines are a correctness-safe
    prune (a row dominated within one block cannot be global), only the
    per-block Pareto frontiers reach the driver for the final pass."""
    from ..ops.agg import skyline2d

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        qty = np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64)
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "qty": pa.array(qty, pa.int64()),
                "price_cents": pa.array(cents, pa.int64()),
            }
        )

    return skyline2d(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "price_cents",
        "qty",
    )


def q_view_click_overlap(sf_dir: str):
    """Interval-overlap join (ops/join.interval_overlap_join): per user
    every (view, click) pair whose 30-minute activity windows
    intersect — the overlap predicate the equi/as-of/range family
    can't express. ONE key-complete exchange; per-key searchsorted
    prefix + end-mask, no all-pairs."""
    from ..ops.join import interval_overlap_join

    W = 1_800_000_000  # 30 min in us

    def side(event_type: str):
        def fn(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["event_type"], event_type))
            us = pc.cast(f["ts"].combine_chunks(), pa.int64())
            return pa.table(
                {
                    "user_id": f["user_id"],
                    "_s": us,
                    "_e": pc.add(us, pa.scalar(W, pa.int64())),
                    "_id": f["event_id"],
                }
            )

        return fn

    ev = lambda: _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    left = ev().map_batches(side("view"), batch_format="pyarrow", zero_copy_batch=True)
    right = ev().map_batches(side("click"), batch_format="pyarrow", zero_copy_batch=True)
    return interval_overlap_join(left, right, "user_id")


def q_cumulative_users(sf_dir: str):
    """Running audience growth: per day the number of NEW users (first
    touch) and the CUMULATIVE distinct users to date. First-touch =
    min(day) per user on the sorted exchange; the per-day series is
    config-scale, so the running sum is one driver-side cumsum of
    exact ints — the standard two-phase shape for running COUNT
    (DISTINCT) OVER, which no streaming aggregate can do directly."""
    from ..ops.agg import sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(t["ts"].combine_chunks(), pa.int64()))
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pa.array(us // 86_400_000_000, pa.int64()),
            }
        )

    first = sorted_group_agg(
        ev.map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("first_day", "min", "day")],
    )
    counts: dict[int, int] = {}
    for r in first.map_batches(
        lambda t: pa.table(
            {
                "first_day": t["first_day"],
                "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        ).group_by(["first_day"]).aggregate([("n", "sum")]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all():
        counts[r["first_day"]] = counts.get(r["first_day"], 0) + r["n_sum"]
    rows, cum = [], 0
    for day in sorted(counts):
        cum += counts[day]
        rows.append(
            {
                "day": day,
                "n_new_users": counts[day],
                "cum_users": cum,
            }
        )
    return pa.Table.from_pylist(rows)


def q_type_drift(sf_dir: str):
    """Distribution-drift audit: the event-type mix of the data's first
    time-half vs its second (corpus drift detection before a training
    refresh). ONE combiner pass finds the global (min,max) ts, the
    split point is exact integer midpoint; a second combiner pass
    counts per (type, half) — zero exchanges. Shares and the per-type
    KL contribution p·log2(p/q) are floats computed from EXACT integer
    counts in one fixed expression — bit-identical to the sequential
    Counter oracle (expected.expected_type_drift); a type absent from
    either half yields null kl_term."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def ts_range(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64())}
            )
        us = pc.cast(t["ts"].combine_chunks(), pa.int64())
        return pa.table(
            {
                "mn": pa.array([pc.min(us).as_py()], pa.int64()),
                "mx": pa.array([pc.max(us).as_py()], pa.int64()),
            }
        )

    parts = ev.map_batches(
        ts_range, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    mid = (min(r["mn"] for r in parts) + max(r["mx"] for r in parts)) // 2

    def with_half(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(t["ts"].combine_chunks(), pa.int64()))
        return pa.table(
            {
                "event_type": t["event_type"],
                "half": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    counts = partial_group_agg(
        ev.map_batches(with_half, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "half"],
        [("n", "count_all", None)],
    )
    first: dict[str, int] = {}
    second: dict[str, int] = {}
    for r in counts.to_pylist():
        (second if r["half"] else first)[r["event_type"]] = r["n"]
    ta, tb = sum(first.values()), sum(second.values())
    rows = []
    for ty in sorted(set(first) | set(second)):
        a, b = first.get(ty, 0), second.get(ty, 0)
        sa = float(np.float64(a) / np.float64(ta)) if ta else None
        sb = float(np.float64(b) / np.float64(tb)) if tb else None
        kl = (
            float(np.float64(sa) * np.log2(np.float64(sa) / np.float64(sb)))
            if a and b
            else None
        )
        rows.append(
            {
                "event_type": ty,
                "n_first": a,
                "n_second": b,
                "share_first": sa,
                "share_second": sb,
                "kl_term": kl,
            }
        )
    return pa.Table.from_pylist(rows)


KMV_K = 64


def q_audience_overlap(sf_dir: str):
    """Pairwise audience-overlap estimates between event types via KMV
    theta sketches (ops/agg.kmv_sketches → kmv_estimate_intersections):
    k smallest distinct user-hashes per type build in ONE zero-exchange
    streaming pass (order-invariant merge-k combiner), then the
    standard θ-combine estimates |A∩B| — the scale answer to "how many
    users did BOTH" that exact counting needs a shuffle for."""
    from ..ops.agg import kmv_estimate_intersections, kmv_sketches

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    sk = kmv_sketches(ev, "event_type", "user_id", k=KMV_K)
    return kmv_estimate_intersections(sk, k=KMV_K)


def q_ab_lift(sf_dir: str):
    """Experiment-analysis report: purchase-conversion lift between the
    two deterministic user-parity cohorts, with the two-proportion
    z-score — the A/B readout an eval pass runs on engagement data.
    Per-user conversion on the sorted exchange, cohort counts via the
    zero-exchange combiner; every float is one fixed expression over
    exact ints (rate, lift, pooled-p z) matching the SQL oracle's op
    order to the bit."""
    from ..ops.agg import partial_group_agg, sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def conv_ind(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "is_conv": pc.cast(
                    pc.equal(t["event_type"], "purchase"), pa.int64()
                ),
            }
        )

    per_user = sorted_group_agg(
        ev.map_batches(conv_ind, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("conv", "max", "is_conv")],
    )

    def grp(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"], dtype=np.int64)
        return pa.table(
            {
                "grp": pa.array(uid % 2, pa.int64()),
                "one": pa.array(np.ones(len(uid), np.int64), pa.int64()),
                "conv": t["conv"],
            }
        )

    agg = partial_group_agg(
        per_user.map_batches(grp, batch_format="pyarrow", zero_copy_batch=True),
        ["grp"],
        [("n", "sum", "one"), ("c", "sum", "conv")],
    )
    rows = {r["grp"]: r for r in agg.to_pylist()}
    na, ca = rows[0]["n"], rows[0]["c"]
    nb, cb = rows[1]["n"], rows[1]["c"]
    f = np.float64
    rate_a = f(ca) / f(na)
    rate_b = f(cb) / f(nb)
    lift = rate_b - rate_a
    p = f(ca + cb) / f(na + nb)
    z = lift / np.sqrt(p * (f(1.0) - p) * (f(1.0) / f(na) + f(1.0) / f(nb)))
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "conv_a": pa.array([ca], pa.int64()),
            "conv_b": pa.array([cb], pa.int64()),
            "rate_a": pa.array([float(rate_a)], pa.float64()),
            "rate_b": pa.array([float(rate_b)], pa.float64()),
            "lift": pa.array([float(lift)], pa.float64()),
            "z_score": pa.array([float(z)], pa.float64()),
        }
    )


def q_value_mean_ci(sf_dir: str):
    """Poisson-bootstrap 95% CI for the mean event value in cents
    (ops/agg.poisson_bootstrap_mean): content-stable splitmix64 per-row
    Poisson(1) replicate weights → exact-int combiner partials, the
    whole B=50-replicate bootstrap in ONE streaming pass — the
    resampling scheme that works when data never fits one machine.
    Sequential oracle recomputes the identical replicates."""
    from ..ops.agg import poisson_bootstrap_mean

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        return pa.table(
            {"event_id": t["event_id"], "c": pa.array(c, pa.int64())}
        )

    return poisson_bootstrap_mean(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "event_id",
        "c",
        reps=50,
    )


def q_value_ranksum(sf_dir: str):
    """Mann-Whitney U rank-sum test: do the two user-parity cohorts
    draw event values from the same distribution? (The nonparametric
    sibling of ab_lift's proportion z.) Exact integer machinery end to
    end: per-(value, cohort) counts via the zero-exchange combiner
    (value domain in cents is config-scale — for unbounded domains
    route through sorted_group_agg), min-ranks by prefix sums over the
    sorted domain, doubled midranks (2·mn + t − 1) stay integers under
    ties, tie-corrected σ from Σ(t³−t); floats are one fixed
    expression matching the SQL oracle bit-for-bit."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        uid = np.asarray(t["user_id"], dtype=np.int64)
        return pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "grp": pa.array(uid % 2, pa.int64()),
            }
        )

    counts = partial_group_agg(
        ev.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        ["c", "grp"],
        [("t", "count_all", None)],
        max_groups=1 << 20,
    )
    by_c: dict[int, list[int]] = {}
    for r in counts.to_pylist():
        a = by_c.setdefault(r["c"], [0, 0])
        a[r["grp"]] += r["t"]
    n_a = n_b = 0
    r2a = 0  # Σ over cohort-A rows of 2·midrank (exact int)
    tie3 = 0  # Σ (t³ − t)
    seen = 0
    for c in sorted(by_c):
        ta, tb = by_c[c]
        t = ta + tb
        mn = seen + 1  # min-rank of this value
        r2a += ta * (2 * mn + t - 1)
        tie3 += t * t * t - t
        n_a += ta
        n_b += tb
        seen += t
    N = n_a + n_b
    f = np.float64
    u_a = (f(r2a) - f(n_a * (n_a + 1))) / f(2.0)  # R_a − n_a(n_a+1)/2
    mean_u = f(n_a) * f(n_b) / f(2.0)
    var_u = (
        f(n_a) * f(n_b) / f(12.0)
        * (f(N + 1) - f(tie3) / (f(N) * f(N - 1)))
    )
    z = (u_a - mean_u) / np.sqrt(var_u)
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "u_a": pa.array([float(u_a)], pa.float64()),
            "z_score": pa.array([float(z)], pa.float64()),
        }
    )


def q_bitmap_distinct_users(sf_dir: str):
    """Exact distinct users per type via the ZERO-exchange bitmap
    combiner (ops/agg.group_bitmap_distinct) — the bounded-int-domain
    alternate to distinct_users_per_type's sorted exchange: per-block
    OR-able bitmaps move once, rows never shuffle. Same answer as SQL
    COUNT(DISTINCT), different (cheaper) plan for dense id spaces."""
    from ..ops.agg import group_bitmap_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return group_bitmap_distinct(ev, "event_type", "user_id", domain_size=1 << 20)


def q_user_entropy_by_type(sf_dir: str):
    """Per-type Shannon entropy (bits) of the user-id distribution —
    audience diversity (ops/agg.group_entropy): exact (type,user)
    counts on the sorted exchange, then ORDER-INVARIANT integer
    fixed-point term sums (round(c·log2 c·2²⁰) — quantization is part
    of the operator definition) so the float appears only in the final
    per-type expression; bit-identical at any block layout and to the
    sequential oracle (expected.expected_user_entropy)."""
    from ..ops.agg import group_entropy

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return group_entropy(ev, ["event_type"], "user_id")


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 analog — per-nation revenue where customer and supplier
    share the nation, region-filtered, one-year order window. The
    6-table join matrix in ONE composition, each side handled at its
    honest scale: nation⋈region resolved driver-side (config-scale
    dims), the two data-scale joins (orders⋈customer on custkey,
    lineitem⋈on orderkey) on the task-based key-complete exchange, the
    supplier→nation probe BROADCAST once (pool-scale dim; vectorized
    searchsorted per block, no third exchange), revenue in exact
    integer cents via a zero-exchange combiner."""
    from ..ops.agg import partial_group_agg
    from ..ops.join import sort_merge_inner_join

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    asia = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == "ASIA"
    }
    nkey_to_name = {
        r["n_nationkey"]: r["n_name"]
        for r in nat.to_pylist()
        if r["n_regionkey"] in asia
    }
    asia_keys = pa.array(sorted(nkey_to_name), pa.int64())

    # customer is a DIMENSION (TPC-H: SF·150k rows of two ints) —
    # broadcast the custkey→nationkey probe once instead of a third
    # key-complete exchange, with the engine's standard ≤1 GiB bound;
    # past the bound fall back to sort_merge_inner_join(ord_f, cust).
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    if cust_tbl.nbytes > (1 << 30):
        raise ValueError(
            "q_local_supplier_revenue: customer dim exceeds the 1 GiB "
            "broadcast bound — route through sort_merge_inner_join"
        )
    c_order = np.argsort(np.asarray(cust_tbl["c_custkey"], dtype=np.int64))
    c_keys = ray.put(np.asarray(cust_tbl["c_custkey"], dtype=np.int64)[c_order])
    c_nats = ray.put(
        np.asarray(cust_tbl["c_nationkey"], dtype=np.int64)[c_order]
    )
    asia_np = np.asarray(asia_keys)
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def orders_probe(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo),
                pc.less(t["o_orderdate"], hi),
            )
        )
        keys, nats = ray.get(c_keys), ray.get(c_nats)
        ck = np.asarray(f["o_custkey"], dtype=np.int64)
        ix = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        nat = np.where(keys[ix] == ck, nats[ix], -1)
        keep = np.isin(nat, asia_np)
        return pa.table(
            {
                "l_orderkey": f["o_orderkey"].combine_chunks().filter(
                    pa.array(keep)
                ),
                "c_nationkey": pa.array(nat[keep], pa.int64()),
            }
        )

    oc = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_probe, batch_format="pyarrow", zero_copy_batch=True)

    def li_cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        d = np.asarray(t["l_discount"], dtype=np.float64)
        cents = np.floor(p * (1.0 - d) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_cents, batch_format="pyarrow", zero_copy_batch=True)
    lioc = sort_merge_inner_join(
        li, oc, "l_orderkey", ["l_suppkey", "cents"], ["c_nationkey"]
    )

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    s_order = np.argsort(np.asarray(sup["s_suppkey"], dtype=np.int64))
    s_keys = ray.put(np.asarray(sup["s_suppkey"], dtype=np.int64)[s_order])
    s_nats = ray.put(np.asarray(sup["s_nationkey"], dtype=np.int64)[s_order])

    def local_only(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(s_keys), ray.get(s_nats)
        sk = np.asarray(t["l_suppkey"], dtype=np.int64)
        ix = np.searchsorted(keys, sk)
        ix = np.clip(ix, 0, len(keys) - 1)
        s_nat = np.where(keys[ix] == sk, nats[ix], -1)
        keep = s_nat == np.asarray(t["c_nationkey"], dtype=np.int64)
        return pa.table(
            {
                "n_nationkey": pa.array(s_nat[keep], pa.int64()),
                "cents": t["cents"].combine_chunks().filter(pa.array(keep)),
            }
        )

    local = lioc.map_batches(
        local_only, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial_group_agg(
        local, ["n_nationkey"], [("revenue_cents", "sum", "cents")]
    )
    rows = sorted(
        (
            {"n_name": nkey_to_name[r["n_nationkey"]],
             "revenue_cents": r["revenue_cents"]}
            for r in agg.to_pylist()
        ),
        key=lambda r: (-r["revenue_cents"], r["n_name"]),
    )
    if not rows:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows)


def q_max_value_event_per_type(sf_dir: str):
    """MAX_BY / ARG_MAX: per event_type the event carrying the maximum
    value (event_id tiebreak) — group_top_k with k=1, one key-complete
    exchange."""
    from ..ops.agg import group_top_k

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    top = group_top_k(ev, "event_type", ["value", "event_id"], [True, False], k=1)
    return top.map_batches(
        lambda t: t.select(["event_type", "event_id", "value"]),
        batch_format="pyarrow",
    )


FUZZY_PREFIX = 32
FUZZY_MAX_DIST = 10


def q_fuzzy_search(sf_dir: str):
    """Typo-tolerant snippet lookup: the 32-byte prefixes of docs 0 and
    1, each with chars 3/4 transposed (a planted typo), searched
    against every document's prefix by bit-parallel Myers Levenshtein
    (ops/text.edit_distance_search — one vectorized uint64 pass per
    pattern per block, no per-row DP). Hits within distance 10."""
    from ..ops.text import edit_distance_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    seed_rows = {
        r["doc_id"]: (r["text"] or "")[:FUZZY_PREFIX]
        for r in docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    }
    patterns = [
        p[:2] + p[3] + p[2] + p[4:] if len(p) >= 4 else p
        for p in (seed_rows[0], seed_rows[1])
    ]
    return edit_distance_search(
        docs,
        patterns,
        prefix_len=FUZZY_PREFIX,
        max_dist=FUZZY_MAX_DIST,
    )


def q_events_hourly_dense(sf_dir: str):
    """Gap-filled hourly series: per-(type, hour) counts zero-filled
    over the FULL dense grid (every type × every hour between the
    global min and max) — the densify step a charting/forecasting
    consumer needs. Counts are the zero-exchange combiner
    (partial_group_agg); the grid is metadata-scale (types × hours),
    built driver-side from two tiny min/max partials and left-joined
    in one vectorized pandas merge. No shuffle anywhere."""
    from ..ops.agg import partial_group_agg

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def with_hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour_start": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    hourly = ev.map_batches(with_hour, batch_format="pyarrow", zero_copy_batch=True)
    counts = partial_group_agg(
        hourly,
        ["event_type", "hour_start"],
        [("n_events", "count_all", None)],
    )
    bounds = partial_group_agg(
        hourly.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        ),
        ["one"],
        [("h0", "min", "hour_start"), ("h1", "max", "hour_start")],
    )
    h0 = bounds["h0"][0].as_py()
    h1 = bounds["h1"][0].as_py()
    hours = np.arange(
        np.datetime64(h0, "us"),
        np.datetime64(h1, "us") + np.timedelta64(1, "h"),
        np.timedelta64(1, "h"),
    )
    types = sorted(set(counts["event_type"].to_pylist()))
    grid = pa.table(
        {
            "event_type": pa.array(np.repeat(types, len(hours)), pa.string()),
            "hour_start": pa.array(
                np.tile(hours, len(types)), pa.timestamp("us")
            ),
        }
    )
    merged = (
        grid.to_pandas()
        .merge(counts.to_pandas(), on=["event_type", "hour_start"], how="left")
        .fillna({"n_events": 0})
    )
    merged["n_events"] = merged["n_events"].astype("int64")
    return pa.Table.from_pandas(merged, preserve_index=False)


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-15"


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 analog (shipping priority) in ONE exchange: the
    segment-filtered custkey set broadcasts once (ray.put +
    searchsorted membership inside map_batches — the star-schema
    broadcast pattern of q_orders_per_nation, with the sort-merge semi
    join as the over-budget fallback), date-filtered lineitems
    equi-join the surviving orders on the key-complete exchange, and
    because that exchange leaves every orderkey whole in one block,
    the per-(order, date) revenue aggregate and the top-10 partials
    are BLOCK-LOCAL — only ≤10 rows per block reach the driver.
    Revenue rounds per line like the oracle (round(price·(1−disc)·100),
    half away from zero) so the cents sums are merge-order-proof."""
    from ..ops.join import sort_merge_inner_join, sort_merge_semi_join

    cut = np.datetime64(Q3_CUTOFF + "T00:00:00", "us")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust_tbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    if cust_tbl.nbytes <= BROADCAST_DIM_BYTES:
        keep = pc.equal(cust_tbl["c_mktsegment"], Q3_SEGMENT)
        keys_ref = ray.put(
            np.sort(
                np.asarray(cust_tbl.filter(keep)["c_custkey"], dtype=np.int64)
            )
        )

        def order_filter(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
            ks = ray.get(keys_ref)  # plasma-local after first batch
            oc = np.asarray(t["o_custkey"], dtype=np.int64)
            pos = np.minimum(np.searchsorted(ks, oc), len(ks) - 1)
            return t.select(["o_orderkey", "o_orderdate"]).filter(
                pa.array(ks[pos] == oc)
            )

        orders = orders.map_batches(
            order_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    else:  # data-scale dimension: fall back to the sort-merge semi join
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        keys = cust.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t.filter(
                        pc.equal(t["c_mktsegment"], Q3_SEGMENT)
                    )["c_custkey"]
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        orders = sort_merge_semi_join(
            orders.map_batches(
                lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cut))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            keys,
            "o_custkey",
        ).map_batches(
            lambda t: t.select(["o_orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def line_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        p = np.asarray(t["l_extendedprice"], dtype=np.float64)
        d = np.asarray(t["l_discount"], dtype=np.float64)
        rev = np.floor(p * (1 - d) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": pa.array(rev, pa.int64())}
        )

    joined = sort_merge_inner_join(
        li.map_batches(line_cents, batch_format="pyarrow", zero_copy_batch=True),
        orders,
        "l_orderkey",
        ["rev"],
        ["o_orderdate"],
        right_key="o_orderkey",
    )

    def block_top10(t: pa.Table) -> pa.Table:
        # the join exchange is key-complete on l_orderkey, so the
        # group-by and the top-k partial are exact block-local
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["l_orderkey", "o_orderdate"]).aggregate([("rev", "sum")])
        g = pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "o_orderdate": g["o_orderdate"],
                "revenue_cents": g["rev_sum"],
            }
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
        )
        return g.take(idx.slice(0, 10))

    partials = joined.map_batches(
        block_top10, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    top = pa.Table.from_pylist(
        partials,
        schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )
    idx = pc.sort_indices(
        top,
        sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")],
    )
    return top.take(idx.slice(0, 10))


def q_value_outliers(sf_dir: str):
    """Per-group IQR outlier fence (Tukey 1.5·IQR) — the robust-stats
    admission filter: exact q25/q75 per event_type on the quantile
    exchange (10 rows), fences computed driver-side with the oracle's
    exact float op order (t = q3−q1; lo = q1 − 1.5·t; hi = q3 + 1.5·t),
    broadcast into a block-local vectorized filter (index_in code
    lookup, no per-row Python). Two-phase like
    quality_percentile_filter, but per-key."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    q = group_quantiles(ev, "event_type", "value", percents=(25, 75)).take_all()
    qs: dict[str, dict[int, float]] = {}
    for row in q:
        qs.setdefault(row["event_type"], {})[row["pct"]] = row["value"]
    types = sorted(qs)
    lo_v, hi_v = [], []
    for t in types:
        q1, q3 = qs[t][25], qs[t][75]
        iqr = q3 - q1
        lo_v.append(q1 - 1.5 * iqr)
        hi_v.append(q3 + 1.5 * iqr)
    type_arr = pa.array(types, pa.string())
    lo_arr = np.asarray(lo_v, dtype=np.float64)
    hi_arr = np.asarray(hi_v, dtype=np.float64)

    def keep(t: pa.Table) -> pa.Table:
        codes = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        v = np.asarray(t["value"], dtype=np.float64)
        mask = (v < lo_arr[codes]) | (v > hi_arr[codes])
        return t.select(["event_id", "event_type", "value"]).filter(
            pa.array(mask)
        )

    return ev.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def q_event_lag_lead(sf_dir: str):
    """LAG/LEAD(value) OVER (PARTITION BY user ORDER BY ts, id) — the
    neighbor-value window pair (null at partition edges) as null-masked
    take-indices on the key-complete exchange (ops/window.lag_lead)."""
    from ..ops.window import lag_lead

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return lag_lead(ev, "user_id", ["ts", "event_id"], "event_id", "value")


def q_event_rank_ties(sf_dir: str):
    """RANK / DENSE_RANK OVER (PARTITION BY event_type ORDER BY
    user_id) — the tie-aware rank half (ops/window.rank_with_ties);
    user_id repeats within a type so tie runs are real. Only rn uses
    the event_id tiebreak."""
    from ..ops.window import rank_with_ties

    ev = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    return rank_with_ties(ev, "event_type", "user_id", "event_id")


def q_user_first_last(sf_dir: str):
    """First/last-touch attribution: per user the first and last
    event_type by (ts, event_id) plus the row count, one row per user
    (ops/window.group_first_last on the key-complete exchange)."""
    from ..ops.window import group_first_last

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return group_first_last(ev, "user_id", ["ts", "event_id"], "event_type")


def q_value_fill_forward(sf_dir: str):
    """LOCF gap repair: values nulled on a deterministic mask
    (event_id % 7 == 3), then forward-filled per user in (ts, id)
    order (ops/window.fill_forward); leading nulls stay null. The mask
    is shared with the SQL oracle so both sides repair the same gaps."""
    from ..ops.window import fill_forward

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"], dtype=np.int64)
        mask = (ids % 7) == 3
        vals = np.asarray(t["value"], dtype=np.float64)
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pa.array(vals, pa.float64(), mask=mask),
        )

    return fill_forward(
        ev.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        ["ts", "event_id"],
        "event_id",
        "value",
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (ops/agg.group_count_distinct): one sorted-distinct exchange over
    the (type, user) pairs, then the zero-exchange combiner count —
    the hard-count twin of hll_users_by_type."""
    from ..ops.agg import group_count_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return group_count_distinct(ev, "event_type", "user_id")


def q_user_modal_type(sf_dir: str):
    """Per-user modal event_type (most frequent; ties broken by the
    lexicographically smallest type) — the categorical mode aggregate,
    composed as per-(user, type) counts on the sorted group-aggregate
    chained into the per-group rank (k=1). Two exchanges, both
    key-complete."""
    from ..ops.agg import group_top_k, sorted_group_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = sorted_group_agg(
        ev, ["user_id", "event_type"], [("n_events", "count_all", None)]
    )
    top = group_top_k(
        counts, "user_id", ["n_events", "event_type"], [True, False], k=1
    )
    return top.map_batches(
        lambda t: t.select(["user_id", "event_type", "n_events"]),
        batch_format="pyarrow",
    )


def q_top_users_per_type(sf_dir: str):
    """Two chained exchanges — per-(type, user) counts on the sorted
    group-aggregate, then per-type top-3 users on the key-complete
    rank — the heavy-hitters-per-segment composition (who dominates
    each event type). Tiebreak (count desc, user asc) is total."""
    from ..ops.agg import group_top_k, sorted_group_agg

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    counts = sorted_group_agg(
        ev, ["event_type", "user_id"], [("n_events", "count_all", None)]
    )
    top = group_top_k(
        counts, "event_type", ["n_events", "user_id"], [True, False], k=3
    )
    return top.map_batches(
        lambda t: t.select(["event_type", "user_id", "n_events", "rn"]),
        batch_format="pyarrow",
    )


def q_event_ranks(sf_dir: str):
    """The rank window-function family — ROW_NUMBER / PERCENT_RANK /
    NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) —
    on the key-complete exchange (ops/window.rank_window). The
    tiebreak makes the order total, so even the float percent_rank is
    an exact ratio reproducible at any parallelism."""
    from ..ops.window import rank_window

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return rank_window(ev, "event_type", "value", "event_id", n_tiles=4)


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets in one
    streaming pass (ops/agg.cube_agg — in-task set fan-out, zero
    exchange)."""
    from ..ops.agg import cube_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def with_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.strftime(t["ts"], format="%Y-%m-%d"))

    return cube_agg(
        ev.map_batches(with_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"],
        [("n_events", "count_all", None), ("max_value", "max", "value")],
    )


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of event values (vectorized binning +
    zero-exchange combiner; edge bins clip out-of-range)."""
    from ..ops.agg import value_histogram

    return value_histogram(
        _read(sf_dir, "events", ["value"]), "value", lo=0.0, hi=500.0, nbins=20
    )


def q_events_sliding(sf_dir: str):
    """Hopping-window aggregate: 60-min windows every 30 min × type —
    each event fans out to its 2 containing windows inside the map task;
    only (window, type) partials leave it (ops/window
    .hopping_window_agg)."""
    from ..ops.window import hopping_window_agg

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    return hopping_window_agg(
        ev,
        "ts",
        ["event_type"],
        [
            ("n_events", "count_all", None),
            ("max_value", "max", "value"),
        ],
        size_minutes=60,
        hop_minutes=30,
    )


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: hourly event windows × type, counts +
    exact min/max — the window derive is a vectorized floor_temporal and
    the aggregate is the zero-exchange combiner (ops/window
    .tumbling_window_agg; windows are just another group key)."""
    from ..ops.window import tumbling_window_agg

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    return tumbling_window_agg(
        ev,
        "ts",
        ["event_type"],
        [
            ("n_events", "count_all", None),
            ("min_value", "min", "value"),
            ("max_value", "max", "value"),
        ],
        unit="hour",
    )


def q_top_bigrams(sf_dir: str):
    """LM-style n-gram statistics: exact global top-K word bigrams —
    same combiner→sort-exchange→top-K shape as top_terms; bigrams never
    cross documents (ops/text.top_ngrams)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.top_ngrams(ds, n=2, k=TOP_TERMS_K)


PMI_MIN_COUNT = 5
PMI_TOP_K = 30


def q_bigram_pmi(sf_dir: str):
    """Collocation mining: top bigrams by pointwise mutual information
    (PMI) with a support floor — the phrase detector a tokenizer/
    vocab pipeline runs before merging multiword units. Exact integer
    counts end to end (bigram + unigram counts on the sorted exchange,
    unigram counts joined BACK per side via sort-merge — no broadcast-
    vocab assumption), PMI = log2 of ONE exact-int ratio per surviving
    bigram (DuckDB log2 verified bit-equal to np.log2 on this host)."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join
    from ..ops.text import _doc_term_freqs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        # vectorized adjacency (ops/text.top_ngrams kernel shape):
        # a bigram starts at i iff token rows i, i+1 share one doc;
        # per-block (w1,w2) partial counts cut the exchange from
        # token-bigram rows to block-distinct rows (combiner pattern)
        empty = pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), np.diff(offsets)
        )
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = pa.array(r[1:] == r[:-1])
        pairs = pa.table(
            {
                "w1": f.slice(0, m - 1).filter(same),
                "w2": f.slice(1, m - 1).filter(same),
            }
        )
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "cnt": g["count_all"]})

    def term_rows(t: pa.Table) -> pa.Table:
        # (term, tf) partials straight from the per-doc freq kernel —
        # no row repetition; the exchange sums partials
        if t.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        tf = _doc_term_freqs(t, "text", "doc_id")
        g = pa.table({"term": tf["term"], "cnt": tf["tf"]}).group_by(
            ["term"]
        ).aggregate([("cnt", "sum")])
        return pa.table({"term": g["term"], "cnt": g["cnt_sum"]})

    pair_ds = ds.map_batches(
        bigram_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    big = sorted_group_agg(
        pair_ds, ["w1", "w2"], [("c_xy", "sum", "cnt")]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_xy"], PMI_MIN_COUNT)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    uni = sorted_group_agg(
        ds.map_batches(term_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        [("c", "sum", "cnt")],
    )
    j1 = sort_merge_inner_join(
        big.map_batches(
            lambda t: pa.table(
                {"term": t["w1"], "w2": t["w2"], "c_xy": t["c_xy"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        uni,
        "term",
        ["w2", "c_xy"],
        ["c"],
    ).map_batches(
        lambda t: pa.table(
            {"term": t["w2"], "w1_c": t["c"], "c_xy": t["c_xy"], "w1": t["term"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j2 = sort_merge_inner_join(j1, uni, "term", ["w1", "w1_c", "c_xy"], ["c"])
    rows = j2.take_all()  # post-floor collocation set: config-scale
    n_uni = sum(
        r["c"] for r in uni.map_batches(
            lambda t: pa.table({"c": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    n_bi = sum(
        r["n"] for r in pair_ds.map_batches(
            # pair_ds rows are (w1,w2,cnt) partials: total bigram tokens
            # is the cnt sum, not the row count
            lambda t: pa.table(
                {"n": pa.array([pc.sum(t["cnt"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    out = []
    for r in rows:
        num = r["c_xy"] * n_uni * n_uni
        den = n_bi * r["w1_c"] * r["c"]
        # math.log2 (libm) is bit-identical to DuckDB log2; numpy's
        # SIMD np.log2 drifts a ulp on ~5% of inputs (measured). The
        # float(int) casts mirror the oracle's CAST(... AS DOUBLE) pair.
        pmi = math.log2(float(num) / float(den))
        out.append(
            {
                "bigram": f"{r['w1']} {r['term']}",
                "c_xy": r["c_xy"],
                "pmi": pmi,
            }
        )
    out.sort(key=lambda x: (-x["pmi"], x["bigram"]))
    return pa.Table.from_pylist(out[:PMI_TOP_K])


KN_DISCOUNT = 0.75


def q_kn_bigram_lm(sf_dir: str):
    """Distributed n-gram LM training: interpolated Kneser-Ney bigram
    probabilities — p(w2|w1) = (max(c−d,0) + d·N1+(w1·)·pcont(w2)) / c(w1·)
    with pcont(w2) = N1+(·w2)/N1+(··), d = 0.75. ALL counts are exact
    integers off ONE (w1,w2) sorted exchange (the bigram table), its
    by-w1 / by-w2 marginals are two narrow re-aggregations joined back
    by sort-merge, and the probability is a single shared float
    expression — bit-identical to the REAL SQL oracle (same op order:
    ((d·n1f)·n1b)/B, then +max-term, then /c1)."""
    from ..ops.agg import sorted_group_agg
    from ..ops.window import attach_group_agg

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = pa.array(r[1:] == r[:-1])
        pairs = pa.table(
            {"w1": f.slice(0, m - 1).filter(same), "w2": f.slice(1, m - 1).filter(same)}
        )
        # combiner-before-exchange: per-block (w1,w2) partial counts cut
        # the exchange from token-bigram rows to block-distinct rows
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "c": g["count_all"]})

    cb = sorted_group_agg(
        ds.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"],
        [("n", "sum", "c")],
    )
    n_bigrams = sum(
        r["b"]
        for r in cb.map_batches(
            lambda t: pa.table({"b": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    )
    # marginals ATTACHED on two key-complete exchanges
    # (ops/window.attach_group_agg) — the aggregate-then-join-back plan
    # paid five exchanges (two marginal aggs + two joins on top of cb)
    w1s = attach_group_agg(
        cb, "w1", [("c1", "sum", "n"), ("n1f", "count_all", None)]
    )
    full = attach_group_agg(w1s, "w2", [("n1b", "count_all", None)])
    d = KN_DISCOUNT
    B = float(n_bigrams)

    def prob(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()), "p_kn": pa.array([], pa.float64())}
            )
        n = np.asarray(t["n"], dtype=np.float64)
        c1 = np.asarray(t["c1"], dtype=np.float64)
        n1f = np.asarray(t["n1f"], dtype=np.float64)
        n1b = np.asarray(t["n1b"], dtype=np.float64)
        p = (np.maximum(n - d, 0.0) + ((d * n1f) * n1b) / B) / c1
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"],
             "n": pc.cast(t["n"], pa.int64()), "p_kn": pa.array(p, pa.float64())}
        )

    return full.map_batches(prob, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_length_histogram(sf_dir: str):
    """Per-(lang, log2-length-bucket) doc histogram — the length-
    distribution panel of a corpus report (spot truncation spikes and
    boilerplate walls before training). The bucket is the BIT LENGTH of
    n_chars+1 (np.frexp exponent == DuckDB length(bin(x)) — exact
    integer, no float log anywhere); ONE zero-exchange combiner pass."""
    from ..ops.agg import partial_group_agg

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        n = np.asarray(
            pc.coalesce(t["n_chars"], 0), dtype=np.int64
        )
        bucket = np.frexp((n + 1).astype(np.float64))[1].astype(np.int64)
        return pa.table(
            {
                "lang": t["lang"],
                "len_bucket": pa.array(bucket, pa.int64()),
                "n_chars": pa.array(n, pa.int64()),
            }
        )

    return partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "len_bucket"],
        [("n_docs", "count_all", None), ("sum_chars", "sum", "n_chars")],
    )


ORACLE_SQL["doc_length_histogram"] = (
    "WITH d AS (SELECT lang, "
    "  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_chars, "
    "  CAST(length(bin(CAST(coalesce(n_chars, 0) AS BIGINT) + 1)) AS BIGINT) "
    "    AS len_bucket FROM documents) "
    "SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS n_docs, "
    "  CAST(sum(n_chars) AS BIGINT) AS sum_chars "
    "FROM d GROUP BY lang, len_bucket"
)


def q_lexical_diversity(sf_dir: str):
    """Per-language lexical-diversity report: vocabulary size, hapax-
    legomenon count/fraction, and corpus type-token ratio — the vocab-
    growth health check a tokenizer/corpus build runs next to Zipf
    (zipf_slope) and fertility (tokenizer_fertility). Per-batch partial
    (lang, term) counts ride ONE term-colocating exchange; the per-lang
    rollup is a second, vocabulary-sized exchange; the two ratios are
    single IEEE divisions of exact ints — bit-equal to the SQL CASTs."""
    from ..ops.agg import sorted_group_agg

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"lang": pa.array([], pa.string()),
             "term": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        langs = t["lang"].combine_chunks().take(pa.array(doc_of[keep]))
        g = (
            pa.table({"lang": langs, "term": flat.filter(pa.array(keep))})
            .group_by(["lang", "term"])
            .aggregate([("term", "count")])
        )
        return pa.table(
            {"lang": g["lang"], "term": g["term"],
             "c": pc.cast(g["term_count"], pa.int64())}
        )

    tf = sorted_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "term"],
        [("c", "sum", "c")],
    )

    def mark(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"], dtype=np.int64)
        return pa.table(
            {"lang": t["lang"],
             "h": pa.array((c == 1).astype(np.int64), pa.int64()),
             "c": t["c"]}
        )

    per = sorted_group_agg(
        tf.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"],
        [("vocab", "count_all", None), ("hapax", "sum", "h"),
         ("n_tokens", "sum", "c")],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "vocab": pa.array([], pa.int64()),
                 "hapax": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "hapax_frac": pa.array([], pa.float64()),
                 "ttr": pa.array([], pa.float64())}
            )
        v = np.asarray(t["vocab"], dtype=np.int64).astype(np.float64)
        h = np.asarray(t["hapax"], dtype=np.int64).astype(np.float64)
        n = np.asarray(t["n_tokens"], dtype=np.int64).astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "vocab": t["vocab"],
                "hapax": t["hapax"],
                "n_tokens": t["n_tokens"],
                "hapax_frac": pa.array(h / v, pa.float64()),
                "ttr": pa.array(v / n, pa.float64()),
            }
        )

    return per.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["lexical_diversity"] = (
    r"WITH tok AS (SELECT lang, unnest(regexp_split_to_array("
    r"coalesce(text, ''), '\s+')) AS term FROM documents), "
    "tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c FROM tok "
    "  WHERE term <> '' GROUP BY 1, 2), "
    "per AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab, "
    "  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax, "
    "  CAST(sum(c) AS BIGINT) AS n_tokens FROM tf GROUP BY lang) "
    "SELECT lang, vocab, hapax, n_tokens, "
    "  CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_frac, "
    "  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr "
    "FROM per"
)


def q_pld_rollup(sf_dir: str):
    """Per-registrable-domain (PLD) rollup over deterministically
    derived hosts (functions/urlnorm.registrable_domain): URL count +
    distinct-host count per ownership unit — the aggregation level web
    crawl politeness/reputation keys on (news.bbc.co.uk and
    www.bbc.co.uk are ONE budget). Hosts are built from doc_id on both
    sides (subdomain·site·suffix mix incl. co.uk/com.au multi-label
    suffixes); two narrow exchanges: (pld, host) distinct then per-pld
    merge."""
    from ..functions.urlnorm import registrable_domain
    from ..ops.agg import sorted_group_agg

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        sub = np.array(["www", "m", "blog", "news"])[ids % 4]
        suf = np.array(["co.uk", "com.au", "com"])[ids % 3]
        site = np.char.add("site", (ids % 50).astype(str))
        host = pa.array(
            [f"{a}.{b}.{c}" for a, b, c in zip(sub, site, suf)], pa.string()
        )
        return pa.table({"host": host, "pld": registrable_domain(host)})

    rows = ds.map_batches(hosts, batch_format="pyarrow", zero_copy_batch=True)
    per_host = sorted_group_agg(
        rows, ["pld", "host"], [("n", "count_all", None)]
    )
    return sorted_group_agg(
        per_host, ["pld"], [("n_urls", "sum", "n"), ("n_hosts", "count_all", None)]
    )


def _pld_oracle_sql() -> str:
    from ..functions.urlnorm import PLD_SECOND_LEVEL

    alt = "|".join(s.replace(".", r"\.") for s in PLD_SECOND_LEVEL)
    ml = rf"([^.]+\.(?:{alt}))$"
    two = r"([^.]+\.[^.]+)$"
    return (
        "WITH h AS (SELECT doc_id, "
        "  (CASE doc_id % 4 WHEN 0 THEN 'www' WHEN 1 THEN 'm' "
        "     WHEN 2 THEN 'blog' ELSE 'news' END) "
        "  || '.site' || CAST(doc_id % 50 AS VARCHAR) || '.' || "
        "  (CASE doc_id % 3 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com.au' "
        "     ELSE 'com' END) AS host FROM documents), "
        "p AS (SELECT host, "
        f"  CASE WHEN regexp_matches(host, '{ml}') "
        f"       THEN regexp_extract(host, '{ml}', 1) "
        f"       WHEN regexp_matches(host, '{two}') "
        f"       THEN regexp_extract(host, '{two}', 1) "
        "       ELSE host END AS pld FROM h) "
        "SELECT pld, CAST(count(*) AS BIGINT) AS n_urls, "
        "  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts "
        "FROM p GROUP BY pld"
    )


ORACLE_SQL["pld_rollup"] = _pld_oracle_sql()


BM25_TOP_K = 50


def q_bm25_search(sf_dir: str):
    """BM25 top-k retrieval over documents for the fixed SEARCH_TERMS
    query set (ops/text.bm25_search): Lucene-style idf (log2 variant),
    k1=1.2, b=0.75, per-(doc,term) contributions quantized to int64 so
    per-doc totals sum exactly in any merge order. Ranked score_q DESC,
    doc_id; REAL SQL oracle evaluates the identical float expression
    with identical parenthesization (constants written as the same
    runtime sums, e.g. (1.2 + 1.0), never pre-folded literals)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.bm25_search(ds, list(SEARCH_TERMS), k=BM25_TOP_K)


def _bm25_oracle_sql() -> str:
    in_list = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return (
        f"WITH tok AS (SELECT doc_id, term FROM ({_TOK_SQL}) WHERE term <> ''), "
        "stats AS (SELECT "
        "  (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs, "
        "  (SELECT CAST(count(*) AS DOUBLE) FROM tok) AS n_tok), "
        f"tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        f"  FROM tok WHERE term IN ({in_list}) GROUP BY 1, 2), "
        "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl "
        "  FROM tok GROUP BY 1), "
        "df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf "
        "  GROUP BY term), "
        "sc AS (SELECT tf.doc_id, tf.tf, "
        "  CAST(floor((log2((n_docs - df + 0.5) / (df + 0.5) + 1.0) * "
        "    (CAST(tf AS DOUBLE) * (1.2 + 1.0))) / "
        "    (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + "
        "      (0.75 * CAST(dl AS DOUBLE)) / (n_tok / n_docs))) "
        "    * 1048576.0 + 0.5) AS BIGINT) AS tq "
        "  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) "
        "  CROSS JOIN stats), "
        "per AS (SELECT doc_id, CAST(sum(tq) AS BIGINT) AS score_q, "
        "  CAST(sum(tf) AS BIGINT) AS n_hits FROM sc GROUP BY doc_id) "
        "SELECT doc_id, n_hits, score_q, "
        "  CAST(score_q AS DOUBLE) / 1048576.0 AS score "
        f"FROM per ORDER BY score_q DESC, doc_id LIMIT {BM25_TOP_K}"
    )


ORACLE_SQL["bm25_search"] = _bm25_oracle_sql()


PPL_QUANT = 1 << 20
PPL_BUCKETS = 3


def q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet-style LM-perplexity corpus bucketing (Wenzek et al. 2020):
    score every doc under the corpus-trained Kneser-Ney bigram LM
    (q_kn_bigram_lm) and NTILE the corpus into head/middle/tail thirds
    by bits-per-bigram. Each bigram's surprisal −log2 p is QUANTIZED to
    int64 (the shared _nb_lq convention), so per-doc totals are exact
    integer sums — merge-order-free; the only floats are one final
    division per doc and the (deterministic) sort key.

    Shape: LM table (one bigram exchange, from q_kn_bigram_lm) → doc
    bigram counts pre-aggregated per block (zero exchange — a doc lives
    in one row) → ONE bg-keyed sort-merge join → ONE doc-keyed sum
    exchange → global sort + zip_with_index for the NTILE (rank·k//n
    reproduces DuckDB NTILE exactly: bigger buckets first). At corpus
    scale the final sort ranks one narrow row per doc; sampled bucket
    THRESHOLDS (group_quantiles machinery) replace the exact NTILE when
    even that is too wide. Docs with <2 tokens have no bigrams and drop
    out, matching the SQL inner join."""
    from ..ops.agg import sorted_group_agg
    from ..ops.join import sort_merge_inner_join
    from ..ops.text import _nb_lq
    from ..stages.index import zip_with_index

    lm = q_kn_bigram_lm(sf_dir)

    def lm_q(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bg": pa.array([], pa.string()),
                 "nll_q": pa.array([], pa.int64())}
            )
        nll = -_nb_lq(np.asarray(t["p_kn"], dtype=np.float64))
        return pa.table(
            {
                "bg": pc.binary_join_element_wise(t["w1"], t["w2"], " "),
                "nll_q": pa.array(nll, pa.int64()),
            }
        )

    lmq = lm.map_batches(lm_q, batch_format="pyarrow", zero_copy_batch=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_bigrams(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bg": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        f = f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        r = row_idx[keep]
        m = len(f)
        if m < 2:
            return empty
        same = r[1:] == r[:-1]
        bg = pc.binary_join_element_wise(
            f.slice(0, m - 1).filter(pa.array(same)),
            f.slice(1, m - 1).filter(pa.array(same)),
            " ",
        )
        ids = np.asarray(t["doc_id"], dtype=np.int64)[r[:-1][same]]
        g = (
            pa.table({"doc_id": pa.array(ids, pa.int64()), "bg": bg})
            .group_by(["doc_id", "bg"])
            .aggregate([("bg", "count")])
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "bg": g["bg"],
                "cnt": pc.cast(g["bg_count"], pa.int64()),
            }
        )

    occ = docs.map_batches(doc_bigrams, batch_format="pyarrow", zero_copy_batch=True)
    joined = sort_merge_inner_join(
        occ, lmq, key="bg", left_cols=["doc_id", "cnt"], right_cols=["nll_q"]
    )

    def terms(t: pa.Table) -> pa.Table:
        cnt = np.asarray(t["cnt"], dtype=np.int64)
        nll = np.asarray(t["nll_q"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(cnt * nll, pa.int64()),
                "cnt": t["cnt"],
            }
        )

    per_doc = sorted_group_agg(
        joined.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"],
        [("bits_q", "sum", "bits"), ("n_bigrams", "sum", "cnt")],
    )

    def score(t: pa.Table) -> pa.Table:
        bq = np.asarray(t["bits_q"], dtype=np.int64)
        nb = np.asarray(t["n_bigrams"], dtype=np.int64)
        avg = bq.astype(np.float64) / nb.astype(np.float64) / float(PPL_QUANT)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "bits_q": t["bits_q"],
                "avg_bits": pa.array(avg, pa.float64()),
            }
        )

    scored = per_doc.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = scored.count()
    ranked = zip_with_index(scored, ["avg_bits", "doc_id"], [False, False])

    def bucketize(t: pa.Table) -> pa.Table:
        rk = np.asarray(t["rank"], dtype=np.int64)
        b = rk * PPL_BUCKETS // max(n, 1) + 1
        return t.drop_columns(["rank"]).append_column(
            "bucket", pa.array(b, pa.int64())
        )

    return ranked.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["ccnet_ppl_buckets"] = (
    r"WITH l AS (SELECT doc_id, list_filter(regexp_split_to_array("
    r"coalesce(text, ''), '\s+'), x -> x <> '') AS toks FROM documents), "
    "b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
    "i -> toks[i] || ' ' || toks[i + 1])) AS term FROM l), "
    "cb AS (SELECT term, count(*) AS n FROM b GROUP BY term), "
    "s1 AS (SELECT split_part(term, ' ', 1) AS w1, sum(n) AS c1, "
    "count(*) AS n1f FROM cb GROUP BY 1), "
    "s2 AS (SELECT split_part(term, ' ', 2) AS w2, count(*) AS n1b "
    "FROM cb GROUP BY 1), "
    "tot AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM cb), "
    "lm AS (SELECT term, "
    "  (greatest(CAST(n AS DOUBLE) - 0.75, 0) + "
    "   0.75 * CAST(n1f AS DOUBLE) * CAST(n1b AS DOUBLE) / b) "
    "  / CAST(c1 AS DOUBLE) AS p_kn "
    "  FROM cb CROSS JOIN tot "
    "  JOIN s1 ON s1.w1 = split_part(term, ' ', 1) "
    "  JOIN s2 ON s2.w2 = split_part(term, ' ', 2)), "
    "lmq AS (SELECT term, CAST(-floor(log2(p_kn) * 1048576 + 0.5) AS BIGINT) "
    "  AS nll_q FROM lm), "
    "occ AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt "
    "  FROM b GROUP BY 1, 2), "
    "per AS (SELECT doc_id, CAST(sum(cnt * nll_q) AS BIGINT) AS bits_q, "
    "  CAST(sum(cnt) AS BIGINT) AS n_bigrams "
    "  FROM occ JOIN lmq USING (term) GROUP BY doc_id) "
    "SELECT doc_id, n_bigrams, bits_q, "
    "  CAST(bits_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1048576.0 "
    "    AS avg_bits, "
    "  CAST(NTILE(3) OVER (ORDER BY "
    "    CAST(bits_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1048576.0, "
    "    doc_id) AS BIGINT) AS bucket "
    "FROM per"
)


def q_normalize_text(sf_dir: str):
    """C4-style cleaning: NFC → lowercase → collapse whitespace → trim,
    dialect-identical pyarrow/DuckDB kernels (ops/text.normalize_text)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.normalize_text(ds)


def q_value_quantiles(sf_dir: str):
    """Exact per-type value quantiles (25/50/75): one sort exchange +
    per-block rank-target selection — no group ever materializes in one
    task (ops/agg.group_quantiles; DuckDB quantile_disc convention)."""
    from ..ops.agg import group_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return group_quantiles(ev, "event_type", "value", percents=(25, 50, 75))


def q_value_quantiles_cont(sf_dir: str):
    """Exact per-type INTERPOLATED quantiles (percentile_cont
    25/50/90): same sort exchange as the discrete form, floor+ceil rank
    picks per target, DuckDB's own lo·(crn−rn)+hi·(rn−frn) combination
    so the float output is bit-identical to quantile_cont
    (ops/agg.group_quantiles_cont)."""
    from ..ops.agg import group_quantiles_cont

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return group_quantiles_cont(ev, "event_type", "value", percents=(25, 50, 90))


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
