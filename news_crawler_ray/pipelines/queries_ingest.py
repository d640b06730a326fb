"""Crawl/news pipeline + archive & columnar ingest sources (RSS, IPC, ORC, evolving, WET).

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


