"""Event analytics: cohorts, funnels, drift, A/B, rank tests, time travel, upserts.

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
    _read,
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




def q_value_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift test between user-parity
    cohorts over event value-cents (ops/agg.ks_two_sample: all-integer
    sup-norm ECDF distance, exact tie handling, one value-sorted
    exchange + a two-ints-per-block scan). REAL SQL oracle: windowed
    cumulative counts over distinct values, identical integer
    numerator."""
    from ..ops.agg import ks_two_sample

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], np.float64)
        if v.size and v.min() < 0:
            raise ValueError("value_ks_test: negative values break the "
                             "half-away-from-zero cents rounding match")
        return pa.table(
            {
                "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
                "cohort": pa.array(
                    (np.asarray(t["user_id"], np.int64) % 2).astype(np.int64)
                ),
            }
        )

    return ks_two_sample(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "cents",
        "cohort",
    )


ORACLE_SQL["value_ks_test"] = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v, user_id % 2 AS g FROM events),
pv AS (
  SELECT v,
         SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n2
  FROM e GROUP BY v),
c AS (
  SELECT v,
         SUM(n1) OVER (ORDER BY v) AS c1,
         SUM(n2) OVER (ORDER BY v) AS c2
  FROM pv),
t AS (SELECT CAST(SUM(n1) AS BIGINT) AS N1, CAST(SUM(n2) AS BIGINT) AS N2 FROM pv)
SELECT N1 AS n1, N2 AS n2,
       CAST(MAX(ABS(c1 * N2 - c2 * N1)) AS BIGINT) AS d_num,
       N1 * N2 AS d_den,
       CAST(MAX(ABS(c1 * N2 - c2 * N1)) AS DOUBLE) / (N1 * N2) AS d
FROM c, t GROUP BY N1, N2
"""
