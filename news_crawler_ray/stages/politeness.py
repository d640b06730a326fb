"""Politeness + priority scheduling as a *data* computation.

The reference's politeness is a serial loop with ``time.sleep(1)``
between fetches (/root/reference/src/secbot/fetchers/news.py:133-138)
and its crawl order is a consequence of sequential loops + stable sort
(news.py:152-162). Under parallelism that order must be *defined as
data* (SURVEY.md §7 "deterministic crawl order"): each host fetches its
queue in (priority desc, url asc) order with ``crawl_delay_ms`` between
requests on a virtual clock, so

    fetch_at_us(row) = rank_in_host * crawl_delay_ms(host) * 1000

and the global crawl order is ``(fetch_at_us asc, priority desc, url
asc)`` — host-interleaved, recency-weighted, identical at any
parallelism level. No actual sleeping happens in the engine: the
schedule IS the politeness (wall-clock pacing is the fetch executor's
concern; the ordering contract is what conformance checks).

Robots handling mirrors T1: per-host disallow prefixes filtered before
scheduling, rules broadcast once via ``ray.put`` and read per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .index import partitioned_group_rank, with_group_rank, zip_with_index

_PATH_RE = r"^[a-z]+://[^/]+(?P<path>/.*)$"


def _host_runs(hosts: pa.Array):
    """(starts, values) of host runs in a host-sorted column."""
    n = len(hosts)
    if n == 0:
        return np.zeros(0, np.int64), []
    if n == 1:
        return np.zeros(1, np.int64), [hosts[0].as_py()]
    neq = pc.not_equal(hosts.slice(1), hosts.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    values = hosts.take(pa.array(starts)).to_pylist()
    return starts, values


def robots_rank_block(
    t: pa.Table, cfg: dict, default_delay_ms: int
) -> pa.Table:
    """Robots filter + per-host politeness rank for ONE host-complete block.

    The block must contain every surviving row of each host it contains
    (hash-partition by host upstream). One local sort by
    (host, priority desc, url), then per-HOST-RUN work: delay lookup and
    disallow-prefix checks are done once per host with vectorized
    ``pc.starts_with`` over the run's paths (no per-row Python), ranks
    are arange-minus-boundary per run. Appends delay_ms, host_rank,
    fetch_at_us.
    """
    if t.num_rows == 0:
        out = t.append_column("delay_ms", pa.array([], pa.int32()))
        out = out.append_column("host_rank", pa.array([], pa.int64()))
        return out.append_column("fetch_at_us", pa.array([], pa.int64()))
    idx = pc.sort_indices(
        t,
        sort_keys=[("host", "ascending"), ("priority", "descending"), ("url", "ascending")],
    )
    s = t.take(idx)
    n = s.num_rows
    hosts = s["host"].combine_chunks()
    paths = pc.struct_field(pc.extract_regex(s["url"], _PATH_RE), "path")
    starts, values = _host_runs(hosts)
    ends = np.concatenate([starts[1:], [n]])
    keep = np.ones(n, dtype=bool)
    delays = np.full(n, default_delay_ms, dtype=np.int32)
    for st, en, host in zip(starts, ends, values):
        host_cfg = cfg.get(host)
        if host_cfg is None:
            continue
        prefixes, delay = host_cfg
        delays[st:en] = delay
        for pre in prefixes:
            hit = pc.starts_with(paths.slice(st, en - st), pattern=pre)
            keep[st:en] &= ~pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
    s = s.append_column("delay_ms", pa.array(delays, pa.int32()))
    if not keep.all():
        s = s.filter(pa.array(keep))
    # rank within surviving host runs (order preserved by filter)
    kept_hosts = s["host"].combine_chunks()
    m = s.num_rows
    if m == 0:
        out = s.append_column("host_rank", pa.array([], pa.int64()))
        return out.append_column("fetch_at_us", pa.array([], pa.int64()))
    if m == 1:
        ranks = np.zeros(1, dtype=np.int64)
    else:
        neq = pc.not_equal(kept_hosts.slice(1), kept_hosts.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        boundaries = np.concatenate([[0], np.nonzero(neq)[0] + 1])
        run_ids = np.concatenate([[0], np.cumsum(neq)])
        ranks = np.arange(m, dtype=np.int64) - boundaries[run_ids]
    fetch_at = ranks * np.asarray(s["delay_ms"], dtype=np.int64) * 1000
    s = s.append_column("host_rank", pa.array(ranks, pa.int64()))
    return s.append_column("fetch_at_us", pa.array(fetch_at, pa.int64()))


def wave_schedule_block(
    batch: pa.Table, cfg: dict, shards: list | None, default_delay_ms: int
) -> pa.Table:
    """Fused per-block wave kernel: dedup → seen-key → seen-filter →
    robots → host_rank → fetch_at_us, over ONE host-complete block.

    Correctness relies only on host co-location: duplicate canonical
    URLs share a host, so within-block keep-best dedup is exact, and
    per-host politeness ranks see every surviving row of the host. A hot
    host lands in one block — its queue is politeness-bounded anyway
    (fetch_at grows linearly with queue position), and the kernel is
    O(n log n) vectorized; salt upstream if one host ever outgrows a
    block.

    SHA-1 seen-keys are computed HERE, after dedup, so the per-row
    digest loop runs on survivors only — not on the (much larger)
    candidate stream.
    """
    from ..functions import urlnorm
    from .seen import SeenFilterStage

    if batch.num_rows == 0:
        out = batch
        if "url_sha1" not in out.column_names:
            out = out.append_column("url_sha1", pa.array([], pa.binary()))
        return robots_rank_block(out, cfg, default_delay_ms)
    # 1. keep-best dedup by canonical url (priority desc, discovered
    #    asc, url asc — DEFAULT_ORDER semantics, dedup.py)
    idx = pc.sort_indices(
        batch,
        sort_keys=[
            ("url", "ascending"),
            ("priority", "descending"),
            ("discovered_at", "ascending"),
        ],
    )
    s = batch.take(idx)
    urls = s["url"].combine_chunks()
    n = s.num_rows
    first = np.empty(n, dtype=bool)
    first[0] = True
    if n > 1:
        first[1:] = pc.not_equal(urls.slice(1), urls.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    s = s.filter(pa.array(first))
    # 2. seen-key + seen-filter (check_and_add marks survivors seen
    #    BEFORE robots, matching the oracle: robots-blocked URLs stay
    #    seen — testing/oracle.py seen-then-robots order)
    if "url_sha1" not in s.column_names:
        s = s.append_column("url_sha1", urlnorm.sha1_array(s["url"]))
    if shards:
        s = SeenFilterStage(shards)(s)
    # 3. robots + politeness rank
    return robots_rank_block(s, cfg, default_delay_ms)


class WaveScheduleStage:
    """Actor-pool form of :func:`wave_schedule_block` for the hash-shuffle
    ("fused") schedule strategy: one host-key shuffle co-locates hosts,
    then the fused kernel runs per partition. Robots config is fetched
    once per actor (T1 robots cache)."""

    def __init__(self, shards: list, robots_ref, default_delay_ms: int = 1000):
        self.shards = shards
        self.cfg = ray.get(robots_ref)
        self.default_delay_ms = default_delay_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        return wave_schedule_block(batch, self.cfg, self.shards, self.default_delay_ms)


def schedule_fused(
    ds: "ray.data.Dataset",
    robots_ref,
    seen_shards: list | None,
    concurrency: int | tuple = 2,
    num_cpus: float | None = None,
    default_delay_ms: int = 1000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Candidates (canonicalized, host column set) → politeness schedule
    in one host-key shuffle + one fused actor stage. Output columns:
    input + url_sha1, delay_ms, host_rank, fetch_at_us (no global
    crawl_rank — derive it with :func:`stages.index.zip_with_index` on
    (fetch_at_us, priority desc, url) when conformance needs it).
    """
    if num_partitions is None:
        from ray.data import DataContext

        num_partitions = DataContext.get_current().default_hash_shuffle_parallelism
    parts = ds.repartition(num_blocks=num_partitions, keys=["host"])
    return parts.map_batches(
        WaveScheduleStage,
        fn_constructor_kwargs={
            "shards": seen_shards,
            "robots_ref": robots_ref,
            "default_delay_ms": default_delay_ms,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # one batch per host-partition: hosts stay whole
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


@ray.remote
def _fused_block_task(cfg: dict, shards: list | None, delay_ms: int, k: int, *parts):
    """Assemble one host-complete block from its owner rows + donated
    boundary runs, run the fused wave kernel, return ``k`` zero-copy
    slices (downstream task granularity without a finer sort —
    see stages/index._add_rank_split)."""
    tables = [p for p in parts if p.num_rows]
    tbl = pa.concat_tables(tables) if len(tables) != 1 else tables[0]
    out = wave_schedule_block(tbl, cfg, shards, delay_ms)
    if k <= 1:
        return out
    step = -(-out.num_rows // k) if out.num_rows else 1
    return tuple(out.slice(i * step, step) for i in range(k))


def schedule_sorted_fused(
    ds: "ray.data.Dataset",
    robots_ref,
    seen_shards: list | None,
    default_delay_ms: int = 1000,
    rank_split: int = 1,
) -> "ray.data.Dataset":
    """Candidates (canonicalized) → politeness schedule in ONE global
    exchange: a task-based range-partition sort on ``host`` (the cheap
    single-column key), a 3-values-per-block metadata pass, boundary-run
    donation so every host is complete in exactly one task, then the
    fused wave kernel (dedup → seen → robots → rank) as plain TASKS.

    vs the two-sort chain this removes: the URL-keyed dedup sort +
    materialize, the separate SHA-1 pass, and the seen-filter + robots
    actor pools (per-wave pool startup). vs ``schedule_fused`` it
    replaces the hash shuffle (fixed aggregator-pool startup per op,
    measured ~6.5-7 s in-sandbox regardless of width) with the task sort.
    Output = input + url_sha1, delay_ms, host_rank, fetch_at_us; derive
    the global ``crawl_rank`` with :func:`stages.index.zip_with_index`
    when conformance needs it.

    Skew: a host spanning many sort blocks is assembled into its owner
    task (same co-location a hash shuffle would force); politeness
    bounds its queue, and the kernel is O(n log n) vectorized.
    """
    from .index import key_complete_parts

    groups = key_complete_parts(ds, "host", coalesce=False)
    if not groups:
        return ds.limit(0)  # caller breaks on empty waves before scheduling
    out_refs = []
    for parts in groups:
        task = _fused_block_task.options(
            num_returns=rank_split if rank_split > 1 else 1
        ).remote(robots_ref, seen_shards, default_delay_ms, rank_split, *parts)
        if rank_split > 1:
            out_refs.extend(task)
        else:
            out_refs.append(task)
    return ray.data.from_arrow_refs(out_refs)


def robots_table_to_config(robots: pa.Table) -> dict:
    """robots table -> {host: (tuple(disallow_prefixes), delay_ms)}."""
    return {
        h: (tuple(d or ()), int(ms))
        for h, d, ms in zip(
            robots["host"].to_pylist(),
            robots["disallow_prefixes"].to_pylist(),
            robots["crawl_delay_ms"].to_pylist(),
        )
    }


class RobotsFilter:
    """Actor-pool stage: drop rows disallowed by robots; attach delay_ms.

    The robots config is broadcast once (``ray.put``) and fetched in
    ``__init__`` — once per actor, not per batch (T1 robots cache).
    Unknown hosts get ``default_delay_ms`` and no restrictions.
    """

    def __init__(self, robots_ref, default_delay_ms: int = 1000):
        self.cfg = ray.get(robots_ref)
        self.default = default_delay_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("delay_ms", pa.array([], pa.int32()))
        n = batch.num_rows
        # dictionary-encode hosts: config lookups run once per UNIQUE
        # host, delays map back with one vectorized gather, and the
        # per-path prefix checks touch only rows of restricted hosts
        # (the old per-row Python loop was the schedule phase's floor)
        hosts = batch["host"].combine_chunks()
        enc = hosts.dictionary_encode()
        codes = np.asarray(enc.indices)
        uniq = enc.dictionary.to_pylist()
        delay_by_code = np.full(len(uniq), self.default, dtype=np.int32)
        restricted: list[tuple[int, tuple]] = []
        for u, h in enumerate(uniq):
            cfg = self.cfg.get(h)
            if cfg is None:
                continue
            prefixes, delay = cfg
            delay_by_code[u] = delay
            if prefixes:
                restricted.append((u, prefixes))
        delays = delay_by_code[codes]
        keep = np.ones(n, dtype=bool)
        if restricted:
            paths = pc.struct_field(pc.extract_regex(batch["url"], _PATH_RE), "path")
            for u, prefixes in restricted:
                sel = np.flatnonzero(codes == u)
                sub = paths.take(pa.array(sel))
                bad = np.zeros(sel.size, dtype=bool)
                for pre in prefixes:
                    hit = pc.starts_with(sub, pattern=pre)
                    bad |= pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
                keep[sel[bad]] = False
        out = batch.append_column("delay_ms", pa.array(delays, pa.int32()))
        if keep.all():
            return out
        return out.filter(pa.array(keep))


def schedule(
    ds: "ray.data.Dataset",
    robots_ref,
    concurrency: int | tuple = 2,
    default_delay_ms: int = 1000,
    num_partitions: int | None = None,
    rank_strategy: str = "sort",
    robots_num_cpus: float | None = None,
    with_crawl_rank: bool = True,
    rank_split: int = 1,
) -> "ray.data.Dataset":
    """Candidates -> politeness-ordered schedule with ``crawl_rank``.

    Output columns: input + delay_ms, host_rank, fetch_at_us, crawl_rank.
    Rows come back sorted in crawl order.

    ``rank_strategy``: "sort" ranks hosts via a range-partition sort +
    offset stitching (task-based, measured faster in-sandbox because
    hash-shuffle aggregator pools pay a per-op startup cost); "hash"
    uses a key shuffle on ``host`` + per-partition rank (pick it when a
    sort of the candidate set would be wider than a host co-location).
    Both produce identical output.
    """
    filtered = ds.map_batches(
        RobotsFilter,
        fn_constructor_kwargs={"robots_ref": robots_ref, "default_delay_ms": default_delay_ms},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # one dictionary-encode per block, not per 1024 rows
        concurrency=concurrency,
        num_cpus=robots_num_cpus,
    )
    if rank_strategy == "hash":
        ranked = partitioned_group_rank(
            filtered, "host", ["priority", "url"], [True, False],
            rank_col="host_rank", num_partitions=num_partitions,
        )
    else:
        ranked = with_group_rank(
            filtered,
            "host",
            ["priority", "url"],
            [True, False],
            rank_col="host_rank",
            # the host-rank sort is the wave's LAST exchange: slicing its
            # ranked blocks here hands the downstream fused fetch+decode
            # fine-grained tasks without paying a finer (costlier) sort
            split_output=rank_split,
        )

    def add_fetch_at(t: pa.Table) -> pa.Table:
        fetch_at = np.asarray(t["host_rank"]) * np.asarray(t["delay_ms"], dtype=np.int64) * 1000
        return t.append_column("fetch_at_us", pa.array(fetch_at, pa.int64()))

    timed = ranked.map_batches(add_fetch_at, batch_format="pyarrow", zero_copy_batch=True)
    if not with_crawl_rank:
        # crawl order stays fully determined by (fetch_at_us, priority,
        # url); materializing the global index costs one extra global
        # sort + materialize — conformance/display mode only
        return timed
    return zip_with_index(
        timed,
        ["fetch_at_us", "priority", "url"],
        [False, True, False],
        rank_col="crawl_rank",
    )
