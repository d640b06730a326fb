"""End-to-end crawl pipeline: the engine's flagship.

Wave-loop analog of the reference's scheduled jobs
(/root/reference/src/secbot/scheduler.py:39-89 seen-set cycle,
src/secbot/fetchers/asec.py:129-148 listing→post expansion): each wave is
one lazy Ray Data pipeline

    candidates → canonicalize
               → ONE task-based sort on host + boundary-run donation
               → fused kernel per host-complete block:
                   dedup → sha1 → seen-filter (sharded actors, exact)
                         → robots → politeness rank (virtual clock)
               → fetch (keyed lookup into the page-store)
               → write parquet, hive-partitioned by fetch_status
                 (resumable layout; status counts from footers only)

and the parse stage's outlink expansion feeds the next wave. The driver
only ever loops over *waves* (a handful), never over rows.

Determinism contract (SURVEY.md §7 "deterministic crawl order"): crawl
order is data — ``(wave, crawl_rank)`` where ``crawl_rank`` orders by
``(fetch_at_us, -priority, url)`` — so N-vs-4N-CPU runs agree exactly.
Verified against the pure-Python oracle in
``news_crawler_ray.testing.oracle``.

Resume contract (SURVEY.md §7 step 9): after wave ``w`` completes the
pipeline checkpoints (a) the seen-set per shard as ``epoch=w+1`` (state
AFTER wave w), (b) next-wave candidates parquet, (c) a manifest line.
A killed job restarts from the last completed wave with an identical
final seen-set and crawl order (test: tests/test_crawl_pipeline.py).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.canonicalize import canonicalize
from ..stages.dedup import dedup_frontier, dedup_frontier_sorted
from ..stages.fetch import fetch_broadcast
from ..stages.parse import extract_outlinks
from ..stages.politeness import robots_table_to_config, schedule
from ..stages.seen import SeenFilterStage, SeenSet

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("discovered_at", pa.timestamp("us")),
        ("priority", pa.float64()),
    ]
)


@dataclass
class CrawlConfig:
    max_waves: int = 3
    num_seen_shards: int = 4
    seen_capacity_per_shard: int = 1 << 16
    dedup_partitions: int = 8
    # "sorted" (default): ONE task-based range-partition sort on host +
    # boundary-run donation (host-complete blocks) + the fused wave
    # kernel (dedup → seen → robots → rank) as plain tasks
    # (stages/politeness.schedule_sorted_fused) — a single exchange, no
    # per-wave actor-pool startups.
    # "two_sort": the round-2 chain — URL-keyed dedup sort, then
    # seen-filter + robots actor pools, then the host-rank sort.
    # "fused": ONE host-key hash shuffle + the same fused kernel as an
    # actor stage (stages/politeness.WaveScheduleStage) — Ray's
    # hash-shuffle aggregator pool pays a large fixed per-op startup on
    # this box; prefer it where that cost amortizes (long waves, real
    # multi-node clusters).
    schedule_strategy: str = "sorted"
    # host-shuffle width for the fused strategy; None = the session's
    # default_hash_shuffle_parallelism (≈2/CPU). dedup_partitions is NOT
    # reused here — a 32-wide aggregator pool on an 8-CPU session stalls
    schedule_partitions: int | None = None
    # global crawl_rank = zip-with-index over (fetch_at_us, priority
    # desc, url) — one extra global sort + materialize per wave. The
    # crawl ORDER is already fully determined by those columns in the
    # output; the materialized rank is a conformance/display concern,
    # so benches turn it off.
    compute_crawl_rank: bool = True
    # "sort": range-partition sort + run stitching (task-based, scales
    # best in-sandbox); "hash": key shuffle (dedup_frontier). Only used
    # by schedule_strategy="two_sort" (sorted/fused dedup inside their
    # kernels).
    dedup_strategy: str = "sort"
    # Actor-pool sizing. "auto" sizes each pool as a FRACTION of the
    # session's CPUs with fractional num_cpus per actor — measured to
    # scale ~3x from 8→32 CPUs where autoscaling (min,max) pools
    # plateaued at ~4 actors regardless of cluster size. Explicit ints/
    # tuples are honored as-is.
    fetch_concurrency: int | tuple | str = "auto"
    seen_filter_concurrency: int | tuple | str = "auto"
    robots_concurrency: int | tuple | str = "auto"
    verify_concurrency: int | tuple | str = "auto"
    schedule_concurrency: int | tuple | str = "auto"
    pool_actor_cpus: float = 0.7  # logical CPUs per pool actor in auto mode
    fetch_batch_size: int = 1024
    # "broadcast": ray.put the store once, keyed lookup per batch (small
    # stores — a multi-GB ray.put serializes for minutes); "join":
    # hash-partitioned left-outer join on image_id (the 100 TB path);
    # "auto": broadcast under broadcast_limit_bytes, else join;
    # "http": live-transport fetch (stages/transport.HTTPFetcher) —
    # real GETs with per-host wall-clock politeness; the pagestore
    # argument is ignored (the network IS the store).
    fetch_mode: str = "auto"
    # fetch_mode="http" knobs. http_base_url: loopback/proxy root — a
    # row's GET goes to {base}/{host}{path} (None = request the row's
    # URL directly). Rate/burst feed the shared token-bucket shards
    # (stages/ratelimit.py): budget is per TRUE host, wall-clock.
    http_base_url: str | None = None
    http_timeout_s: float = 5.0
    http_attempts: int = 3
    http_rate_per_s: float = 8.0
    http_burst: float = 1.0
    http_rate_shards: int = 2
    http_batch_size: int = 256
    # recrawl mode: emit an `etag` column on fetched output, and/or
    # load a prior run's (url, etag) pairs (a fetched/ dir or any
    # parquet with those columns) to make every GET conditional —
    # unchanged pages answer 304 (fetch_status="not_modified", no
    # payload bytes on the wire).
    http_emit_etag: bool = False
    http_prior_etags_path: str | None = None
    # crawl budgets. max_url_depth: candidates deeper than this are
    # dropped BEFORE the seen-insert (they stay fetchable if
    # rediscovered shallower — link-depth cap, not a seen mark).
    # max_pages: stop starting new waves once cumulative scheduled
    # URLs reach the budget — wave-granular by design: trimming inside
    # a wave would strand rows the schedule kernel already marked seen,
    # breaking resume ("seen but never fetched").
    max_url_depth: int | None = None
    max_pages: int | None = None
    broadcast_limit_bytes: int = 1 << 30
    default_delay_ms: int = 1000
    outlink_decay: float = 0.5
    # decode every fetched payload, verify its perceptual hash and emit
    # features instead of raw bytes (the north rule's per-row pixel
    # invariant as a pipeline stage); CPU-bound
    verify_payloads: bool = False
    # sharded store + verify_payloads: run lookup+decode as ONE fused
    # task-form kernel (stages/fetch.fetch_decode_batch) — payload bytes
    # never enter the inter-operator block stream (measured ~6 GB and
    # ~87 CPU-s of gather per 2 M-row wave when the stages were split)
    fuse_fetch_decode: bool = True
    # "tasks" (default): stateless decode as elastic tasks — uses every
    # free CPU; "actors": fixed pool (for codecs with real load state)
    verify_mode: str = "tasks"
    # opt-in plasma staging of the sharded store (see run_crawl note)
    stage_store_to_plasma: bool = False
    # day-window semantics as config, not accident (reference resets the
    # seen-set daily, scheduler.py:43-44): None = never reset
    seen_epoch_scope: str | None = None
    # fold seen-set delta checkpoints once this many MANIFEST-FINALIZED
    # epochs have accumulated past the last fold (0 = never): bounds the
    # per-shard file count — and so resume replay cost — at
    # O(seen_compact_every) instead of one file per wave forever. Only
    # finalized epochs fold; the in-flight wave's delta (and any orphan
    # from a crash) stays a separate file so resume's orphan-skip
    # semantics are untouched.
    seen_compact_every: int = 8


@dataclass
class WaveMetrics:
    """Per-wave lineage + metrics row (SURVEY.md §7 step 8).

    ``scheduled`` counts rows surviving canonicalize→dedup→seen→robots;
    the candidate→scheduled gap is the dedup+politeness drop (the fused
    pass never materializes the intermediate, so per-stage splits are a
    stats() concern, not a metrics row).
    """

    wave: int
    candidates: int
    scheduled: int
    fetched_ok: int
    missing: int
    outlinks: int
    elapsed_s: float

    @property
    def urls_per_sec(self) -> float:
        return self.scheduled / self.elapsed_s if self.elapsed_s > 0 else 0.0

    def to_json(self) -> dict:
        d = self.__dict__.copy()
        d["urls_per_sec"] = self.urls_per_sec
        return d


@dataclass
class CrawlResult:
    out_dir: str
    waves: list[WaveMetrics] = field(default_factory=list)
    seen: SeenSet | None = None

    @property
    def total_fetched(self) -> int:
        return sum(w.fetched_ok for w in self.waves)

    def fetched_dataset(self) -> "ray.data.Dataset":
        """All fetched pages across waves; global order = (wave, crawl_rank)."""
        return ray.data.read_parquet(os.path.join(self.out_dir, "fetched"))


def _read_candidates(
    path: str, rows_per_block: int = 32768, n: int | None = None
) -> "tuple[ray.data.Dataset, int]":
    """Read a candidate dir split into ~``rows_per_block``-row blocks;
    returns ``(dataset, row_count)``.

    Block count propagates through the whole wave: Ray's range-partition
    sort emits as many partitions as input blocks. Sort exchange cost
    grows with input_blocks × partitions (O(B²) small objects), so
    blocks stay COARSE here (~32 k rows) and the LAST exchange's output
    is sliced finer for CPU-bound downstream tasks instead
    (``schedule(rank_split=...)`` → ``index._add_rank_split``) — fine
    task granularity without a fine sort. Pass ``n`` when the caller
    already knows the row count (e.g. it just wrote the dir); otherwise
    one metadata-only pass reads it from the parquet footers.
    """
    if n is None:
        # parquet-footer metadata scan (pyarrow, driver-side) — no Ray
        # job startup for a pure row count
        if os.path.isfile(path):
            n = pq.ParquetFile(path).metadata.num_rows
        else:
            n = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(
                    os.path.join(path, "**", "*.parquet"), recursive=True
                )
            )
    if n == 0:
        return ray.data.read_parquet(path), 0
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    blocks = int(min(512, max(2 * ncpu, n // rows_per_block)))
    return ray.data.read_parquet(path, override_num_blocks=blocks), n


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def _read_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"completed_through": -1, "waves": []}


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(out_dir))  # atomic publish


def run_crawl(
    seeds: "pa.Table | ray.data.Dataset | None",
    pagestore: "pa.Table | ray.data.Dataset | str",
    robots: pa.Table,
    out_dir: str,
    config: CrawlConfig | None = None,
    resume: bool = False,
    seeds_path: str | None = None,
) -> CrawlResult:
    """Run (or resume) a multi-wave crawl. See module docstring.

    ``pagestore`` may be an in-memory Table (broadcast for small
    stores), a Dataset, or a parquet/Lance path (both → hash-join fetch,
    the at-scale path; a Table above ``broadcast_limit_bytes`` is also
    joined), or ``None`` with ``fetch_mode="http"`` (live transport:
    real GETs via stages/transport.HTTPFetcher with wall-clock per-host
    politeness — the network is the store). The wave loop is identical
    in every mode.

    ``seeds_path``: path of an ALREADY-DURABLE frontier parquet dir to
    reference as wave 0 instead of copying it under
    ``out_dir/candidates/`` — at 10^10-URL scale the wave-0 copy is a
    full extra write+read of the frontier for no durability gain (the
    source file IS the checkpoint). The path is recorded in the
    manifest so a resume of wave 0 re-reads the same source; later
    waves checkpoint under ``out_dir`` exactly as before."""
    cfg = config or CrawlConfig()
    # Window scoping covers the WHOLE run layout (candidates, fetched,
    # manifest, seen): a new window (e.g. a new day when
    # seen_epoch_scope="2025-06-21") is a fresh sub-run starting from an
    # empty seen-set — the reference's day-scoped reset
    # (scheduler.py:43-44) as explicit config, not wall clock. Scoping
    # only the seen dir would let two windows' candidates/fetched files
    # interleave in one directory tree.
    if cfg.seen_epoch_scope:
        out_dir = os.path.join(out_dir, f"window-{cfg.seen_epoch_scope}")
    os.makedirs(os.path.join(out_dir, "candidates"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "fetched"), exist_ok=True)
    seen_dir = os.path.join(out_dir, "seen")

    robots_ref = ray.put(robots_table_to_config(robots))
    from ..stages.fetch import (
        broadcast_pagestore,
        fetch_decode_sharded,
        fetch_join,
        fetch_sharded,
        stage_shards,
    )

    shard_dir, num_store_shards = None, 0
    use_http = cfg.fetch_mode == "http"
    limiter_shards: list | None = None
    if use_http:
        # live transport: the network is the store — no broadcast, no
        # join, no shards. One set of token-bucket actors serves the
        # whole run (politeness budget is global per host, however wide
        # the fetch pool is).
        from ..stages.ratelimit import TokenBucketShard

        pagestore = None
        limiter_shards = [
            TokenBucketShard.remote() for _ in range(cfg.http_rate_shards)
        ]
        if cfg.http_prior_etags_path:
            # prior-crawl etags: column-pruned driver read (narrow — two
            # strings per previously-fetched url), broadcast ONCE
            import pyarrow.dataset as pads

            et = pads.dataset(cfg.http_prior_etags_path).to_table(
                columns=["url", "etag"]
            )
            etag_map = {
                u: e
                for u, e in zip(
                    et["url"].to_pylist(), et["etag"].to_pylist()
                )
                if e is not None
            }
            prior_etags_ref = ray.put(etag_map)
        else:
            prior_etags_ref = None
    elif isinstance(pagestore, str):
        if os.path.isdir(os.path.join(pagestore, "shard-0")):
            # hash-partitioned store (stages.fetch.partition_pagestore):
            # the preferred at-scale layout — waves shuffle only narrow
            # frontier rows, payload bytes never move between workers
            shard_dir = pagestore
            from ..stages.fetch import read_store_manifest

            num_store_shards = read_store_manifest(pagestore)
        else:
            from ..sources.pagestore import read_pagestore

            pagestore = read_pagestore(pagestore)
    use_join = (
        not use_http
        and shard_dir is None
        and not isinstance(pagestore, pa.Table)
    )
    if cfg.fetch_mode == "join":
        use_join = True
        if isinstance(pagestore, pa.Table):
            pagestore = ray.data.from_arrow(pagestore)
    elif (
        cfg.fetch_mode == "auto"
        and isinstance(pagestore, pa.Table)
        and pagestore.nbytes > cfg.broadcast_limit_bytes
    ):
        use_join = True
        pagestore = ray.data.from_arrow(pagestore)
    store_ref = (
        broadcast_pagestore(pagestore)
        if (shard_dir is None and not use_join and not use_http)
        else None
    )

    seen = SeenSet(cfg.num_seen_shards, cfg.seen_capacity_per_shard)
    manifest = _read_manifest(out_dir) if resume else {"completed_through": -1, "waves": []}
    start_wave = manifest["completed_through"] + 1
    result = CrawlResult(out_dir=out_dir, seen=seen)
    result.waves = [WaveMetrics(**w) for w in _strip_derived(manifest["waves"])]

    if resume and start_wave > 0:
        # replay deltas through epoch start_wave = state after the last
        # MANIFEST-completed wave — an orphan checkpoint from a crash
        # mid-wave is deliberately skipped (its wave re-runs). A silent
        # empty restore would re-crawl every seen URL, so fail loudly
        # when the manifest says keys must exist but none were found
        # (layout / window mismatch)
        restored = seen.restore(seen_dir, max_epoch=start_wave)
        prior_scheduled = sum(w.get("scheduled", 0) for w in manifest["waves"])
        if restored == 0 and prior_scheduled > 0:
            raise RuntimeError(
                f"resume: no seen-set checkpoint under {seen_dir} but the "
                f"manifest records {prior_scheduled} scheduled URLs — "
                "check seen_epoch_scope / checkpoint layout"
            )
        cand_path = os.path.join(out_dir, "candidates", f"wave-{start_wave}")
        if not os.path.exists(cand_path):
            return result  # crawl had already drained
        candidates, cand_n = _read_candidates(cand_path)
    elif resume and seeds is None and seeds_path is None:
        # Resume of a run that crashed BEFORE completing wave 0
        # (completed_through == -1): re-read the recorded wave-0 source —
        # either the checkpointed copy under candidates/wave-0 (seeds
        # runs) or the manifest's seed_source (seeds_path runs, whose
        # wave 0 is never copied). Falling into the seeding branch here
        # would crash on seeds=None.
        seed_path = os.path.join(out_dir, "candidates", "wave-0")
        src = manifest.get("seed_source")
        if os.path.exists(seed_path):
            candidates, cand_n = _read_candidates(seed_path)
        elif src and os.path.exists(src):
            candidates, cand_n = _read_candidates(src)
        else:
            raise RuntimeError(
                f"resume: wave 0 never checkpointed under {out_dir} and "
                "the manifest records no seed_source — pass seeds or "
                "seeds_path to re-seed"
            )
    else:
        if seeds_path is not None:
            src_schema = ray.data.read_parquet(seeds_path).schema()
            got = list(zip(src_schema.names, src_schema.types))
            want = [(f.name, f.type) for f in FRONTIER_SCHEMA]
            if got != want:
                # the copy path casts through FRONTIER_SCHEMA; a
                # referenced source must already BE frontier-shaped
                raise TypeError(
                    f"seeds_path {seeds_path} schema {got} != frontier "
                    f"schema {want} — pass it as `seeds` to cast-copy"
                )
            manifest["seed_source"] = seeds_path
            _write_manifest(out_dir, manifest)
            candidates, cand_n = _read_candidates(seeds_path)
        else:
            if isinstance(seeds, pa.Table):
                candidates = ray.data.from_arrow(seeds)
            else:
                candidates = seeds
            seed_path = os.path.join(out_dir, "candidates", "wave-0")
            if not os.path.exists(seed_path):
                _write_candidates(candidates, seed_path)
            candidates, cand_n = _read_candidates(seed_path)

    pools = _resolve_pools(cfg)
    store_shard_refs: list | None = None
    if cfg.stage_store_to_plasma and shard_dir is not None:
        # launch the (parallel, remote) shard loads NOW so they overlap
        # the first wave's dedup/schedule phases — refs resolve lazily in
        # the fetch workers' first ray.get
        store_shard_refs = stage_shards(shard_dir, num_store_shards)
    trace = os.environ.get("NC_CRAWL_TRACE") == "1"
    pending: dict | None = None  # previous wave's deferred finalization

    def _tr(label, t_start):
        if trace:
            print(f"[crawl-trace] {label}: {time.monotonic() - t_start:.1f}s", flush=True)
        return time.monotonic()

    # page budget resumes from the manifest: finalized waves' scheduled
    # counts are already durable there
    cum_scheduled = sum(w.scheduled for w in result.waves)

    for wave in range(start_wave, cfg.max_waves):
        t0 = time.monotonic()
        n_candidates = cand_n
        if n_candidates == 0:
            break
        if cfg.max_pages is not None and cum_scheduled >= cfg.max_pages:
            break

        tp = time.monotonic()
        if cfg.max_url_depth is not None:
            # pre-seen depth cap: over-deep candidates vanish from THIS
            # wave without being marked seen (a shallower rediscovery
            # later still fetches them)
            _cap = cfg.max_url_depth

            candidates = candidates.map_batches(
                lambda t, _c=_cap: t.filter(pc.less_equal(t["depth"], _c)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if cfg.schedule_strategy == "fused":
            from ..stages.index import zip_with_index
            from ..stages.politeness import schedule_fused

            canon = canonicalize(candidates, with_sha1=False)
            scheduled = schedule_fused(
                canon,
                robots_ref,
                seen.shards,
                concurrency=pools["schedule"]["concurrency"],
                num_cpus=pools["schedule"].get("num_cpus"),
                default_delay_ms=cfg.default_delay_ms,
                num_partitions=cfg.schedule_partitions,
            )
            if cfg.compute_crawl_rank:
                scheduled = zip_with_index(
                    scheduled,
                    ["fetch_at_us", "priority", "url"],
                    [False, True, False],
                    rank_col="crawl_rank",
                )
            tp = _tr("fused schedule", tp)
        elif cfg.schedule_strategy == "sorted":
            # default: ONE host sort + donation stitch + fused kernel as
            # tasks — single exchange, no per-wave pool startups
            from ..stages.index import zip_with_index
            from ..stages.politeness import schedule_sorted_fused

            canon = canonicalize(candidates, with_sha1=False)
            scheduled = schedule_sorted_fused(
                canon,
                robots_ref,
                seen.shards,
                default_delay_ms=cfg.default_delay_ms,
                # ~32 k-row sort blocks → ~8 k-row downstream tasks: the
                # fused fetch+decode (~160 µs/row) packs every pool
                # without a single wide straggler setting the wave wall
                rank_split=4,
            )
            if cfg.compute_crawl_rank:
                scheduled = zip_with_index(
                    scheduled,
                    ["fetch_at_us", "priority", "url"],
                    [False, True, False],
                    rank_col="crawl_rank",
                )
            tp = _tr("sorted-fused schedule", tp)
        else:
            # two_sort strategy: dedup keys on the canonical URL string
            # directly, so the per-row SHA-1 seen-key loop runs only on
            # dedup SURVIVORS (the candidate stream is several times
            # larger); seen-filter + politeness rank follow as before.
            canon = canonicalize(candidates, with_sha1=False)
            if cfg.dedup_strategy == "sort":
                deduped = dedup_frontier_sorted(canon, key="url")
            else:
                deduped = dedup_frontier(canon, num_partitions=cfg.dedup_partitions, key="url")
            tp = _tr("dedup(eager)", tp)

            def add_sha1(t: pa.Table) -> pa.Table:
                from ..functions.urlnorm import sha1_array

                return t.append_column("url_sha1", sha1_array(t["url"]))

            keyed = deduped.map_batches(
                add_sha1, batch_format="pyarrow", zero_copy_batch=True
            )
            fresh = keyed.map_batches(
                SeenFilterStage,
                fn_constructor_kwargs={"shards": seen.shards},
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,  # block-sized batches: ~16 shard RPCs per
                # BLOCK, not per 1024-row default batch (32k RPCs/wave)
                concurrency=pools["seen"]["concurrency"],
                num_cpus=pools["seen"].get("num_cpus"),
            )
            scheduled = schedule(
                fresh,
                robots_ref,
                concurrency=pools["robots"]["concurrency"],
                robots_num_cpus=pools["robots"].get("num_cpus"),
                default_delay_ms=cfg.default_delay_ms,
                num_partitions=cfg.dedup_partitions,
                with_crawl_rank=cfg.compute_crawl_rank,
                # ~32 k-row sort blocks → ~8 k-row downstream tasks: the
                # fused fetch+decode (~160 µs/row) packs every pool
                # without a single wide straggler setting the wave wall
                rank_split=4,
            )
            tp = _tr("seen+schedule(eager sorts)", tp)
        fused_decode = (
            shard_dir is not None and cfg.verify_payloads and cfg.fuse_fetch_decode
        )
        if use_http:
            from ..stages.transport import fetch_http

            fetched_raw = fetch_http(
                scheduled,
                cfg.http_base_url,
                limiter_shards=limiter_shards,
                rate_per_s=cfg.http_rate_per_s,
                burst=cfg.http_burst,
                timeout_s=cfg.http_timeout_s,
                attempts=cfg.http_attempts,
                concurrency=pools["fetch"]["concurrency"],
                num_cpus=pools["fetch"].get("num_cpus"),
                batch_size=cfg.http_batch_size,
                prior_etags=prior_etags_ref,
                emit_etag=cfg.http_emit_etag,
            )
        elif fused_decode:
            fetched_raw = fetch_decode_sharded(
                scheduled,
                shard_dir,
                num_shards=num_store_shards,
                shard_refs=store_shard_refs,
            )
        elif shard_dir is not None:
            fetched_raw = fetch_sharded(
                scheduled,
                shard_dir,
                num_shards=num_store_shards,
                concurrency=pools["fetch"]["concurrency"],
                num_cpus=pools["fetch"].get("num_cpus"),
                shard_refs=store_shard_refs,
            )
        elif use_join:
            fetched_raw = fetch_join(
                scheduled, pagestore, num_partitions=cfg.dedup_partitions
            )
        else:
            fetched_raw = fetch_broadcast(
                scheduled,
                store_ref,
                concurrency=pools["fetch"]["concurrency"],
                num_cpus=pools["fetch"].get("num_cpus"),
                batch_size=cfg.fetch_batch_size,
            )
        if cfg.verify_payloads and not fused_decode:
            if cfg.verify_mode == "tasks":
                # the codec is stateless (zlib+numpy) — task-based map
                # lets the dominant stage soak up every idle CPU instead
                # of a fixed actor reservation (a real model-loading
                # decoder would use the actor form below)
                from ..ops.multimodal import decode_features_batch

                fetched_raw = fetched_raw.map_batches(
                    decode_features_batch,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=1024,
                )
            else:
                from ..ops.multimodal import ImageDecodeStage

                fetched_raw = fetched_raw.map_batches(
                    ImageDecodeStage,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=1024,
                    concurrency=pools["verify"]["concurrency"],
                    num_cpus=pools["verify"].get("num_cpus"),
                )
        fetched = fetched_raw.map_batches(
            lambda t, w=wave: t.append_column("wave", pa.array([w] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        wave_dir = os.path.join(out_dir, "fetched", f"wave-{wave}")
        # hive-partitioned by fetch_status: status counts become a
        # parquet-footer metadata read (no data pass at all) and the
        # outlink expansion reads ONLY the ok partition with pruned
        # columns — replaces a full narrow-column materialize + two
        # passes per wave. Written to a tmp dir and atomically published:
        # a run killed MID-write leaves part files behind, and a resumed
        # re-run of the wave would otherwise APPEND to them (duplicate
        # rows in fetched/)
        tmp_dir = wave_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        fetched.write_parquet(tmp_dir, partition_cols=["fetch_status"])
        # a fully-filtered wave (every candidate seen/blocked) writes no
        # files at all — publish an empty dir so the layout stays uniform
        os.makedirs(tmp_dir, exist_ok=True)
        shutil.rmtree(wave_dir, ignore_errors=True)
        os.replace(tmp_dir, wave_dir)
        # Seen checkpoint futures launch NOW — every insert of this wave
        # completed with the pipeline above, and the next wave's inserts
        # cannot start until its own pipeline executes, so the epoch
        # delta is exact while the actual writes overlap the counts +
        # outlink passes below instead of serializing after them.
        ckpt_futs = [
            s.checkpoint.remote(seen_dir, wave + 1) for s in seen.shards
        ]
        tp = _tr("fetch+write", tp)
        if trace and os.environ.get("NC_CRAWL_STATS") == "1":
            print(f"[crawl-stats] wave {wave}:\n{fetched.stats()}", flush=True)

        # status counts straight from parquet footers (pyarrow metadata
        # reads; no Ray job startup per status dir)
        counts = {"ok": 0, "missing": 0}
        for status_dir in glob.glob(os.path.join(wave_dir, "fetch_status=*")):
            status = os.path.basename(status_dir).split("=", 1)[1]
            counts[status] = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(status_dir, "*.parquet"))
            )
        counts["total"] = sum(v for k, v in counts.items())
        tp = _tr("counts", tp)
        next_path = os.path.join(out_dir, "candidates", f"wave-{wave + 1}")
        outlink_cols = ["caption", "priority", "discovered_at", "depth"]
        frontier_cols = [f.name for f in FRONTIER_SCHEMA]
        if counts["ok"]:
            outlinks = extract_outlinks(
                ray.data.read_parquet(
                    os.path.join(wave_dir, "fetch_status=ok"), columns=outlink_cols
                ),
                decay=cfg.outlink_decay,
            ).map_batches(
                lambda t: t.select(frontier_cols).cast(FRONTIER_SCHEMA),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            # materialize ONCE (narrow rows): the durable candidates
            # write moves to a background thread while the next wave's
            # schedule consumes the same blocks in memory — the
            # write+read-back round trip leaves the critical path
            out_mat = outlinks.materialize()
            n_outlinks = out_mat.count()
        else:
            out_mat = ray.data.from_arrow(FRONTIER_SCHEMA.empty_table())
            n_outlinks = 0
        writer_err: list[BaseException] = []

        def _bg_write(mat=out_mat, path=next_path, err=writer_err):
            try:
                _write_candidates_mat(mat, path)
            except BaseException as e:  # surfaced at finalize
                err.append(e)

        writer = threading.Thread(target=_bg_write, daemon=True)
        writer.start()
        tp = _tr("outlinks", tp)

        ray.get(ckpt_futs)
        _tr("seen_checkpoint", tp)
        elapsed = time.monotonic() - t0
        cum_scheduled += counts["total"]
        wm = WaveMetrics(
            wave=wave,
            candidates=n_candidates,
            scheduled=counts["total"],
            fetched_ok=counts["ok"],
            missing=counts["missing"],
            outlinks=n_outlinks,
            elapsed_s=elapsed,
        )
        # Finalize the PREVIOUS wave now: its candidates writer had this
        # whole wave to finish, so the join is ~free. Manifest entries
        # stay strictly ordered; a crash inside wave N re-runs wave N-1
        # too (its entry was pending) — idempotent by the atomic-publish
        # discipline on every wave artifact.
        if pending is not None:
            _finalize_wave(pending, result, manifest, out_dir)
            _maybe_compact_seen(cfg, seen_dir, manifest, out_dir)
        pending = {"writer": writer, "err": writer_err, "wm": wm, "wave": wave}

        if n_outlinks == 0:
            break
        nb = out_mat.num_blocks()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        if nb > 512:
            # bound the next schedule sort's partition count (sort cost
            # grows with input_blocks × partitions)
            out_mat = out_mat.repartition(512).materialize()
        elif nb < ncpu and n_outlinks > 4096 * ncpu:
            # floor it too: the schedule sort emits as many partitions
            # as input blocks, so a narrow outlink materialization
            # (e.g. 3 extract tasks after a small wave) would run the
            # next wave's whole exchange at a fraction of the cluster —
            # the multiwave scaling window showed later waves starving.
            # One cheap narrow-row repartition buys full sort width.
            out_mat = out_mat.repartition(2 * ncpu).materialize()
        candidates, cand_n = out_mat, n_outlinks

    if pending is not None:
        _finalize_wave(pending, result, manifest, out_dir)
        _maybe_compact_seen(cfg, seen_dir, manifest, out_dir)
    return result


def _maybe_compact_seen(
    cfg: CrawlConfig, seen_dir: str, manifest: dict, out_dir: str
) -> None:
    """Retention policy for seen-set delta checkpoints (VERDICT r4 #4):
    once ``seen_compact_every`` finalized epochs have accumulated past
    ``manifest["seen_compacted_through"]``, fold every shard's deltas up
    to the last FINALIZED epoch (``completed_through + 1`` — the
    in-flight wave's epoch and any crash orphan stay out, preserving
    resume's ``max_epoch`` orphan-skip exactly), then record the fold in
    the manifest. Compaction is idempotent and crash-safe
    (stages/seen.compact_checkpoints), so a crash between the folds and
    the manifest write only means one redundant re-fold on resume."""
    if not cfg.seen_compact_every:
        return
    finalized_epoch = manifest["completed_through"] + 1
    done_through = manifest.get("seen_compacted_through", 0)
    if finalized_epoch - done_through < cfg.seen_compact_every:
        return
    from ..stages.seen import compact_shard_task

    ray.get(
        [
            compact_shard_task.remote(seen_dir, s, finalized_epoch)
            for s in range(cfg.num_seen_shards)
        ]
    )
    manifest["seen_compacted_through"] = finalized_epoch
    _write_manifest(out_dir, manifest)


def _finalize_wave(pending: dict, result: "CrawlResult", manifest: dict, out_dir: str) -> None:
    """Join a wave's background candidates writer and publish its
    manifest entry (strictly ordered; called one wave later or at loop
    exit)."""
    pending["writer"].join()
    if pending["err"]:
        raise pending["err"][0]
    wm = pending["wm"]
    result.waves.append(wm)
    manifest["completed_through"] = pending["wave"]
    manifest["waves"].append(wm.to_json())
    _write_manifest(out_dir, manifest)


def _resolve_pools(cfg: CrawlConfig) -> dict[str, dict]:
    """Turn "auto" pool configs into fixed sizes scaled to cluster CPUs.

    Fractions: robots 8%, seen-filter 15%, fetch 15%, payload-verify 50%
    of session CPUs (min 1 actor each), each actor at
    ``pool_actor_cpus`` logical CPUs so task operators (reads, sorts)
    always keep scheduling headroom. Fixed pools start eagerly and keep
    the whole cluster busy; autoscaling pools were measured to plateau.
    """
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    fracs = {"robots": 0.08, "seen": 0.15, "fetch": 0.25, "verify": 0.5,
             "schedule": 0.35}
    out: dict[str, dict] = {}
    for name, key in (
        ("robots", "robots_concurrency"),
        ("seen", "seen_filter_concurrency"),
        ("fetch", "fetch_concurrency"),
        ("verify", "verify_concurrency"),
        ("schedule", "schedule_concurrency"),
    ):
        val = getattr(cfg, key)
        if val == "auto":
            out[name] = {
                "concurrency": max(1, int(ncpu * fracs[name])),
                "num_cpus": cfg.pool_actor_cpus,
            }
        else:
            out[name] = {"concurrency": val}
    return out


def _strip_derived(waves: list[dict]) -> list[dict]:
    return [{k: v for k, v in w.items() if k != "urls_per_sec"} for w in waves]


def _write_candidates_mat(mat: "ray.data.Dataset", path: str) -> None:
    """Durable-publish an ALREADY-materialized, already-frontier-cast
    candidates dataset (background-thread path of the wave loop: the
    next wave consumes the same blocks in memory, this write is pure
    durability). Same tmp+rename discipline as :func:`_write_candidates`."""
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    mat.write_parquet(tmp)
    if not os.path.isdir(tmp) or not os.listdir(tmp):
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            FRONTIER_SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet")
        )
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def _write_candidates(ds: "ray.data.Dataset", path: str) -> int:
    """Write next-wave candidates to a parquet dir (parallel), return rows.

    Candidates are narrow rows (urls + floats, no binary); blocks are
    written by workers, the driver only sees the count. The dir-per-wave
    layout is the resumable contract — at 10^10 scale the same dirs get
    partitioned by url_sha1 prefix.
    """
    cols = [f.name for f in FRONTIER_SCHEMA]
    casted = ds.map_batches(
        lambda t: t.select(cols).cast(FRONTIER_SCHEMA),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tmp = path + ".tmp"
    # a run killed mid-write leaves part files in tmp (write_parquet
    # would APPEND beside them → duplicate candidates), and a run killed
    # between publish and manifest-append leaves the TARGET dir populated
    # (os.replace onto a non-empty dir raises ENOTEMPTY) — clear both,
    # same publish discipline as the wave_dir write above
    shutil.rmtree(tmp, ignore_errors=True)
    casted.write_parquet(tmp)  # single pass; workers write their blocks
    if not os.path.isdir(tmp) or not os.listdir(tmp):
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(FRONTIER_SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet"))
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)  # atomic publish of the wave's candidate dir
    # row count from parquet footers only — no second pass over the data
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
