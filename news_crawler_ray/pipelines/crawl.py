"""End-to-end crawl pipeline: the engine's flagship.

Wave-loop analog of the reference's scheduled jobs
(/root/reference/src/secbot/scheduler.py:39-89 seen-set cycle,
src/secbot/fetchers/asec.py:129-148 listing→post expansion): each wave is
one lazy Ray Data pipeline

    candidates → canonicalize → frontier-dedup (hash shuffle)
               → seen-filter (sharded actors, exact)
               → politeness schedule (robots + per-host virtual clock)
               → fetch (broadcast keyed lookup into the page-store)
               → write parquet (resumable layout) + metrics

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

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.canonicalize import canonicalize
from ..stages.dedup import dedup_frontier
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
    fetch_concurrency: int | tuple = (1, 2)  # autoscaling pool: min 1 actor
    seen_filter_concurrency: int | tuple = (1, 4)
    fetch_batch_size: int = 1024
    default_delay_ms: int = 1000
    outlink_decay: float = 0.5
    # day-window semantics as config, not accident (reference resets the
    # seen-set daily, scheduler.py:43-44): None = never reset
    seen_epoch_scope: str | None = None


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
    seeds: pa.Table | "ray.data.Dataset",
    pagestore: pa.Table,
    robots: pa.Table,
    out_dir: str,
    config: CrawlConfig | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Run (or resume) a multi-wave crawl. See module docstring.

    ``pagestore`` is broadcast via ``ray.put`` once — at real scale this
    becomes :func:`news_crawler_ray.stages.fetch.fetch_join` against a
    Lance/parquet page-store Dataset; the wave loop is unchanged.
    """
    cfg = config or CrawlConfig()
    os.makedirs(os.path.join(out_dir, "candidates"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "fetched"), exist_ok=True)
    seen_dir = os.path.join(out_dir, "seen")

    robots_ref = ray.put(robots_table_to_config(robots))
    from ..stages.fetch import broadcast_pagestore

    store_ref = broadcast_pagestore(pagestore)

    seen = SeenSet(cfg.num_seen_shards, cfg.seen_capacity_per_shard)
    manifest = _read_manifest(out_dir) if resume else {"completed_through": -1, "waves": []}
    start_wave = manifest["completed_through"] + 1
    result = CrawlResult(out_dir=out_dir, seen=seen)
    result.waves = [WaveMetrics(**w) for w in _strip_derived(manifest["waves"])]

    if resume and start_wave > 0:
        seen.restore(seen_dir)  # latest epoch = state after last completed wave
        cand_path = os.path.join(out_dir, "candidates", f"wave-{start_wave}")
        if not os.path.exists(cand_path):
            return result  # crawl had already drained
        candidates = ray.data.read_parquet(cand_path)
    else:
        if isinstance(seeds, pa.Table):
            candidates = ray.data.from_arrow(seeds)
        else:
            candidates = seeds
        seed_path = os.path.join(out_dir, "candidates", "wave-0")
        if not os.path.exists(seed_path):
            _write_candidates(candidates, seed_path)
        candidates = ray.data.read_parquet(seed_path)

    for wave in range(start_wave, cfg.max_waves):
        t0 = time.monotonic()
        n_candidates = candidates.count()
        if n_candidates == 0:
            break

        canon = canonicalize(candidates)
        deduped = dedup_frontier(canon, num_partitions=cfg.dedup_partitions)
        fresh = deduped.map_batches(
            SeenFilterStage,
            fn_constructor_kwargs={"shards": seen.shards},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=cfg.seen_filter_concurrency,
        )
        scheduled = schedule(
            fresh,
            robots_ref,
            concurrency=cfg.fetch_concurrency,
            default_delay_ms=cfg.default_delay_ms,
            num_partitions=cfg.dedup_partitions,
        )
        fetched = fetch_broadcast(
            scheduled,
            store_ref,
            concurrency=cfg.fetch_concurrency,
            batch_size=cfg.fetch_batch_size,
        ).map_batches(
            lambda t, w=wave: t.append_column("wave", pa.array([w] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        wave_dir = os.path.join(out_dir, "fetched", f"wave-{wave}")
        fetched.write_parquet(wave_dir)

        # re-reads below prune to the columns they need — the wide
        # ``bytes`` payload column never leaves parquet again
        counts = _wave_counts(
            ray.data.read_parquet(wave_dir, columns=["fetch_status"])
        )
        outlink_cols = ["caption", "priority", "discovered_at", "depth", "fetch_status"]
        outlinks = extract_outlinks(
            ray.data.read_parquet(wave_dir, columns=outlink_cols).filter(
                expr="fetch_status == 'ok'"
            ),
            decay=cfg.outlink_decay,
        )
        next_path = os.path.join(out_dir, "candidates", f"wave-{wave + 1}")
        n_outlinks = _write_candidates(outlinks, next_path)

        seen.checkpoint(seen_dir, epoch=wave + 1)
        elapsed = time.monotonic() - t0
        wm = WaveMetrics(
            wave=wave,
            candidates=n_candidates,
            scheduled=counts["total"],
            fetched_ok=counts["ok"],
            missing=counts["missing"],
            outlinks=n_outlinks,
            elapsed_s=elapsed,
        )
        result.waves.append(wm)
        manifest["completed_through"] = wave
        manifest["waves"].append(wm.to_json())
        _write_manifest(out_dir, manifest)

        if n_outlinks == 0:
            break
        candidates = ray.data.read_parquet(next_path)

    return result


def _strip_derived(waves: list[dict]) -> list[dict]:
    return [{k: v for k, v in w.items() if k != "urls_per_sec"} for w in waves]


def _wave_counts(fetched: "ray.data.Dataset") -> dict:
    """Status counts via per-batch partials + driver merge — a groupby
    here would launch a whole hash-shuffle for a 2-row result."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t["fetch_status"].combine_chunks().value_counts()
        return pa.table(
            {
                "fetch_status": vc.field("values"),
                "n": vc.field("counts"),
            }
        )

    agg: dict[str, int] = {}
    for row in fetched.map_batches(partial, batch_format="pyarrow").take_all():
        agg[row["fetch_status"]] = agg.get(row["fetch_status"], 0) + row["n"]
    ok = int(agg.get("ok", 0))
    missing = int(agg.get("missing", 0))
    return {"ok": ok, "missing": missing, "total": ok + missing}


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
    mat = casted.materialize()
    total = mat.count()
    tmp = path + ".tmp"
    if total == 0:
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(FRONTIER_SCHEMA.empty_table(), os.path.join(tmp, "empty.parquet"))
    else:
        mat.write_parquet(tmp)
    os.replace(tmp, path)  # atomic publish of the wave's candidate dir
    return total
