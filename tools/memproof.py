"""Bounded-memory proof at ~10x bench data under a CAPPED object store
(VERDICT r4 #3).

Everything else in BENCH/BASELINE is measured at sf0.1 / 2-8 M-row
frontiers, comfortably inside this box's 128 GiB. This tool runs the
flagship crawl at a ~20 M-row frontier over a 5x (10 M-page) sharded
store, PLUS the five most expensive registry queries at 10x their
sf0.1 inputs — all inside one Ray session whose object store is capped
(default 16 GiB) — and records:

* peak object-store usage (polled via ``ray.available_resources`` —
  cap minus available, sampled at 4 Hz on a daemon thread);
* spilled bytes / object count (parsed from Ray's memory summary);
* driver peak RSS (``ru_maxrss`` — a driver-side materialization bug
  shows up HERE, not in plasma);
* per-stage wall times.

PASS = every job completes with no OOM and driver RSS stays flat; the
object store is ALLOWED to spill — that is the design (let plasma
spill rather than hold Python lists). The result JSON line goes into
BASELINE.md's bounded-memory entry.

Usage:
    python tools/memproof.py                      # full 20M/10M proof
    python tools/memproof.py --quick              # 2M/1M smoke (~1 min)
    python tools/memproof.py --object-store-gb 8  # tighter cap
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the big store lives on DISK (not /dev/shm): tmpfs pages are RAM, and
# a 25 GB store in RAM would silently un-cap the experiment
IO_DIR = os.environ.get("MEMPROOF_IO_DIR", "/tmp/nc_memproof")


class PlasmaPeakTracker:
    """Samples object-store usage (cap - available) at ~4 Hz."""

    def __init__(self, cap_bytes: int):
        import ray

        self._ray = ray
        self.cap = cap_bytes
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                avail = self._ray.available_resources().get(
                    "object_store_memory", self.cap
                )
                self.peak = max(self.peak, self.cap - int(avail))
            except Exception:
                pass
            time.sleep(0.25)

    def stop(self) -> int:
        self._stop.set()
        self._t.join(timeout=2)
        return self.peak


def _spill_stats() -> dict:
    """Spilled MiB / object count. Primary: Ray's memory summary;
    fallback (this container lacks ``grpc``, which that API imports):
    scan the session raylet log for its periodic 'Spilled N MiB, M
    objects' lines and take the LAST (cumulative) one."""
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB, (\d+) objects", txt)
        out = {"spilled_mib": 0, "spilled_objects": 0, "source": "memory_summary"}
        if m:
            out.update(spilled_mib=int(m.group(1)), spilled_objects=int(m.group(2)))
        return out
    except Exception:
        pass
    out = {"spilled_mib": 0, "spilled_objects": 0, "source": "raylet_log"}
    try:
        import glob as _glob

        last = None
        for p in _glob.glob("/tmp/ray/session_latest/logs/raylet*.out"):
            with open(p, errors="replace") as f:
                for line in f:
                    m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
                    if m:
                        last = m
        if last:
            out.update(
                spilled_mib=int(last.group(1)),
                spilled_objects=int(last.group(2)),
            )
    except OSError as e:
        out["error"] = repr(e)[:120]
    return out


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)


def _big_fixture(n_frontier: int, n_store: int) -> tuple[str, str]:
    """20 M-row frontier (two seed passes over the same 10 M-page URL
    space — the second pass is ~all duplicates, so dedup runs at the
    full 20 M while fetch/decode runs at the store's 10 M) + the 5x
    page store hash-partitioned ON DISK."""
    import pyarrow.parquet as pq

    from news_crawler_ray.fixtures import synth

    d = os.path.join(IO_DIR, f"fix_f{n_frontier}_s{n_store}")
    marker = os.path.join(d, "_done")
    frontier_path = os.path.join(d, "frontier.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        store = synth.make_pagestore(
            n_store, seed=42, image_pool=64, sizes=(32,)
        )
        pq.write_table(
            store, os.path.join(d, "pagestore.parquet"), row_group_size=100_000
        )
        del store
        parts = []
        per_seed = n_frontier // 2
        for seed in (42, 43):
            parts.append(synth.make_frontier(per_seed, seed=seed))
        import pyarrow as pa

        pq.write_table(
            pa.concat_tables(parts), frontier_path, row_group_size=100_000
        )
        del parts
        pq.write_table(
            synth.make_robots(seed=42), os.path.join(d, "robots.parquet")
        )
        open(marker, "w").close()
    shard_dir = os.path.join(d, "store_sharded")
    if not os.path.exists(os.path.join(shard_dir, "store_manifest.json")):
        import ray.data

        from news_crawler_ray.stages.fetch import partition_pagestore

        partition_pagestore(
            ray.data.read_parquet(os.path.join(d, "pagestore.parquet")),
            shard_dir,
            num_shards=32,
        )
    return d, shard_dir


def _scaled_tables(sf_dir: str, scale: int) -> str:
    """documents/events x``scale`` (id-offset replicas; customer stays
    1x so the skew join's hot keys get ``scale``x hotter — the stress
    direction), written once under IO_DIR."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = os.path.join(IO_DIR, f"sf_x{scale}")
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for name, id_cols in (
        ("documents", ["doc_id"]),
        ("events", ["event_id"]),
    ):
        t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        offs = {c: pc.max(t[c]).as_py() + 1 for c in id_cols}
        reps = []
        for k in range(scale):
            r = t
            for c in id_cols:
                r = r.set_column(
                    r.column_names.index(c), c,
                    pc.add(r[c], k * offs[c]),
                )
            reps.append(r)
        pq.write_table(
            pa.concat_tables(reps),
            os.path.join(d, f"{name}.parquet"),
            row_group_size=100_000,
        )
    for name in ("customer",):
        shutil.copyfile(
            os.path.join(sf_dir, f"{name}.parquet"),
            os.path.join(d, f"{name}.parquet"),
        )
    open(marker, "w").close()
    return d


def run_proof(
    n_frontier: int,
    n_store: int,
    cap_gb: float,
    sf_dir: str,
    scale: int,
) -> dict:
    import ray

    cap = int(cap_gb * (1 << 30))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            object_store_memory=cap,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from news_crawler_ray.context import configure

    configure()
    result: dict = {
        "metric": "memproof",
        "object_store_cap_gb": cap_gb,
        "frontier_rows": n_frontier,
        "store_rows": n_store,
        "query_scale": scale,
        "stages": {},
    }

    # ---------------------------------------------------- flagship crawl
    # fixture prep ran in a SUBPROCESS (see main) so this process's
    # ru_maxrss reflects the DRIVER under load, not table generation;
    # the call here is a cached no-op returning paths
    t0 = time.monotonic()
    fix_dir, shard_dir = _big_fixture(n_frontier, n_store)
    result["stages"]["fixture_prep_s"] = round(time.monotonic() - t0, 1)

    from news_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    import pyarrow.parquet as pq

    robots = pq.read_table(os.path.join(fix_dir, "robots.parquet"))
    out_dir = os.path.join(IO_DIR, "crawl_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        max_waves=1,
        num_seen_shards=16,
        seen_capacity_per_shard=max(1 << 16, int(n_frontier * 1.6 / 16)),
        dedup_partitions=32,
        fetch_batch_size=4096,
        verify_payloads=True,
        compute_crawl_rank=False,
        # plasma staging OFF: the 5x store would not fit the cap — the
        # disk layout + per-worker page-cache views is the at-scale mode
        stage_store_to_plasma=False,
    )
    tracker = PlasmaPeakTracker(cap)
    t0 = time.monotonic()
    res = run_crawl(
        None, shard_dir, robots, out_dir, config=cfg,
        seeds_path=os.path.join(fix_dir, "frontier.parquet"),
    )
    crawl_s = time.monotonic() - t0
    w = res.waves[0]
    result["crawl"] = {
        "wall_s": round(crawl_s, 1),
        "candidates": w.candidates,
        "scheduled": w.scheduled,
        "fetched_ok": w.fetched_ok,
        "urls_per_sec": round(w.scheduled / crawl_s, 1) if crawl_s else 0,
        "peak_object_store_gb": round(tracker.stop() / (1 << 30), 2),
        "spill": _spill_stats(),
        "driver_rss_gb": round(_rss_gb(), 2),
    }
    shutil.rmtree(out_dir, ignore_errors=True)

    # ------------------------------------- 5 most expensive queries, 10x
    big_sf = _scaled_tables(sf_dir, scale)
    from news_crawler_ray.pipelines.queries import build_queries

    qs = build_queries()
    result["queries"] = {}
    for name in (
        "decontaminate_scaled",
        "nb_classify",
        "ccnet_ppl_buckets",
        "resolve_redirects",
        "event_customer_skew_join",
    ):
        tracker = PlasmaPeakTracker(cap)
        t0 = time.monotonic()
        out = qs[name](big_sf)
        n = out.count() if hasattr(out, "count") and not hasattr(out, "num_rows") else out.num_rows
        dt = time.monotonic() - t0
        result["queries"][name] = {
            "wall_s": round(dt, 2),
            "rows": int(n),
            "peak_object_store_gb": round(tracker.stop() / (1 << 30), 2),
            "driver_rss_gb": round(_rss_gb(), 2),
        }
    result["spill_final"] = _spill_stats()
    result["driver_rss_gb"] = round(_rss_gb(), 2)
    ray.shutdown()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier-n", type=int, default=20_000_000)
    ap.add_argument("--store-n", type=int, default=10_000_000)
    ap.add_argument("--object-store-gb", type=float, default=16.0)
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--quick", action="store_true",
        help="2M frontier / 1M store / x2 queries (~minutes, smoke)",
    )
    ap.add_argument(
        "--prep-only", action="store_true",
        help="internal: generate fixtures + scaled tables, then exit",
    )
    args = ap.parse_args()
    if args.quick:
        args.frontier_n, args.store_n, args.scale = 2_000_000, 1_000_000, 2
    if args.prep_only:
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                include_dashboard=False,
                logging_level="ERROR",
            )
        _big_fixture(args.frontier_n, args.store_n)
        _scaled_tables(args.sf_dir, args.scale)
        ray.shutdown()
        return
    import subprocess

    # fixture generation holds the whole store table transiently (tens
    # of GB at 10 M pages) — run it in a THROWAWAY process so the proof
    # process's peak-RSS metric measures the driver, not the generator
    prep = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__), "--prep-only",
            "--frontier-n", str(args.frontier_n),
            "--store-n", str(args.store_n),
            "--scale", str(args.scale),
            "--sf-dir", args.sf_dir,
        ],
        timeout=3600,
    )
    if prep.returncode != 0:
        raise RuntimeError("fixture prep subprocess failed")
    out = run_proof(
        args.frontier_n, args.store_n, args.object_store_gb,
        args.sf_dir, args.scale,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
