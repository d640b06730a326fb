"""``ray job submit``-able CLI entrypoint (north-rule run surface).

On a real cluster the whole pipeline runs as one driver script:

    ray job submit --working-dir . -- python -m news_crawler_ray \
        crawl --frontier /data/frontier --store /data/pagestore \
        --robots /data/robots.parquet --out /data/run1 --max-waves 3

In-sandbox the same command runs against ``RAY_ADDRESS=local``. Three
subcommands:

* ``synth``  — write the deterministic image+caption fixtures (page
  store, frontier, robots) to parquet, so ``crawl`` has a real on-disk
  input (no external data; BASELINE.json input_hint schema).
* ``crawl``  — run (or ``--resume``) the multi-wave frontier crawl;
  prints one JSON metrics line per wave (lineage row) and a final
  summary line.
* ``query``  — run one named ``queries()`` pipeline over an sf dir and
  print its row count (optionally write the result to parquet).

Only this CLI owns the Ray session (guarded: the driver contract's
``__ray_entry__`` path never goes through here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _ray_init() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def _load_table_or_path(path: str) -> "pa.Table | str":
    """A directory (page-store shard layout) passes through as a path;
    a single parquet file loads driver-side (small-side broadcast)."""
    if os.path.isdir(path):
        return path
    return pq.read_table(path)


def cmd_synth(args: argparse.Namespace) -> int:
    from .fixtures import synth

    os.makedirs(args.out, exist_ok=True)
    store = synth.make_pagestore(
        args.pages, seed=args.seed,
        image_pool=min(args.pages, 512) if args.pages > 4096 else None,
    )
    frontier = synth.make_frontier(args.frontier, seed=args.seed)
    robots = synth.make_robots(seed=args.seed)
    pq.write_table(store, os.path.join(args.out, "pagestore.parquet"))
    pq.write_table(frontier, os.path.join(args.out, "frontier.parquet"))
    pq.write_table(robots, os.path.join(args.out, "robots.parquet"))
    print(json.dumps({
        "out": args.out, "pages": store.num_rows,
        "frontier": frontier.num_rows, "robots_hosts": robots.num_rows,
    }))
    return 0


def cron_next_delay(now_s: float, times: list[str]) -> float:
    """Seconds from ``now_s`` (epoch) until the next HH:MM occurrence
    (local time; tomorrow if every listed time already passed today).
    Pure function — the cron loop's only clock math, unit-testable
    without sleeping. Mirrors the reference's APScheduler cron triggers
    (/root/reference/src/secbot/scheduler.py:92-111)."""
    import datetime as dt

    now = dt.datetime.fromtimestamp(now_s)
    delays = []
    for t in times:
        hh, mm = (int(x) for x in t.strip().split(":"))
        cand = now.replace(hour=hh, minute=mm, second=0, microsecond=0)
        if cand <= now:
            cand += dt.timedelta(days=1)
        delays.append((cand - now).total_seconds())
    return min(delays)


def _run_crawl_once(args: argparse.Namespace, resume: bool, scope: str | None) -> dict:
    from .pipelines.crawl import CrawlConfig, run_crawl
    from .settings import crawl_config_env_overrides

    # precedence CLI > NC_* env > default: env overrides seed the kwargs
    # (covering every CrawlConfig field), CLI-mapped flags layer on top
    # (their argparse defaults already fell back to env via env_default,
    # so an un-passed flag carries the env value, not the built-in one),
    # and an explicit cron day-scope wins over everything.
    cfg_kwargs = crawl_config_env_overrides()
    cfg_kwargs.update(
        max_waves=args.max_waves,
        num_seen_shards=args.seen_shards,
        dedup_partitions=args.dedup_partitions,
        compute_crawl_rank=not args.no_crawl_rank,
    )
    if scope:
        cfg_kwargs["seen_epoch_scope"] = scope
    cfg = CrawlConfig(**cfg_kwargs)
    if args.store is None and cfg.fetch_mode != "http":
        raise SystemExit(
            "--store is required unless fetch_mode is 'http' "
            "(set NC_FETCH_MODE=http and NC_HTTP_BASE_URL)"
        )
    if args.frontier is None:
        # zero-local-input discovery: the host list is the only input —
        # seeds come from each host's live /sitemap.xml
        if not getattr(args, "hosts", None):
            raise SystemExit("--frontier or --hosts is required")
        if cfg.fetch_mode != "http":
            raise SystemExit("--hosts discovery requires fetch_mode http")
        from .sources.discovery import fetch_sitemap_frontier

        with open(args.hosts) as f:
            host_list = [l.strip() for l in f if l.strip()]
        frontier = fetch_sitemap_frontier(
            host_list,
            base_url=cfg.http_base_url,
            timeout_s=cfg.http_timeout_s,
        )
    else:
        frontier = pq.read_table(args.frontier) if os.path.isfile(args.frontier) else args.frontier
    if isinstance(frontier, str):
        import ray.data

        frontier = ray.data.read_parquet(frontier)
    if args.robots == "http":
        # discover politeness rules from each frontier host's live
        # /robots.txt (sources/robotstxt) instead of a parquet table —
        # requires the http transport config for routing
        from .sources.robotstxt import fetch_robots_table

        if isinstance(frontier, pa.Table):
            hosts = sorted(set(frontier["host"].to_pylist()))
        else:
            hosts = sorted(
                r["host"] for r in frontier.select_columns(["host"]).unique("host").take_all()
            )
        robots = fetch_robots_table(
            hosts,
            base_url=cfg.http_base_url,
            default_delay_ms=cfg.default_delay_ms,
            timeout_s=cfg.http_timeout_s,
        )
    else:
        robots = pq.read_table(args.robots)
    res = run_crawl(
        frontier,
        _load_table_or_path(args.store) if args.store is not None else None,
        robots,
        args.out,
        config=cfg,
        resume=resume,
    )
    for w in res.waves:
        print(json.dumps({"wave_metrics": w.to_json()}))
    summary = {
        "out_dir": res.out_dir,
        "waves": len(res.waves),
        "total_fetched": res.total_fetched,
    }
    print(json.dumps(summary))
    return summary


def cmd_crawl(args: argparse.Namespace) -> int:
    _ray_init()
    from .context import configure

    configure()
    if not args.cron and args.cron_interval is None:
        _run_crawl_once(args, args.resume, None)
        return 0

    # Cron mode — the reference's scheduler daemon re-expressed as the
    # launcher loop a cluster user wraps around `ray job submit`: each
    # firing is a DAY-SCOPED run (seen_epoch_scope = the run date, the
    # reference's daily seen-set reset, scheduler.py:43-44) resumed
    # idempotently within the day. --cron-interval N fires every N
    # seconds instead (testing / ad-hoc cadence); --cron-runs bounds the
    # loop (0 = forever).
    import datetime as dt

    runs = 0
    while True:
        if args.cron:
            time.sleep(cron_next_delay(time.time(), args.cron.split(",")))
        elif runs > 0 and args.cron_interval:
            time.sleep(args.cron_interval)
        scope = dt.date.today().isoformat()
        _run_crawl_once(args, resume=True, scope=scope)
        runs += 1
        if args.cron_runs and runs >= args.cron_runs:
            return 0


def cmd_query(args: argparse.Namespace) -> int:
    _ray_init()
    from .context import configure
    from .pipelines.queries import build_queries

    configure()
    qs = build_queries()
    if args.name not in qs:
        sys.stderr.write(f"unknown query {args.name!r}; known: {sorted(qs)}\n")
        return 2
    res = qs[args.name](args.sf_dir)
    if isinstance(res, pa.Table):
        tbl = res
    elif hasattr(res, "to_arrow_refs"):  # ray Dataset, pandas-free
        import ray

        parts = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(parts, promote_options="default") if parts else pa.table(
            {n: pa.array([], t_) for n, t_ in zip(res.schema().names, res.schema().types)}
        )
    else:
        tbl = pa.Table.from_pandas(res)
    if args.write:
        pq.write_table(tbl, args.write)
    print(json.dumps({"query": args.name, "rows": tbl.num_rows,
                      "columns": tbl.column_names}))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Curate a page-store into training shards: admission → clip-score
    → aspect bucket → exact phash dedup → resumable shard export (one
    manifest line on stdout; a rerun over a complete manifest is a
    no-op)."""
    _ray_init()
    import ray.data

    from .context import configure
    from .ops.multimodal import curate_image_corpus
    from .stages.sinks import write_training_shards

    configure()
    ps = ray.data.read_parquet(args.store)
    manifest = write_training_shards(
        curate_image_corpus(ps, min_clip_score=args.min_clip_score),
        args.out,
        num_shards=args.shards,
        fmt=args.format,
    )
    print(json.dumps(manifest))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m news_crawler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sy = sub.add_parser("synth", help="write deterministic fixtures to parquet")
    sy.add_argument("--out", required=True)
    sy.add_argument("--pages", type=int, default=2000)
    sy.add_argument("--frontier", type=int, default=1500)
    sy.add_argument("--seed", type=int, default=42)
    sy.set_defaults(fn=cmd_synth)

    cr = sub.add_parser("crawl", help="run or resume the multi-wave crawl")
    cr.add_argument(
        "--frontier",
        default=None,
        help="seed frontier parquet file/dir (omit with --hosts to "
        "discover seeds from each host's live /sitemap.xml)",
    )
    cr.add_argument(
        "--hosts",
        default=None,
        help="text file of hosts (one per line) for sitemap seed "
        "discovery; requires fetch_mode http",
    )
    cr.add_argument(
        "--store",
        default=None,
        help="page-store parquet file or shard dir (omit with "
        "NC_FETCH_MODE=http: the network is the store)",
    )
    cr.add_argument(
        "--robots",
        required=True,
        help="robots parquet file, or the literal 'http' to discover "
        "rules from each frontier host's live /robots.txt",
    )
    cr.add_argument("--out", required=True, help="run output dir (checkpoints live here)")
    from .settings import env_default

    cr.add_argument("--max-waves", type=int, default=env_default("max_waves", 3))
    cr.add_argument(
        "--seen-shards", type=int, default=env_default("num_seen_shards", 4)
    )
    cr.add_argument(
        "--dedup-partitions",
        type=int,
        default=env_default("dedup_partitions", 8),
    )
    cr.add_argument(
        "--no-crawl-rank",
        action="store_true",
        default=not env_default("compute_crawl_rank", True),
    )
    cr.add_argument("--resume", action="store_true")
    cr.add_argument(
        "--cron",
        help="comma-separated HH:MM local fire times; each firing runs a "
        "day-scoped resume (reference scheduler.py cron analog)",
    )
    cr.add_argument(
        "--cron-runs", type=int, default=0,
        help="stop after N cron firings (0 = run forever)",
    )
    cr.add_argument(
        "--cron-interval", type=float, default=None,
        help="fire every N seconds instead of at --cron wall times",
    )
    cr.set_defaults(fn=cmd_crawl)

    qu = sub.add_parser("query", help="run one named pipeline over an sf dir")
    qu.add_argument("name")
    qu.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qu.add_argument("--write", help="write result parquet here")
    qu.set_defaults(fn=cmd_query)

    ex = sub.add_parser(
        "export", help="curate a page-store into resumable training shards"
    )
    ex.add_argument("--store", required=True, help="page-store parquet file/dir")
    ex.add_argument("--out", required=True, help="shard output dir")
    ex.add_argument("--shards", type=int, default=16)
    ex.add_argument("--min-clip-score", type=float, default=0.0)
    ex.add_argument(
        "--format", choices=("parquet", "jsonl"), default="parquet",
        help="shard file format (jsonl = gzip NDJSON, binary base64-encoded)",
    )
    ex.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
