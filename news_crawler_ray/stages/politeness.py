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
        hosts = batch["host"].to_pylist()
        paths = pc.struct_field(
            pc.extract_regex(batch["url"], _PATH_RE), "path"
        ).to_pylist()
        keep = np.ones(batch.num_rows, dtype=bool)
        delays = np.full(batch.num_rows, self.default, dtype=np.int32)
        for i, (h, p) in enumerate(zip(hosts, paths)):
            cfg = self.cfg.get(h)
            if cfg is None:
                continue
            prefixes, delay = cfg
            delays[i] = delay
            if p is not None and any(p.startswith(pre) for pre in prefixes):
                keep[i] = False
        out = batch.append_column("delay_ms", pa.array(delays, pa.int32()))
        return out.filter(pa.array(keep))


def schedule(
    ds: "ray.data.Dataset",
    robots_ref,
    concurrency: int | tuple = 2,
    default_delay_ms: int = 1000,
    num_partitions: int | None = None,
    rank_strategy: str = "sort",
    robots_num_cpus: float | None = None,
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
            filtered, "host", ["priority", "url"], [True, False], rank_col="host_rank"
        )

    def add_fetch_at(t: pa.Table) -> pa.Table:
        fetch_at = np.asarray(t["host_rank"]) * np.asarray(t["delay_ms"], dtype=np.int64) * 1000
        return t.append_column("fetch_at_us", pa.array(fetch_at, pa.int64()))

    timed = ranked.map_batches(add_fetch_at, batch_format="pyarrow", zero_copy_batch=True)
    return zip_with_index(
        timed,
        ["fetch_at_us", "priority", "url"],
        [False, True, False],
        rank_col="crawl_rank",
    )
