"""Frontier discovery over the live transport: seed a crawl from each
host's ``/sitemap.xml``.

Together with robots discovery (sources/robotstxt.py) and the HTTP
fetch stage (stages/transport.py) this completes the zero-local-input
deployment: a crawl needs nothing but a HOST LIST — politeness rules
come from live ``/robots.txt``, seeds from live ``/sitemap.xml``, pages
from live GETs. The sitemap XML parse itself reuses the existing
vectorized parser (stages/rss.extract_sitemap_urls_batch — one
``extract_regex`` pass, no per-row Python); this module only adds the
transport hop and the frontier-schema projection.

Row-level error semantics throughout (T5): a host without a sitemap
(404) or an unreachable host contributes zero seed rows, never a dead
job.
"""

from __future__ import annotations

import http.client

import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)"


class SitemapFetchStage:
    """Actor-pool stage: (host) rows → (sitemap_id=host, xml) rows via
    ``GET /sitemap.xml`` over a persistent transport session. Hosts
    without one yield no row."""

    def __init__(
        self,
        base_url: "str | None" = None,
        timeout_s: float = 5.0,
        transport_factory=None,
    ):
        from ..stages.transport import HTTPTransport

        self.base_url = base_url.rstrip("/") if base_url else None
        self.transport = (
            transport_factory() if transport_factory is not None
            else HTTPTransport(timeout_s=timeout_s)
        )

    def _url(self, host: str) -> str:
        if self.base_url is not None:
            return f"{self.base_url}/{host}/sitemap.xml"
        return f"http://{host}/sitemap.xml"

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts_out, xmls = [], []
        for h in batch["host"].to_pylist():
            try:
                resp = self.transport.get(self._url(h))
            except (OSError, http.client.HTTPException):
                continue
            if resp.status == 200 and resp.body is not None:
                hosts_out.append(h)
                xmls.append(resp.body.decode("utf-8", errors="replace"))
        return pa.table(
            {
                "sitemap_id": pa.array(hosts_out, pa.string()),
                "xml": pa.array(xmls, pa.string()),
            }
        )


def sitemap_rows_to_frontier(rows: pa.Table) -> pa.Table:
    """(sitemap_id, url, lastmod) → frontier-schema seeds: host parsed
    from each url, depth 0, ``discovered_at`` = lastmod date (midnight
    UTC; epoch when absent/garbled — ``strptime`` nulls, never raises),
    priority 1.0. Pure Arrow kernels."""
    from ..pipelines.crawl import FRONTIER_SCHEMA

    url = rows["url"].combine_chunks() if rows.num_rows else rows["url"]
    host = pc.struct_field(pc.extract_regex(url, _HOST_RE), "host")
    ts = pc.strptime(
        pc.coalesce(rows["lastmod"], ""), format="%Y-%m-%d", unit="us",
        error_is_null=True,
    )
    epoch = pa.scalar(0, pa.timestamp("us"))
    import numpy as np

    n = rows.num_rows
    return pa.table(
        {
            "url": url,
            "host": pc.coalesce(host, ""),
            "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            "discovered_at": pc.fill_null(ts, epoch),
            "priority": pa.array(np.ones(n, np.float64), pa.float64()),
        }
    ).cast(FRONTIER_SCHEMA)


def fetch_sitemap_frontier(
    hosts: "pa.Table | list[str]",
    base_url: "str | None" = None,
    timeout_s: float = 5.0,
    concurrency: "int | tuple" = (1, 4),
    batch_size: int = 256,
) -> pa.Table:
    """Live sitemap discovery → frontier seed table (FRONTIER_SCHEMA),
    sorted by url for determinism. Fetch fans out as an actor-pool
    stage; the XML parse is the existing vectorized sitemap parser."""
    import ray
    import ray.data

    from ..stages.rss import extract_sitemap_urls_batch

    if isinstance(hosts, list):
        hosts = pa.table({"host": pa.array(hosts, pa.string())})
    ds = (
        ray.data.from_arrow(hosts.select(["host"]))
        .map_batches(
            SitemapFetchStage,
            fn_constructor_kwargs=dict(base_url=base_url, timeout_s=timeout_s),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(
            extract_sitemap_urls_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(
            sitemap_rows_to_frontier,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # materialize ONCE (schema probe would re-fetch every sitemap)
    parts = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    from ..pipelines.crawl import FRONTIER_SCHEMA

    out = (
        pa.concat_tables(parts)
        if parts
        else FRONTIER_SCHEMA.empty_table()
    )
    return out.cast(FRONTIER_SCHEMA).sort_by("url")


class FeedFetchStage:
    """Actor-pool stage: (host) rows → (feed_id=host, xml) rows via
    ``GET /feed.xml`` — the reference's RSS feed loop
    (news.py RSS_FEEDS / advisory.py feedparser fetch) over the
    injectable transport. Hosts without a feed yield no row."""

    def __init__(
        self,
        base_url: "str | None" = None,
        timeout_s: float = 5.0,
        transport_factory=None,
        path: str = "/feed.xml",
    ):
        from ..stages.transport import HTTPTransport

        self.base_url = base_url.rstrip("/") if base_url else None
        self.path = path
        self.transport = (
            transport_factory() if transport_factory is not None
            else HTTPTransport(timeout_s=timeout_s)
        )

    def _url(self, host: str) -> str:
        if self.base_url is not None:
            return f"{self.base_url}/{host}{self.path}"
        return f"http://{host}{self.path}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts_out, xmls = [], []
        for h in batch["host"].to_pylist():
            try:
                resp = self.transport.get(self._url(h))
            except (OSError, http.client.HTTPException):
                continue
            if resp.status == 200 and resp.body is not None:
                hosts_out.append(h)
                xmls.append(resp.body.decode("utf-8", errors="replace"))
        return pa.table(
            {
                "feed_id": pa.array(hosts_out, pa.string()),
                "xml": pa.array(xmls, pa.string()),
            }
        )


def fetch_rss_entries(
    hosts: "pa.Table | list[str]",
    base_url: "str | None" = None,
    timeout_s: float = 5.0,
    concurrency: "int | tuple" = (1, 4),
    batch_size: int = 256,
):
    """Live feed fetch → flat entry-row Dataset (the input
    ``stages.rss.parse_rss_entries`` projects): one GET per host, the
    vectorized RSS-XML parse, zero exchange. Returns the lazy Dataset —
    callers chain the projection/day-cut and consume it like any other
    feed-entry source."""
    import ray.data

    from ..stages.rss import parse_rss_xml

    if isinstance(hosts, list):
        hosts = pa.table({"host": pa.array(hosts, pa.string())})
    fetched = ray.data.from_arrow(hosts.select(["host"])).map_batches(
        FeedFetchStage,
        fn_constructor_kwargs=dict(base_url=base_url, timeout_s=timeout_s),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    # materialize ONCE (the lazy schema probe would re-hit every feed)
    return parse_rss_xml(fetched.materialize())
