"""Parse/extract stage: outlink expansion, keyword & exclusion filters,
IOC extraction, date cutoff.

Vectorized analogs of the reference's per-page parsing (SURVEY.md §2.2):
outlink harvest S3/M9 (asec.py:64-76,102-105), keyword any-match M7
(news.py:144-149), exclusion anti-filter M10 (asec.py:107-120), IOC
regex extraction M8 (asec.py:44-53, parsers/ioc.py:34-53), today filter
M6 (news.py:141-142). All stateless ``map_batches``; compiled patterns
live at module import (once per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- IOC patterns (defang-aware, M8) -------------------------------------
IP_RE = re.compile(r"(?<![\d.])(?:\d{1,3}(?:\[\.\]|\.)){3}\d{1,3}(?![\d.])")
HASH_RE = re.compile(r"\b(?:[0-9a-fA-F]{64}|[0-9a-fA-F]{40}|[0-9a-fA-F]{32})\b")
URL_RE = re.compile(r"https?(?:\[:\]|:)//[^\s\"'<>]+")
LINK_TOKEN = "link:"


def _refang(s: str) -> str:
    return s.replace("[.]", ".").replace("[:]", ":")


def _valid_ip(s: str) -> bool:
    parts = s.split(".")
    return len(parts) == 4 and all(p.isdigit() and int(p) <= 255 for p in parts)


def extract_iocs_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Long-format extraction: (doc_id, kind, value), per-doc unique+sorted.

    Per-doc set semantics = A5 (asec.py:80-83); refang on IPs/URLs = M11.
    """
    ids_out, kinds, values = [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        if text is None:
            continue
        ips = sorted({_refang(m) for m in IP_RE.findall(text) if _valid_ip(_refang(m))})
        hashes = sorted({m.lower() for m in HASH_RE.findall(text)})
        urls = sorted({_refang(m) for m in URL_RE.findall(text)})
        for kind, vals in (("ip", ips), ("hash", hashes), ("url", urls)):
            for v in vals:
                ids_out.append(doc_id)
                kinds.append(kind)
                values.append(v)
    return pa.table(
        {
            id_col: pa.array(ids_out, batch.schema.field(id_col).type),
            "kind": pa.array(kinds, pa.string()),
            "value": pa.array(values, pa.string()),
        }
    )


def extract_iocs(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: extract_iocs_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def merged_distinct_iocs(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Global distinct+sorted IOC table (A6/A7 partial+final distinct)."""
    from ..ops.agg import sorted_distinct

    long = extract_iocs(ds, text_col, id_col).drop_columns([id_col])
    # per-batch extraction already dedups per doc (partial); the final
    # distinct rides the task-based sort exchange, then a small sort
    # for the display order.
    return sorted_distinct(long, ["kind", "value"]).sort(["kind", "value"])


# -- HTML listing extraction (M1/S1) --------------------------------------
# The reference CSS-selects div.news_list blocks and pulls a[href],
# span.news_txt (title), span.news_writer (byline|date)
# (/root/reference/src/secbot/fetchers/news.py:98-122). Without bs4 the
# engine uses anchored regexes over the same structure — a real HTML
# parser would slot into the same batch signature.
_ITEM_RE = re.compile(
    r'<div\s+class="news_list"\s*>.*?<a\s+href="(?P<href>[^"]+)".*?'
    r'<span\s+class="news_txt"\s*>(?P<title>.*?)</span>.*?'
    r'<span\s+class="news_writer"\s*>(?P<writer>.*?)</span>',
    re.S,
)


def extract_news_items_batch(
    batch: pa.Table, html_col: str = "html", base_url_col: str = "base_url"
) -> pa.Table:
    """HTML listing pages → one row per news item (href absolutized
    against the page's base URL — M2)."""
    from urllib.parse import urljoin

    hrefs, titles, writers, pages = [], [], [], []
    for page_url, html in zip(
        batch[base_url_col].to_pylist(), batch[html_col].to_pylist()
    ):
        if not html:
            continue
        for m in _ITEM_RE.finditer(html):
            hrefs.append(urljoin(page_url or "", m.group("href")))
            titles.append(m.group("title").strip())
            writers.append(m.group("writer").strip())
            pages.append(page_url)
    return pa.table(
        {
            "page_url": pa.array(pages, pa.string()),
            "link": pa.array(hrefs, pa.string()),
            "title": pa.array(titles, pa.string()),
            "writer_line": pa.array(writers, pa.string()),
        }
    )


def extract_news_items(ds, html_col: str = "html", base_url_col: str = "base_url"):
    return ds.map_batches(
        lambda b: extract_news_items_batch(b, html_col, base_url_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- outlink expansion ----------------------------------------------------
def extract_outlinks_batch(batch: pa.Table, decay: float = 0.5) -> pa.Table:
    """Fetched pages -> child frontier candidates.

    Captions embed ``link:<url>`` tokens (the synthetic stand-in for
    href harvesting). Child priority = parent * decay (recency-weighted
    chain), depth = parent + 1, discovered_at inherited.
    """
    urls, hosts, depths, disc, prios = [], [], [], [], []
    has_depth = "depth" in batch.column_names
    caps = batch["caption"].to_pylist()
    p_prio = batch["priority"].to_pylist() if "priority" in batch.column_names else [1.0] * len(caps)
    p_disc = (
        batch["discovered_at"].to_pylist()
        if "discovered_at" in batch.column_names
        else [0] * len(caps)
    )
    p_depth = batch["depth"].to_pylist() if has_depth else [0] * len(caps)
    for cap, prio, dat, dep in zip(caps, p_prio, p_disc, p_depth):
        if not cap:
            continue
        for tok in cap.split():
            if tok.startswith(LINK_TOKEN):
                u = tok[len(LINK_TOKEN) :]
                urls.append(u)
                m = re.match(r"^[a-z]+://([^/]+)", u)
                hosts.append(m.group(1) if m else "")
                depths.append((dep or 0) + 1)
                disc.append(dat)
                prios.append((prio if prio is not None else 1.0) * decay)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "discovered_at": pa.array(
                disc,
                batch.schema.field("discovered_at").type
                if "discovered_at" in batch.column_names
                else pa.timestamp("us"),
            ),
            "priority": pa.array(prios, pa.float64()),
        }
    )


def extract_anchor_texts_batch(
    batch: pa.Table, html_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """``<a href>`` anchor-text harvest — the web-graph feature source
    (anchor corpora label their TARGET page; search/training pipelines
    aggregate them per target). Splitting on ``<a`` + whitespace keeps
    each (attrs, body) pair inside one fragment — the same pairing
    trick as the sitemap parser (stages/rss.py:74) — then vectorized
    extract_regex passes recover the href (double- OR single-quoted,
    anywhere among the tag's attributes) and the anchor text (nested
    inline elements stripped); no per-row Python, no DOM. A fragment
    whose attribute run hits another '<' before its '>' is not a real
    anchor tag and is dropped. Reference analog: the anchor harvest at
    /root/reference/src/secbot/fetchers/asec.py:102-105, upgraded to
    keep the anchor text. Output (doc_id, host, href, anchor)."""
    ids = batch[id_col].combine_chunks()
    html = pc.coalesce(batch[html_col], "")
    frags = pc.split_pattern_regex(html, r"<a\s")
    frags = frags.combine_chunks() if isinstance(frags, pa.ChunkedArray) else frags
    lens = pc.list_value_length(frags).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    flat = pc.list_flatten(frags)
    # fragment i>0 starts right after '<a '; attrs run to the tag's own
    # '>' (no '<' allowed — guards against '">…</a>' sequences in text
    # that never opened a tag), body runs non-greedily to '</a>'
    m = pc.extract_regex(flat, r"(?s)^(?P<attrs>[^<>]*)>(?P<body>.*?)</a>")
    attrs = pc.struct_field(m, "attrs")
    href_m = pc.coalesce(
        pc.extract_regex(attrs, r'href\s*=\s*"(?P<v>[^"]*)"'),
        pc.extract_regex(attrs, r"href\s*=\s*'(?P<v>[^']*)'"),
    )
    keep = pc.and_(pc.is_valid(m), pc.is_valid(href_m)).to_numpy(
        zero_copy_only=False
    )
    sel = pa.array(np.flatnonzero(keep), pa.int64())
    href = pc.struct_field(href_m, "v").take(sel)
    anchor = pc.replace_substring_regex(
        pc.struct_field(m, "body").take(sel), r"(?s)<[^>]*>", ""
    )
    hm = pc.extract_regex(href, r"^https?://(?P<h>[^/]+)")
    return pa.table(
        {
            id_col: ids.take(pa.array(row_idx[keep], pa.int64())),
            "host": pc.fill_null(pc.struct_field(hm, "h"), ""),
            "href": href,
            "anchor": anchor,
        }
    )


def extract_anchor_texts(ds, html_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: extract_anchor_texts_batch(b, html_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def extract_outlinks(ds, decay: float = 0.5):
    return ds.map_batches(
        lambda b: extract_outlinks_batch(b, decay),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- filters --------------------------------------------------------------
def keyword_any_match(ds, keywords: list[str], col: str = "title"):
    """Keep rows whose ``col`` contains any keyword (case-insensitive).

    One compiled alternation per batch call (M7); the keyword list is
    query config, not data — no shuffle.
    """
    pattern = "|".join(re.escape(k) for k in keywords)

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.match_substring_regex(t[col], pattern, ignore_case=True)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exclusion_filter(ds, exclude_exact: set[str], exclude_substring: str | None = None, col: str = "url"):
    """Anti-filter against a tiny broadcast exclusion set (M10/J2)."""
    exact = pa.array(sorted(exclude_exact), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t[col], value_set=exact))
        if exclude_substring:
            keep = pc.and_(keep, pc.invert(pc.match_substring(t[col], exclude_substring)))
        return t.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def date_cutoff(ds, col: str, day: str):
    """Keep rows where ``col`` falls on ``day`` (M6 today-filter)."""

    def fn(t: pa.Table) -> pa.Table:
        d = pc.cast(t[col], pa.date32())
        return t.filter(pc.equal(d, pa.scalar(np.datetime64(day, "D").item(), pa.date32())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
