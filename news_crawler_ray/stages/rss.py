"""RSS/feed-entry source operator (SURVEY.md §2.1 S2, §2.2 M4/M5).

Re-expresses the reference's advisory feed path
(/root/reference/src/secbot/fetchers/advisory.py:61-109): take the first
``limit`` feed entries, project each to (title.strip, link.strip,
published, summary-or-description), normalize the published date with a
UTC → target-timezone shift (advisory.py:83-88 converts to Asia/Seoul
before taking the calendar date) plus the regex / default-day fallbacks,
and optionally keep only "today" (advisory.py:96-99).

Feed entries arrive as rows (entry_id, seq, title, link, published,
summary, description) — ``seq`` is the entry's position in the feed, so
the head-limit (A3, ``feed.entries[:limit]``) is a deterministic
``seq < limit`` filter at any parallelism. All vectorized
``map_batches``; no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dates import normalize_rss_dates


def project_rss_entries_batch(
    batch: pa.Table,
    tz_offset_hours: int = 9,
    default_day: str | None = None,
    limit: int | None = None,
) -> pa.Table:
    if limit is not None:
        batch = batch.filter(pc.less(batch["seq"], limit))
    published = normalize_rss_dates(
        batch["published"], default_day=default_day, tz_offset_hours=tz_offset_hours
    )
    summary = pc.coalesce(batch["summary"], batch["description"], "")
    return pa.table(
        {
            "entry_id": batch["entry_id"],
            "title": pc.utf8_trim_whitespace(pc.coalesce(batch["title"], "")),
            "link": pc.utf8_trim_whitespace(pc.coalesce(batch["link"], "")),
            "published": published,
            "summary": summary,
        }
    )


def parse_rss_entries(
    ds,
    tz_offset_hours: int = 9,
    default_day: str | None = None,
    limit: int | None = None,
    day_filter: str | None = None,
):
    """Feed-entry Dataset → projected advisories, optionally day-cut."""
    out = ds.map_batches(
        lambda b: project_rss_entries_batch(b, tz_offset_hours, default_day, limit),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if day_filter is not None:
        import numpy as np

        day = pa.scalar(np.datetime64(day_filter, "D").item(), pa.date32())
        out = out.map_batches(
            lambda t: t.filter(pc.equal(t["published"], day)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return out


def extract_sitemap_urls_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """Sitemap-XML frontier seeding: explode every ``<loc>`` entry (and
    its optional sibling ``<lastmod>``) out of sitemap documents — the
    standard seed source a news crawler polls alongside RSS
    (reference scope: seed-list fetch, news.py feed loop). One
    vectorized ``extract_all_regex`` per column, offsets become the
    explode index; no per-row Python, no XML library (sitemaps are flat
    enough that the <url> block regex is exact on well-formed files).

    Output (sitemap_id, url, lastmod) — lastmod '' when the block has
    none."""
    import numpy as np

    ids = batch["sitemap_id"].combine_chunks()
    xml = pc.coalesce(batch[xml_col], "")
    # split on '<url>' so each fragment holds at most ONE block — loc
    # and its optional lastmod stay paired inside the same fragment
    frags = pc.split_pattern(xml, "<url>")
    frags = frags.combine_chunks() if isinstance(frags, pa.ChunkedArray) else frags
    lens = pc.list_value_length(frags).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    flat = pc.list_flatten(frags)
    loc = pc.extract_regex(flat, r"<loc>(?P<u>[^<]*)</loc>")
    keep = pc.is_valid(loc).to_numpy(zero_copy_only=False)
    lm = pc.extract_regex(flat, r"<lastmod>(?P<d>[^<]*)</lastmod>")
    sel = pa.array(np.flatnonzero(keep), pa.int64())
    return pa.table(
        {
            "sitemap_id": ids.take(pa.array(row_idx[keep], pa.int64())),
            "url": pc.struct_field(loc, "u").take(sel),
            "lastmod": pc.fill_null(pc.struct_field(lm, "d"), "").take(sel),
        }
    )


def parse_sitemaps(ds, xml_col: str = "xml"):
    """Dataset form of :func:`extract_sitemap_urls_batch` — the frontier
    seed stage: sitemap docs in, one (sitemap_id, url, lastmod) row per
    <loc> out, embarrassingly parallel (zero exchange)."""
    return ds.map_batches(
        lambda t: extract_sitemap_urls_batch(t, xml_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def extract_rss_entries_batch(
    batch: pa.Table, xml_col: str = "xml", id_col: str = "feed_id"
) -> pa.Table:
    """RSS/Atom-ish feed XML → the flat entry rows ``parse_rss_entries``
    consumes: (entry_id, seq, title, link, published, summary,
    description) — the engine's feedparser analog
    (/root/reference/src/secbot/fetchers/advisory.py:61-76 iterates
    ``feedparser.parse(...).entries``). Same vectorized shape as the
    sitemap parser: split on ``<item>`` so each fragment holds at most
    one entry (fragment 0 is the channel header — its ``<title>`` is
    the FEED title, not an entry — and is dropped by position, not by
    content), one ``extract_regex`` per field, missing fields → null so
    the projection's coalesce/default-day fallbacks fire exactly as
    they do on fixture rows. ``seq`` is the entry's position in its own
    feed (the deterministic head-limit key), ``entry_id`` =
    ``{feed_id}#{seq}``."""
    import numpy as np

    ids = batch[id_col].combine_chunks() if batch.num_rows else batch[id_col]
    xml = pc.coalesce(batch[xml_col], "")
    frags = pc.split_pattern(xml, "<item>")
    frags = frags.combine_chunks() if isinstance(frags, pa.ChunkedArray) else frags
    lens = pc.list_value_length(frags).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else np.array([], np.int64)
    within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    keep = within > 0  # fragment 0 per row = channel header
    flat = pc.list_flatten(frags)

    def field(tag: str):
        m = pc.extract_regex(flat, rf"<{tag}>(?P<v>[^<]*)</{tag}>")
        return pc.struct_field(m, "v")

    sel = pa.array(np.flatnonzero(keep), pa.int64())
    feed_of = ids.take(pa.array(row_idx[keep], pa.int64()))
    seq = pa.array(within[keep] - 1, pa.int64())
    entry_id = pc.binary_join_element_wise(
        feed_of, pa.array([str(s) for s in (within[keep] - 1)], pa.string()), "#"
    )
    return pa.table(
        {
            "entry_id": entry_id,
            "seq": seq,
            "title": field("title").take(sel),
            "link": field("link").take(sel),
            "published": field("pubDate").take(sel),
            "summary": field("summary").take(sel),
            "description": field("description").take(sel),
        }
    )


def parse_rss_xml(ds, xml_col: str = "xml", id_col: str = "feed_id"):
    """Dataset form of :func:`extract_rss_entries_batch` — feed docs
    in, entry rows out, zero exchange; pipe into
    :func:`parse_rss_entries` for the projection/day-cut."""
    return ds.map_batches(
        lambda t: extract_rss_entries_batch(t, xml_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
