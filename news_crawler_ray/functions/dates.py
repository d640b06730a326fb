"""Date parsing/normalization functions (SURVEY.md §2.2 M3/M4).

Vectorized re-expressions of the reference's date handling:

* Korean-format article dates ``"%Y년 %m월 %d일 %H:%M"`` parsed after
  splitting a ``"writer | date"`` byline
  (/root/reference/src/secbot/fetchers/news.py:108-121);
* RSS timestamps normalized to a target timezone's calendar date with a
  ``YYYY-MM-DD`` regex fallback and a default-to-today fallback
  (/root/reference/src/secbot/fetchers/advisory.py:50-58,81-95).

Invalid inputs become nulls (the reference drops those rows), never
exceptions — row-level errors, not job failures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KOREAN_DATE_RE = (
    r"(?P<y>\d{4})년\s*(?P<m>\d{1,2})월\s*(?P<d>\d{1,2})일(?:\s*(?P<H>\d{1,2}):(?P<M>\d{2}))?"
)
ISO_DATE_RE = r"(?P<iso>\d{4}-\d{2}-\d{2})"


def parse_korean_dates(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Korean-format date strings → date32 (invalid → null).

    The date pattern is matched anywhere in the string, which subsumes
    the reference's ``"기자 | date"`` byline split (news.py:113) — no
    separate split pass needed.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = pc.extract_regex(pc.coalesce(arr, ""), KOREAN_DATE_RE)
    valid = pc.is_valid(m)
    ys = pc.struct_field(m, "y").to_pylist()
    ms = pc.struct_field(m, "m").to_pylist()
    ds = pc.struct_field(m, "d").to_pylist()
    out = np.full(len(arr), None, dtype=object)
    for i, (ok, y, mo, d) in enumerate(zip(valid.to_pylist(), ys, ms, ds)):
        if not ok:
            continue
        try:
            out[i] = np.datetime64(f"{int(y):04d}-{int(mo):02d}-{int(d):02d}", "D").item()
        except ValueError:
            pass  # e.g. month 13 → null
    return pa.array(out.tolist(), pa.date32())


def normalize_rss_dates(
    arr: pa.Array | pa.ChunkedArray,
    default_day: str | None = None,
    tz_offset_hours: int = 0,
) -> pa.Array:
    """RSS-ish timestamp strings → date32.

    Order of attempts per the reference: full timestamp parse — shifted
    by ``tz_offset_hours`` so a UTC feed timestamp lands on the TARGET
    timezone's calendar day (the reference converts ``published_parsed``
    UTC → Asia/Seoul before taking the date, advisory.py:83-88; pass 9
    for Seoul) — then a ``YYYY-MM-DD`` regex fallback (taken verbatim,
    no shift, advisory.py:90-93), then ``default_day`` (the reference
    uses "today"; here it is explicit config — no wall clock in the
    engine), else null.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # attempt 1: ISO timestamp cast (strict → null on failure) + tz shift
    ts = pc.strptime(arr, format="%Y-%m-%dT%H:%M:%S", unit="s", error_is_null=True)
    if tz_offset_hours:
        ts = pc.add(ts, pa.scalar(np.timedelta64(tz_offset_hours * 3600, "s")))
    d1 = pc.cast(ts, pa.date32())
    # attempt 2: regex date fallback
    m = pc.extract_regex(pc.coalesce(arr, ""), ISO_DATE_RE)
    iso = pc.struct_field(m, "iso")
    d2 = pc.cast(pc.strptime(iso, format="%Y-%m-%d", unit="s", error_is_null=True), pa.date32())
    out = pc.coalesce(d1, d2)
    if default_day is not None:
        out = pc.coalesce(
            out, pa.scalar(np.datetime64(default_day, "D").item(), pa.date32())
        )
    return out
