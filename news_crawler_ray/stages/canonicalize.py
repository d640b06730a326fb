"""Canonicalize stage: url -> (canonical url, host[, url_sha1]).

The dedup-identity stage (reference: sha256(title|link) keying,
/root/reference/src/secbot/scheduler.py:52-53, plus defang normalizers
main.py:38-42). Stateless vectorized ``map_batches`` over Arrow batches.

``with_sha1=False`` defers the SHA-1 seen-key to a later stage: the
fused schedule path dedups by canonical URL inside host-co-located
blocks, so the per-row SHA-1 loop only ever runs on rows that SURVIVE
dedup (the candidate stream is typically several times larger).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import urlnorm


def _canonicalize_batch(batch: pa.Table, with_sha1: bool = True) -> pa.Table:
    canon = urlnorm.canonicalize_array(batch["url"])
    host = urlnorm.host_array(canon)
    out = batch.set_column(batch.schema.get_field_index("url"), "url", canon)
    if "host" in out.column_names:
        out = out.set_column(out.schema.get_field_index("host"), "host", host)
    else:
        out = out.append_column("host", host)
    if with_sha1:
        out = out.append_column("url_sha1", urlnorm.sha1_array(canon))
    return out


def canonicalize(ds, batch_size: int = 8192, with_sha1: bool = True):
    """Dataset[url, ...] -> Dataset[url(canonical), host[, url_sha1], ...]."""
    return ds.map_batches(
        lambda b: _canonicalize_batch(b, with_sha1),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
