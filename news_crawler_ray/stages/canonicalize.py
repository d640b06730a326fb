"""Canonicalize stage: url -> (canonical url, host, url_sha1).

The dedup-identity stage (reference: sha256(title|link) keying,
/root/reference/src/secbot/scheduler.py:52-53, plus defang normalizers
main.py:38-42). Stateless vectorized ``map_batches`` over Arrow batches.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import urlnorm


def _canonicalize_batch(batch: pa.Table) -> pa.Table:
    canon = urlnorm.canonicalize_array(batch["url"])
    keys = urlnorm.sha1_array(canon)
    host = urlnorm.host_array(canon)
    out = batch.set_column(batch.schema.get_field_index("url"), "url", canon)
    if "host" in out.column_names:
        out = out.set_column(out.schema.get_field_index("host"), "host", host)
    else:
        out = out.append_column("host", host)
    return out.append_column("url_sha1", keys)


def canonicalize(ds, batch_size: int = 8192):
    """Dataset[url, ...] -> Dataset[url(canonical), host, url_sha1, ...]."""
    return ds.map_batches(
        _canonicalize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
