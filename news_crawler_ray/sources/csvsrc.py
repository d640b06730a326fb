"""CSV source — the other raw-feed format next to sources/jsonl. Thin
wrapper over ``ray.data.read_csv`` (Arrow CSV reader; gzip pinned by
extension like the JSONL reader)."""

from __future__ import annotations

import ray.data


def read_csv(path: str, **kwargs) -> "ray.data.Dataset":
    if path.endswith(".gz"):
        kwargs.setdefault("arrow_open_stream_args", {"compression": "gzip"})
    return ray.data.read_csv(path, **kwargs)
