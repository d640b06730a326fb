"""JSON-lines source (optionally gzip'd) — the raw-feed ingestion
format upstream of the parquet/Lance page-store. Thin, explicit wrapper
over ``ray.data.read_json`` so compression is pinned by extension
rather than guessed per task."""

from __future__ import annotations

import ray.data


def read_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """Read .jsonl / .jsonl.gz into a Dataset (schema inferred by the
    Arrow JSON reader per block; gzip pinned explicitly for .gz)."""
    if path.endswith(".gz"):
        kwargs.setdefault("arrow_open_stream_args", {"compression": "gzip"})
    return ray.data.read_json(path, **kwargs)
