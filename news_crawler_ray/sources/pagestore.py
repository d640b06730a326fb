"""Sources: the image+caption page-store and generic table readers.

The north rule stores pages as a Lance table (BASELINE.json input_hint
schema: image_id, bytes, w, h, fmt, caption, phash). This container has
no Lance library, so :func:`read_pagestore` prefers
``ray.data.read_lance`` when importable and falls back to parquet with
the SAME schema and the same downstream pipeline — the storage format is
a reader concern only.

Column pruning is first-class: pass ``columns`` so wide ``bytes``
payloads never leave storage for metadata-only pipelines.
"""

from __future__ import annotations

import os

import ray.data

PAGESTORE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def read_pagestore(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a page-store (Lance dir if available/applicable, else parquet)."""
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            import lance  # noqa: F401

            return ray.data.read_lance(path, columns=columns)
        except ImportError as e:
            raise ImportError(
                "page-store is a Lance dataset but the 'lance' package is "
                "not installed in this environment"
            ) from e
    return ray.data.read_parquet(path, columns=columns)


def read_table_dir(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read one named table (``{sf_dir}/{table}.parquet``) with pruning."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)
