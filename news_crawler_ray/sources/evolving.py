"""Schema-evolution source — union-by-name over parquet shards whose
schemas drifted across ingest generations (columns added/dropped as the
feed evolved; every long-lived corpus has this). The union schema is
resolved DRIVER-SIDE from file footers only (pq.read_schema — metadata
bytes, no row I/O), then each file decodes in its own task and aligns
to the fixed union: missing columns materialize as typed nulls, column
order is canonical first-seen. Same-named columns must carry the SAME
Arrow type across shards — a silent cast would corrupt data, so type
drift raises loudly with both offenders named."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def union_schema(paths: list[str]) -> pa.Schema:
    """First-seen-ordered union of the files' schemas; loud on type
    conflicts. Footer reads only — O(files) metadata, zero row I/O."""
    fields: dict[str, pa.Field] = {}
    for p in sorted(paths):
        for f in pq.read_schema(p):
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
            elif prev.type != f.type:
                raise TypeError(
                    f"union_schema: column {f.name!r} drifted across "
                    f"shards ({prev.type} vs {f.type} in {p}); migrate "
                    "the shard instead of silently casting"
                )
    return pa.schema(list(fields.values()))


def read_union_by_name(path: str) -> "ray.data.Dataset":
    """Read a directory of schema-drifted parquet shards into ONE
    Dataset with the union-by-name schema: each file is one task;
    alignment is column reordering plus typed-null fills (no row-level
    work)."""
    if os.path.isdir(path):
        paths = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"read_union_by_name: no parquet under {path}")
    schema = union_schema(paths)

    def align(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch["bytes"]:
            t = pq.read_table(pa.BufferReader(b.as_py()))
            cols = [
                t[f.name]
                if f.name in t.column_names
                else pa.nulls(t.num_rows, f.type)
                for f in schema
            ]
            tables.append(pa.table(dict(zip(schema.names, cols))))
        return pa.concat_tables(tables) if len(tables) != 1 else tables[0]

    files = ray.data.read_binary_files(path, file_extensions=["parquet"])
    return files.map_batches(
        align, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
