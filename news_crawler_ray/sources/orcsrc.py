"""ORC source — the columnar warehouse-interchange format (Hive/Spark
ecosystems emit it) read through ``pyarrow.orc``. Ray Data ships no
read_orc, so the reader composes the engine's standard source shape:
``read_binary_files`` (one file = one read task, streaming-executor
parallel) + a per-task ORC→Arrow decode. Stripes inside a file decode
vectorized in C++; sharding across files is the parallelism unit, same
contract as the IPC/CSV/JSONL siblings — all four readers are pinned to
land the identical table in tests and the ingest oracle."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def write_orc_shards(tbl: pa.Table, out_dir: str, num_shards: int = 4) -> list[str]:
    """Split ``tbl`` row-wise into ``num_shards`` ORC files —
    deterministic contiguous slices, atomic tmp+rename per shard."""
    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    paths = []
    for s in range(num_shards):
        lo = s * n // num_shards
        hi = (s + 1) * n // num_shards
        p = os.path.join(out_dir, f"part-{s:04d}.orc")
        tmp = p + ".tmp"
        orc.write_table(tbl.slice(lo, hi - lo), tmp)
        os.replace(tmp, p)
        paths.append(p)
    return paths


def read_orc(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read an .orc file or a directory of them into a Dataset: each
    file decodes in its own task via pyarrow.orc (column pruning pushed
    into the ORC reader — unselected columns never decompress)."""
    import pyarrow.orc as orc

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            orc.ORCFile(pa.BufferReader(b.as_py())).read(columns=columns)
            for b in batch["bytes"]
        ]
        return pa.concat_tables(tables) if len(tables) != 1 else tables[0]

    files = ray.data.read_binary_files(path, file_extensions=["orc"])
    return files.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
