"""Arrow IPC (Feather v2) source — the zero-parse interchange format a
Ray-native engine should ingest natively: an IPC file's record batches
ARE Arrow buffers, so reading is a memory-map plus offset bookkeeping
(no decode stage at all, unlike CSV/JSONL). One file = one read task;
shard large corpora across many files (the writer below does) so the
streaming executor parallelizes the scan."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def write_ipc_shards(tbl: pa.Table, out_dir: str, num_shards: int = 4) -> list[str]:
    """Split ``tbl`` row-wise into ``num_shards`` Feather-v2 files —
    the layout read_ipc parallelizes over. Deterministic contiguous
    slices; atomic tmp+rename per shard."""
    import pyarrow.feather as feather

    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    paths = []
    for s in range(num_shards):
        lo = s * n // num_shards
        hi = (s + 1) * n // num_shards
        p = os.path.join(out_dir, f"part-{s:04d}.arrow")
        tmp = p + ".tmp"
        feather.write_feather(tbl.slice(lo, hi - lo), tmp, compression="uncompressed")
        os.replace(tmp, p)
        paths.append(p)
    return paths


def read_ipc(path: str) -> "ray.data.Dataset":
    """Read a .arrow IPC file or a directory of them into a Dataset:
    each file decodes in its own task (read_binary_files + one
    RecordBatchFile open per file — the file IS Arrow, so 'decode' is
    buffer slicing, not parsing)."""
    import pyarrow.feather as feather

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            feather.read_table(pa.BufferReader(b.as_py())) for b in batch["bytes"]
        ]
        return pa.concat_tables(tables) if len(tables) != 1 else tables[0]

    files = ray.data.read_binary_files(path, file_extensions=["arrow"])
    return files.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
