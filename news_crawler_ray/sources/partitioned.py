"""Hive-partitioned parquet layout: explicit partition PRUNING at the
path level — the "prune at the read" rule as a source primitive. Ray
2.49's read_parquet(filter=...) binds partition-column filters against
each fragment's PHYSICAL schema and fails on hive layouts, so pruning
here is done where it is unambiguous anyway: select the partition
directories by predicate BEFORE any byte is read, then read only those
and re-attach the partition value as a constant column per directory.
Unselected partitions cost zero I/O and zero tasks."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def list_partitions(base_dir: str, col: str) -> list[str]:
    """Partition values present under ``base_dir`` (dirs named
    ``col=value``), sorted."""
    vals = []
    prefix = f"{col}="
    for name in sorted(os.listdir(base_dir)):
        if name.startswith(prefix) and os.path.isdir(
            os.path.join(base_dir, name)
        ):
            vals.append(name[len(prefix):])
    return vals


def read_hive_partitioned(
    base_dir: str, col: str, keep, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Read only the partitions whose value passes ``keep`` (a
    predicate on the string partition value). Each selected partition
    reads as plain parquet (column-pruned via ``columns``) and gets the
    partition value re-attached as a constant string column; the union
    of the selected partitions streams as one Dataset."""
    selected = [v for v in list_partitions(base_dir, col) if keep(v)]
    if not selected:
        raise ValueError(
            f"read_hive_partitioned: no partition of {base_dir} matches"
        )
    parts = []
    for v in selected:
        ds = ray.data.read_parquet(
            os.path.join(base_dir, f"{col}={v}"), columns=columns
        )

        def attach(t: pa.Table, v=v) -> pa.Table:
            # ray's reader may itself infer the hive column from the
            # path (version-dependent) — attach only when absent
            if col in t.column_names:
                return t
            return t.append_column(
                col, pa.array([v] * t.num_rows, pa.string())
            )

        parts.append(
            ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def write_hive_partitioned(
    tbl: pa.Table, base_dir: str, col: str
) -> str:
    """One-time hive-layout writer for fixtures/tests (atomic via a
    ``_done`` marker; re-entrant)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(base_dir, "_done")
    if os.path.exists(marker):
        return base_dir
    for v in pc.unique(tbl[col]).to_pylist():
        d = os.path.join(base_dir, f"{col}={v}")
        os.makedirs(d, exist_ok=True)
        sub = tbl.filter(pc.equal(tbl[col], v)).drop_columns([col])
        pq.write_table(sub, os.path.join(d, "part-0.parquet"))
    open(marker, "w").close()
    return base_dir
