"""Output sinks: merge-with-existing stable-id tables, rules files.

The reference's rules files are merge-don't-rewrite: a new run keeps
every previously written entry (and its SID) and appends only new values
with fresh SIDs (/root/reference/src/secbot/defense/suricata.py:139-195,
suricata_url.py:61-96, suricata_hash.py:63-86 — A8 in SURVEY.md §2.5).
Re-expressed as a resumable parquet table:

* prior output is the table ``(value, sid)`` under ``out_dir``;
* new values are deduped against it (anti-join) and appended with
  ``sid = max_prior + 1 + rank`` (rank = sorted position among the new
  values — deterministic at any parallelism);
* the write is an atomic epoch-dir swap, so a killed merge never
  corrupts the prior table and re-running is idempotent.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .index import zip_with_index


def merge_stable_output(
    new_values_ds: "ray.data.Dataset",
    out_dir: str,
    value_col: str = "value",
    base_sid: int = 7000000,
    broadcast_limit_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """Merge new values into the persistent ``(value, sid)`` table.

    Returns the merged Dataset (also persisted under ``out_dir``).
    Prior rows keep their SIDs verbatim; new distinct values get
    consecutive SIDs after the current maximum, ordered by value.

    Anti-join plan is size-adaptive: rules tables are small by
    construction (distinct blocked values), so up to
    ``broadcast_limit_rows`` the prior key set is broadcast once via
    ``ray.put`` and new values filter block-locally (zero exchange);
    past the bound the merge AUTO-SWITCHES to the task-based sort-merge
    anti-join (ops/join.sort_merge_anti_join) — same rows, one narrow
    exchange, no driver materialization.
    """
    import ray as _ray

    from ..ops.agg import sorted_distinct

    cur_path = os.path.join(out_dir, "current")
    have_prior = os.path.isdir(cur_path)
    distinct_new = sorted_distinct(new_values_ds, [value_col])
    if have_prior:
        prior = ray.data.read_parquet(cur_path)
        next_sid = int(prior.max("sid")) + 1
        n_prior = prior.count()
        if n_prior > broadcast_limit_rows:
            from ..ops.join import sort_merge_anti_join

            fresh = sort_merge_anti_join(
                distinct_new, prior.select_columns([value_col]), value_col
            )
        else:
            # arrow-native key-set assembly (no per-row Python): concat
            # the prior table's blocks into one value array (blocks may
            # disagree on string vs large_string — cast to the dataset
            # schema type)
            sch = prior.schema()
            vt = sch.types[sch.names.index(value_col)]
            chunks = [
                b[value_col].combine_chunks().cast(vt)
                for b in _ray.get(
                    prior.select_columns([value_col]).to_arrow_refs()
                )
                if b.num_rows
            ]
            prior_ref = _ray.put(
                pa.concat_arrays(chunks) if chunks else pa.array([], vt)
            )

            def drop_seen(t: pa.Table, ref=prior_ref) -> pa.Table:
                seen_vals = _ray.get(ref)
                return t.filter(
                    pc.invert(pc.is_in(t[value_col], value_set=seen_vals))
                )

            fresh = distinct_new.map_batches(drop_seen, batch_format="pyarrow")
    else:
        prior = None
        next_sid = base_sid
        fresh = distinct_new

    ranked = zip_with_index(fresh, [value_col], [False], rank_col="_pos")
    import numpy as np

    fresh_sids = ranked.map_batches(
        lambda t: pa.table(
            {
                value_col: t[value_col],
                "sid": pa.array(np.asarray(t["_pos"]) + next_sid, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    merged = prior.union(fresh_sids) if prior is not None else fresh_sids

    epoch_dir = cur_path + ".new"
    merged.write_parquet(epoch_dir)
    old_dir = cur_path + ".old"
    if have_prior:
        os.rename(cur_path, old_dir)
    os.rename(epoch_dir, cur_path)  # atomic publish
    if have_prior:
        import shutil

        shutil.rmtree(old_dir, ignore_errors=True)
    return ray.data.read_parquet(cur_path)


# ------------------------------------------------------------ mail digest


@ray.remote
def _digest_block(ts_col: str, type_col: str, id_col: str, *parts) -> pa.Table:
    """Render one day-complete, (day, ts, id)-sorted table into one
    markdown digest row per day."""
    import numpy as np

    t = pa.concat_tables(parts).combine_chunks()
    days = np.asarray(t["day"].cast(pa.int32()))
    day_str = pc.strftime(t[ts_col], format="%Y-%m-%d")
    lines = pc.binary_join_element_wise(
        "- ",
        pc.strftime(t[ts_col], format="%H:%M"),
        " [",
        t[type_col],
        "] #",
        pc.cast(t[id_col], pa.string()),
        "",
    )
    bounds = np.concatenate(
        [[0], np.flatnonzero(days[1:] != days[:-1]) + 1, [len(days)]]
    )
    out_day, out_digest, out_n = [], [], []
    lines_py = lines.to_pylist()
    for a, b in zip(bounds[:-1], bounds[1:]):
        out_day.append(t["day"][int(a)].as_py())
        out_digest.append(
            f"# digest {day_str[int(a)].as_py()}\n" + "\n".join(lines_py[a:b])
        )
        out_n.append(int(b - a))
    return pa.table(
        {
            "day": pa.array(out_day, pa.date32()),
            "digest": pa.array(out_digest, pa.string()),
            "n_items": pa.array(out_n, pa.int64()),
        }
    )


def daily_digest(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """K1 mail-digest assembly (reference gmail.py:186-223): one
    markdown document per day listing that day's items in (ts, id)
    order. The reference renders its digest from a single in-memory
    list; here the ordered concat runs on the task-based key-complete
    exchange (one sort, no hash shuffle), so a day with 10^8 rows is
    assembled in its owner task exactly like a skewed groupby key."""
    from .index import key_complete_parts

    def derive(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.cast(t[ts_col], pa.date32()))

    withday = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    groups = key_complete_parts(withday, "day", order=[ts_col, id_col])
    if not groups:
        return ray.data.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.date32()),
                    "digest": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow_refs(
        [_digest_block.remote(ts_col, type_col, id_col, *parts) for parts in groups]
    )


# ---------------------------------------------- training shard export


def write_training_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str = "image_id",
    num_shards: int = 16,
    fmt: str = "parquet",
) -> dict:
    """WebDataset-style resumable shard export for a training corpus:
    rows land in ``shard-{k:05d}/`` by content-stable hash of
    ``key_col`` (identical shards on every rerun and cluster shape —
    a loader can seed its order off the shard id), each input block
    scatters its own rows as one part file per touched shard (the
    shuffle-free layout partition_pagestore proved out: no exchange,
    payload bytes move exactly once), and ``_manifest.json`` commits
    the export atomically (tmp+rename) with per-shard row counts. A
    rerun over a directory whose manifest is already complete SKIPS the
    write entirely — the kill-and-rerun contract of the reference's
    merge-don't-rewrite sinks (suricata.py:139-195) applied to corpus
    export. ``fmt="jsonl"`` writes gzip NDJSON parts instead (the
    LLM-training delivery format): binary columns are base64-encoded
    via polars' vectorized ``bin.encode`` — no per-row Python. Returns
    the manifest dict."""
    import json

    import numpy as np
    import polars as pl
    import pyarrow.parquet as pq

    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")

    manifest_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("complete"):
            return m

    # incomplete prior attempt (killed before the manifest landed):
    # clear its part files so the rerun cannot double-count rows — the
    # kill-and-rerun contract is restart-from-scratch, never append
    if os.path.isdir(out_dir):
        import shutil

        for entry in os.listdir(out_dir):
            if entry.startswith("shard-"):
                shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def scatter(t: pa.Table) -> pa.Table:
        import hashlib

        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        col = t[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        h = pl.from_arrow(col).hash(seed=7).to_numpy().astype(np.uint64)
        shards = (h % np.uint64(num_shards)).astype(np.int64)
        out_s, out_n = [], []
        for s in np.unique(shards):
            part = t.filter(pa.array(shards == s))
            d = os.path.join(out_dir, f"shard-{int(s):05d}")
            os.makedirs(d, exist_ok=True)
            # part name = digest of the part's key set: a retried Ray
            # task rewrites the SAME file instead of duplicating rows
            # (blocks are disjoint, so distinct parts never collide)
            digest = hashlib.md5(
                "\x1f".join(str(v) for v in part[key_col].to_pylist()).encode()
            ).hexdigest()
            tmp_part = os.path.join(d, f".part-{digest}.tmp")
            if fmt == "jsonl":
                import gzip

                df = pl.from_arrow(part)
                df = df.with_columns(
                    [
                        pl.col(c).bin.encode("base64")
                        for c, dt in zip(df.columns, df.dtypes)
                        if dt == pl.Binary
                    ]
                )
                with open(tmp_part, "wb") as f:
                    f.write(gzip.compress(df.write_ndjson().encode()))
                os.replace(tmp_part, os.path.join(d, f"part-{digest}.jsonl.gz"))
            else:
                pq.write_table(part, tmp_part)
                os.replace(tmp_part, os.path.join(d, f"part-{digest}.parquet"))
            out_s.append(int(s))
            out_n.append(part.num_rows)
        return pa.table({"shard": pa.array(out_s, pa.int64()),
                         "rows": pa.array(out_n, pa.int64())})

    counts = ds.map_batches(
        scatter, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    per_shard: dict[int, int] = {}
    for r in counts:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + r["rows"]
    manifest = {
        "complete": True,
        "num_shards": num_shards,
        "key_col": key_col,
        "fmt": fmt,
        "rows": sum(per_shard.values()),
        "per_shard": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path)
    return manifest


def compact_parquet_dir(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 100_000,
) -> dict:
    """Small-files compaction — the nightly operational job that keeps
    read parallelism sane after incremental ingests: a directory of N
    little parquet parts is rewritten as ceil(total/target) BALANCED
    files. Resumable like write_training_shards: atomic manifest commit
    (tmp+rename), rerun over a complete manifest is a NO-OP, and a
    killed half-run restarts from scratch (never appends). The copy
    streams block-by-block through repartition — the driver never holds
    rows, and at 100 TB this runs per-partition-directory so each
    compaction is independently retryable."""
    import glob
    import json
    import shutil

    import ray.data

    manifest_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("complete"):
            return m
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_parquet(in_dir)
    total = ds.count()
    n_files = max(1, -(-total // target_rows_per_file))
    ds.repartition(n_files).write_parquet(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    manifest = {
        "complete": True,
        "rows": total,
        "n_files": len(files),
        "target_rows_per_file": target_rows_per_file,
        "in_dir": os.path.abspath(in_dir),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path)
    return manifest
