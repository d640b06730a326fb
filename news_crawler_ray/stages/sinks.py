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
) -> "ray.data.Dataset":
    """Merge new values into the persistent ``(value, sid)`` table.

    Returns the merged Dataset (also persisted under ``out_dir``).
    Prior rows keep their SIDs verbatim; new distinct values get
    consecutive SIDs after the current maximum, ordered by value.
    """
    import ray as _ray

    cur_path = os.path.join(out_dir, "current")
    have_prior = os.path.isdir(cur_path)
    if have_prior:
        prior = ray.data.read_parquet(cur_path)
        next_sid = int(prior.max("sid")) + 1
        # rules tables are small by construction (distinct blocked
        # values); broadcast the key set for the anti-join. The bound is
        # ENFORCED, not assumed — past it, swap in the hash-partitioned
        # anti-join used by queries.q_customers_without_orders.
        n_prior = prior.count()
        if n_prior > 5_000_000:
            raise ValueError(
                f"merge_stable_output: prior table has {n_prior} rows — too "
                "large for the broadcast anti-join path; use a hash-"
                "partitioned anti-join (see q_customers_without_orders)"
            )
        prior_vals = pa.array(
            [r[value_col] for r in prior.select_columns([value_col]).take_all()]
        )
        prior_ref = _ray.put(prior_vals)
    else:
        prior = None
        next_sid = base_sid
        prior_ref = None

    from ..ops.agg import sorted_distinct

    distinct_new = sorted_distinct(new_values_ds, [value_col])
    if have_prior:

        def drop_seen(t: pa.Table, ref=prior_ref) -> pa.Table:
            seen_vals = _ray.get(ref)
            return t.filter(pc.invert(pc.is_in(t[value_col], value_set=seen_vals)))

        fresh = distinct_new.map_batches(drop_seen, batch_format="pyarrow")
    else:
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
