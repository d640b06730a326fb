"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir AND its
``oracle_sql()`` statement in DuckDB (sf tables registered as views),
then compares row count, schema (column names), and an order-insensitive
value comparison. Usage:

    PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith(("datetime64", "date")):
            # dates arrive as datetime.date objects from Arrow but
            # datetime64 from DuckDB — normalize both to ISO strings
            df[c] = df[c].astype(str).str.slice(0, 10) if str(df[c].dtype).startswith("datetime64") else df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    qs = e.queries()
    # rebuild the expected-value (inline-VALUES) oracles for THIS sf dir —
    # e.oracle_sql() pins them to sf0.01 (the driver's gate), which would
    # spuriously fail every expected-pairs query at other scales
    from news_crawler_ray.pipelines.queries import build_oracle_sql

    oracles = build_oracle_sql(sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"{name}: QUERY ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if sql is None:
            print(f"{name}: no_oracle rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as ex:
            print(f"{name}: ORACLE ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        rows_ok = len(got) == len(exp)
        schema_ok = list(got.columns) == list(exp.columns)
        vals_ok = False
        if rows_ok and schema_ok:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False, rtol=1e-9
                )
                vals_ok = True
            except AssertionError as ex:
                vals_ok = False
                detail = str(ex).splitlines()[0]
        status = "OK" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(got)}/{len(exp)} schema_ok={schema_ok} "
            f"vals_ok={vals_ok} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and rows_ok and schema_ok:
            print("   ", detail)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
