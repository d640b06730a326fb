"""Strict dtype + exact-value audit of every queries() entry vs its oracle.

The driver's gate hashes canonicalized values EXACTLY (no rtol); a column
that is int64 on the Ray side but HUGEINT->float64 from DuckDB, or a float
that differs in the last bit, fails the hash even though
tools/check_correctness.py (rtol=1e-9) passes. This tool reports, per
query, any column whose dtype kind differs or whose stringified values
are not identical after canonical sorting.

    PYTHONPATH=/root/repo python tools/audit_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith(("datetime64", "date")):
            df[c] = (
                df[c].astype(str).str.slice(0, 10)
                if str(df[c].dtype).startswith("datetime64")
                else df[c].astype(str)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e
    from news_crawler_ray.pipelines.queries import build_oracle_sql

    qs = e.queries()
    oracles = build_oracle_sql(sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_issues = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            n_issues += 1
            continue
        issues = []
        if len(got) != len(exp):
            issues.append(f"rows {len(got)}!={len(exp)}")
        elif list(got.columns) != list(exp.columns):
            issues.append(f"cols {list(got.columns)}!={list(exp.columns)}")
        else:
            for c in got.columns:
                gk, xk = got[c].dtype.kind, exp[c].dtype.kind
                if gk != xk:
                    issues.append(f"{c}: dtype kind {got[c].dtype}!={exp[c].dtype}")
                    continue
                if gk == "f":
                    gv, xv = got[c].to_numpy(), exp[c].to_numpy()
                    both_nan = np.isnan(gv) & np.isnan(xv)
                    neq = int((~((gv == xv) | both_nan)).sum())
                    if neq:
                        issues.append(
                            f"{c}: {neq} float rows not bit-equal "
                            f"(maxdiff {np.nanmax(np.abs(gv - xv)):.3e})"
                        )
                else:
                    neq = int((got[c].astype(str) != exp[c].astype(str)).sum())
                    if neq:
                        issues.append(f"{c}: {neq} rows differ")
        if issues:
            n_issues += 1
            print(f"{name}: STRICT-FAIL ({time.time()-t0:.1f}s) " + "; ".join(issues))
        else:
            print(f"{name}: strict-ok ({time.time()-t0:.1f}s)")
    ray.shutdown()
    print(f"issues: {n_issues}")
    return 1 if n_issues else 0


if __name__ == "__main__":
    raise SystemExit(main())
