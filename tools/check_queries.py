"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry and its ``oracle_sql()`` twin through DuckDB on
the same sf tables, comparing row count, column names and order-insensitive
values (rows sorted by all columns, compared exactly). Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    a, b = normalize(ray_df), normalize(sql_df)
    # align dtypes (int32 vs int64 etc.)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            try:
                a[c] = a[c].astype("int64")
                b[c] = b[c].astype("int64")
            except (ValueError, TypeError):
                a[c] = a[c].astype(str)
                b[c] = b[c].astype(str)
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        return f"VALUES first diff row {i}: ray={a.loc[i].to_dict()} sql={b.loc[i].to_dict()}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:32s} rows-only rows={len(ray_df)} ({dt:.1f}s)")
            continue
        try:
            sql_df = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} SQL-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:32s} {verdict} rows={len(ray_df)} ({dt:.1f}s)")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
