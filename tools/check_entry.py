"""Local replica of the driver's correctness gate: runs every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compares row count, schema (column names), and values (columns sorted by
name, rows sorted, exact match; floats compared bitwise with a reported
max-abs-diff fallback).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from ontology_mapper_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count {len(spark_df)} vs {len(duck_df)}")
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"schema {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
        )
        return problems
    a, b = _canon(spark_df), _canon(duck_df)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            if not np.array_equal(av, bv, equal_nan=True):
                d = np.nanmax(np.abs(av - bv)) if len(av) else 0
                problems.append(f"col {c}: float mismatch (max abs diff {d:.3e})")
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                n_bad = int((av.astype(str) != bv.astype(str)).sum())
                i = int(np.argmax(av.astype(str) != bv.astype(str)))
                problems.append(
                    f"col {c}: {n_bad} mismatches, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok, bad, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            bad.append((name, [f"SPARK ERROR: {e}"]))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            bad.append((name, [f"DUCKDB ERROR: {e}"]))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            bad.append((name, problems))
            print(f"FAIL  {name}: {problems}")
        else:
            ok.append(name)
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(ok)} ok, {len(bad)} failed, {len(rows_only)} rows-only")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
