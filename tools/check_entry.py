"""Local replica of the driver's correctness gate: runs every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compares row count, schema (column names), and values (columns sorted by
name, rows sorted).

The value compare is DTYPE-STRICT, matching the driver's value hash: an
int64 675 on the Spark side and a float64 675.0 on the DuckDB side (e.g.
from DuckDB's sum(BIGINT) -> HUGEINT -> pandas float64 widening) is a
FAILURE here, exactly as it is in CORRECTNESS_r*.json.  Round 2 shipped
with a checker that coerced both sides to float64 before comparing, which
masked precisely that bug class (r2 VERDICT #2) — do not reintroduce the
coercion.  Cells are compared via their canonical string form (shortest
repr for floats), so bit-identical doubles match and any dtype or value
drift fails.

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


def _dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind class the driver's hash is
    sensitive to: int-vs-float-vs-bool-vs-other."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "obj"


def _cell_str(v) -> str:
    """Canonical string form of one cell — shortest repr for floats so
    bit-identical doubles compare equal, plain str otherwise."""
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    return str(v)


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
        ka, kb = _dtype_kind(a[c].dtype), _dtype_kind(b[c].dtype)
        if ka != kb:
            # the driver's value hash sees 675 vs 675.0 as different cells;
            # coercing here is what let the r2 HUGEINT bug ship (VERDICT #2)
            problems.append(
                f"col {c}: dtype mismatch {a[c].dtype} (spark) vs "
                f"{b[c].dtype} (oracle) — driver hash would differ even if "
                f"values agree"
            )
            continue
        av = np.array([_cell_str(v) for v in a[c]], dtype=object)
        bv = np.array([_cell_str(v) for v in b[c]], dtype=object)
        if not (av == bv).all():
            n_bad = int((av != bv).sum())
            i = int(np.argmax(av != bv))
            problems.append(
                f"col {c}: {n_bad} mismatches, first at row {i}: "
                f"{av[i]!r} vs {bv[i]!r}"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracles (ivf_ann_topk trains its centroids from the
    # embeddings table) must read the same sf dir the Spark side reads
    os.environ["ONTOMAP_ORACLE_SF_DIR"] = sf_dir
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
