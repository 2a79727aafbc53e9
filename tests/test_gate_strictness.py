"""Regression pins for the round-2 gate failures.

1. tools/check_entry.compare must be at least as strict as the driver's
   value hash: an int64 column vs a float64 column with equal values (the
   DuckDB sum(BIGINT) -> HUGEINT -> pandas float64 widening that shipped
   two red rows in CORRECTNESS_r02) is a FAILURE.  r2's checker coerced
   both sides to float64 and passed it (VERDICT #2).
2. The hardened analytics queries (corpus_rollup, events_sessionize,
   events_windowed) must be value-identical across different shuffle
   partitionings — their aggregates are exact-integer or single-division
   forms, so summation order cannot flip a rounding boundary (VERDICT #3).
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_entry import compare  # noqa: E402

HARDENED = ["corpus_rollup", "events_sessionize", "events_windowed"]


def test_compare_rejects_int_vs_float_dtype():
    spark_side = pd.DataFrame({"k": ["a", "b"], "total": pd.array([675, 12], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "total": pd.array([675.0, 12.0], dtype="float64")})
    problems = compare("t", spark_side, oracle_side)
    assert problems, "int64 vs float64 with equal values must fail (r2 bug class)"
    assert any("dtype" in p for p in problems)


def test_compare_accepts_identical_frames():
    a = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5], "n": [1, 2]})
    b = pd.DataFrame({"n": [2, 1], "v": [2.5, 1.5], "k": ["b", "a"]})
    assert compare("t", a, b) == []


def test_compare_catches_value_drift():
    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": [1.0, 2.0000001]})
    assert compare("t", a, b)


def test_hardened_queries_partition_invariant(spark):
    """Same query, shuffle_partitions 2 vs 32 and input repartitioned 1 vs
    13: canonicalized results must be cell-identical (driver-hash level)."""
    import __spark_entry__ as entrymod
    from tools.check_entry import _canon

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    qs = entrymod.queries()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("2", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in HARDENED:
                results[(name, parts)] = _canon(qs[name](spark, sf).toPandas())
        for name in HARDENED:
            a, b = results[(name, "2")], results[(name, "32")]
            assert compare(name, a, b) == [], f"{name} not partition-invariant"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
