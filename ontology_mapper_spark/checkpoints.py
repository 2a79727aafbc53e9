"""Resumable partitioned execution with lineage + score metrics (north_rule).

The pipeline's unit of restart is a URL-hash bucket: output is written
idempotently per bucket (``<out>/data/bucket=N/``), and a ``_lineage`` table
records each completed bucket with row counts and an input snapshot tag.
A re-run anti-joins the bucket list against lineage and processes only the
remainder — kill the job anywhere and rerun to byte-identical output
(tests/test_checkpoints.py proves it).

Score-distribution metrics (``_metrics``): decile histogram of mapping
scores per bucket, for drift monitoring across snapshots.

At cluster scale buckets map to independent Spark jobs over disjoint
predicate-pruned slices (the bucket filter is a pushed-down predicate on a
stored ``bucket`` column when the page table is bucketed/partitioned by it);
bucket count should be sized so a bucket ~ minutes of work (e.g. 4096 at
10^12 docs).
"""

from __future__ import annotations

import datetime
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("input_snapshot", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_sec", T.DoubleType(), False),
        T.StructField("completed_ts", T.TimestampType(), False),
    ]
)


def bucket_col(key: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


class CheckpointedRun:
    def __init__(self, spark: SparkSession, out_dir: str, n_buckets: int = 16,
                 input_snapshot: str = "unversioned"):
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.input_snapshot = input_snapshot
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.metrics_dir = os.path.join(out_dir, "_metrics")
        self.data_dir = os.path.join(out_dir, "data")

    def completed_buckets(self) -> set[int]:
        try:
            rows = (
                self.spark.read.schema(LINEAGE_SCHEMA)
                .parquet(self.lineage_dir)
                .filter(F.col("input_snapshot") == self.input_snapshot)
                .select("bucket")
                .collect()
            )
            return {r["bucket"] for r in rows}
        except Exception:
            return set()

    def run(
        self,
        inputs: DataFrame,
        key: str,
        build_fn: Callable[[DataFrame], DataFrame],
        score_col: str = "score",
    ) -> DataFrame:
        """Process every not-yet-completed bucket of ``inputs`` through
        ``build_fn`` and return the full output DataFrame (all buckets)."""
        done = self.completed_buckets()
        bucketed = inputs.withColumn("_bucket", bucket_col(F.col(key), self.n_buckets))
        for b in range(self.n_buckets):
            if b in done:
                continue
            t0 = time.time()
            subset = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
            rows_in = subset.count()
            out = build_fn(subset).cache()
            rows_out = out.count()
            out.write.mode("overwrite").parquet(
                os.path.join(self.data_dir, f"bucket={b}")
            )
            if score_col in out.columns:
                (
                    out.groupBy(
                        F.least(F.floor(F.col(score_col) * 10), F.lit(9)).alias("bin")
                    )
                    .agg(F.count(F.lit(1)).alias("n"))
                    .withColumn("bucket", F.lit(b))
                    .write.mode("overwrite")
                    .parquet(os.path.join(self.metrics_dir, f"bucket={b}"))
                )
            out.unpersist()
            lineage_row = [
                (
                    b,
                    self.input_snapshot,
                    rows_in,
                    rows_out,
                    time.time() - t0,
                    datetime.datetime.now(),
                )
            ]
            self.spark.createDataFrame(lineage_row, LINEAGE_SCHEMA).write.mode(
                "append"
            ).parquet(self.lineage_dir)
        return self.spark.read.parquet(self.data_dir)
