"""Scan-parallelism spreading for small inputs.

A parquet file is split across scan tasks only at row-group boundaries,
and the split planner additionally floors split sizes at
``spark.sql.files.openCostInBytes`` (4 MB) — so a small single-row-group
table always scans as ONE task, and every narrow transformation chained
above that scan (n-gram explodes, md5 digests, Arrow-batched Python
kernels, string metrics) serializes on one core until the first
exchange. Measured on the sf0.1 bench tables (each a single row group):
the whole map side of most suite queries ran as ``(0 + 1) / 1`` stages
on a 16-core session.

``spread_small_scan`` round-robin-repartitions such an input so the
per-row work above it parallelizes. It is scale-adaptive, not a local
tuning constant (optimization-guide §2: derive partitioning from input
size): when the source already scans with at least ``target`` tasks —
any production-sized table — it is a no-op, so no shuffle is ever added
at scale. The round-robin exchange itself is deterministic under task
retries (Spark sorts before repartition, SPARK-23207) and costs one
pass over a by-definition-small relation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Never spread an input above this size: past it the one-pass shuffle is
# real I/O, and a source this large parallelizes acceptably on its own
# (>= a few maxPartitionBytes splits) even when it can't reach the full
# core count. The scale-adaptive rule below (expected scan tasks vs
# target) is what keeps production inputs untouched; this cap is the
# safety belt on top of it.
SPREAD_MAX_BYTES = 1024 * 1024 * 1024


def _bytes_conf(spark, key: str, default: int) -> int:
    """A Spark byte-size conf as an int (values come back as '134217728'
    or '128m'/'128mb' depending on how they were set)."""
    try:
        s = str(spark.conf.get(key)).strip().lower()
        mult = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
        if s.endswith("b") and len(s) >= 2 and s[-2] in mult:
            return int(float(s[:-2]) * mult[s[-2]])
        if s and s[-1] in mult:
            return int(float(s[:-1]) * mult[s[-1]])
        return int(s)
    except Exception:
        return default


def spread_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default ``defaultParallelism``)
    partitions iff its source scan cannot parallelize to ``target``
    tasks naturally. Row-level results are unchanged (pure round-robin
    placement); only placement of rows changes, so every deterministic
    relational result computed above is identical.

    The smallness probe is file-size-based (``df.inputFiles()`` + a
    local stat — no Spark job, no plan compile): the split planner
    yields at most ``ceil(total_bytes / maxPartitionBytes)`` scan tasks
    (fewer still when files are single-row-group, which bytes cannot
    detect — splitting is row-group-bounded), so when that ceiling is
    already below ``target`` the scan is provably under-parallel and a
    one-pass spread is cheap by construction (bounded by
    ``SPREAD_MAX_BYTES``). A production-sized source fails both tests
    and is never touched. For non-file-backed inputs (in-memory
    relations, RDD scans) it falls back to the partition count, which
    is cheap to read there.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = None
    if files:
        total = 0
        for f in files:
            # inputFiles URIs look like file:///path; extra leading
            # slashes are harmless to a POSIX stat
            path = f[5:] if f.startswith("file:") else f
            try:
                total += os.path.getsize(path)
            except OSError:
                return df  # non-local source: assume production-sized
        max_split = _bytes_conf(
            spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
        )
        expected_tasks = -(-total // max_split) if max_split else target
        if total >= SPREAD_MAX_BYTES or expected_tasks >= target:
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
