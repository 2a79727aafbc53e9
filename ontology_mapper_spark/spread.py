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

# Above this input size the scan is left alone: a production-sized
# source splits naturally (and repartitioning it would be a real
# shuffle), while anything under it both NEEDS the spread (it scans as
# a handful of tasks at best) and shuffles in a single cheap pass.
SPREAD_MAX_BYTES = 64 * 1024 * 1024


def spread_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default ``defaultParallelism``)
    partitions iff its source is small — i.e. only when the scan cannot
    parallelize naturally. Row-level results are unchanged (pure
    round-robin placement); only placement of rows changes, so every
    deterministic relational result computed above is identical.

    The smallness probe is file-size-based (``df.inputFiles()`` + a
    local stat — no Spark job, no plan compile) because the split
    planner cannot split a single row group no matter the config; for
    non-file-backed inputs (in-memory relations, RDD scans) it falls
    back to the partition count, which is cheap to read there.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
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
        if total >= SPREAD_MAX_BYTES:
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
