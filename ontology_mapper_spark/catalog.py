"""Table catalog shim: Iceberg when a catalog is configured, parquet paths
otherwise (this sandbox ships no Iceberg runtime jars).

north_rule targets partitioned Iceberg tables; every writer in this engine
funnels through ``write_table``/``read_table`` so the swap is a config, not
a refactor. With ``spark.sql.catalog.<name>`` configured (iceberg-spark-
runtime on the classpath), set ``ONTOLOGY_MAPPER_CATALOG=<name>`` and
tables become ``<name>.<namespace>.<table>`` with snapshot isolation,
hidden partitioning and time travel; otherwise identifiers map to parquet
directories under ``ONTOLOGY_MAPPER_WAREHOUSE`` (default ``./warehouse``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG_ENV = "ONTOLOGY_MAPPER_CATALOG"
WAREHOUSE_ENV = "ONTOLOGY_MAPPER_WAREHOUSE"


def _catalog() -> str | None:
    return os.environ.get(CATALOG_ENV) or None


def _path_for(identifier: str) -> str:
    root = os.environ.get(WAREHOUSE_ENV, "warehouse")
    return os.path.join(root, *identifier.split("."))


def write_table(
    df: DataFrame,
    identifier: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    cat = _catalog()
    if cat:
        writer = df.writeTo(f"{cat}.{identifier}").using("iceberg")
        for c in partition_by or []:
            writer = writer.partitionedBy(c)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(_path_for(identifier))


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    cat = _catalog()
    if cat:
        return spark.read.table(f"{cat}.{identifier}")
    return spark.read.parquet(_path_for(identifier))
