"""Catalog shim: parquet-path mode round trip (Iceberg mode needs the
runtime jars — exercised only when ONTOLOGY_MAPPER_CATALOG is set)."""

import os

import pytest

from ontology_mapper_spark.catalog import read_table, write_table


@pytest.mark.spark
def test_catalog_parquet_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("ONTOLOGY_MAPPER_WAREHOUSE", str(tmp_path))
    monkeypatch.delenv("ONTOLOGY_MAPPER_CATALOG", raising=False)
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 0)], ["id", "v", "part"]
    )
    write_table(df, "kg.triples_test", partition_by=["part"])
    assert os.path.isdir(str(tmp_path / "kg" / "triples_test" / "part=0"))
    back = read_table(spark, "kg.triples_test")
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # append mode accumulates
    write_table(df.filter("id = 1"), "kg.triples_test", ["part"], mode="append")
    assert read_table(spark, "kg.triples_test").count() == 4
