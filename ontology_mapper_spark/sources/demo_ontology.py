"""Inline demo ontology over the synthetic ``documents`` vocabulary.

The driver's correctness gate (``__spark_entry__.py``) runs engine queries
against a DuckDB oracle on the same parquet tables; ontologies aren't among
those tables, so mapping queries use this inline dimension — defined ONCE
here and rendered both as a Spark DataFrame and as a SQL VALUES clause, so
the two sides cannot drift.

Labels are composed from the synthetic documents' own word vocabulary
(join/hash/scan/sort/...) so TF-IDF actually finds matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_B = "http://example.org/dbops/OP_"

# (iri, label, synonyms)
DEMO_TERMS = [
    (_B + "0001", "table scan", ["full table scan"]),
    (_B + "0002", "hash join", ["join with hash"]),
    (_B + "0003", "merge join", ["sort merge join"]),
    (_B + "0004", "window function", ["window agg"]),
    (_B + "0005", "group agg", ["agg by group"]),
    (_B + "0006", "stream batch", []),
    (_B + "0007", "slow query", ["query plan"]),
    (_B + "0008", "row filter", ["filter row"]),
    (_B + "0009", "column vector", ["vector data"]),
    (_B + "0010", "spark partition", ["spark part"]),
    (_B + "0011", "customer order", []),
    (_B + "0012", "fast key", ["small key"]),
    (_B + "0013", "big data", []),
    (_B + "0014", "line item", ["order line"]),
]


def demo_label_rows() -> list[tuple[str, str, bool, str]]:
    """onto_labels-shaped rows: (iri, name, is_synonym, display_label)."""
    rows = []
    for iri, label, synonyms in DEMO_TERMS:
        rows.append((iri, label, False, label))
        for s in synonyms:
            rows.append((iri, s, True, label))
    return rows


def demo_onto_labels(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        demo_label_rows(), ["iri", "name", "is_synonym", "display_label"]
    )


def demo_onto_terms(spark: SparkSession) -> DataFrame:
    """The demo ontology as a full onto_terms relation (for gate queries
    that exercise the WHOLE map_terms_df pipeline, not just the label
    side). ``onto_labels_df(filter_terms_df(...))`` over this reproduces
    ``demo_onto_labels`` exactly."""
    from ontology_mapper_spark.sources.ontology import onto_terms_from_rows

    rows = [
        {
            "iri": iri,
            "labels": [label],
            "synonyms": list(synonyms),
            "definitions": [],
            "parents": {},
            "children": {},
            "instances": {},
            "restrictions": {},
            "deprecated": False,
            "term_type": "class",
        }
        for iri, label, synonyms in DEMO_TERMS
    ]
    return onto_terms_from_rows(spark, rows)


def demo_onto_values_sql() -> str:
    """DuckDB VALUES clause mirroring ``demo_onto_labels`` exactly."""
    vals = ",\n    ".join(
        f"('{iri}', '{name}', {str(is_syn).upper()}, '{disp}')"
        for iri, name, is_syn, disp in demo_label_rows()
    )
    return (
        "onto(iri, name, is_synonym, display_label) AS (\n  SELECT * FROM (VALUES\n    "
        + vals
        + "\n  ) AS t(iri, name, is_synonym, display_label)\n)"
    )
