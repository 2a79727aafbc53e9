"""Ontology cache + registry (SURVEY.md §2 S6-S8; reference
``onto_cache.py``, ``t2t.py:117-129``).

The reference pickles ``dict[iri -> OntologyTerm]`` per ontology acronym
under ``cache/<acr>/``; this engine stores parquet ontology tables (column-
pruned, predicate-pushed reads — and Iceberg-ready). The cached-equals-fresh
invariant the reference pins (``test/simple_tests.py:70-75``) is pinned
here too (tests/test_pipeline.py::test_cached_equals_fresh).
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession

from ontology_mapper_spark.config import MappingConfig, OntologyTermType
from ontology_mapper_spark.sources.ontology import (
    onto_terms_from_rows,
    read_ontology_cache,
    write_ontology_cache,
)
from ontology_mapper_spark.sources.owl import parse_owl


def cache_dir_for(acronym: str, cache_root: str = "cache") -> str:
    return os.path.join(cache_root, acronym, f"{acronym}-term-details")


def cache_exists(acronym: str, cache_root: str = "cache") -> bool:
    return os.path.isdir(cache_dir_for(acronym, cache_root))


def clear_cache(acronym: str = "", cache_root: str = "cache") -> None:
    """Reference ``onto_cache.clear_cache`` (``onto_cache.py:38-50``):
    remove one acronym's cached tables, or the whole cache root when no
    acronym is given."""
    import shutil

    target = os.path.join(cache_root, acronym) if acronym else cache_root
    if os.path.isdir(target):
        shutil.rmtree(target)


def cache_ontology(
    spark: SparkSession,
    ontology_path: str,
    ontology_acronym: str = "",
    cache_root: str = "cache",
    use_reasoning: bool = False,
) -> "OntologyCache":
    """S6 — parse an OWL file and persist the full (term_type=any,
    unfiltered) table, like reference ``cache_ontology`` (``t2t.py:118-129``).
    ``use_reasoning``: classify before caching (the collector-level knob,
    ``term_collector.py:20``) so the cached hierarchy includes inferred
    edges."""
    acronym = ontology_acronym or os.path.basename(ontology_path)
    rows = parse_owl(ontology_path, use_reasoning=use_reasoning)
    if not rows:
        raise RuntimeError("Could not find any terms in the given ontology.")
    terms = onto_terms_from_rows(spark, rows)
    write_ontology_cache(terms, cache_dir_for(acronym, cache_root))
    return OntologyCache(spark, acronym, cache_root)


def cache_ontology_set(
    spark: SparkSession, registry_csv: str, cache_root: str = "cache"
) -> dict[str, "OntologyCache"]:
    """S8 — registry scan: CSV rows (acronym, version, url) cached in a
    driver loop (reference ``onto_cache.py:18-29``); url must be a local
    OWL path in this offline engine."""
    caches: dict[str, OntologyCache] = {}
    with open(registry_csv) as f:
        for row in csv.DictReader(f):
            caches[row["acronym"]] = cache_ontology(
                spark, row["url"], row["acronym"], cache_root
            )
    return caches


class OntologyCache:
    """Reference ``onto_cache.py:52-73`` — a handle whose ``map_terms``
    forwards to the engine with the cached ontology."""

    def __init__(self, spark: SparkSession, acronym: str, cache_root: str = "cache"):
        self.spark = spark
        self.acronym = acronym
        self.cache_root = cache_root

    def terms(
        self,
        base_iris: tuple = (),
        excl_deprecated: bool = False,
        term_type: str = OntologyTermType.CLASS,
    ) -> DataFrame:
        return read_ontology_cache(
            self.spark,
            cache_dir_for(self.acronym, self.cache_root),
            base_iris,
            excl_deprecated,
            term_type,
        )

    def cache_exists(self) -> bool:
        return cache_exists(self.acronym, self.cache_root)

    def clear_cache(self) -> None:
        clear_cache(self.acronym, self.cache_root)

    def map_terms(self, source_terms, cfg: MappingConfig | None = None) -> DataFrame:
        from ontology_mapper_spark.pipeline import map_terms

        cfg = cfg or MappingConfig()
        onto = self.terms(cfg.base_iris, cfg.excl_deprecated, cfg.term_type)
        # filters already applied at read; avoid double application quirks
        read_cfg = MappingConfig(**{**cfg.__dict__, "base_iris": (),
                                    "excl_deprecated": False,
                                    "term_type": OntologyTermType.ANY})
        return map_terms(self.spark, source_terms, onto, read_cfg)
