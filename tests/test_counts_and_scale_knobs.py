"""Fixture term-collector count asserts (the shape of the reference's
``simple_tests.py:166-196``), page-dedup in the KG flow, and the stop-ngram
skew valve's P/R bound."""

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.operators.tfidf import (
    tfidf_map_broadcast,
    tfidf_map_inverted_index,
)
from ontology_mapper_spark.pipeline import construct_kg
from ontology_mapper_spark.sources.ontology import (
    filter_terms_df,
    fixture_onto_terms,
    onto_labels_df,
)
from ontology_mapper_spark.sources.pages import detect_mentions, synthesize_pages


@pytest.fixture(scope="module")
def onto(spark):
    return fixture_onto_terms(spark).cache()


@pytest.mark.spark
def test_term_collector_counts(spark, onto):
    # shape of simple_tests.py:166-196: exact counts per filter combination
    assert filter_terms_df(onto, term_type="any").count() == 31
    assert filter_terms_df(onto, term_type="class").count() == 25
    assert filter_terms_df(onto, term_type="property").count() == 6
    efo = ("http://www.ebi.ac.uk/efo",)
    assert filter_terms_df(onto, base_iris=efo, term_type="any").count() == 22
    assert filter_terms_df(onto, base_iris=efo, term_type="property").count() == 4
    hp = ("http://purl.obolibrary.org/obo/HP",)
    assert filter_terms_df(onto, base_iris=hp, term_type="any").count() == 8
    assert (
        filter_terms_df(onto, term_type="any", excl_deprecated=True).count() == 28
    )
    with pytest.raises(ValueError):
        filter_terms_df(onto, term_type="neither")


@pytest.mark.spark
def test_construct_kg_dedup_pages(spark, onto):
    pages = synthesize_pages(spark, 60).cache()
    # duplicate recrawl with LATER timestamps and different content
    recrawl = pages.limit(20).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
    )
    both = pages.unionByName(recrawl)
    cfg = MappingConfig(max_mappings=1)
    t_dedup = construct_kg(both, onto, cfg, dedup_pages=True)
    t_plain = construct_kg(pages, onto, cfg)
    # newest capture per url wins; subj set identical to single-crawl run
    assert {r["subj"] for r in t_dedup.collect()} == {
        r["subj"] for r in t_plain.collect()
    }
    # without dedup, duplicated urls double-emit
    t_nodedup = construct_kg(both, onto, cfg)
    assert t_nodedup.count() > t_dedup.count()


@pytest.mark.spark
def test_stop_ngram_valve_pr(spark, onto):
    labels = onto_labels_df(filter_terms_df(onto, term_type="class"))
    mentions = detect_mentions(synthesize_pages(spark, 100, variants=5)).select(
        "source_term_id", "source_term", "tags"
    )
    exact = tfidf_map_broadcast(mentions, labels, MappingConfig())
    valve = tfidf_map_inverted_index(
        mentions, labels, MappingConfig(stop_ngram_df_fraction=0.4)
    )
    e = {(r["source_term_id"], r["mapped_term_iri"]) for r in exact.collect()}
    v = {(r["source_term_id"], r["mapped_term_iri"]) for r in valve.collect()}
    tp = len(e & v)
    assert tp / len(v) >= 0.95 and tp / len(e) >= 0.95, (len(e), len(v), tp)
