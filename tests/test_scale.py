"""EFO-scale smoke: the broadcast TF-IDF path at the reference's ontology
scale anchor (50,867 EFO terms, ``simple_tests.py:167``)."""

import time

import pytest

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.operators.tfidf import tfidf_map_broadcast
from ontology_mapper_spark.sources.ontology import (
    filter_terms_df,
    onto_labels_df,
    onto_terms_from_rows,
    synthesize_ontology_rows,
)
from ontology_mapper_spark.sources.pages import detect_mentions, synthesize_pages


@pytest.mark.spark
@pytest.mark.slow
def test_efo_scale_ontology(spark):
    onto = onto_terms_from_rows(spark, synthesize_ontology_rows(50000))
    labels = onto_labels_df(filter_terms_df(onto, term_type="class"))
    mentions = detect_mentions(synthesize_pages(spark, 5000, variants=997)).select(
        "source_term_id", "source_term", "tags"
    )
    cfg = MappingConfig(min_score=0.3, max_mappings=3)
    t0 = time.time()
    out = tfidf_map_broadcast(mentions, labels, cfg)
    n = out.count()
    dt = time.time() - t0
    assert n > 10000  # real candidate volume
    # capped per mention
    assert out.groupBy("source_term_id").count().agg(
        {"count": "max"}
    ).collect()[0][0] <= 3
    # sanity throughput floor: >500 mentions/s even on a noisy box
    assert 20000 / dt > 500, f"too slow: {dt:.1f}s"
