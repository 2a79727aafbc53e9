"""The BASELINE quality gate rehearsal: triples P/R >= 0.95 vs the frozen
reference oracle, computed on the (subj, pred, obj) set exactly as
FIXTURES.md §5 specifies — on the synthetic page corpus end-to-end, and for
the prefiltered syntactic ensemble path vs the exact nested-loop semantics.
"""

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.oracle.tfidf_oracle import tfidf_mappings
from ontology_mapper_spark.pipeline import construct_kg
from ontology_mapper_spark.sources.ontology import (
    filter_terms_df,
    fixture_onto_terms,
    onto_labels_df,
)
from ontology_mapper_spark.sources.pages import detect_mentions, synthesize_pages


def _pr(got: set, exp: set) -> tuple[float, float]:
    if not got or not exp:
        return (0.0, 0.0)
    tp = len(got & exp)
    return tp / len(got), tp / len(exp)


@pytest.mark.spark
@pytest.mark.slow
def test_kg_triples_pr_vs_oracle(spark):
    cfg = MappingConfig(min_score=0.3, max_mappings=3)
    onto = fixture_onto_terms(spark).cache()
    pages = synthesize_pages(spark, 400, variants=7).cache()

    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in construct_kg(pages, onto, cfg).collect()
    }

    # oracle on the very same mention list
    mentions = detect_mentions(pages).select("source_term_id", "source_term")
    mrows = mentions.collect()
    labels = (
        onto_labels_df(filter_terms_df(onto, term_type=cfg.term_type))
        .orderBy("iri", "is_synonym", "name")
        .collect()
    )
    oracle_rows = tfidf_mappings(
        [r["source_term"] for r in mrows],
        [r["source_term_id"] for r in mrows],
        [r["name"] for r in labels],
        [r["iri"] for r in labels],
        [r["display_label"] for r in labels],
        max_mappings=cfg.max_mappings,
        min_score=cfg.min_score,
    )
    exp = {
        (r["source_term_id"], "mappedTo", r["mapped_term_iri"]) for r in oracle_rows
    }
    precision, recall = _pr(got, exp)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # with a frozen oracle on identical input we expect exact agreement
    assert precision == 1.0 and recall == 1.0


@pytest.mark.spark
@pytest.mark.slow
def test_prefiltered_syntactic_pr(spark):
    from ontology_mapper_spark.operators.syntactic import (
        syntactic_map_broadcast,
        syntactic_map_prefiltered,
    )

    onto = fixture_onto_terms(spark)
    labels = onto_labels_df(filter_terms_df(onto, term_type="class"))
    mentions = detect_mentions(synthesize_pages(spark, 150, variants=5)).select(
        "source_term_id", "source_term"
    )
    cfg = MappingConfig(mapper="levenshtein", max_mappings=3, min_score=0.5)
    exact = syntactic_map_broadcast(mentions, labels, cfg).filter(
        F.col("mapping_score") >= cfg.min_score
    )
    fast = syntactic_map_prefiltered(mentions, labels, cfg).filter(
        F.col("mapping_score") >= cfg.min_score
    )
    e = {(r["source_term_id"], r["mapped_term_iri"]) for r in exact.collect()}
    f = {(r["source_term_id"], r["mapped_term_iri"]) for r in fast.collect()}
    precision, recall = _pr(f, e)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


@pytest.mark.spark
@pytest.mark.slow
def test_prefilter_dispatch_through_pipeline(spark):
    """cfg.candidate_prefilter must be reachable through map_terms_df (it was
    dead config in round 1): with prefilter_min_labels=0 the pipeline takes
    the prefiltered plan, and its output stays P/R >= 0.95 vs the exact
    nested-loop plan through the same pipeline API."""
    from ontology_mapper_spark.pipeline import map_terms_df

    onto = fixture_onto_terms(spark)
    mentions = detect_mentions(synthesize_pages(spark, 150, variants=5)).select(
        "source_term_id", "source_term", F.lit(None).cast("array<string>").alias("tags")
    )
    exact_cfg = MappingConfig(
        mapper="levenshtein", max_mappings=3, min_score=0.5,
        candidate_prefilter=False,
    )
    fast_cfg = MappingConfig(
        mapper="levenshtein", max_mappings=3, min_score=0.5,
        candidate_prefilter=True, prefilter_min_labels=0,
    )
    e = {
        (r["source_term_id"], r["mapped_term_iri"])
        for r in map_terms_df(mentions, onto, exact_cfg).collect()
    }
    f = {
        (r["source_term_id"], r["mapped_term_iri"])
        for r in map_terms_df(mentions, onto, fast_cfg).collect()
    }
    precision, recall = _pr(f, e)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # the two configs must actually take different physical plans: the
    # fixture ontology is tiny, so the default threshold keeps exact
    default_cfg = MappingConfig(mapper="levenshtein", max_mappings=3)
    assert default_cfg.candidate_prefilter is True
    assert default_cfg.prefilter_min_labels > 100  # fixture stays exact
