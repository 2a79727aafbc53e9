"""J3/A4/T3: syntactic mapper vs a direct replica of the reference loop
(``syntactic_mapper.py:34-47``), plus broadcast-kernel vs native-SQL plan
equivalence for the JVM-expressible metrics.
"""

import pytest

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.functions.metrics import METRICS
from ontology_mapper_spark.operators.syntactic import (
    _terms_with_names,
    syntactic_map_broadcast,
    syntactic_map_sql,
)
from ontology_mapper_spark.sources.ontology import (
    filter_terms_df,
    fixture_onto_terms,
    onto_labels_df,
)

TERMS = ["asthma", "bronchitis attack", "food allergy", "xyzzy", "Protein Level"]


def _oracle(terms_with_names, source_terms, metric_name, max_mappings):
    """Reference ``_map``: every ontology term scored (max over names),
    top max_mappings by score desc, ties by iri asc (pinned)."""
    metric = METRICS[metric_name]
    out = []
    for i, term in enumerate(source_terms):
        scored = []
        for iri, display, names in terms_with_names:
            best = 0.0
            for name in names:
                s = metric(term, name)
                if s > best:
                    best = s
            scored.append((-best, iri, display))
        scored.sort(key=lambda x: (x[0], x[1]))
        for neg, iri, display in scored[:max_mappings]:
            out.append((f"id{i}", term, iri, round(-neg, 9)))
    return sorted(out)


def _spark_result(spark, impl, metric_name, max_mappings=3):
    cfg = MappingConfig(mapper=metric_name, max_mappings=max_mappings)
    mentions = spark.createDataFrame(
        [(f"id{i}", t) for i, t in enumerate(TERMS)],
        ["source_term_id", "source_term"],
    )
    labels = onto_labels_df(
        filter_terms_df(fixture_onto_terms(spark), term_type=cfg.term_type)
    )
    df = impl(mentions, labels, cfg)
    return sorted(
        (r["source_term_id"], r["source_term"], r["mapped_term_iri"],
         round(r["mapping_score"], 9))
        for r in df.collect()
    ), labels


@pytest.mark.spark
@pytest.mark.parametrize(
    "metric", ["levenshtein", "jaro", "jarowinkler", "indel", "fuzzy", "jaccard"]
)
def test_broadcast_matches_reference_loop(spark, metric):
    got, labels = _spark_result(spark, syntactic_map_broadcast, metric)
    twn = _terms_with_names(labels)
    exp = _oracle(twn, TERMS, metric, 3)
    got_set = {(a, b, c) for a, b, c, _ in got}
    exp_set = {(a, b, c) for a, b, c, _ in exp}
    # candidate sets may differ only where scores tie at the k-th place;
    # scores for shared keys must match exactly
    exp_scores = {(a, b, c): s for a, b, c, s in exp}
    got_scores = {(a, b, c): s for a, b, c, s in got}
    assert got_set == exp_set, f"{metric}: {got_set ^ exp_set}"
    for k, s in exp_scores.items():
        assert abs(got_scores[k] - s) < 1e-9, (metric, k)


@pytest.mark.spark
@pytest.mark.parametrize("metric", ["levenshtein", "jaccard"])
def test_sql_plan_matches_broadcast(spark, metric):
    a, _ = _spark_result(spark, syntactic_map_broadcast, metric, max_mappings=2)
    b, _ = _spark_result(spark, syntactic_map_sql, metric, max_mappings=2)
    assert [(x[0], x[1], x[2]) for x in a] == [(x[0], x[1], x[2]) for x in b]
    for ra, rb in zip(a, b):
        assert abs(ra[3] - rb[3]) < 1e-9
