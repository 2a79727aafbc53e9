"""Executable evidence for the north_star's runtime-adaptivity claims:
the link-score shuffle (the dedup-scoring distinct on mention strings) is
AQE-coalesced, and the candidate join back is AQE-converted to broadcast —
both read from the EXECUTED adaptive plan, not the static one."""

import pytest

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.pipeline import construct_kg
from ontology_mapper_spark.sources.ontology import fixture_onto_terms
from ontology_mapper_spark.sources.pages import synthesize_pages


@pytest.mark.spark
def test_link_score_shuffle_is_aqe_coalesced_and_join_broadcast(spark):
    pages = synthesize_pages(spark, 400)
    onto = fixture_onto_terms(spark)
    triples = construct_kg(pages, onto, MappingConfig(max_mappings=1))
    # collect() executes THIS DataFrame's queryExecution (count() would
    # plan and run a separate query, leaving this plan un-finalized)
    assert len(triples.collect()) > 0
    executed = triples._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed
    # the distinct's exchange was re-planned at runtime: tiny map output
    # must coalesce to fewer reducers than spark.sql.shuffle.partitions
    assert "AQEShuffleRead" in executed, executed
    assert "coalesced" in executed, executed
    # the candidates->mentions join back carries no static broadcast hint;
    # AQE must still pick a broadcast-hash join from the observed size
    assert "BroadcastHashJoin" in executed, executed
