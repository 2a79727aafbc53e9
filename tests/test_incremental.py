"""Incremental KG maintenance: change detection by content digest,
delta-only recomputation, triple reuse, and the headline invariant
incremental == full rebuild (also driver-checked by the
``incremental_kg_triples`` gate query against the full-rebuild SQL)."""

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.operators.tfidf import source_idf_map
from ontology_mapper_spark.pipeline import (
    construct_kg,
    incremental_kg,
    merge_digests,
    page_digests,
    triple_url,
)
from ontology_mapper_spark.sources.ontology import fixture_onto_terms
from ontology_mapper_spark.sources.pages import (
    detect_mentions,
    recrawl_pages,
    synthesize_pages,
)

N_PREV = 120
RECRAWL_LO, RECRAWL_HI = 80, 160
MUTATE_EVERY = 7


@pytest.fixture(scope="module")
def onto(spark):
    return fixture_onto_terms(spark).cache()


@pytest.fixture(scope="module")
def state(spark, onto):
    """(prev_pages, new_pages, latest_pages, frozen_idf, cfg,
    prev_triples) — the rolling-crawl scenario shared by the tests."""
    cfg = MappingConfig(max_mappings=1)
    prev = synthesize_pages(spark, N_PREV).cache()
    new = recrawl_pages(
        spark, RECRAWL_LO, RECRAWL_HI, mutate_every=MUTATE_EVERY
    ).cache()
    # latest corpus state: urls not re-crawled keep their old capture
    latest = prev.join(
        new.select("url"), "url", "left_anti"
    ).unionByName(new).cache()
    # the frozen IDF model both runs share (snapshot state, like digests)
    idf = source_idf_map(detect_mentions(latest), cfg.ngram_length)
    prev_triples = construct_kg(
        prev, onto, cfg, tfidf_source_idf=idf
    ).cache()
    return prev, new, latest, idf, cfg, prev_triples


def _key(df):
    return sorted(
        (r["subj"], r["pred"], r["obj"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.mark.spark
def test_incremental_equals_full_rebuild(spark, onto, state):
    prev, new, latest, idf, cfg, prev_triples = state
    full = construct_kg(latest, onto, cfg, tfidf_source_idf=idf)
    inc = incremental_kg(
        new, page_digests(prev), prev_triples, onto, cfg,
        tfidf_source_idf=idf,
    )
    assert _key(inc) == _key(full)
    # sanity: the scenario exercises all three url classes
    assert prev_triples.count() > 0
    changed = [u for i, u in _urls(RECRAWL_LO, N_PREV) if i % MUTATE_EVERY == 0]
    assert changed, "mutation rule produced no changed re-captures"


def _urls(lo, hi):
    return [(i, f"https://example.org/site{i % 97}/page{i}") for i in range(lo, hi)]


@pytest.mark.spark
def test_unchanged_triples_are_reused_not_recomputed(spark, onto, state):
    """Poison prev_triples for an unchanged url: the incremental output
    must carry the poisoned row verbatim — proof the engine reused the
    stored triple instead of recomputing it."""
    prev, new, latest, idf, cfg, prev_triples = state
    # an unchanged RE-CRAWLED url (content identical, so must be reused)
    unchanged = next(
        u for i, u in _urls(RECRAWL_LO, N_PREV) if i % MUTATE_EVERY != 0
        and any(r["subj"].startswith(u + "#") for r in prev_triples.collect())
    )
    poisoned = prev_triples.withColumn(
        "obj",
        F.when(
            triple_url("subj") == unchanged, F.lit("urn:poison")
        ).otherwise(F.col("obj")),
    )
    inc = incremental_kg(
        new, page_digests(prev), poisoned, onto, cfg, tfidf_source_idf=idf
    )
    got = inc.filter(triple_url("subj") == unchanged).select("obj").collect()
    assert got and all(r["obj"] == "urn:poison" for r in got)


@pytest.mark.spark
def test_retired_urls_drop_triples(spark, onto, state):
    prev, new, latest, idf, cfg, prev_triples = state
    victim = next(
        u for i, u in _urls(0, RECRAWL_LO)
        if any(r["subj"].startswith(u + "#") for r in prev_triples.collect())
    )
    retired = spark.createDataFrame([(victim,)], ["url"])
    inc = incremental_kg(
        new, page_digests(prev), prev_triples, onto, cfg,
        retired_urls=retired, tfidf_source_idf=idf,
    )
    assert inc.filter(triple_url("subj") == victim).count() == 0


@pytest.mark.spark
def test_merge_digests_advances_snapshot(spark, state):
    prev, new, latest, idf, cfg, prev_triples = state
    merged = merge_digests(page_digests(prev), new)
    expect = {r["url"]: r["digest"] for r in page_digests(latest).collect()}
    got = {r["url"]: r["digest"] for r in merged.collect()}
    assert got == expect


@pytest.mark.spark
def test_page_digests_is_map_side_only(spark):
    plan = (
        page_digests(synthesize_pages(spark, 50))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


@pytest.mark.spark
def test_tfidf_requires_frozen_idf(spark, onto, state):
    prev, new, latest, idf, cfg, prev_triples = state
    with pytest.raises(ValueError, match="frozen"):
        incremental_kg(new, page_digests(prev), prev_triples, onto, cfg)


@pytest.mark.spark
def test_triple_url_with_fragmenty_urls(spark):
    df = spark.createDataFrame(
        [("https://a.org/p#frag#3",), ("https://b.org/q#0",)], ["subj"]
    )
    got = [r["u"] for r in df.select(triple_url("subj").alias("u")).collect()]
    assert got == ["https://a.org/p#frag", "https://b.org/q"]


@pytest.mark.spark
def test_merge_digests_drops_retired_urls(spark, state):
    """A retired url's digest must leave the snapshot with its triples:
    a stale digest would classify a later re-appearance with unchanged
    content as 'unchanged' and its triples would stay missing forever
    (r4 review finding)."""
    prev, new, latest, idf, cfg, prev_triples = state
    victim = _urls(0, RECRAWL_LO)[0][1]
    retired = spark.createDataFrame([(victim,)], ["url"])
    merged = merge_digests(page_digests(prev), new, retired_urls=retired)
    assert merged.filter(F.col("url") == victim).count() == 0
    # everything else unaffected
    assert merged.count() == merge_digests(page_digests(prev), new).count() - 1


@pytest.mark.spark
def test_retired_and_recrawled_url_yields_no_triples(spark, onto, state):
    """Retirement WINS over re-crawl within one cycle: a url both retired
    and re-captured (even with changed content) contributes no fresh
    triples, matching merge_digests dropping its digest — KG and digest
    snapshot must agree on the url's existence (r4 review finding)."""
    prev, new, latest, idf, cfg, prev_triples = state
    # a CHANGED re-crawled url (would otherwise be recomputed)
    victim = next(
        u for i, u in _urls(RECRAWL_LO, N_PREV) if i % MUTATE_EVERY == 0
    )
    retired = spark.createDataFrame([(victim,)], ["url"])
    inc = incremental_kg(
        new, page_digests(prev), prev_triples, onto, cfg,
        retired_urls=retired, tfidf_source_idf=idf,
    )
    assert inc.filter(triple_url("subj") == victim).count() == 0
