"""S3 OWL scan (round-trip vs fixture), S6-S8 cache/registry, CLI."""

import os
import subprocess
import sys

import pytest

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.sources.cache import (
    OntologyCache,
    cache_exists,
    cache_ontology,
    cache_ontology_set,
)
from ontology_mapper_spark.sources.ontology import (
    fixture_ontology_rows,
    onto_terms_from_rows,
)
from ontology_mapper_spark.sources.owl import parse_owl, write_owl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def owl_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("owl") / "fixture.owl")
    write_owl(fixture_ontology_rows(), path, "http://example.org/fixture")
    return path


def test_owl_round_trip(owl_file):
    parsed = {r["iri"]: r for r in parse_owl(owl_file)}
    orig = {r["iri"]: r for r in fixture_ontology_rows()}
    assert set(parsed) == set(orig)
    for iri, o in orig.items():
        p = parsed[iri]
        assert p["labels"] == o["labels"], iri
        assert sorted(p["synonyms"]) == sorted(o["synonyms"]), iri
        assert set(p["parents"]) == set(o["parents"]), iri
        assert p["deprecated"] == o["deprecated"], iri
        assert p["term_type"] == o["term_type"], iri
        assert set(p["instances"]) == set(o["instances"]), iri
    # term counts by type, shaped like simple_tests.py:166-196
    n_class = sum(1 for r in parsed.values() if r["term_type"] == "class")
    n_prop = sum(1 for r in parsed.values() if r["term_type"] == "property")
    assert n_class == 25 and n_prop == 6 and len(parsed) == 31


@pytest.mark.spark
def test_owl_mapping_equals_fixture_mapping(spark, owl_file):
    from ontology_mapper_spark.pipeline import map_terms
    from ontology_mapper_spark.sources.ontology import fixture_onto_terms

    terms = ["asthma", "acute bronchitis", "protein level"]
    onto_owl = onto_terms_from_rows(spark, parse_owl(owl_file))
    a = map_terms(spark, terms, onto_owl).collect()
    b = map_terms(spark, terms, fixture_onto_terms(spark)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.spark
def test_cache_and_registry(spark, owl_file, tmp_path):
    root = str(tmp_path / "cache")
    handle = cache_ontology(spark, owl_file, "FIX", cache_root=root)
    assert cache_exists("FIX", root)
    df = handle.map_terms(["asthma"], MappingConfig(max_mappings=1))
    rows = df.collect()
    # score 1.0 ties between EFO asthma / HP Asthma; pinned tiebreak iri asc
    assert rows and rows[0]["mapped_term_iri"].endswith("HP_0002099")
    assert rows[0]["mapping_score"] == 1.0
    # registry CSV
    reg = tmp_path / "ontologies.csv"
    reg.write_text(f"acronym,version,url\nFIX2,1.0,{owl_file}\n")
    caches = cache_ontology_set(spark, str(reg), cache_root=root)
    assert set(caches) == {"FIX2"}
    assert isinstance(caches["FIX2"], OntologyCache)
    # property filter flows through the cache read
    props = handle.terms(term_type="property").collect()
    assert len(props) == 6


@pytest.mark.slow
def test_cli_end_to_end(owl_file, tmp_path):
    terms_file = tmp_path / "terms.txt"
    terms_file.write_text("asthma\nacute bronchitis\nmojito\n")
    out_csv = tmp_path / "out.csv"
    r = subprocess.run(
        [sys.executable, "-m", "ontology_mapper_spark",
         "-s", str(terms_file), "-t", owl_file, "-o", str(out_csv),
         "-min", "0.3", "-u", "--cores", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    content = out_csv.read_text().splitlines()
    assert sum(1 for l in content if l.startswith("#")) == 11
    body = [l for l in content if not l.startswith("#")]
    assert body[0].startswith("Source Term ID,Source Term,Mapped Term Label")
    assert any("asthma" in l for l in body[1:])
    assert any("unmapped" in l for l in body[1:])  # mojito row via -u
