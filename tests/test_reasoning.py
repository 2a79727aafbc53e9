"""Structural classification (sources/reasoning.py) — the engine's bounded
counterpart of the reference's optional HermiT run
(``term_collector.py:20,352-363``). Tests drive it through
``parse_owl(use_reasoning=True)`` on Turtle fixtures so the parse-time
equivalence capture is exercised too."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_mapper_spark.sources.owl import parse_owl  # noqa: E402

EX = "http://example.org/ex#"

BASE_TTL = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/ex#> .

ex:Disease a owl:Class ; rdfs:label "disease" .
ex:Lung a owl:Class ; rdfs:label "lung" .
ex:LeftLung a owl:Class ; rdfs:label "left lung" ;
    rdfs:subClassOf ex:Lung .
ex:locatedIn a owl:ObjectProperty ; rdfs:label "located in" .

# defined class: LungDisease EquivalentTo Disease and (locatedIn some Lung)
ex:LungDisease a owl:Class ; rdfs:label "lung disease" ;
    owl:equivalentClass [ a owl:Class ;
        owl:intersectionOf ( ex:Disease
            [ a owl:Restriction ;
              owl:onProperty ex:locatedIn ;
              owl:someValuesFrom ex:Lung ] ) ] .

# X: primitive class entailing the definition via a SUBCLASS filler
ex:X a owl:Class ; rdfs:label "x" ;
    rdfs:subClassOf ex:Disease ;
    rdfs:subClassOf [ a owl:Restriction ;
        owl:onProperty ex:locatedIn ;
        owl:someValuesFrom ex:LeftLung ] .

# X2: disease with no location — must NOT be classified as LungDisease
ex:X2 a owl:Class ; rdfs:label "x2" ;
    rdfs:subClassOf ex:Disease .

# Y: below X, inherits the restriction -> also a LungDisease
ex:Y a owl:Class ; rdfs:label "y" ;
    rdfs:subClassOf ex:X .
"""


def _parse(tmp_path, ttl: str, use_reasoning: bool):
    p = tmp_path / "onto.ttl"
    p.write_text(ttl)
    return {r["iri"]: r for r in parse_owl(str(p), use_reasoning=use_reasoning)}


def test_defined_class_gains_inferred_subclasses(tmp_path):
    asserted = _parse(tmp_path, BASE_TTL, use_reasoning=False)
    assert EX + "LungDisease" not in asserted[EX + "X"]["parents"]

    inferred = _parse(tmp_path, BASE_TTL, use_reasoning=True)
    x = inferred[EX + "X"]
    # X ⊑ LungDisease: Disease conjunct via told parent, restriction
    # conjunct via filler subsumption (LeftLung ⊑ Lung)
    assert x["parents"][EX + "LungDisease"] == "lung disease"
    # Y inherits X's constraints and X's new parent -> classified too
    assert EX + "LungDisease" in inferred[EX + "Y"]["parents"]
    # soundness: no restriction, no classification
    assert EX + "LungDisease" not in inferred[EX + "X2"]["parents"]
    # children map reflects the inferred edges
    assert EX + "X" in inferred[EX + "LungDisease"]["children"]


def test_property_hierarchy_satisfies_restriction(tmp_path):
    ttl = BASE_TTL + """
ex:anatomicallyLocatedIn a owl:ObjectProperty ;
    rdfs:label "anatomically located in" ;
    rdfs:subPropertyOf ex:locatedIn .
ex:Z a owl:Class ; rdfs:label "z" ;
    rdfs:subClassOf ex:Disease ;
    rdfs:subClassOf [ a owl:Restriction ;
        owl:onProperty ex:anatomicallyLocatedIn ;
        owl:someValuesFrom ex:Lung ] .
"""
    inferred = _parse(tmp_path, ttl, use_reasoning=True)
    # q ⊑ p: (anatomicallyLocatedIn some Lung) entails (locatedIn some Lung)
    assert EX + "LungDisease" in inferred[EX + "Z"]["parents"]


def test_named_equivalence_mutual_subsumption(tmp_path):
    ttl = """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/ex#> .
ex:A a owl:Class ; rdfs:label "a" ; owl:equivalentClass ex:B .
ex:B a owl:Class ; rdfs:label "b" .
ex:Sub a owl:Class ; rdfs:label "sub" ; rdfs:subClassOf ex:B .
"""
    asserted = _parse(tmp_path, ttl, use_reasoning=False)
    # without reasoning, a plain named equivalent is NOT a parent
    assert asserted[EX + "A"]["parents"] == {}

    inferred = _parse(tmp_path, ttl, use_reasoning=True)
    assert EX + "B" in inferred[EX + "A"]["parents"]
    assert EX + "A" in inferred[EX + "B"]["parents"]
    # members of B are classified under A transitively (ancestor closure
    # runs over the emitted parents, so the direct edge suffices here)
    assert EX + "B" in inferred[EX + "Sub"]["parents"]


def test_fixpoint_chained_definitions(tmp_path):
    """A second definition whose named conjunct is itself inferred: needs
    the fixpoint iteration, not a single pass."""
    ttl = BASE_TTL + """
ex:severity a owl:ObjectProperty ; rdfs:label "severity" .
ex:Severe a owl:Class ; rdfs:label "severe" .
# SevereLungDisease EquivalentTo LungDisease and (severity some Severe)
ex:SevereLungDisease a owl:Class ; rdfs:label "severe lung disease" ;
    owl:equivalentClass [ a owl:Class ;
        owl:intersectionOf ( ex:LungDisease
            [ a owl:Restriction ;
              owl:onProperty ex:severity ;
              owl:someValuesFrom ex:Severe ] ) ] .
ex:W a owl:Class ; rdfs:label "w" ;
    rdfs:subClassOf ex:X ;
    rdfs:subClassOf [ a owl:Restriction ;
        owl:onProperty ex:severity ;
        owl:someValuesFrom ex:Severe ] .
"""
    inferred = _parse(tmp_path, ttl, use_reasoning=True)
    # W ⊑ X ⊑(inferred) LungDisease, plus severity some Severe
    # -> W ⊑ SevereLungDisease (requires LungDisease edge from pass 1)
    assert EX + "SevereLungDisease" in inferred[EX + "W"]["parents"]
    # X lacks the severity restriction -> not severe
    assert EX + "SevereLungDisease" not in inferred[EX + "X"]["parents"]


def test_rdfxml_reasoning_matches_ttl(tmp_path):
    """Same ontology in RDF/XML: identical inferred rows (the equivalence
    capture works in both parsers)."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Class rdf:about="http://example.org/ex#Disease">
    <rdfs:label>disease</rdfs:label></owl:Class>
  <owl:Class rdf:about="http://example.org/ex#Lung">
    <rdfs:label>lung</rdfs:label></owl:Class>
  <owl:Class rdf:about="http://example.org/ex#LeftLung">
    <rdfs:label>left lung</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://example.org/ex#Lung"/></owl:Class>
  <owl:ObjectProperty rdf:about="http://example.org/ex#locatedIn">
    <rdfs:label>located in</rdfs:label></owl:ObjectProperty>
  <owl:Class rdf:about="http://example.org/ex#LungDisease">
    <rdfs:label>lung disease</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <owl:Class rdf:about="http://example.org/ex#Disease"/>
          <owl:Restriction>
            <owl:onProperty rdf:resource="http://example.org/ex#locatedIn"/>
            <owl:someValuesFrom rdf:resource="http://example.org/ex#Lung"/>
          </owl:Restriction>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass></owl:Class>
  <owl:Class rdf:about="http://example.org/ex#X">
    <rdfs:label>x</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://example.org/ex#Disease"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://example.org/ex#locatedIn"/>
        <owl:someValuesFrom rdf:resource="http://example.org/ex#LeftLung"/>
      </owl:Restriction>
    </rdfs:subClassOf></owl:Class>
</rdf:RDF>"""
    p = tmp_path / "onto.owl"
    p.write_text(xml)
    via_xml = {r["iri"]: r for r in parse_owl(str(p), use_reasoning=True)}
    assert EX + "LungDisease" in via_xml[EX + "X"]["parents"]


def test_classifier_scales_and_is_deterministic():
    """Dimension-scale smoke: 5k classes (10-ary tree) + 500 definitions
    classify in well under a minute driver-side (candidate pools are seeded
    from named-conjunct descendants, not classes^2), and the inference
    count is exactly reproducible."""
    import time

    from ontology_mapper_spark.sources.reasoning import classify_terms

    def build():
        terms = {}

        def mk(iri, ttype="class"):
            terms[iri] = {
                "iri": iri, "labels": [iri], "synonyms": [],
                "definitions": [], "parents": {}, "children": {},
                "instances": {}, "restrictions": {}, "deprecated": False,
                "term_type": ttype, "equiv": [],
            }
            return terms[iri]

        mk("p0", "property")
        for i in range(5000):
            t = mk(f"c{i}")
            if i > 0:
                t["parents"][f"c{(i - 1) // 10}"] = ""
            if i % 7 == 0:
                t["restrictions"]["p0"] = f"c{i % 50}"
        for d in range(500):
            t = mk(f"def{d}")
            t["equiv"].append(
                {"named": [f"c{d % 100}"], "restrictions": {"p0": f"c{d % 50}"}}
            )
        return terms

    t0 = time.time()
    a = classify_terms(build())
    elapsed = time.time() - t0
    assert elapsed < 30, f"classifier too slow: {elapsed:.1f}s"
    # 34575 -> 34275 with the SCC-correct _ancestors: definition classes
    # form 2-cycles with their named conjunct (C EquivalentTo N and N ⊑ C);
    # the old partial ancestor sets failed to see c ∈ anc[x] inside such
    # cycles and re-added 300 already-entailed edges. The entailed CLOSURE
    # is unchanged-or-larger; only the count of explicit additions drops.
    assert a == classify_terms(build()) == 34275


def test_ancestors_cycles_get_full_sets():
    """r3 ADVICE #2: the DFS+memo _ancestors cached partial sets for nodes
    finishing while a cycle was open. SCC condensation must give every
    cycle member the complete set regardless of traversal order."""
    from ontology_mapper_spark.sources.reasoning import _ancestors

    # two-cycle A <-> B with a tail C -> A and a head B -> D
    anc = _ancestors({"A": {"B"}, "B": {"A", "D"}, "C": {"A"}, "D": set()})
    assert anc["A"] == {"A", "B", "D"}
    assert anc["B"] == {"A", "B", "D"}
    assert anc["C"] == {"A", "B", "D"}
    assert anc["D"] == set()

    # self-loop includes the node itself
    anc = _ancestors({"X": {"X", "Y"}, "Y": set()})
    assert anc["X"] == {"X", "Y"}

    # acyclic behavior unchanged: no self-membership, full transitivity
    anc = _ancestors({"a": {"b"}, "b": {"c"}, "c": set()})
    assert anc["a"] == {"b", "c"} and anc["b"] == {"c"} and anc["c"] == set()

    # 3-cycle reached late (traversal-order independence)
    anc = _ancestors({"p": {"q"}, "q": {"r"}, "r": {"p"}, "s": {"q"}})
    assert anc["s"] == {"p", "q", "r"}
    assert anc["p"] == anc["q"] == anc["r"] == {"p", "q", "r"}
