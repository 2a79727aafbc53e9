"""G1-G4: hierarchy edges, ancestor closure, per-term graphs — checked
against a direct python replica of the reference recursion
(``term_graph_generator.py:13-49``) on the fixture ontology.
"""

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.operators.graph import (
    ancestor_closure,
    hierarchy_edges,
    term_graphs_json,
)
from ontology_mapper_spark.sources.ontology import (
    fixture_onto_terms,
    fixture_ontology_rows,
    onto_terms_from_rows,
)


def _py_closure(rows):
    parents = {r["iri"]: set(r["parents"]) for r in rows}
    known = set(parents)
    out = set()
    for iri in parents:
        stack = list(parents[iri])
        seen = set()
        while stack:
            a = stack.pop()
            if (iri, a) in out or a in seen:
                continue
            out.add((iri, a))
            seen.add(a)
            if a in known:  # reference recurses only through retained terms
                stack.extend(parents[a])
    return out


@pytest.fixture(scope="module")
def onto(spark):
    return fixture_onto_terms(spark).cache()


@pytest.mark.spark
def test_hierarchy_edges(spark, onto):
    edges = hierarchy_edges(onto).collect()
    is_a = {(e["src"], e["dst"]) for e in edges if e["label"] == "IS_A"}
    rows = fixture_ontology_rows()
    exp = {(r["iri"], p) for r in rows for p in r["parents"]}
    assert is_a == exp
    inst = [(e["src"], e["dst"]) for e in edges if e["label"] == "INSTANCE_OF"]
    assert len(inst) == 2  # strain instances


@pytest.mark.spark
def test_ancestor_closure_matches_python(spark, onto):
    got = {(r["term"], r["anc"]) for r in ancestor_closure(onto).collect()}
    exp = _py_closure(fixture_ontology_rows())
    assert got == exp
    # diamond: food allergy reaches disease once, via two paths
    fa = [a for t, a in got if t.endswith("EFO_0003945")]
    assert sum(1 for a in fa if a.endswith("EFO_0000408")) == 1
    assert any(a.endswith("EFO_0003785") for a in fa)  # allergy path
    assert any(a.endswith("EFO_0000405") for a in fa)  # digestive path


@pytest.mark.spark
def test_closure_tolerates_missing_ancestor(spark):
    rows = fixture_ontology_rows()
    # drop 'disease' — paths through it must terminate there, edge retained
    rows = [r for r in rows if not r["iri"].endswith("EFO_0000408")]
    onto = onto_terms_from_rows(spark, rows)
    got = {(t, a) for t, a in
           ((r["term"], r["anc"]) for r in ancestor_closure(onto).collect())}
    asthma = "http://www.ebi.ac.uk/efo/EFO_0000270"
    anc = {a for t, a in got if t == asthma}
    assert any(a.endswith("EFO_0000408") for a in anc)  # edge to missing kept
    assert not any(a.endswith("EFO_0000001") for a in anc)  # no walk through it


@pytest.mark.spark
def test_closure_cycle_safe(spark):
    rows = [
        dict(iri="a", labels=["a"], synonyms=[], definitions=[], parents={"b": "b"},
             children={}, instances={}, restrictions={}, deprecated=False,
             term_type="class"),
        dict(iri="b", labels=["b"], synonyms=[], definitions=[], parents={"a": "a"},
             children={}, instances={}, restrictions={}, deprecated=False,
             term_type="class"),
    ]
    onto = onto_terms_from_rows(spark, rows)
    got = {(r["term"], r["anc"]) for r in ancestor_closure(onto).collect()}
    assert got == {("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")}


@pytest.mark.spark
def test_term_graphs_json(spark, onto):
    graphs = {r["iri"]: r for r in term_graphs_json(onto).collect()}
    asthma = "http://www.ebi.ac.uk/efo/EFO_0000270"
    g = graphs[asthma]
    node_ids = {n["id"] for n in g["nodes"]}
    # self + full ancestor chain
    for frag in ("EFO_0000270", "EFO_0009531", "EFO_0000408", "EFO_0000001"):
        assert any(i.endswith(frag) for i in node_ids), frag
    # direct children present (asthma attack, deprecated phenotype)
    assert any(i.endswith("EFO_0009459") for i in node_ids)
    edges = {(e["from"], e["to"], e["label"]) for e in g["edges"]}
    assert all(l in ("IS_A", "INSTANCE_OF") for _, _, l in edges)
    # child edge direction: child -> term
    assert any(f.endswith("EFO_0009459") and t == asthma for f, t, l in edges)
    # instance graph
    strain = "http://www.ebi.ac.uk/efo/EFO_0005135"
    sg = graphs[strain]
    assert any(e["label"] == "INSTANCE_OF" for e in sg["edges"])
    # every graph's JSON is serializable via to_json
    js = term_graphs_json(onto).select(F.to_json(F.struct("iri", "nodes", "edges")))
    assert js.count() == len(graphs)
