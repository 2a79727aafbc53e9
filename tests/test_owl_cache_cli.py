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


def test_ttl_round_trip_identical_to_rdfxml(owl_file, tmp_path):
    """r2 VERDICT #7: a Turtle serialization of the same ontology yields
    IDENTICAL onto_terms rows to the RDF/XML one — full dict equality,
    including parent/child label resolution, restrictions, instances."""
    from ontology_mapper_spark.sources.owl import write_ttl

    ttl = str(tmp_path / "fixture.ttl")
    write_ttl(fixture_ontology_rows(), ttl, "http://example.org/fixture")
    via_xml = {r["iri"]: r for r in parse_owl(owl_file)}
    via_ttl = {r["iri"]: r for r in parse_owl(ttl)}
    assert via_ttl == via_xml
    assert len(via_ttl) == 31


def test_ttl_real_world_shapes(tmp_path):
    """Turtle grammar features real exporters emit: prefixed names, 'a',
    object lists, blank-node restrictions, intersectionOf collections,
    lang-tagged + datatyped literals, comments, equivalentClass bnodes."""
    ttl = tmp_path / "mini.ttl"
    ttl.write_text("""\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix obo: <http://purl.obolibrary.org/obo/> .
@prefix oboInOwl: <http://www.geneontology.org/formats/oboInOwl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

# a defined class with an intersection definition
obo:EX_1 a owl:Class ;
    rdfs:label "asthma"@en ;
    oboInOwl:hasExactSynonym "bronchial hyperreactivity", "chronic asthma" ;
    owl:equivalentClass [ a owl:Class ;
        owl:intersectionOf ( obo:EX_2
            [ a owl:Restriction ;
              owl:onProperty obo:RO_1 ;
              owl:someValuesFrom obo:EX_3 ] ) ] .

obo:EX_2 a owl:Class ; rdfs:label "disease" ;
    rdfs:subClassOf owl:Thing .
obo:EX_3 a owl:Class ; rdfs:label "lung" .
obo:EX_4 a owl:Class ; rdfs:label "old disease" ;
    rdfs:subClassOf obo:EX_2 ;
    owl:deprecated "true"^^xsd:boolean .
obo:RO_1 a owl:ObjectProperty ; rdfs:label "located in" .
""")
    rows = {r["iri"]: r for r in parse_owl(str(ttl))}
    obo = "http://purl.obolibrary.org/obo/"
    assert rows[obo + "EX_1"]["labels"] == ["asthma"]
    assert rows[obo + "EX_1"]["synonyms"] == [
        "bronchial hyperreactivity", "chronic asthma"
    ]
    # intersection conjuncts: named -> parent, restriction -> restriction
    assert rows[obo + "EX_1"]["parents"] == {obo + "EX_2": "disease"}
    assert rows[obo + "EX_1"]["restrictions"] == {obo + "RO_1": obo + "EX_3"}
    # owl:Thing is never a parent
    assert rows[obo + "EX_2"]["parents"] == {}
    assert rows[obo + "EX_4"]["deprecated"] is True
    assert rows[obo + "RO_1"]["term_type"] == "property"
    # children derived as inverse of parents, labels resolved
    assert rows[obo + "EX_2"]["children"] == {
        obo + "EX_1": "asthma", obo + "EX_4": "old disease"
    }


def test_ttl_imports_closure(tmp_path):
    """owl:imports from a Turtle file resolves local targets — including a
    mixed-format closure (.ttl importing .owl)."""
    from ontology_mapper_spark.sources.owl import write_owl as _write_owl

    imported = str(tmp_path / "imported.owl")
    _write_owl(
        [{
            "iri": "http://example.org/dep#X", "labels": ["dep x"],
            "synonyms": [], "definitions": [], "parents": {}, "children": {},
            "instances": {}, "restrictions": {}, "deprecated": False,
            "term_type": "class",
        }],
        imported,
        "http://example.org/imported",
    )
    main = tmp_path / "main.ttl"
    main.write_text("""\
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
<http://example.org/main> a owl:Ontology ;
    owl:imports <imported.owl> ,
        <http://example.org/ontologies/unreachable.owl> .
<http://example.org/main#A> a owl:Class ; rdfs:label "a term" .
""")
    rows = {r["iri"]: r for r in parse_owl(str(main))}
    assert set(rows) == {"http://example.org/main#A", "http://example.org/dep#X"}
    solo = parse_owl(str(main), follow_imports=False)
    assert [r["iri"] for r in solo] == ["http://example.org/main#A"]


_MAIN_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://example.org/main">
    <owl:imports rdf:resource="imported.owl"/>
    <owl:imports rdf:resource="http://example.org/ontologies/remote-dep.owl"/>
    <owl:imports rdf:resource="http://example.org/ontologies/unreachable.owl"/>
  </owl:Ontology>
  <owl:Class rdf:about="http://example.org/main#Pancreatitis">
    <rdfs:label>pancreatitis</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://example.org/imported#Disease"/>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <owl:Class rdf:about="http://example.org/imported#InflammatoryDisease"/>
          <owl:Restriction>
            <owl:onProperty rdf:resource="http://example.org/main#hasLocation"/>
            <owl:someValuesFrom rdf:resource="http://example.org/main#Pancreas"/>
          </owl:Restriction>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
  <owl:Class rdf:about="http://example.org/main#Pancreas">
    <rdfs:label>pancreas</rdfs:label>
    <owl:equivalentClass rdf:resource="http://example.org/other#PancreasOrgan"/>
  </owl:Class>
  <owl:ObjectProperty rdf:about="http://example.org/main#hasLocation">
    <rdfs:label>has location</rdfs:label>
  </owl:ObjectProperty>
</rdf:RDF>
"""

_IMPORTED_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://example.org/imported">
    <owl:imports rdf:resource="main.owl"/>
  </owl:Ontology>
  <owl:Class rdf:about="http://example.org/imported#Disease">
    <rdfs:label>disease</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://example.org/imported#InflammatoryDisease">
    <rdfs:label>inflammatory disease</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://example.org/imported#Disease"/>
  </owl:Class>
</rdf:RDF>
"""

_REMOTE_DEP_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Class rdf:about="http://example.org/remote#Organ">
    <rdfs:label>organ</rdfs:label>
  </owl:Class>
  <owl:DatatypeProperty rdf:about="http://example.org/remote#hasCode">
    <rdfs:label>has code</rdfs:label>
  </owl:DatatypeProperty>
</rdf:RDF>
"""


def test_owl_imports_and_equivalent_class(tmp_path):
    """owl:imports closure (relative + basename-resolved http + skipped
    unreachable, cycle-safe) and equivalentClass-embedded restrictions —
    reference term_collector.py:53-60 (imports) and 93-132 (And/Restriction
    parents). Counts hand-computed, shaped like simple_tests.py:166-196."""
    (tmp_path / "main.owl").write_text(_MAIN_OWL)
    (tmp_path / "imported.owl").write_text(_IMPORTED_OWL)
    (tmp_path / "remote-dep.owl").write_text(_REMOTE_DEP_OWL)

    rows = {r["iri"]: r for r in parse_owl(str(tmp_path / "main.owl"))}
    # 3 main (2 classes + 1 property) + 2 imported + 2 basename-resolved
    # remote (1 class + 1 property); unreachable.owl skipped cleanly
    assert len(rows) == 7
    n_class = sum(1 for r in rows.values() if r["term_type"] == "class")
    n_prop = sum(1 for r in rows.values() if r["term_type"] == "property")
    assert (n_class, n_prop) == (5, 2)

    panc = rows["http://example.org/main#Pancreatitis"]
    # named equivalentClass conjunct -> parent, alongside the asserted one,
    # with labels resolved across files
    assert panc["parents"] == {
        "http://example.org/imported#Disease": "disease",
        "http://example.org/imported#InflammatoryDisease": "inflammatory disease",
    }
    # restriction conjunct -> restrictions map
    assert panc["restrictions"] == {
        "http://example.org/main#hasLocation": "http://example.org/main#Pancreas"
    }
    # plain named equivalent is NOT a parent
    assert rows["http://example.org/main#Pancreas"]["parents"] == {}
    # children derived across the merged set
    dis = rows["http://example.org/imported#Disease"]
    assert set(dis["children"]) == {
        "http://example.org/main#Pancreatitis",
        "http://example.org/imported#InflammatoryDisease",
    }
    # follow_imports=False parses only the one file
    solo = parse_owl(str(tmp_path / "main.owl"), follow_imports=False)
    assert len(solo) == 3


_DESCRIPTION_STYLE_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <rdf:Description rdf:about="http://example.org/d#Asthma">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
    <rdfs:label>asthma</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://example.org/d#Disease"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/d#Disease">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
    <rdfs:label>disease</rdfs:label>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/d#hasCode">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#DatatypeProperty"/>
    <rdfs:label>has code</rdfs:label>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/d#case1">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#NamedIndividual"/>
    <rdf:type rdf:resource="http://example.org/d#Asthma"/>
    <rdfs:label>case one</rdfs:label>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/d#untyped">
    <rdfs:label>annotation-only node, skipped</rdfs:label>
  </rdf:Description>
</rdf:RDF>
"""


def test_owl_rdf_description_serialization(tmp_path):
    """The rdf:Description + rdf:type style many real-world exporters emit
    must parse identically to directly-typed elements; untyped Description
    nodes (annotation axioms) are skipped."""
    p = tmp_path / "desc.owl"
    p.write_text(_DESCRIPTION_STYLE_OWL)
    rows = {r["iri"]: r for r in parse_owl(str(p))}
    assert set(rows) == {
        "http://example.org/d#Asthma",
        "http://example.org/d#Disease",
        "http://example.org/d#hasCode",
    }
    asthma = rows["http://example.org/d#Asthma"]
    assert asthma["term_type"] == "class"
    assert asthma["parents"] == {"http://example.org/d#Disease": "disease"}
    assert asthma["instances"] == {"http://example.org/d#case1": "case one"}
    assert rows["http://example.org/d#hasCode"]["term_type"] == "property"


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
    # clear_cache parity (reference onto_cache.py:38-50,66-73)
    assert handle.cache_exists()
    caches["FIX2"].clear_cache()
    assert not cache_exists("FIX2", root) and handle.cache_exists()
    handle.clear_cache()
    assert not handle.cache_exists()


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


def test_owlxml_serialization(tmp_path):
    """OWL/XML (functional-style XML, root owl:Ontology) — the third
    owlready2-tolerated serialization: declarations, annotation assertions,
    subclass/intersection/restriction axioms, class assertions, and the
    same rows as the equivalent Turtle."""
    owlxml = tmp_path / "mini.owx"
    owlxml.write_text("""<?xml version="1.0"?>
<Ontology xmlns="http://www.w3.org/2002/07/owl#"
          ontologyIRI="http://example.org/mini">
  <Prefix name="rdfs" IRI="http://www.w3.org/2000/01/rdf-schema#"/>
  <Prefix name="oio" IRI="http://www.geneontology.org/formats/oboInOwl#"/>
  <Prefix name="owl" IRI="http://www.w3.org/2002/07/owl#"/>
  <Declaration><Class IRI="#Disease"/></Declaration>
  <Declaration><Class IRI="#Asthma"/></Declaration>
  <Declaration><Class IRI="#Old"/></Declaration>
  <Declaration><ObjectProperty IRI="#locatedIn"/></Declaration>
  <Declaration><NamedIndividual IRI="#case1"/></Declaration>
  <AnnotationAssertion>
    <AnnotationProperty abbreviatedIRI="rdfs:label"/>
    <IRI>#Disease</IRI><Literal>disease</Literal>
  </AnnotationAssertion>
  <AnnotationAssertion>
    <AnnotationProperty abbreviatedIRI="rdfs:label"/>
    <IRI>#Asthma</IRI><Literal xml:lang="en">asthma</Literal>
  </AnnotationAssertion>
  <AnnotationAssertion>
    <AnnotationProperty abbreviatedIRI="oio:hasExactSynonym"/>
    <IRI>#Asthma</IRI><Literal>bronchial hyperreactivity</Literal>
  </AnnotationAssertion>
  <AnnotationAssertion>
    <AnnotationProperty abbreviatedIRI="owl:deprecated"/>
    <IRI>#Old</IRI><Literal>true</Literal>
  </AnnotationAssertion>
  <AnnotationAssertion>
    <AnnotationProperty abbreviatedIRI="rdfs:label"/>
    <IRI>#case1</IRI><Literal>case one</Literal>
  </AnnotationAssertion>
  <SubClassOf><Class IRI="#Asthma"/><Class IRI="#Disease"/></SubClassOf>
  <SubClassOf>
    <Class IRI="#Asthma"/>
    <ObjectSomeValuesFrom>
      <ObjectProperty IRI="#locatedIn"/><Class IRI="#Disease"/>
    </ObjectSomeValuesFrom>
  </SubClassOf>
  <ClassAssertion><Class IRI="#Asthma"/><NamedIndividual IRI="#case1"/></ClassAssertion>
</Ontology>""")
    rows = {r["iri"]: r for r in parse_owl(str(owlxml))}
    ex = "http://example.org/mini#"
    assert set(rows) == {ex + "Disease", ex + "Asthma", ex + "Old",
                         ex + "locatedIn"}
    a = rows[ex + "Asthma"]
    assert a["labels"] == ["asthma"]
    assert a["synonyms"] == ["bronchial hyperreactivity"]
    assert a["parents"] == {ex + "Disease": "disease"}
    assert a["restrictions"] == {ex + "locatedIn": ex + "Disease"}
    assert a["instances"] == {ex + "case1": "case one"}
    assert rows[ex + "Old"]["deprecated"] is True
    assert rows[ex + "locatedIn"]["term_type"] == "property"
    assert rows[ex + "Disease"]["children"] == {ex + "Asthma": "asthma"}


def test_owlxml_equivalence_reasoning(tmp_path):
    """EquivalentClasses in OWL/XML feeds the classifier the same way the
    other serializations do."""
    owlxml = tmp_path / "defined.owx"
    owlxml.write_text("""<?xml version="1.0"?>
<Ontology xmlns="http://www.w3.org/2002/07/owl#"
          ontologyIRI="http://example.org/d">
  <Declaration><Class IRI="#Disease"/></Declaration>
  <Declaration><Class IRI="#Lung"/></Declaration>
  <Declaration><Class IRI="#LungDisease"/></Declaration>
  <Declaration><Class IRI="#X"/></Declaration>
  <Declaration><ObjectProperty IRI="#locatedIn"/></Declaration>
  <EquivalentClasses>
    <Class IRI="#LungDisease"/>
    <ObjectIntersectionOf>
      <Class IRI="#Disease"/>
      <ObjectSomeValuesFrom>
        <ObjectProperty IRI="#locatedIn"/><Class IRI="#Lung"/>
      </ObjectSomeValuesFrom>
    </ObjectIntersectionOf>
  </EquivalentClasses>
  <SubClassOf><Class IRI="#X"/><Class IRI="#Disease"/></SubClassOf>
  <SubClassOf>
    <Class IRI="#X"/>
    <ObjectSomeValuesFrom>
      <ObjectProperty IRI="#locatedIn"/><Class IRI="#Lung"/>
    </ObjectSomeValuesFrom>
  </SubClassOf>
</Ontology>""")
    ex = "http://example.org/d#"
    asserted = {r["iri"]: r for r in parse_owl(str(owlxml))}
    # equivalent-intersection conjuncts are told parents (parse_parents rule)
    assert ex + "Disease" in asserted[ex + "LungDisease"]["parents"]
    assert ex + "LungDisease" not in asserted[ex + "X"]["parents"]
    inferred = {r["iri"]: r
                for r in parse_owl(str(owlxml), use_reasoning=True)}
    assert ex + "LungDisease" in inferred[ex + "X"]["parents"]


def test_ttl_annotated_axiom_statements(tmp_path):
    """OWLAPI/ROBOT emit one standalone '[ ... ] .' blank-node statement
    per annotated axiom, plus leading-dot decimals and comment headers —
    none of these may abort the parse (r3 review findings)."""
    ttl = tmp_path / "annotated.ttl"
    ttl.write_text("""\
# exported by robot -- comment header
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix oboInOwl: <http://www.geneontology.org/formats/oboInOwl#> .
@prefix ex: <http://example.org/ex#> .

ex:A a owl:Class ; rdfs:label "a term" ; rdfs:subClassOf ex:B ;
    ex:confidence .5 .
ex:B a owl:Class ; rdfs:label "b term" .

[ rdf:type owl:Axiom ;
  owl:annotatedSource ex:A ;
  owl:annotatedProperty rdfs:subClassOf ;
  owl:annotatedTarget ex:B ;
  oboInOwl:hasDbXref "UMLS:C0004096" ] .
""")
    rows = {r["iri"]: r for r in parse_owl(str(ttl))}
    ex = "http://example.org/ex#"
    assert set(rows) == {ex + "A", ex + "B"}
    assert rows[ex + "A"]["parents"] == {ex + "B": "b term"}


def test_owlxml_annotated_axioms_kept(tmp_path):
    """<Annotation> children inside OWL/XML axioms must not make the axiom
    miscount its operands and get dropped (r3 review finding)."""
    owlxml = tmp_path / "annotated.owx"
    owlxml.write_text("""<?xml version="1.0"?>
<Ontology xmlns="http://www.w3.org/2002/07/owl#"
          ontologyIRI="http://example.org/a">
  <Prefix name="rdfs" IRI="http://www.w3.org/2000/01/rdf-schema#"/>
  <Prefix name="oio" IRI="http://www.geneontology.org/formats/oboInOwl#"/>
  <Declaration><Class IRI="#Asthma"/></Declaration>
  <Declaration><Class IRI="#Disease"/></Declaration>
  <SubClassOf>
    <Annotation>
      <AnnotationProperty abbreviatedIRI="oio:hasDbXref"/>
      <Literal>UMLS:C0004096</Literal>
    </Annotation>
    <Class IRI="#Asthma"/><Class IRI="#Disease"/>
  </SubClassOf>
  <AnnotationAssertion>
    <Annotation>
      <AnnotationProperty abbreviatedIRI="oio:hasDbXref"/>
      <Literal>src</Literal>
    </Annotation>
    <AnnotationProperty abbreviatedIRI="rdfs:label"/>
    <IRI>#Asthma</IRI><Literal>asthma</Literal>
  </AnnotationAssertion>
</Ontology>""")
    rows = {r["iri"]: r for r in parse_owl(str(owlxml))}
    ex = "http://example.org/a#"
    assert rows[ex + "Asthma"]["parents"] == {ex + "Disease": "Disease"}
    assert rows[ex + "Asthma"]["labels"] == ["asthma"]


def test_write_ttl_escapes_control_whitespace(tmp_path):
    """Multi-line definitions serialize as escaped \\n, not raw LF (invalid
    Turtle); round-trips through our parser with the value intact."""
    from ontology_mapper_spark.sources.owl import write_ttl

    row = {
        "iri": "http://example.org/x#T", "labels": ["t"],
        "synonyms": [], "definitions": ["line one\nline two\ttabbed"],
        "parents": {}, "children": {}, "instances": {}, "restrictions": {},
        "deprecated": False, "term_type": "class",
    }
    p = str(tmp_path / "esc.ttl")
    write_ttl([row], p)
    text = open(p).read()
    # no literal spans two physical lines
    for line in text.splitlines():
        assert line.count('"') % 2 == 0, line
    back = parse_owl(p)
    assert back[0]["definitions"] == ["line one\nline two\ttabbed"]


def test_extensionless_ntriples_with_comment_header(tmp_path):
    """An extensionless NTriples dump starting with '#' comments must sniff
    as Turtle, not fall into ElementTree (r3 review finding)."""
    p = tmp_path / "dump"
    p.write_text("""\
# generated by some exporter
<http://example.org/n#A> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .
<http://example.org/n#A> <http://www.w3.org/2000/01/rdf-schema#label> "a term" .
""")
    rows = parse_owl(str(p))
    assert rows[0]["iri"] == "http://example.org/n#A"
    assert rows[0]["labels"] == ["a term"]


def test_extensionless_turtle_with_long_comment_header(tmp_path):
    """A license/comment header larger than any fixed sniff window must not
    push the file into the XML parser (r3 review finding)."""
    p = tmp_path / "licensed"
    header = "".join(f"# license line {i} " + "x" * 60 + "\n" for i in range(80))
    p.write_text(header + """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
<http://example.org/L#A> a owl:Class ; rdfs:label "licensed term" .
""")
    assert len(header) > 4096  # precondition: beyond the old 2048-byte window
    rows = parse_owl(str(p))
    assert rows[0]["labels"] == ["licensed term"]
