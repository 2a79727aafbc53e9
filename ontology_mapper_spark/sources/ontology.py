"""Ontology-side tables: ``onto_terms`` and ``onto_labels``.

The reference parses OWL with owlready2 into ``dict[iri -> OntologyTerm]``
(``/root/reference/text2term/term_collector.py:23-48``, ``term.py:12-146``)
and pickles it as a cache (``t2t.py:163-165``). Ontologies are a few MB —
dimension data — so in this engine the parse stays driver-side and the result
becomes two *broadcastable* DataFrames persisted as partitioned parquet
(Iceberg-ready: swap ``write.parquet`` for ``writeTo(...).using('iceberg')``
when a catalog is configured):

- ``onto_terms(iri, labels, synonyms, definitions, parents, children,
  instances, restrictions, deprecated, term_type)``
- ``onto_labels(iri, name, is_synonym, display_label, term_type, deprecated)``
  = labels ∪ synonyms exploded one row per name — the join side of every
  mapper (reference ``tfidf_mapper.py:79-95``).

Display label: the reference uses ``next(iter(labels))`` — set-iteration
order, nondeterministic (``term.py:110-116``). We pin ``labels[0]``.

No live OWL download here (no network): ontologies enter either via the
deterministic fixture below (shaped like the reference's EFO test slice) or
via ``onto_terms_from_rows`` fed by any external parser.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapper_spark.config import OntologyTermType

ONTO_TERMS_SCHEMA = T.StructType(
    [
        T.StructField("iri", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("synonyms", T.ArrayType(T.StringType()), False),
        T.StructField("definitions", T.ArrayType(T.StringType()), False),
        T.StructField("parents", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("children", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("instances", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField(
            "restrictions", T.MapType(T.StringType(), T.StringType()), False
        ),
        T.StructField("deprecated", T.BooleanType(), False),
        T.StructField("term_type", T.StringType(), False),
    ]
)

EFO = "http://www.ebi.ac.uk/efo/"
OBO = "http://purl.obolibrary.org/obo/"


def _t(
    iri,
    labels,
    synonyms=(),
    parents=None,
    deprecated=False,
    term_type=OntologyTermType.CLASS,
    definitions=(),
    instances=None,
    restrictions=None,
):
    return {
        "iri": iri,
        "labels": list(labels),
        "synonyms": list(synonyms),
        "definitions": list(definitions),
        "parents": dict(parents or {}),
        "children": {},
        "instances": dict(instances or {}),
        "restrictions": dict(restrictions or {}),
        "deprecated": deprecated,
        "term_type": term_type,
    }


def fixture_ontology_rows() -> list[dict]:
    """Deterministic EFO/HP-shaped mini-ontology (FIXTURES.md §2).

    Covers the reference test vocabulary (asthma, acute bronchitis, colon
    disease, food allergy, protein level, contains, location — cf.
    ``/root/reference/test/simple_tests.py:37-120`` and
    ``test/unstruct_terms.txt``), two IRI namespaces for base_iris filters,
    deprecated terms, properties, a parent diamond, and multi-synonym terms.
    ``children`` maps are derived from ``parents`` in ``onto_terms_from_rows``.
    """
    E, H = EFO + "EFO_", OBO + "HP_"
    rows = [
        _t(E + "0000001", ["experimental factor"], ["ExperimentalFactor"]),
        _t(E + "0000408", ["disease"], ["disorder", "medical condition"],
           parents={E + "0000001": "experimental factor"},
           definitions=["A disposition to undergo pathological processes."]),
        _t(E + "0009531", ["respiratory system disease"],
           ["respiratory disease", "disease of respiratory system"],
           parents={E + "0000408": "disease"}),
        _t(E + "0000270", ["asthma"],
           ["bronchial hyperreactivity", "chronic obstructive asthma"],
           parents={E + "0009531": "respiratory system disease"},
           definitions=["A bronchial disease with chronic inflammation."]),
        _t(E + "0009459", ["asthma attack"], ["acute asthma exacerbation"],
           parents={E + "0000270": "asthma"}),
        _t(E + "0009463", ["acute bronchitis"], ["acute infective bronchitis"],
           parents={E + "0009531": "respiratory system disease"}),
        _t(E + "0009464", ["bronchitis"], [],
           parents={E + "0009531": "respiratory system disease"}),
        _t(E + "0000405", ["digestive system disease"],
           ["gastrointestinal disease"], parents={E + "0000408": "disease"}),
        _t(E + "1001950", ["colon disease"], ["disease of colon", "colonic disease"],
           parents={E + "0000405": "digestive system disease"}),
        _t(E + "0000540", ["immune system disease"], [],
           parents={E + "0000408": "disease"}),
        # diamond: allergy under immune AND digestive paths to disease
        _t(E + "0003785", ["allergy"], ["allergic disease", "hypersensitivity"],
           parents={E + "0000540": "immune system disease"}),
        _t(E + "0003945", ["food allergy"], ["allergy to food"],
           parents={E + "0003785": "allergy",
                    E + "0000405": "digestive system disease"}),
        _t(E + "0001444", ["measurement"], ["measurement value"],
           parents={E + "0000001": "experimental factor"}),
        _t(E + "0004747", ["protein measurement"], ["protein level", "protein amount"],
           parents={E + "0001444": "measurement"}),
        _t(E + "0004340", ["body mass index"], ["BMI"],
           parents={E + "0001444": "measurement"}),
        _t(E + "0005135", ["strain"], [],
           parents={E + "0000001": "experimental factor"},
           instances={E + "0005136": "C57BL/6", E + "0005137": "BALB/c"}),
        # deprecated EFO terms
        _t(E + "0005950", ["obsolete asthma phenotype"], ["asthma phenotype"],
           parents={E + "0000270": "asthma"}, deprecated=True),
        _t(E + "0005951", ["obsolete bronchitis variant"], [],
           parents={E + "0009464": "bronchitis"}, deprecated=True),
        # EFO properties (plain-fragment IRIs, like EFO's own annotation props)
        _t(EFO + "contains", ["contains"], [], term_type=OntologyTermType.PROPERTY),
        _t(EFO + "location", ["location"], ["locus"],
           term_type=OntologyTermType.PROPERTY),
        _t(EFO + "disease_location", ["disease location"], ["site of disease"],
           parents={EFO + "location": "location"},
           term_type=OntologyTermType.PROPERTY),
        _t(EFO + "has_quality", ["has quality"], [],
           term_type=OntologyTermType.PROPERTY),
        _t(OBO + "BFO_0000050", ["part of"], [],
           term_type=OntologyTermType.PROPERTY),
        # HP namespace (second base IRI)
        _t(H + "0000001", ["All"], []),
        _t(H + "0000118", ["Phenotypic abnormality"], [],
           parents={H + "0000001": "All"}),
        _t(H + "0002086", ["Abnormality of the respiratory system"],
           ["Respiratory abnormality"], parents={H + "0000118": "Phenotypic abnormality"}),
        _t(H + "0002099", ["Asthma"], ["Bronchial asthma"],
           parents={H + "0002086": "Abnormality of the respiratory system"}),
        _t(H + "0012393", ["Allergy"], ["Allergic reaction"],
           parents={H + "0000118": "Phenotypic abnormality"}),
        _t(H + "0002583", ["Colitis"], ["Colon inflammation"],
           parents={H + "0000118": "Phenotypic abnormality"}),
        _t(H + "0100279", ["Ulcerative colitis"], [],
           parents={H + "0002583": "Colitis"}, deprecated=True),
        _t(H + "0031797", ["clinical course"], [],
           term_type=OntologyTermType.PROPERTY),
    ]
    return rows


def fixture_ontology_rows_v2() -> list[dict]:
    """Deterministic "next release" of the fixture ontology — the
    ontology-delta counterpart of ``sources.pages.recrawl_rows``: one
    rule, shared by the incremental-ontology tests, the
    ``incremental_kg_onto`` gate query, and its DuckDB full-rebuild
    oracle. One edit per delta class the affected-mention analysis in
    ``pipeline.incremental_kg_ontology`` must handle — each targeting a
    string the deterministic page corpus ACTUALLY mentions (the
    ``_paragraphs`` rotation ``(i*7+3j) % 14`` reaches vocab indices
    {0,2,3,6,7,9,10,13} only):

    - term REMOVED: EFO_1001950 "colon disease" — the winning entity for
      the "colon disease" mentions; its triples must vanish and the
      mentions re-link to whatever survives (promotion after removal);
    - synonym REMOVED: "protein level" off EFO_0004747 — the exact name
      that carries the "protein level" mentions; synonym-granularity
      removal must re-score them through the remaining names;
    - term ADDED: EFO_0010001 "carbon monoxide" — a guaranteed-unmapped
      vocab mention becomes mappable (the unmapped→mapped transition a
      reused-triples-only scheme would miss);
    - label CHANGED: HP_0012393 "Allergy" → "Allergy NOS" — changed text
      is one removed + one added label row AND a display_label change on
      the term's synonym row; the "allergy" mentions keep matching the
      EFO allergy term, so this exercises a changed SECOND candidate;
    - synonym ADDED: "asthma disorder" on EFO_0000270 — flags the
      "asthma" mentions (scores above min_score) without displacing
      their exact-match winner: the sound over-flag-and-remap-to-same
      path."""
    E, H = EFO + "EFO_", OBO + "HP_"
    out = []
    for r in fixture_ontology_rows():
        iri = r["iri"]
        if iri == E + "1001950":
            continue
        r = dict(r)
        if iri == E + "0004747":
            r["synonyms"] = [s for s in r["synonyms"] if s != "protein level"]
        elif iri == H + "0012393":
            r["labels"] = ["Allergy NOS"]
        elif iri == E + "0000270":
            r["synonyms"] = list(r["synonyms"]) + ["asthma disorder"]
        out.append(r)
    out.append(_t(E + "0010001", ["carbon monoxide"], ["CO gas"]))
    return out


_SYNTH_VOCAB = [
    "asthma", "bronchitis", "allergy", "disease", "syndrome", "disorder",
    "measurement", "protein", "level", "acute", "chronic", "respiratory",
    "digestive", "immune", "colon", "lung", "food", "attack", "location",
    "phenotype", "carcinoma", "infection", "inflammation", "deficiency",
    "cardiac", "renal", "hepatic", "neural", "vascular", "metabolic",
]


def synthesize_ontology_rows(n_terms: int) -> list[dict]:
    """Deterministic large ontology for benchmarking: EFO-shaped scale
    (labels+synonyms per term, shallow IS_A chain). ~1.5 names/term like
    real EFO; label text drawn from a medical-ish vocabulary so n-gram
    postings have realistic skew."""
    v = len(_SYNTH_VOCAB)
    rows = []
    for k in range(n_terms):
        w1 = _SYNTH_VOCAB[k % v]
        w2 = _SYNTH_VOCAB[(k // v + k) % v]
        label = f"{w1} {w2} type {k % 977}"
        synonyms = [f"{w2} {w1} variant {k % 977}"] if k % 2 == 0 else []
        parent = {}
        if k >= v:
            p = k % (k // 2 + 1)
            parent = {f"{EFO}EFO_B{p:07d}": f"synthetic parent {p}"}
        rows.append(
            _t(f"{EFO}EFO_B{k:07d}", [label], synonyms, parents=parent,
               deprecated=(k % 53 == 0))
        )
    return rows


def onto_terms_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Builds ``onto_terms`` with ``children`` derived as the inverse of
    ``parents`` (the reference collects both directions,
    ``term_collector.py:93-158``)."""
    by_iri = {r["iri"]: r for r in rows}
    children: dict[str, dict[str, str]] = {}
    for r in rows:
        for p_iri in r["parents"]:
            children.setdefault(p_iri, {})[r["iri"]] = r["labels"][0]
    out = []
    for r in rows:
        r = dict(r)
        r["children"] = children.get(r["iri"], {})
        # parser-internal field (equivalence definitions for the optional
        # classifier) — not part of the onto_terms relation
        r.pop("equiv", None)
        out.append(r)
    assert len(by_iri) == len(rows), "duplicate IRIs in ontology rows"
    return spark.createDataFrame(out, schema=ONTO_TERMS_SCHEMA)


def fixture_onto_terms(spark: SparkSession) -> DataFrame:
    return onto_terms_from_rows(spark, fixture_ontology_rows())


def filter_terms_df(
    terms: DataFrame,
    base_iris: tuple = (),
    excl_deprecated: bool = False,
    term_type: str = OntologyTermType.CLASS,
) -> DataFrame:
    """Filters F6-F8 (reference ``term_collector.py:379-406``). Applied at
    scan time so Catalyst pushes them into the parquet read."""
    if base_iris:
        cond = reduce(
            lambda a, b: a | b,
            [F.col("iri").startswith(p) for p in base_iris],
        )
        terms = terms.filter(cond)
    if excl_deprecated:
        terms = terms.filter(~F.col("deprecated"))
    if term_type != OntologyTermType.ANY:
        if term_type not in OntologyTermType.ALL:
            raise ValueError(f"Invalid term type: {term_type}")
        terms = terms.filter(F.col("term_type") == term_type)
    return terms


def onto_labels_df(terms: DataFrame) -> DataFrame:
    """Explode labels ∪ synonyms to one row per name (reference
    ``tfidf_mapper.py:79-95``; its non-str guard is free here — the schema
    is array<string>). Null-name rows are dropped like the reference skips
    non-strings."""
    lbl = terms.select(
        "iri",
        F.explode("labels").alias("name"),
        F.lit(False).alias("is_synonym"),
        F.col("labels")[0].alias("display_label"),
        "term_type",
        "deprecated",
    )
    syn = terms.select(
        "iri",
        F.explode("synonyms").alias("name"),
        F.lit(True).alias("is_synonym"),
        F.col("labels")[0].alias("display_label"),
        "term_type",
        "deprecated",
    )
    return lbl.unionByName(syn).filter(F.col("name").isNotNull())


def write_ontology_cache(terms: DataFrame, path: str) -> None:
    """S6 — replaces the reference's pickle cache (``t2t.py:163-165``) with a
    columnar table; cached-vs-fresh equivalence is pinned by tests (the
    reference asserts the same at ``test/simple_tests.py:70-75``)."""
    terms.write.mode("overwrite").parquet(path)


def read_ontology_cache(
    spark: SparkSession,
    path: str,
    base_iris: tuple = (),
    excl_deprecated: bool = False,
    term_type: str = OntologyTermType.CLASS,
) -> DataFrame:
    """S7 — cache read + lazy filters (reference ``t2t.py:182-188``)."""
    return filter_terms_df(
        spark.read.parquet(path), base_iris, excl_deprecated, term_type
    )
