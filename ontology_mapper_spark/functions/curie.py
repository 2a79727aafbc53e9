"""CURIE / IRI projections (SURVEY.md §2 F11-F13).

The reference calls bioregistry at runtime (``onto_utils.py:56-62``);
bioregistry is a network-updated registry, so this engine snapshots the
prefix map as a literal table (derived from the reference's own static
``ONTOLOGY_IRIS``, ``onto_utils.py:163-184``, plus the OBO PURL convention)
and evaluates the projection as a native when/regexp chain — JVM-side,
no UDF. Unknown IRIs yield "" exactly like the reference's failure path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OBO_BASE_IRI = "http://purl.obolibrary.org/obo/"
BIOPORTAL_BASE_IRI = "http://purl.bioontology.org/ontology/"
ORPHANET_IRI = "http://www.orpha.net/ORDO/"
EBI_EFO = "http://www.ebi.ac.uk/efo/"
SNOMED_IRI = "http://snomed.info/id/"

# Reference onto_utils.py:163-184 (tag -> base IRI); used by iri_from_tag.
ONTOLOGY_IRIS = {
    "EFO": EBI_EFO,
    "Orphanet": ORPHANET_IRI,
    "ORPHA": ORPHANET_IRI,
    **{
        p: OBO_BASE_IRI
        for p in (
            "CL", "MONDO", "HP", "UBERON", "GO", "DOID", "CHEBI", "OMIT",
            "NCIT", "MAXO", "DRON", "OAE", "CIDO", "PATO",
        )
    },
    "OMIM": BIOPORTAL_BASE_IRI + "OMIM/",
    "SNOMED": SNOMED_IRI,
}


_OBO_RE = r"^https?://purl\.obolibrary\.org/obo/([A-Za-z][A-Za-z0-9]*)_([A-Za-z0-9.]+)$"
_IDORG_RE = r"^https?://identifiers\.org/([A-Za-z][A-Za-z0-9._]*)[:/]([A-Za-z0-9._-]+)$"
_LOCAL_ID_RE = r"^[A-Za-z0-9._-]+$"


def curie_from_iri_col(iri: Column) -> Column:
    """bioregistry-shaped CURIE, uppercased; "" when unresolvable
    (reference ``onto_utils.py:56-62``, ``term_mapping.py:39-42``).

    Table-driven from ``registry_snapshot``: two *generic* rules cover the
    pattern-shaped registries (every OBO Foundry PURL — several hundred
    prefixes — and identifiers.org), then ``PREFIX_SNAPSHOT`` enumerates
    opaque namespaces (BioPortal PURLs, SNOMED, MeSH, UMLS, Wikidata, ...)
    longest-prefix-first. All native when/regexp expressions — no UDF, one
    codegen'd projection."""
    from ontology_mapper_spark.functions.registry_snapshot import PREFIX_SNAPSHOT

    obo_curie = F.concat_ws(
        ":",
        F.regexp_extract(iri, _OBO_RE, 1),
        F.regexp_extract(iri, _OBO_RE, 2),
    )
    expr = F.when(iri.isNull() | (iri == ""), F.lit(""))
    expr = expr.when(
        F.regexp_extract(iri, _OBO_RE, 0) != "", F.upper(obo_curie)
    )
    for iri_prefix, curie_prefix in sorted(
        PREFIX_SNAPSHOT, key=lambda r: len(r[0]), reverse=True
    ):
        local = F.substring(iri, len(iri_prefix) + 1, 2048)
        expr = expr.when(
            iri.startswith(iri_prefix) & local.rlike(_LOCAL_ID_RE),
            F.upper(F.concat(F.lit(curie_prefix + ":"), local)),
        )
    # generic identifiers.org fallback (after the specific snapshot rows)
    expr = expr.when(
        F.regexp_extract(iri, _IDORG_RE, 0) != "",
        F.upper(
            F.concat_ws(
                ":",
                F.regexp_extract(iri, _IDORG_RE, 1),
                F.regexp_extract(iri, _IDORG_RE, 2),
            )
        ),
    )
    return expr.otherwise(F.lit(""))


def label_from_iri_col(iri: Column) -> Column:
    """Fragment after '#', else after the last '/'
    (reference ``onto_utils.py:65-69``)."""
    return F.when(
        iri.contains("#"), F.element_at(F.split(iri, "#"), 2)
    ).otherwise(F.element_at(F.split(iri, "/"), -1))


def iri_from_tag(source_tag: str) -> str:
    """CURIE-ish tag -> full IRI (reference ``onto_utils.py:72-97``);
    driver-side scalar (used for config values, not data)."""
    iri = source_tag
    if len(source_tag) > 0 and source_tag != "NA":
        iri = iri.replace(" ", "")
        if ":" in source_tag:
            onto_name = iri.split(":")[0]
            term_name = iri.replace(":", "_")
            full_iri = _get_iri(onto_name, term_name)
            iri = full_iri if len(full_iri) > 0 else iri
        elif "_" in source_tag:
            onto_name = iri.split("_")[0]
            full_iri = _get_iri(onto_name, iri)
            iri = full_iri if len(full_iri) > 0 else iri
    return iri


def _get_iri(ont_name: str, term_name: str) -> str:
    if ont_name not in ONTOLOGY_IRIS:
        return ""
    if ont_name == "ORPHA":
        return ONTOLOGY_IRIS[ont_name] + term_name.replace("ORPHA_", "Orphanet_")
    if ont_name in ("SNOMED", "OMIM"):
        return ONTOLOGY_IRIS[ont_name] + term_name.replace(ont_name + "_", "")
    return ONTOLOGY_IRIS[ont_name] + term_name
