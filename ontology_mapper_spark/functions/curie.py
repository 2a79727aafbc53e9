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


def curie_from_iri_col(iri: Column) -> Column:
    """bioregistry-shaped CURIE, uppercased; "" when unresolvable
    (reference ``onto_utils.py:56-62``, ``term_mapping.py:39-42``)."""
    obo = F.regexp_extract(iri, r"^http://purl\.obolibrary\.org/obo/([A-Za-z]+)_([A-Za-z0-9.]+)$", 0)
    obo_curie = F.concat_ws(
        ":",
        F.upper(F.regexp_extract(iri, r"^http://purl\.obolibrary\.org/obo/([A-Za-z]+)_([A-Za-z0-9.]+)$", 1)),
        F.regexp_extract(iri, r"^http://purl\.obolibrary\.org/obo/([A-Za-z]+)_([A-Za-z0-9.]+)$", 2),
    )
    efo = F.regexp_extract(iri, r"^http://www\.ebi\.ac\.uk/efo/EFO_([A-Za-z0-9.]+)$", 1)
    orpha = F.regexp_extract(iri, r"^http://www\.orpha\.net/ORDO/Orphanet_([0-9]+)$", 1)
    omim = F.regexp_extract(iri, r"^http://purl\.bioontology\.org/ontology/OMIM/([A-Za-z0-9.]+)$", 1)
    snomed = F.regexp_extract(iri, r"^http://snomed\.info/id/([0-9]+)$", 1)
    return (
        F.when(iri.isNull() | (iri == ""), F.lit(""))
        .when(obo != "", F.upper(obo_curie))
        .when(efo != "", F.concat(F.lit("EFO:"), F.upper(efo)))
        .when(orpha != "", F.concat(F.lit("ORPHANET:"), orpha))
        .when(omim != "", F.concat(F.lit("OMIM:"), F.upper(omim)))
        .when(snomed != "", F.concat(F.lit("SNOMEDCT:"), snomed))
        .otherwise(F.lit(""))
    )


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
