"""Offline registry snapshot for CURIE resolution (SURVEY.md §2 F11).

The reference resolves IRIs to CURIEs through the live ``bioregistry``
package at call time (``/root/reference/text2term/onto_utils.py:56-62``).
bioregistry is a network-updated registry; this engine instead snapshots
the prefix conventions as a data table generated at build time, so CURIE
projection is a deterministic, native (JVM-side) expression with no
runtime dependency. The snapshot below is derived from public registry
conventions — the OBO Foundry PURL scheme, BioPortal ontology PURLs,
identifiers.org, and the registries the reference's own static
``ONTOLOGY_IRIS`` map names (``onto_utils.py:163-184``).

Two rule classes:

- ``GENERIC_RULES``: pattern-shaped namespaces where the CURIE prefix is
  embedded in the IRI itself (OBO PURLs ``.../obo/<PREFIX>_<id>``,
  identifiers.org ``/<prefix>/<id>``). These cover every OBO Foundry
  ontology — several hundred prefixes — without enumeration.
- ``PREFIX_SNAPSHOT``: flat (iri_prefix -> curie_prefix) rows for
  registries with opaque namespaces. Longest-prefix-first at build time.

To refresh: regenerate the rows from a bioregistry dump
(``bioregistry.read_registry()`` -> uri_prefix/preferred_prefix) and paste;
the consuming expression builder (``curie.py``) is table-driven.
"""

from __future__ import annotations

# (iri_prefix, curie_prefix). Local ids are validated as bare tokens
# ([A-Za-z0-9._-]+) by the expression builder; unresolvable IRIs -> "".
PREFIX_SNAPSHOT: list[tuple[str, str]] = [
    # EBI-hosted
    ("http://www.ebi.ac.uk/efo/EFO_", "EFO"),
    ("http://www.ebi.ac.uk/cmpo/CMPO_", "CMPO"),
    ("https://www.ebi.ac.uk/ols/ontologies/efo/terms?iri=EFO_", "EFO"),
    # Orphanet (ORDO)
    ("http://www.orpha.net/ORDO/Orphanet_", "ORPHANET"),
    # SNOMED CT
    ("http://snomed.info/id/", "SNOMEDCT"),
    ("http://purl.bioontology.org/ontology/SNOMEDCT/", "SNOMEDCT"),
    # BioPortal PURLs (opaque per-ontology namespaces)
    ("http://purl.bioontology.org/ontology/OMIM/", "OMIM"),
    ("http://purl.bioontology.org/ontology/ICD10CM/", "ICD10CM"),
    ("http://purl.bioontology.org/ontology/ICD10/", "ICD10"),
    ("http://purl.bioontology.org/ontology/ICD9CM/", "ICD9CM"),
    ("http://purl.bioontology.org/ontology/LNC/", "LOINC"),
    ("http://purl.bioontology.org/ontology/RXNORM/", "RXNORM"),
    ("http://purl.bioontology.org/ontology/MEDDRA/", "MEDDRA"),
    ("http://purl.bioontology.org/ontology/MESH/", "MESH"),
    ("http://purl.bioontology.org/ontology/NCIT/", "NCIT"),
    ("http://purl.bioontology.org/ontology/HGNC/", "HGNC"),
    ("http://purl.bioontology.org/ontology/NDFRT/", "NDFRT"),
    ("http://purl.bioontology.org/ontology/MEDLINEPLUS/", "MEDLINEPLUS"),
    ("http://purl.bioontology.org/ontology/CPT/", "CPT"),
    # NLM / NCBI
    ("http://id.nlm.nih.gov/mesh/", "MESH"),
    ("https://www.ncbi.nlm.nih.gov/gene/", "NCBIGENE"),
    ("https://www.ncbi.nlm.nih.gov/clinvar/variation/", "CLINVAR"),
    # UniProt / ChEMBL / Reactome
    ("http://purl.uniprot.org/uniprot/", "UNIPROT"),
    ("https://www.ebi.ac.uk/chembl/compound_report_card/", "CHEMBL.COMPOUND"),
    ("https://reactome.org/content/detail/", "REACTOME"),
    # UMLS
    ("http://linkedlifedata.com/resource/umls/id/", "UMLS"),
    ("https://uts.nlm.nih.gov/uts/umls/concept/", "UMLS"),
    # HGNC / Ensembl
    ("http://identifiers.org/hgnc/HGNC:", "HGNC"),
    ("http://identifiers.org/ensembl/", "ENSEMBL"),
    # Wikidata / schema.org-adjacent registries
    ("http://www.wikidata.org/entity/", "WIKIDATA"),
    ("https://www.wikidata.org/wiki/", "WIKIDATA"),
    # EDAM (local ids look like topic_0003 / data_0006)
    ("http://edamontology.org/", "EDAM"),
    # Experimental Factor Ontology GWAS-adjacent
    ("http://www.ebi.ac.uk/gwas/", "GWASCENTRAL"),
    # round-3 widening (r2 VERDICT missing #3) — more public conventions:
    # NCI Thesaurus native namespace (the same one the OWL parser reads
    # P90 synonyms from)
    ("http://ncicb.nci.nih.gov/xml/owl/EVS/Thesaurus.owl#", "NCIT"),
    # OMIM's own site + BioPortal US-edition SNOMED
    ("https://omim.org/entry/", "OMIM"),
    ("https://www.omim.org/entry/", "OMIM"),
    ("http://purl.bioontology.org/ontology/SNOMEDCT_US/", "SNOMEDCT"),
    # more BioPortal opaque namespaces
    ("http://purl.bioontology.org/ontology/ATC/", "ATC"),
    ("http://purl.bioontology.org/ontology/ICD11/", "ICD11"),
    ("http://purl.bioontology.org/ontology/ICPC2P/", "ICPC2P"),
    ("http://purl.bioontology.org/ontology/PDQ/", "PDQ"),
    ("http://purl.bioontology.org/ontology/VANDF/", "VANDF"),
    # LOINC's own site, dbSNP, PubMed, NCBI taxonomy browser
    ("https://loinc.org/", "LOINC"),
    ("https://www.ncbi.nlm.nih.gov/snp/", "DBSNP"),
    ("https://pubmed.ncbi.nlm.nih.gov/", "PUBMED"),
    ("https://www.ncbi.nlm.nih.gov/Taxonomy/Browser/wwwtax.cgi?id=",
     "NCBITAXON"),
    # https variants of namespaces above
    ("https://www.orpha.net/ORDO/Orphanet_", "ORPHANET"),
    ("https://snomed.info/id/", "SNOMEDCT"),
    ("https://www.wikidata.org/entity/", "WIKIDATA"),
    # round-5 refresh (r4 VERDICT directive #8): the xref namespaces the
    # reference's own test-suite ontologies (resources/ontologies.csv —
    # CL, EFO, FOODON, GO, HPO, MONDO, NCIT, UBERON) actually carry,
    # per the public bioregistry conventions for each registry
    ("http://purl.org/sig/ont/fma/fma", "FMA"),  # CL/UBERON anatomy xrefs
    ("http://www.informatics.jax.org/marker/MGI:", "MGI"),
    ("https://www.informatics.jax.org/marker/MGI:", "MGI"),
    ("https://zfin.org/", "ZFIN"),  # ids ZDB-...; page paths contain '/'
    # and fail the bare-token rule, so this stays id-only
    ("http://flybase.org/reports/", "FLYBASE"),
    ("https://go.drugbank.com/drugs/", "DRUGBANK"),
    ("https://www.drugbank.ca/drugs/", "DRUGBANK"),
    ("https://www.kegg.jp/entry/", "KEGG"),
    ("https://www.rhea-db.org/rhea/", "RHEA"),  # GO/ChEBI reaction xrefs
    ("https://enzyme.expasy.org/EC/", "EC"),  # GO enzyme xrefs
    ("http://aims.fao.org/aos/agrovoc/", "AGROVOC"),  # FOODON xrefs
    ("https://www.ncbi.nlm.nih.gov/medgen/", "MEDGEN"),  # MONDO xrefs
    ("https://pubchem.ncbi.nlm.nih.gov/compound/", "PUBCHEM.COMPOUND"),
    ("http://www.ncbi.nlm.nih.gov/gene/", "NCBIGENE"),  # http variant
    ("https://purl.uniprot.org/uniprot/", "UNIPROT"),
    ("http://www.uniprot.org/uniprot/", "UNIPROT"),
    ("https://commonchemistry.cas.org/detail?cas_rn=", "CAS"),
    # AmiGO term pages embed a ready-made CURIE after the last slash;
    # kept out (local id contains ':', fails the bare-token rule) —
    # GO PURLs are covered by the generic OBO rule. Same bare-token
    # exclusion applies to DOIs (local part contains '/') and genenames
    # query URLs (hgnc_id=HGNC:5 — ':' in the id); both documented
    # unmappable, matching the reference's "" failure path.
    # Dublin-core-ish misc kept out on purpose: no CURIE convention.
]

# namespaces whose local part embeds the prefix; handled by regex rules in
# curie.py (kept here as documentation of the generic rule inputs)
OBO_PURL = "http://purl.obolibrary.org/obo/"
IDENTIFIERS_ORG = ("http://identifiers.org/", "https://identifiers.org/")
