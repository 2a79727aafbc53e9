"""F11-F13 CURIE / IRI projections (reference ``onto_utils.py:56-97``)."""

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.functions.curie import (
    curie_from_iri_col,
    iri_from_tag,
    label_from_iri_col,
)


def test_iri_from_tag():
    assert iri_from_tag("EFO:0000270") == "http://www.ebi.ac.uk/efo/EFO_0000270"
    assert iri_from_tag("HP_0002099") == "http://purl.obolibrary.org/obo/HP_0002099"
    assert (
        iri_from_tag("ORPHA:1234") == "http://www.orpha.net/ORDO/Orphanet_1234"
    )
    assert iri_from_tag("SNOMED:44054006") == "http://snomed.info/id/44054006"
    assert iri_from_tag("OMIM:600807") == (
        "http://purl.bioontology.org/ontology/OMIM/600807"
    )
    assert iri_from_tag("NA") == "NA"
    assert iri_from_tag("") == ""
    assert iri_from_tag("no match here") == "nomatchhere"  # whitespace stripped


@pytest.mark.spark
def test_curie_and_label_cols(spark):
    cases = [
        ("http://www.ebi.ac.uk/efo/EFO_0000270", "EFO:0000270", "EFO_0000270"),
        ("http://purl.obolibrary.org/obo/HP_0002099", "HP:0002099", "HP_0002099"),
        ("http://purl.obolibrary.org/obo/BFO_0000050", "BFO:0000050", "BFO_0000050"),
        ("http://www.orpha.net/ORDO/Orphanet_1234", "ORPHANET:1234", "Orphanet_1234"),
        ("http://snomed.info/id/44054006", "SNOMEDCT:44054006", "44054006"),
        ("http://www.ebi.ac.uk/efo/contains", "", "contains"),  # unresolvable -> ""
        ("http://example.org/thing#Frag", "", "Frag"),  # '#' fragment label
        ("", "", None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["iri"])
    got = df.select(
        "iri",
        curie_from_iri_col(F.col("iri")).alias("curie"),
        label_from_iri_col(F.col("iri")).alias("lbl"),
    ).collect()
    by_iri = {r["iri"]: r for r in got}
    for iri, curie, lbl in cases:
        assert by_iri[iri]["curie"] == curie, iri
        if lbl is not None:
            assert by_iri[iri]["lbl"] == lbl, iri
