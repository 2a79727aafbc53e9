"""F1 normalize + char_wb n-grams: Python replica vs Spark-native columns.

Reference semantics: ``onto_utils.py:33-43`` (normalize) and sklearn
``char_wb`` as used in ``tfidf_mapper.py:36-48``.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ontology_mapper_spark.text.normalize import (
    char_wb_ngrams_col,
    char_wb_ngrams_py,
    normalize_col,
    normalize_py,
)

CASES = [
    "asthma",
    "Acute Bronchitis",
    "protein_level and the OTHER thing",
    "  multiple   spaces\tand tabs ",
    "punct,u-a;tion! (x)",
    "ICD excluded FINNGEN",  # uppercase stopwords survive (quirk)
    "the and or for",  # all stopwords -> empty
    "",
    "9q34.3 microdeletion syndrome",
    "café au lait",  # unicode word chars survive \W with (?U)
]


def test_normalize_known_values():
    assert normalize_py("Acute Bronchitis") == "acute bronchitis"
    assert normalize_py("protein_level and the OTHER thing") == "protein level thing"
    assert normalize_py("the and or for") == ""
    assert normalize_py("ICD excluded FINNGEN") == "icd finngen"


def test_char_wb_known_values():
    # word of length L yields exactly L 3-grams over " "+w+" "
    assert char_wb_ngrams_py("ab") == [" ab", "ab "]
    assert char_wb_ngrams_py("x") == [" x "]
    assert char_wb_ngrams_py("Asthma") == [" as", "ast", "sth", "thm", "hma", "ma "]
    assert char_wb_ngrams_py("a b") == [" a ", " b "]
    assert char_wb_ngrams_py("") == []


@pytest.mark.spark
def test_normalize_spark_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["s"])
    got = [
        (r["s"], r["n"])
        for r in df.withColumn("n", normalize_col(F.col("s"))).collect()
    ]
    for s, n in got:
        assert n == normalize_py(s), f"normalize mismatch for {s!r}"


@pytest.mark.spark
def test_ngrams_spark_matches_python(spark):
    inputs = [normalize_py(c) for c in CASES] + ["asthma attack", "bmi"]
    df = spark.createDataFrame([(c,) for c in inputs], ["s"])
    got = df.withColumn("g", char_wb_ngrams_col(F.col("s"))).collect()
    for r in got:
        assert list(r["g"]) == char_wb_ngrams_py(r["s"]), f"ngram mismatch {r['s']!r}"


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
@settings(max_examples=200, deadline=None)
def test_normalize_py_idempotent(s):
    n = normalize_py(s)
    assert normalize_py(n) == n
