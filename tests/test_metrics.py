"""D1/D2 metric semantics (rapidfuzz/nltk-pinned, see functions/metrics.py)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ontology_mapper_spark.functions.metrics import (
    fuzzy_similarity,
    indel_similarity,
    jaccard_char_similarity,
    jaro_similarity,
    jarowinkler_similarity,
    levenshtein_similarity,
    wratio,
)

short_text = st.text(alphabet="abc xyz", max_size=12)


def test_levenshtein_known():
    assert math.isclose(levenshtein_similarity("kitten", "sitting"), 1 - 3 / 7)
    assert levenshtein_similarity("asthma", "asthma") == 1.0
    assert levenshtein_similarity("", "abc") == 0.0
    assert levenshtein_similarity("", "") == 1.0


def test_jaro_known():
    assert math.isclose(jaro_similarity("MARTHA", "MARHTA"), 0.9444444444, rel_tol=1e-9)
    assert math.isclose(jaro_similarity("DWAYNE", "DUANE"), 0.8222222222, rel_tol=1e-9)
    assert jaro_similarity("abc", "xyz") == 0.0
    assert jaro_similarity("same", "same") == 1.0
    # the reference's jarowinkler is plain jaro (syntactic_mapper.py:93-99)
    assert jarowinkler_similarity("MARTHA", "MARHTA") == jaro_similarity(
        "MARTHA", "MARHTA"
    )


def test_indel_known():
    # LCS(kitten, sitting)=4 -> dist = 6+7-8 = 5 -> 1 - 5/13
    assert math.isclose(indel_similarity("kitten", "sitting"), 1 - 5 / 13)
    assert indel_similarity("", "") == 1.0
    assert indel_similarity("a", "") == 0.0


def test_jaccard_known():
    # chars {a,s,t,h,m} vs {a,s,t,h,m} -> 1
    assert jaccard_char_similarity("asthma", "asthma") == 1.0
    a, b = set("abc"), set("bcd")
    assert math.isclose(jaccard_char_similarity("abc", "bcd"), len(a & b) / len(a | b))
    assert jaccard_char_similarity("", "") == 1.0  # documented nltk divergence


def test_wratio_known():
    assert wratio("asthma", "asthma") == 100.0
    assert math.isclose(
        wratio("this is a test", "this is a test!"), (1 - 1 / 29) * 100, rel_tol=1e-9
    )
    assert wratio("", "x") == 0.0
    assert 0.0 <= fuzzy_similarity("fuzzy wuzzy", "wuzzy fuzzy") <= 1.0
    # token_sort path: identical token multisets score 100*0.95
    assert math.isclose(wratio("fuzzy wuzzy", "wuzzy fuzzy"), 95.0)


@given(short_text, short_text)
@settings(max_examples=300, deadline=None)
def test_metric_properties(s1, s2):
    for f in (
        levenshtein_similarity,
        jaro_similarity,
        indel_similarity,
        jaccard_char_similarity,
        fuzzy_similarity,
    ):
        v = f(s1, s2)
        assert 0.0 <= v <= 1.0
        assert math.isclose(v, f(s2, s1), abs_tol=1e-12), (f.__name__, s1, s2)
        if s1 == s2 and s1:
            assert math.isclose(f(s1, s2), 1.0)
