"""Independent-oracle parity for the re-derived fuzzy metrics (r2 VERDICT
D1 weak flag: WRatio had no oracle other than its own derivation).

rapidfuzz is not installed in the build container, so this module is the
same pattern as the Pillow codec parity test: skipped where the library is
absent, a hard pin wherever it exists (CI with rapidfuzz, a user machine).
The deterministic known-value tests in test_metrics.py remain the
always-on floor."""

import math

import pytest

rf = pytest.importorskip("rapidfuzz")

from hypothesis import given, settings
from hypothesis import strategies as st

from ontology_mapper_spark.functions.metrics import (
    indel_similarity,
    levenshtein_similarity,
    wratio,
)

WORDS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz 0123456789", min_size=0, max_size=40
)


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_wratio_matches_rapidfuzz(a, b):
    expect = rf.fuzz.WRatio(a, b, processor=None)
    assert math.isclose(wratio(a, b), expect, abs_tol=1e-9), (a, b, expect)


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_indel_matches_rapidfuzz(a, b):
    expect = rf.distance.Indel.normalized_similarity(a, b)
    assert math.isclose(indel_similarity(a, b), expect, abs_tol=1e-12)


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_levenshtein_matches_rapidfuzz(a, b):
    expect = rf.distance.Levenshtein.normalized_similarity(a, b)
    assert math.isclose(levenshtein_similarity(a, b), expect, abs_tol=1e-12)


def test_wratio_reference_phrases():
    pairs = [
        ("asthma", "asthma attack"),
        ("acute bronchitis", "bronchitis"),
        ("type 2 diabetes mellitus", "diabetes"),
        ("this is a test", "this is a test!"),
        ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear"),
        ("x", "a much longer completely different sentence"),
    ]
    for a, b in pairs:
        assert math.isclose(
            wratio(a, b), rf.fuzz.WRatio(a, b, processor=None), abs_tol=1e-9
        ), (a, b)
