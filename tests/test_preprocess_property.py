"""Property-based pin of preprocess semantics vs a literal replica of the
reference loop (``/root/reference/text2term/preprocess.py:61-96,101-111``):
blocklist first, then first template whose capture-join is non-empty wins,
implicit final ``(.*)``, empty extraction drops the row."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ontology_mapper_spark.sources.terms import (
    mentions_from_list,
    preprocess_mentions,
)

TEMPLATES = [
    r"Age when diagnosed with (.*)",
    r"History of (.*)",
    r"(\w+) attack in (\d+)",
    r"prefix-(.*)",
    r"nocapture-.*",  # matches but captures nothing -> falls through
]
BLOCKLIST = [r"DELETED.*", r"\d+"]


def reference_loop(terms, templates, blocklist, blocklist_char=""):
    """Literal re-derivation of the reference's preprocess_terms control
    flow (dict keyed by ORIGINAL term, like the reference)."""
    tmpl = [re.compile(t) for t in templates] + [re.compile("(.*)")]
    block = [re.compile(b) for b in blocklist]
    processed = {}
    for term in terms:
        blocked = False
        for banned in block:
            if banned.fullmatch(term):
                blocked = True
                break
        if blocked:
            if blocklist_char:
                processed[term] = blocklist_char
            continue
        for t in tmpl:
            m = t.fullmatch(term)
            if m:
                combined = " ".join(map(str, m.groups()))
                if combined:
                    processed[term] = combined
                    break
    return processed


term_strategy = st.lists(
    st.one_of(
        st.text(
            alphabet="abcdefgh 0123456789-", min_size=0, max_size=30
        ),
        st.sampled_from(
            [
                "Age when diagnosed with asthma",
                "History of colon disease",
                "asthma attack in 2001",
                "prefix-", "prefix-x", "nocapture-zzz",
                "DELETED thing", "12345", "",
            ]
        ),
    ),
    min_size=1,
    max_size=12,
    unique=True,
)


@pytest.mark.spark
@pytest.mark.slow
@given(terms=term_strategy)
@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_preprocess_matches_reference_loop(spark, terms):
    m = mentions_from_list(spark, terms)
    out = preprocess_mentions(m, templates=TEMPLATES, blocklist=BLOCKLIST)
    got = {r["original_term"]: r["source_term"] for r in out.collect()}
    assert got == reference_loop(terms, TEMPLATES, BLOCKLIST)


@pytest.mark.spark
@given(terms=term_strategy)
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_preprocess_blocklist_char_matches(spark, terms):
    m = mentions_from_list(spark, terms)
    out = preprocess_mentions(
        m, templates=TEMPLATES, blocklist=BLOCKLIST, blocklist_char="-"
    )
    got = {r["original_term"]: r["source_term"] for r in out.collect()}
    assert got == reference_loop(terms, TEMPLATES, BLOCKLIST, "-")
