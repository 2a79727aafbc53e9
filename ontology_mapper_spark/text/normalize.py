"""String normalization + char_wb n-gram analysis.

Pins the exact semantics of:
- ``normalize`` (reference ``onto_utils.py:33-43``): gensim
  ``strip_non_alphanum`` (``\\W`` -> space, unicode-aware) -> ``lower()`` ->
  ``_`` -> space -> drop STOP_WORDS tokens -> collapse whitespace. Quirk kept:
  uppercase stopwords (``ICD``, ``FINNGEN``) can never match post-lower.
- sklearn's ``char_wb`` analyzer with ``ngram_range=(n, n)`` as used by the
  reference TF-IDF mapper (``tfidf_mapper.py:36-48``): lowercase, split on
  whitespace, pad each word with single spaces, emit all length-n windows
  (a word of length L yields exactly L n-grams for n=3).

Each function exists twice with identical semantics: a pure-Python version
(shared by the numpy oracle and by pandas-UDF kernels) and a Spark-native
Column version (whole-stage-codegen'd, no Python in the hot path).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference onto_utils.py:11-16 (verbatim set, including the uppercase
# entries that are dead post-lowercasing).
STOP_WORDS = {
    "in", "the", "any", "all", "for", "and", "or", "dx", "on", "fh", "tx",
    "only", "qnorm", "w", "iqb", "s", "ds", "rd", "rdgwas", "ICD", "excluded",
    "excluding", "unspecified", "certain", "also", "undefined", "ordinary",
    "least", "squares", "FINNGEN", "elsewhere", "more", "classified",
    "classifeid", "unspcified", "unspesified", "specified", "acquired",
    "combined", "unspeficied", "by", "strict", "wide", "definition",
    "definitions", "confirmed", "chapter", "chapters", "controls",
    "characterized", "main", "diagnosis", "hospital", "admissions", "other",
    "resulting", "from",
}

# Only lowercase stopwords can ever match (tokens are lowered first); the
# sorted tuple gives deterministic literal arrays in Spark plans.
_ACTIVE_STOP_WORDS = tuple(sorted(w for w in STOP_WORDS if w == w.lower()))

_RE_NONALPHA = re.compile(r"\W", re.UNICODE)  # gensim strip_non_alphanum
_RE_WS = re.compile(r"(\s)+", re.UNICODE)  # gensim strip_multiple_whitespaces


def normalize_py(token: str) -> str:
    """Pure-Python replica of reference ``onto_utils.normalize``."""
    token = _RE_NONALPHA.sub(" ", token).lower()
    token = token.replace("_", " ")
    token = " ".join(w for w in token.split() if w not in STOP_WORDS)
    token = _RE_WS.sub(" ", token)
    return token


def normalize_col(c: Column) -> Column:
    """Spark-native ``normalize``. ``(?U)`` makes Java's ``\\W`` match the
    Python ``re.UNICODE`` semantics. ``filter`` (not ``array_except``) keeps
    duplicate tokens and order, as the reference's generator expression does.
    """
    stop = F.array(*[F.lit(w) for w in _ACTIVE_STOP_WORDS])
    t = F.lower(F.regexp_replace(c, r"(?U)\W", " "))
    t = F.regexp_replace(t, "_", " ")
    toks = F.split(F.trim(t), r"\s+")
    toks = F.filter(toks, lambda w: (w != F.lit("")) & ~F.array_contains(stop, w))
    return F.array_join(toks, " ")


def char_wb_ngrams_py(text: str, n: int = 3) -> list[str]:
    """Pure-Python replica of sklearn ``_char_wb_ngrams`` for ngram_range
    (n, n) with the default ``lowercase=True`` preprocessor applied."""
    text = text.lower()
    ngrams: list[str] = []
    for w in text.split():
        w = " " + w + " "
        w_len = len(w)
        offset = 0
        ngrams.append(w[offset : offset + n])
        while offset + n < w_len:
            offset += 1
            ngrams.append(w[offset : offset + n])
    return ngrams


def ws_tokens(c: Column) -> Column:
    """Whitespace tokenization, the engine-wide canonical form: split the
    trimmed text on whitespace RUNS and drop empty edge tokens. One regex
    scan, no full-text rewrite (~25% faster than normalize-then-split on
    explode-heavy queries). The empty filter is NOT optional: Spark's
    ``trim`` strips only ASCII 0x20, so leading/trailing tabs/newlines
    leave empty strings at the array edges, and the DuckDB oracles filter
    them — one call site forgetting the filter re-opens engine-vs-oracle
    divergence (the r4 review bug). ALL whitespace tokenization (dedup
    shingles, simhash, textstats, char_wb grams) must route through
    here."""
    return F.filter(
        F.split(F.trim(c), r"\s+"), lambda w: w != F.lit("")
    )


def char_wb_ngrams_col(c: Column, n: int = 3) -> Column:
    """Spark-native char_wb n-grams: array<string> of all n-windows over each
    space-padded lowercased word. A word of length L yields max(1, L+3-n)
    windows — identical multiset to ``char_wb_ngrams_py``."""
    words = ws_tokens(F.lower(c))
    return F.flatten(
        F.transform(
            words,
            lambda w: F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(w) + 3 - n)),
                lambda i: F.concat(F.lit(" "), w, F.lit(" ")).substr(i, F.lit(n)),
            ),
        )
    )
