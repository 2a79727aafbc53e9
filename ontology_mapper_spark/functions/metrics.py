"""String-similarity metrics with rapidfuzz/nltk-pinned semantics.

Pure-Python re-derivations (rapidfuzz is a C++ lib, not installed here) of
the metrics the reference SyntacticMapper dispatches on
(``/root/reference/text2term/syntactic_mapper.py:77-124``):

- levenshtein: ``rapidfuzz.distance.Levenshtein.normalized_similarity`` =
  1 - dist / max(len1, len2) (uniform weights)
- jaro: ``rapidfuzz.distance.Jaro.normalized_similarity``
- jarowinkler: the reference QUIRK — ``compare_jarowinkler`` actually calls
  plain Jaro (``syntactic_mapper.py:93-99``); we replicate (alias of jaro)
- indel: 1 - indel_dist / (len1 + len2); indel_dist = len1 + len2 - 2*LCS
- fuzzy: ``rapidfuzz.fuzz.WRatio / 100`` (rapidfuzz >= 3 applies no
  preprocessing by default; reference pins rapidfuzz~=3.9.4)
- jaccard: ``1 - nltk.jaccard_distance(set(s1), set(s2))`` =
  |A∩B| / |A∪B| over character sets. Divergence note: nltk raises
  ZeroDivisionError when both strings are empty; we return 1.0.

These run inside Arrow-batched pandas UDFs (see operators/syntactic.py) —
plain-Python per pair, vectorized transfer, never row-at-a-time Spark UDFs.
"""

from __future__ import annotations


def levenshtein_similarity(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    if len1 < len2:
        s1, s2, len1, len2 = s2, s1, len2, len1
    prev = list(range(len2 + 1))
    for i in range(1, len1 + 1):
        cur = [i] + [0] * len2
        c1 = s1[i - 1]
        for j in range(1, len2 + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return 1.0 - prev[len2] / max(len1, len2)


def _lcs_len(s1: str, s2: str) -> int:
    if not s1 or not s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = [0] * (len(s2) + 1)
    for c1 in s1:
        cur = [0] * (len(s2) + 1)
        for j, c2 in enumerate(s2, 1):
            cur[j] = prev[j - 1] + 1 if c1 == c2 else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def indel_similarity(s1: str, s2: str) -> float:
    total = len(s1) + len(s2)
    if total == 0:
        return 1.0
    dist = total - 2 * _lcs_len(s1, s2)
    return 1.0 - dist / total


def jaro_similarity(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


# The reference's compare_jarowinkler computes plain Jaro (quirk kept).
jarowinkler_similarity = jaro_similarity


def jaccard_char_similarity(s1: str, s2: str) -> float:
    a, b = set(s1), set(s2)
    union = a | b
    if not union:
        return 1.0
    return len(a & b) / len(union)


# --- rapidfuzz.fuzz.WRatio (fuzzywuzzy WRatio algorithm, no preprocessing) ---


def _ratio(s1: str, s2: str) -> float:
    """fuzz.ratio = Indel normalized similarity * 100."""
    if not s1 and not s2:
        return 100.0
    return indel_similarity(s1, s2) * 100.0


def _partial_ratio(s1: str, s2: str) -> float:
    """Best ratio of the shorter string vs any equal-length window of the
    longer (true maximum — a superset of fuzzywuzzy's block heuristic)."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if not s1:
        return 100.0 if not s2 else 0.0
    n = len(s1)
    best = 0.0
    for start in range(0, len(s2) - n + 1):
        r = _ratio(s1, s2[start : start + n])
        if r > best:
            best = r
        if best == 100.0:
            break
    return best


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split()))


def _token_sort_ratio(s1: str, s2: str) -> float:
    return _ratio(_sorted_tokens(s1), _sorted_tokens(s2))


def _partial_token_sort_ratio(s1: str, s2: str) -> float:
    return _partial_ratio(_sorted_tokens(s1), _sorted_tokens(s2))


def _token_set_parts(s1: str, s2: str) -> tuple[str, str, str]:
    a, b = set(s1.split()), set(s2.split())
    sect = " ".join(sorted(a & b))
    combined1 = (sect + " " + " ".join(sorted(a - b))).strip()
    combined2 = (sect + " " + " ".join(sorted(b - a))).strip()
    return sect, combined1, combined2


def _token_set_ratio(s1: str, s2: str) -> float:
    sect, c1, c2 = _token_set_parts(s1, s2)
    return max(_ratio(sect, c1), _ratio(sect, c2), _ratio(c1, c2))


def _partial_token_set_ratio(s1: str, s2: str) -> float:
    a, b = set(s1.split()), set(s2.split())
    if a & b:
        return 100.0
    return _partial_ratio(" ".join(sorted(a)), " ".join(sorted(b)))


def wratio(s1: str, s2: str) -> float:
    """rapidfuzz.fuzz.WRatio in [0, 100]."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    len_ratio = max(len1, len2) / min(len1, len2)
    end_ratio = _ratio(s1, s2)
    UNBASE_SCALE = 0.95
    if len_ratio < 1.5:
        token = max(_token_sort_ratio(s1, s2), _token_set_ratio(s1, s2))
        return max(end_ratio, token * UNBASE_SCALE)
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    end_ratio = max(end_ratio, _partial_ratio(s1, s2) * partial_scale)
    partial_token = max(
        _partial_token_sort_ratio(s1, s2), _partial_token_set_ratio(s1, s2)
    )
    return max(end_ratio, partial_token * UNBASE_SCALE * partial_scale)


def fuzzy_similarity(s1: str, s2: str) -> float:
    return wratio(s1, s2) / 100.0


METRICS = {
    "levenshtein": levenshtein_similarity,
    "jaro": jaro_similarity,
    "jarowinkler": jarowinkler_similarity,
    "indel": indel_similarity,
    "fuzzy": fuzzy_similarity,
    "jaccard": jaccard_char_similarity,
}
