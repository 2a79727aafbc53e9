"""Text analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting).
All native column expressions — portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontology_mapper_spark.text.normalize import ws_tokens

# tiny deterministic stopword profiles for the n-gram/stopword language
# heuristic (public knowledge lists, truncated)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "it": ["il", "di", "che", "e", "la", "per", "un", "non", "sono", "con"],
    "pt": ["o", "de", "que", "e", "do", "da", "em", "um", "para", "com"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "med"],
    "pl": ["i", "w", "na", "z", "do", "to", "się", "nie", "jest", "że"],
    "tr": ["bir", "ve", "bu", "da", "ne", "için", "ben", "de", "çok", "ama"],
    "id": ["yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
           "dalam", "tidak"],
}

# a BPE-ish tokenizer regex: words, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _words(text: Column) -> Column:
    return ws_tokens(text)


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace + regex token counts and basic shape stats."""
    text = F.col(text_col)
    words = _words(text)
    return docs.select(
        F.col(id_col).alias("doc"),
        F.size(words).alias("n_words"),
        F.length(text).alias("n_chars"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_tokens_bpeish"
        ),
        F.round(
            F.aggregate(
                words, F.lit(0.0), lambda a, w: a + F.length(w)
            )
            / F.greatest(F.size(words), F.lit(1)),
            6,
        ).alias("avg_word_len"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristic in [0,1]: length band, alpha ratio,
    distinct-word ratio, stopword presence. Columns exposed individually so
    thresholds stay tunable downstream."""
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    alpha_ratio = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )
    distinct_ratio = F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_ratio = F.size(
        F.filter(words, lambda w: F.array_contains(en_stop, F.lower(w)))
    ) / F.greatest(n_words, F.lit(1))
    length_band = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.3)
    score = F.round(
        0.3 * length_band
        + 0.3 * alpha_ratio
        + 0.2 * distinct_ratio
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    return docs.select(
        F.col(id_col).alias("doc"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: hit count per language profile,
    winner = max hits (ties broken by language code asc), 'und' when no
    profile hits."""
    words = F.transform(_words(F.col(text_col)), F.lower)
    hit_structs = []
    for code in sorted(LANG_PROFILES):
        prof = F.array(*[F.lit(w) for w in LANG_PROFILES[code]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(prof, w)))
        hit_structs.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    arr = F.array(*hit_structs)
    # max hits, tie -> lexicographically smallest code; sort by (-hits, code)
    best = F.array_min(
        F.transform(
            arr,
            lambda s: F.struct(
                (-s["hits"]).alias("neg"), s["code"].alias("code"),
                s["hits"].alias("hits"),
            ),
        )
    )
    return docs.select(
        F.col(id_col).alias("doc"),
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["hits"].alias("profile_hits"),
    )


def doc_fingerprint(docs: DataFrame, k: int = 3, keep: int = 4,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style fingerprint: md5 of the ``keep`` smallest shingle
    digests (order-stable, whitespace-normalized). Near-identical docs
    share fingerprints; portable to any engine with md5."""
    from ontology_mapper_spark.operators.dedup import word_shingles

    digests = F.sort_array(
        F.transform(word_shingles(F.col(text_col), k), F.md5)
    )
    fp = F.md5(F.array_join(F.slice(digests, 1, keep), "|"))
    return docs.select(F.col(id_col).alias("doc"), fp.alias("fingerprint"))
