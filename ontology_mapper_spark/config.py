"""Configuration surface of the engine.

Mirrors the reference's query surface (`/root/reference/text2term/t2t.py:31-34`,
`mapper.py:6-20`, `term.py:6-9`) as a dataclass instead of keyword soup.
"""

from __future__ import annotations

from dataclasses import dataclass


class Mapper:
    """String-enum of mapping methods (reference `mapper.py:6-16`).

    ZOOMA / BIOPORTAL are network annotators; this offline engine runs them
    only through an injected transport (cfg.api_transport — see
    operators/api_mappers.py) and errors cleanly without one.
    """

    LEVENSHTEIN = "levenshtein"
    JARO = "jaro"
    JARO_WINKLER = "jarowinkler"
    JACCARD = "jaccard"
    FUZZY = "fuzzy"
    TFIDF = "tfidf"
    INDEL = "indel"
    ZOOMA = "zooma"
    BIOPORTAL = "bioportal"

    SYNTACTIC = {LEVENSHTEIN, JARO, JARO_WINKLER, JACCARD, FUZZY, INDEL}
    ALL = SYNTACTIC | {TFIDF, ZOOMA, BIOPORTAL}


class OntologyTermType:
    """Reference `term.py:6-9`."""

    CLASS = "class"
    PROPERTY = "property"
    ANY = "any"

    ALL = {CLASS, PROPERTY, ANY}


# Reference `t2t.py:23-24`
IGNORE_TAGS = ["ignore", "Ignore", "ignore ", "Ignore "]
UNMAPPED_TAG = "unmapped"

# Reference output schema (`t2t.py:25-26`); we keep snake_case internally and
# rename at the sink (`sinks.write_mappings_csv`).
OUTPUT_COLUMNS = [
    "Source Term",
    "Source Term ID",
    "Mapped Term Label",
    "Mapped Term CURIE",
    "Mapped Term IRI",
    "Mapping Score",
    "Tags",
]

INTERNAL_COLUMNS = [
    "source_term",
    "source_term_id",
    "mapped_term_label",
    "mapped_term_curie",
    "mapped_term_iri",
    "mapping_score",
    "tags",
]


@dataclass
class MappingConfig:
    """All knobs of `map_terms` (reference `t2t.py:31-34` defaults)."""

    base_iris: tuple = ()
    excl_deprecated: bool = False
    max_mappings: int = 3
    min_score: float = 0.3
    mapper: str = Mapper.TFIDF
    term_type: str = OntologyTermType.CLASS
    incl_unmapped: bool = False
    ngram_length: int = 3  # tfidf_mapper.py:20
    ntop: int = 50  # tfidf_mapper.py:55 candidate cap per mention
    # Engine-only scale knobs (no reference equivalent):
    use_inverted_index: bool = False  # False => broadcast-CSR mapInPandas path
    # Auto-fallback: above this label count the pipeline dispatches to the
    # pure-DataFrame inverted-index plan even with use_inverted_index=False.
    # Threshold raised 1M -> 4M in round 4 after benching both plans at a
    # 1.2M-label dimension: for exact scoring, every label sharing >= 1
    # n-gram with a mention is a candidate (~10^5 per mention against a
    # SNOMED-scale, high-token-overlap terminology), and the kernel does
    # those MACs as numpy scatter-adds against the broadcast CSR (~ms per
    # mention), while the inverted plan materializes the same pairs as
    # JVM aggregate rows — measured ~2 orders of magnitude more wall at
    # 1.2M labels. The kernel's real ceiling is index memory: ~300 B/name
    # (postings + iri/display arrays) => ~1.2 GB at 4M names, inside the
    # default 8g driver/executor budget. Past it, the inverted plan is the
    # only option; pair stop_ngram_df_fraction with it at high-overlap
    # dimensions. The count probe reads the dimension table only
    # (metadata-scale action).
    inverted_index_min_labels: int = 4_000_000
    postings_broadcast: bool = True  # inverted index: force-broadcast the
    # target postings so the mention fact table is never shuffled for
    # scoring. Postings are ~15 rows/label — a multi-million-label ontology
    # is still a 1-2 GB broadcast, far cheaper than shuffling 10^12
    # mentions x 15 grams on a skewed trigram key space. Set False only
    # when postings genuinely exceed executor memory; the join then falls
    # to AQE (shuffle on ngram + skew-join split + stop_ngram valve).
    stop_ngram_df_fraction: float | None = None  # inverted index: drop target
    # postings for n-grams present in more than this fraction of labels.
    # Their IDF is near zero, so they carry negligible score mass but cause
    # the worst join fan-out (skew). Off by default (exact semantics);
    # re-validate P/R when enabling (tests/test_precision_recall.py).
    candidate_prefilter: bool = True  # syntactic mappers: restrict the
    # nested-loop to TF-IDF index candidates at scale (SURVEY.md §4). The
    # pipeline dispatches to the prefiltered plan only when the label side
    # reaches prefilter_min_labels, so fixture-scale runs keep the exact
    # O(n*m) reference semantics; set prefilter_min_labels=0 to force it.
    prefilter_min_labels: int = 1000
    prefilter_ntop: int = 100  # candidates kept per mention by the prefilter
    prefilter_min_score: float = 0.05  # TF-IDF floor for prefilter candidates
    dedup_scoring: bool | None = None  # score each DISTINCT mention string
    # once cluster-wide and join candidates back, instead of per-partition
    # scoring with a per-partition memo. None = each operator's default:
    # the TF-IDF broadcast plan keeps the zero-shuffle per-partition plan
    # (construct_kg flips it on — web corpora repeat the same surface
    # strings constantly, and per-partition memoization still re-scores
    # every hot string once per partition, a 1000x redundancy on a 1000-
    # executor cluster); the Zooma/BioPortal API mappers default to ON
    # (every duplicate HTTP call burns a rate-limited remote service —
    # only False forces their per-partition plan). AQE picks broadcast vs
    # shuffle for the join back from the candidate table's observed size.
    shuffle_partitions: int | None = None
    # Web-API mappers (S11/S12): the HTTP boundary is an injected picklable
    # transport(url, params, headers) -> parsed JSON (operators.api_mappers);
    # the offline engine refuses these mappers without one.
    api_transport: object = None
    enable_network: bool = False  # explicit opt-in for the default
    # requests-backed transport (api_mappers.RequestsTransport) when no
    # api_transport is injected; the engine stays offline by default.
    api_ontologies: str = "all"  # comma-separated acronyms or 'all'
    bioportal_apikey: str = ""  # reference t2t.py:31-34 bioportal_apikey
    api_min_interval_sec: float = 0.0  # per-partition rate limit

    def validate(self) -> None:
        if self.mapper not in Mapper.ALL:
            raise ValueError(f"Unsupported mapper: {self.mapper}")
        if self.mapper in {Mapper.ZOOMA, Mapper.BIOPORTAL} and (
            self.api_transport is None and not self.enable_network
        ):
            raise ValueError(
                f"Mapper '{self.mapper}' calls a network annotator; this "
                "engine is offline by default — inject cfg.api_transport "
                "(a picklable transport(url, params, headers) callable) or "
                "set cfg.enable_network=True to use the default "
                "requests-backed transport (see operators/api_mappers.py; "
                "SURVEY.md §2 S11/S12)."
            )
        if self.term_type not in OntologyTermType.ALL:
            raise ValueError(f"Unsupported term_type: {self.term_type}")
        if not 0.0 <= self.min_score <= 1.0:
            raise ValueError("min_score must be in [0, 1]")
        if self.max_mappings < 1:
            raise ValueError("max_mappings must be >= 1")
        if (
            self.inverted_index_min_labels is not None
            and self.inverted_index_min_labels < 1
        ):
            # 0 would force the inverted plan on every run (limit(0) counts
            # 0 >= 0), negatives die inside Spark's limit() — fail clearly
            raise ValueError(
                "inverted_index_min_labels must be >= 1 (or None to disable"
                " the auto-fallback)"
            )
