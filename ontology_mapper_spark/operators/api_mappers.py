"""Web-API mappers: Zooma and BioPortal Annotator (SURVEY.md §2 S11/S12/T4).

Reference semantics (``/root/reference/text2term/zooma_mapper.py:16-86``,
``bioportal_mapper.py:21-89``): per source term, GET the annotator service
with the *normalized* term, take the first ``max_mappings`` responses
(T4 limit), and map confidence to a score — Zooma HIGH/GOOD/MEDIUM/LOW ->
1.0/0.75/0.5/0.25 (else 0); BioPortal always 1 with the label resolved by a
second GET of the annotated class's ``links.self``.

This engine is offline: the HTTP boundary is an injectable, picklable
``transport(url, params, headers) -> parsed-JSON | None`` callable. A
production deployment passes a requests-backed transport; tests inject a
deterministic mock. A transport may raise :class:`ApiThrottleError` to
signal HTTP 429 — the kernel sleeps ``throttle_wait_sec`` and retries,
mirroring the reference's BioPortal backoff (``bioportal_mapper.py:84-87``).

Physical shape: one Arrow-batched ``mapInPandas`` over the mention
partitions. Each partition memoizes responses per distinct term (web-scale
mentions repeat massively) and rate-limits its own call stream
(``min_interval_sec``); partitions fan out across executors, so aggregate
throughput is ``executors / min_interval``. No driver-side loop — the
reference iterates terms in one process (``zooma_mapper.py:26-28``);
here the term list is never collected.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.operators.tfidf import CANDIDATE_SCHEMA
from ontology_mapper_spark.text.normalize import normalize_py

ZOOMA_URL = "http://www.ebi.ac.uk/spot/zooma/v2/api/services/annotate"
BIOPORTAL_URL = "http://data.bioontology.org/annotator"

# Zooma confidence -> score (zooma_mapper.py:64-75)
_ZOOMA_SCORES = {"HIGH": 1.0, "GOOD": 0.75, "MEDIUM": 0.5, "LOW": 0.25}

Transport = Callable[[str, dict | None, dict | None], object]


class ApiThrottleError(Exception):
    """Raised by a transport on HTTP 429; the kernel waits and retries."""


def _call(
    transport: Transport,
    url: str,
    params: dict | None,
    headers: dict | None,
    throttle_wait_sec: float,
    max_retries: int = 5,
) -> object:
    """Bounded-retry call: consecutive 429s back off (wait, 2x, 4x, ...)
    up to ``max_retries`` waits instead of failing the whole Spark stage on
    the second 429 — the reference's BioPortal mapper retries until success
    (bioportal_mapper.py), but an unbounded loop inside a mapInPandas kernel
    would hang an executor slot forever, so we cap and then propagate."""
    wait = throttle_wait_sec
    for _ in range(max_retries):
        try:
            return transport(url, params, headers)
        except ApiThrottleError:
            time.sleep(wait)
            wait = min(wait * 2, 300.0)
    return transport(url, params, headers)


def _remove_quotes(s: str) -> str:
    """Reference ``onto_utils.remove_quotes``."""
    return s.replace('"', "")


def _apply_kernel(mentions: DataFrame, kernel, dedup: bool) -> DataFrame:
    """Run an annotator kernel over the mention relation.

    ``dedup=True`` (the default for API mappers): call the remote service
    once per DISTINCT mention string cluster-wide, then join candidates
    back onto the mentions. The kernels' per-partition memo only dedupes
    WITHIN a partition — on N partitions every hot string still costs N
    HTTP calls, which is pure waste against a rate-limited service. The
    join back is left to AQE (broadcast when the candidate table is small,
    shuffle join when it is not)."""
    if not dedup:
        return mentions.select("source_term_id", "source_term").mapInPandas(
            kernel, schema=CANDIDATE_SCHEMA
        )
    # explicit repartition: AQE would coalesce the byte-small distinct
    # relation to one partition, serializing every HTTP call through one
    # executor slot (aggregate throughput is executors/min_interval only
    # when partitions spread) — an explicit numPartitions is exempt
    uniq = (
        mentions.select("source_term")
        .distinct()
        .repartition(mentions.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col("source_term").alias("source_term_id"), "source_term"
        )
    )
    cand = uniq.mapInPandas(kernel, schema=CANDIDATE_SCHEMA).drop(
        "source_term_id"
    )
    return (
        mentions.select("source_term_id", "source_term")
        .join(cand, "source_term")
        .select(
            "source_term_id",
            "source_term",
            "mapped_term_label",
            "mapped_term_iri",
            "mapping_score",
        )
    )


def zooma_map(
    mentions: DataFrame,
    cfg: MappingConfig,
    transport: Transport,
    ontologies: str = "all",
    api_params: dict | None = None,
    min_interval_sec: float = 0.0,
    throttle_wait_sec: float = 15.0,
) -> DataFrame:
    """Zooma annotator join (S11). ``mentions(source_term_id, source_term)``
    -> candidate schema; scores from Zooma confidence categories."""
    max_mappings = cfg.max_mappings
    extra = dict(api_params or {})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[tuple[str, str, float]]] = {}
        last_call = [0.0]
        for pdf in batches:
            ids, terms, lbls, iris, scs = [], [], [], [], []
            for sid, term in zip(pdf["source_term_id"], pdf["source_term"]):
                cands = memo.get(term)
                if cands is None:
                    params = {
                        "propertyValue": normalize_py(term),
                        "filter": "required:[none],ontologies:["
                        + ontologies
                        + "]",
                    }
                    params.update(extra)
                    if min_interval_sec:
                        wait = last_call[0] + min_interval_sec - time.time()
                        if wait > 0:
                            time.sleep(wait)
                        last_call[0] = time.time()
                    resp = _call(transport, ZOOMA_URL, params, None,
                                 throttle_wait_sec)
                    cands = []
                    for m in resp or []:
                        if len(cands) >= max_mappings:  # T4 limit
                            break
                        label = m["annotatedProperty"]["propertyValue"]
                        iri = m["semanticTags"][0]
                        score = _ZOOMA_SCORES.get(m.get("confidence"), 0.0)
                        cands.append((label, iri, score))
                    memo[term] = cands
                for label, iri, score in cands:
                    ids.append(sid)
                    terms.append(term)
                    lbls.append(label)
                    iris.append(iri)
                    scs.append(score)
            yield pd.DataFrame(
                {
                    "source_term_id": ids,
                    "source_term": terms,
                    "mapped_term_label": lbls,
                    "mapped_term_iri": iris,
                    "mapping_score": scs,
                }
            )

    return _apply_kernel(mentions, kernel, dedup=cfg.dedup_scoring is not False)


def bioportal_map(
    mentions: DataFrame,
    cfg: MappingConfig,
    transport: Transport,
    ontologies: str = "all",
    apikey: str = "",
    api_params: dict | None = None,
    min_interval_sec: float = 0.0,
    throttle_wait_sec: float = 15.0,
) -> DataFrame:
    """BioPortal Annotator join (S12): score hardcoded 1, label resolved via
    the annotated class's ``links.self`` (``bioportal_mapper.py:58-69``)."""
    max_mappings = cfg.max_mappings
    extra = dict(api_params or {})
    headers = {"Authorization": "apiKey token=" + apikey}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[tuple[str, str, float]]] = {}
        label_memo: dict[str, str] = {}
        last_call = [0.0]
        for pdf in batches:
            ids, terms, lbls, iris, scs = [], [], [], [], []
            for sid, term in zip(pdf["source_term_id"], pdf["source_term"]):
                cands = memo.get(term)
                if cands is None:
                    params = {
                        "text": normalize_py(term),
                        "longest_only": "true",
                        "expand_mappings": "true",
                        "ontologies": ontologies,
                    }
                    params.update(extra)
                    if min_interval_sec:
                        wait = last_call[0] + min_interval_sec - time.time()
                        if wait > 0:
                            time.sleep(wait)
                        last_call[0] = time.time()
                    resp = _call(transport, BIOPORTAL_URL, params, headers,
                                 throttle_wait_sec)
                    cands = []
                    for m in resp or []:
                        if len(cands) >= max_mappings:  # T4 limit
                            break
                        ann = m["annotatedClass"]
                        iri = ann["@id"]
                        link = ann["links"]["self"]
                        label = label_memo.get(link)
                        if label is None:
                            detail = _call(transport, link, None, headers,
                                           throttle_wait_sec)
                            label = (
                                _remove_quotes(detail["prefLabel"])
                                if detail
                                else ""
                            )
                            label_memo[link] = label
                        cands.append((label, iri, 1.0))
                    memo[term] = cands
                for label, iri, score in cands:
                    ids.append(sid)
                    terms.append(term)
                    lbls.append(label)
                    iris.append(iri)
                    scs.append(score)
            yield pd.DataFrame(
                {
                    "source_term_id": ids,
                    "source_term": terms,
                    "mapped_term_label": lbls,
                    "mapped_term_iri": iris,
                    "mapping_score": scs,
                }
            )

    return _apply_kernel(mentions, kernel, dedup=cfg.dedup_scoring is not False)


class RequestsTransport:
    """Default network transport — requests-backed, picklable, one
    ``requests.Session`` per executor process (connection pooling across
    the partition's call stream; the session is rebuilt after unpickling).

    Wire behavior mirrors the reference mappers
    (``zooma_mapper.py:26-33``, ``bioportal_mapper.py:78-87``): GET with
    params/headers, JSON body returned parsed; HTTP 429 raises
    :class:`ApiThrottleError` so the kernel's bounded exponential backoff
    (``_call``) takes over — the reference sleeps 15 s and retries
    unboundedly, which would pin an executor slot forever. Transient
    transport failures (connection reset, DNS) retry ``max_retries``
    times with a linear pause; other HTTP errors raise immediately.

    The engine stays offline-by-default: this class is only instantiated
    when ``cfg.enable_network`` is explicitly True (see
    ``resolve_transport``); constructing it performs no I/O.
    """

    def __init__(self, timeout: float = 30.0, max_retries: int = 3,
                 retry_pause_sec: float = 1.0):
        if max_retries < 1:
            raise ValueError("max_retries must be >= 1")
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_pause_sec = retry_pause_sec
        self._session = None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_session"] = None  # sessions hold sockets — never pickled
        return state

    def _get_session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def __call__(self, url: str, params: dict | None, headers: dict | None):
        import requests

        sess = self._get_session()
        last_exc: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                resp = sess.get(
                    url, params=params, headers=headers, timeout=self.timeout
                )
            except requests.RequestException as e:
                last_exc = e
                if attempt + 1 < self.max_retries:  # no pause after last try
                    time.sleep(self.retry_pause_sec * (attempt + 1))
                continue
            if resp.status_code == 429:
                raise ApiThrottleError(url)
            resp.raise_for_status()
            return resp.json()
        raise last_exc  # type: ignore[misc]


def resolve_transport(cfg: MappingConfig) -> Transport:
    """The transport an API mapper run should use: an explicitly injected
    ``cfg.api_transport`` wins; otherwise ``cfg.enable_network=True`` opts
    in to the default :class:`RequestsTransport`. ``MappingConfig.validate``
    has already rejected the remaining case (no transport, network not
    enabled) with the offline-engine error."""
    if cfg.api_transport is not None:
        return cfg.api_transport  # type: ignore[return-value]
    return RequestsTransport()
