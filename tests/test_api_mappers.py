"""S11/S12/T4 — Zooma / BioPortal annotator mappers behind an injectable
offline transport (reference zooma_mapper.py / bioportal_mapper.py)."""

import pytest

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.operators.api_mappers import (
    ApiThrottleError,
    BIOPORTAL_URL,
    ZOOMA_URL,
    _call,
    bioportal_map,
    zooma_map,
)
from ontology_mapper_spark.sources.terms import mentions_from_list


def _zooma_transport():
    # returned as a closure so cloudpickle serializes it by value (a test-
    # module top-level function is not importable on Spark workers)
    def fake_zooma_transport(url, params, headers):
        """Deterministic Zooma-shaped responses (zooma_mapper.py:50-62
        fields). Returns 4 annotations so the T4 cut is observable."""
        assert url == ZOOMA_URL
        assert params["filter"].startswith("required:[none],ontologies:[")
        term = params["propertyValue"]
        confidences = ["HIGH", "GOOD", "MEDIUM", "LOW"]
        return [
            {
                "annotatedProperty": {"propertyValue": f"{term} label {i}"},
                "semanticTags": [
                    f"http://example.org/zooma/{term.replace(' ', '_')}/{i}"
                ],
                "confidence": confidences[i],
            }
            for i in range(4)
        ]

    return fake_zooma_transport


def _bioportal_transport():
    def fake_bioportal_transport(url, params, headers):
        assert headers["Authorization"].startswith("apiKey token=")
        if url == BIOPORTAL_URL:
            term = params["text"]
            assert params["longest_only"] == "true"
            return [
                {
                    "annotatedClass": {
                        "@id": f"http://example.org/bp/{term.replace(' ', '_')}/{i}",
                        "links": {"self": f"http://example.org/bp/self/{i}"},
                    }
                }
                for i in range(3)
            ]
        # the second GET: term detail -> prefLabel (with quotes to strip)
        idx = url.rsplit("/", 1)[-1]
        return {"prefLabel": f'"pref label {idx}"'}

    return fake_bioportal_transport


@pytest.mark.spark
def test_zooma_map_scores_and_t4_limit(spark):
    m = mentions_from_list(spark, ["Acute Asthma", "fever"])
    cfg = MappingConfig(mapper="zooma", max_mappings=3,
                        api_transport=_zooma_transport())
    cfg.validate()
    rows = zooma_map(m, cfg, _zooma_transport()).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["source_term"], []).append(r)
    # T4: only the first max_mappings=3 of 4 responses kept
    assert {len(v) for v in by_term.values()} == {3}
    a = sorted(by_term["Acute Asthma"], key=lambda r: r["mapped_term_iri"])
    # propertyValue echoes the *normalized* term (zooma_mapper.py:35)
    assert a[0]["mapped_term_label"] == "acute asthma label 0"
    assert [r["mapping_score"] for r in a] == [1.0, 0.75, 0.5]


@pytest.mark.spark
def test_zooma_through_pipeline_min_score(spark):
    from ontology_mapper_spark.pipeline import map_terms
    from ontology_mapper_spark.sources.ontology import fixture_onto_terms

    cfg = MappingConfig(mapper="zooma", max_mappings=4, min_score=0.6,
                        api_transport=_zooma_transport())
    out = map_terms(spark, ["asthma"], fixture_onto_terms(spark), cfg).collect()
    # min_score 0.6 keeps HIGH(1.0) and GOOD(0.75) only
    assert sorted(r["mapping_score"] for r in out) == [0.75, 1.0]
    assert all(r["mapped_term_iri"].startswith("http://example.org/zooma/") for r in out)


@pytest.mark.spark
def test_bioportal_map_label_fetch(spark):
    m = mentions_from_list(spark, ["Fever"])
    cfg = MappingConfig(mapper="bioportal", max_mappings=2,
                        api_transport=_bioportal_transport(),
                        bioportal_apikey="k")
    rows = bioportal_map(m, cfg, _bioportal_transport(), apikey="k").collect()
    assert len(rows) == 2  # T4 limit
    rows.sort(key=lambda r: r["mapped_term_iri"])
    assert rows[0]["mapped_term_iri"] == "http://example.org/bp/fever/0"
    assert rows[0]["mapped_term_label"] == "pref label 0"  # quotes stripped
    assert all(r["mapping_score"] == 1.0 for r in rows)


def test_throttle_retry():
    calls = []

    def throttling_transport(url, params, headers):
        calls.append(url)
        if len(calls) == 1:
            raise ApiThrottleError()
        return {"ok": True}

    out = _call(throttling_transport, "u", None, None, throttle_wait_sec=0.01)
    assert out == {"ok": True}
    assert len(calls) == 2


def test_validate_requires_transport():
    with pytest.raises(ValueError, match="api_transport"):
        MappingConfig(mapper="zooma").validate()
    with pytest.raises(ValueError, match="api_transport"):
        MappingConfig(mapper="bioportal").validate()
    MappingConfig(mapper="zooma", api_transport=_zooma_transport()).validate()


def test_cli_transport_resolution(tmp_path, monkeypatch):
    import sys

    from ontology_mapper_spark.__main__ import resolve_transport

    assert resolve_transport("") is None
    (tmp_path / "my_transport.py").write_text(
        "def transport(url, params, headers):\n    return []\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    t = resolve_transport("my_transport:transport")
    assert callable(t) and t("u", None, None) == []
    with pytest.raises(SystemExit):
        resolve_transport("no_colon_here")


@pytest.mark.spark
def test_api_mapper_dedups_calls_cluster_wide(spark, tmp_path):
    """r3: API mappers call the service once per DISTINCT term TOTAL, not
    once per distinct term PER PARTITION — the per-partition memo can't
    dedup across partitions, and HTTP calls against a rate-limited service
    are the scarcest resource in this path. Calls are counted through the
    filesystem because Spark pickles the transport per task."""
    import os

    calls_dir = str(tmp_path / "calls")
    os.makedirs(calls_dir)

    def make_transport(calls_dir=calls_dir):
        def counting_transport(url, params, headers):
            import os as _os
            import uuid

            term = params["propertyValue"]
            with open(_os.path.join(calls_dir, uuid.uuid4().hex), "w") as f:
                f.write(term)
            return [{
                "annotatedProperty": {"propertyValue": term + " label"},
                "semanticTags": ["http://example.org/z/" + term.replace(" ", "_")],
                "confidence": "HIGH",
            }]
        return counting_transport

    # 64 mention rows over 8 partitions, only 4 distinct strings
    terms = [f"term {i % 4}" for i in range(64)]
    mentions = mentions_from_list(spark, terms).repartition(8)
    cfg = MappingConfig(max_mappings=1)
    out = zooma_map(mentions, cfg, make_transport()).collect()
    assert len(out) == 64  # every mention row got its candidate back
    calls = [open(os.path.join(calls_dir, f)).read()
             for f in os.listdir(calls_dir)]
    assert len(calls) == 4, f"expected 4 HTTP calls, saw {len(calls)}"
    assert sorted(set(calls)) == sorted({f"term {i}" for i in range(4)})

    # explicit opt-out restores the per-partition plan (more calls)
    for f in os.listdir(calls_dir):
        os.remove(os.path.join(calls_dir, f))
    import dataclasses

    cfg_off = dataclasses.replace(cfg, dedup_scoring=False)
    zooma_map(mentions, cfg_off, make_transport()).collect()
    # strictly MORE calls than distinct terms: 8 partitions each hold all 4
    # terms, so the per-partition plan must re-call across partitions — a
    # '>= 4' here would pass even if the opt-out were silently ignored
    assert len(os.listdir(calls_dir)) > 4


# ---------------- default network transport (r3 VERDICT #3) ----------------


def test_offline_default_still_refuses_api_mappers():
    cfg = MappingConfig(mapper="zooma")
    with pytest.raises(ValueError, match="enable_network"):
        cfg.validate()


def test_enable_network_resolves_default_transport():
    from ontology_mapper_spark.operators.api_mappers import (
        RequestsTransport,
        resolve_transport,
    )

    cfg = MappingConfig(mapper="zooma", enable_network=True)
    cfg.validate()  # no longer refused
    t = resolve_transport(cfg)
    assert isinstance(t, RequestsTransport)

    # an injected transport always wins, even with networking enabled
    mock = lambda url, params, headers: []
    cfg2 = MappingConfig(
        mapper="zooma", enable_network=True, api_transport=mock
    )
    assert resolve_transport(cfg2) is mock


def test_requests_transport_wire_behavior(monkeypatch):
    """429 -> ApiThrottleError (kernel backoff takes over); transient
    connection errors retry; success returns parsed JSON; the session is
    never pickled (executors rebuild their own)."""
    import pickle

    import requests

    from ontology_mapper_spark.operators.api_mappers import (
        ApiThrottleError,
        RequestsTransport,
    )

    class FakeResp:
        def __init__(self, code, body=None):
            self.status_code = code
            self._body = body

        def raise_for_status(self):
            if self.status_code >= 400:
                raise requests.HTTPError(str(self.status_code))

        def json(self):
            return self._body

    calls = []

    class FakeSession:
        def __init__(self, script):
            self.script = list(script)

        def get(self, url, params=None, headers=None, timeout=None):
            calls.append((url, params, headers, timeout))
            ev = self.script.pop(0)
            if isinstance(ev, Exception):
                raise ev
            return ev

    t = RequestsTransport(timeout=7.0, max_retries=3, retry_pause_sec=0.0)

    # success after one transient failure
    t._session = FakeSession(
        [requests.ConnectionError("reset"), FakeResp(200, {"ok": 1})]
    )
    assert t("http://example.org/api", {"q": "x"}, None) == {"ok": 1}
    assert calls[-1][3] == 7.0  # timeout plumbed through

    # 429 surfaces as ApiThrottleError immediately (no internal retry —
    # the kernel's bounded exponential backoff owns throttling)
    t._session = FakeSession([FakeResp(429)])
    with pytest.raises(ApiThrottleError):
        t("http://example.org/api", None, None)

    # other HTTP errors raise
    t._session = FakeSession([FakeResp(500)])
    with pytest.raises(requests.HTTPError):
        t("http://example.org/api", None, None)

    # exhausting retries re-raises the last transport error
    t._session = FakeSession([requests.ConnectionError("a")] * 3)
    with pytest.raises(requests.ConnectionError):
        t("http://example.org/api", None, None)

    # picklable, and the live session is dropped in transit
    t2 = pickle.loads(pickle.dumps(t))
    assert t2._session is None and t2.timeout == 7.0


@pytest.mark.spark
def test_pipeline_uses_resolved_transport(spark, monkeypatch):
    """Integration wiring: with enable_network=True and no injected
    transport, the pipeline must route calls through resolve_transport's
    default — proven by substituting the default with a mock and seeing
    its responses in the output mappings."""
    from ontology_mapper_spark.operators import api_mappers
    from ontology_mapper_spark.pipeline import map_terms_df
    from ontology_mapper_spark.sources.ontology import fixture_onto_terms
    from ontology_mapper_spark.sources.terms import mentions_from_dict

    def fake_default():
        def transport(url, params, headers):
            return [
                {
                    "annotatedProperty": {"propertyValue": "Asthma"},
                    "semanticTags": ["http://www.ebi.ac.uk/efo/EFO_0000270"],
                    "confidence": "HIGH",
                }
            ]

        return transport

    monkeypatch.setattr(api_mappers, "RequestsTransport", fake_default)
    mentions = mentions_from_dict(spark, {"asthma": None})
    out = map_terms_df(
        mentions,
        fixture_onto_terms(spark),
        MappingConfig(mapper="zooma", enable_network=True),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["mapped_term_iri"] == "http://www.ebi.ac.uk/efo/EFO_0000270"
    assert rows[0]["mapping_score"] == 1.0
