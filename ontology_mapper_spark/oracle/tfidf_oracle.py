"""Frozen single-node oracle of the reference TF-IDF mapper.

Pure-numpy re-derivation of the reference pipeline
(``/root/reference/text2term/tfidf_mapper.py:20-77``), which is
sklearn ``CountVectorizer.fit`` (shared vocabulary over source+target) +
``TfidfVectorizer.fit_transform`` run *separately* on source and target
(per-corpus IDF, smooth_idf, raw tf, l2 norm) + ``awesome_cossim_topn``
(per-row top-``ntop`` cosine >= ``min_score``) + the IRI-dedup /
``max_mappings`` scan of ``_get_mappings``.

sklearn semantics pinned here (defaults of TfidfVectorizer):
- analyzer='char_wb', ngram_range=(n, n), lowercase=True
- tf = raw in-document count
- smooth_idf=True: idf = ln((1 + n_docs) / (1 + df)) + 1
- sublinear_tf=False, norm='l2'
- vocabulary = union over both corpora (shared index space), but document
  frequencies are computed per corpus — the reference's quirk (SURVEY.md §2 J2)

This module is the TEST oracle only — the engine never imports it at runtime.
No Spark, no sklearn, no scipy.
"""

from __future__ import annotations

import math
from collections import Counter

from ontology_mapper_spark.text.normalize import char_wb_ngrams_py, normalize_py


def _tf_vectors(corpus: list[str], n: int) -> list[Counter]:
    return [Counter(char_wb_ngrams_py(doc, n)) for doc in corpus]


def _idf(tfs: list[Counter]) -> dict[str, float]:
    n_docs = len(tfs)
    df: Counter = Counter()
    for tf in tfs:
        df.update(tf.keys())
    return {g: math.log((1 + n_docs) / (1 + d)) + 1.0 for g, d in df.items()}


def _l2_tfidf(tf: Counter, idf: dict[str, float]) -> dict[str, float]:
    w = {g: c * idf[g] for g, c in tf.items()}
    norm = math.sqrt(sum(v * v for v in w.values()))
    if norm == 0.0:
        return {}
    return {g: v / norm for g, v in w.items()}


def tfidf_mappings(
    source_terms: list[str],
    source_term_ids: list[str],
    target_labels: list[str],
    target_iris: list[str],
    target_display_labels: list[str],
    max_mappings: int = 3,
    min_score: float = 0.3,
    ngram_length: int = 3,
    ntop: int = 50,
) -> list[dict]:
    """Returns mapping rows (dicts) in the reference's emission order.

    ``target_labels[k]`` is the k-th name (label or synonym) in the
    reference's flattened label list (``tfidf_mapper.py:79-95``);
    ``target_iris[k]`` / ``target_display_labels[k]`` identify its term.
    Tie-break within equal scores is pinned to ascending label index
    (the reference's tie order is the sparse matrix column order).
    """
    source_norm = [normalize_py(t) for t in source_terms]
    src_tfs = _tf_vectors(source_norm, ngram_length)
    tgt_tfs = _tf_vectors(target_labels, ngram_length)
    # Per-corpus IDF (the reference quirk): each side fit on its own corpus.
    src_idf = _idf(src_tfs)
    tgt_idf = _idf(tgt_tfs)
    tgt_vecs = [_l2_tfidf(tf, tgt_idf) for tf in tgt_tfs]

    rows: list[dict] = []
    for i, tf in enumerate(src_tfs):
        svec = _l2_tfidf(tf, src_idf)
        cands: list[tuple[float, int]] = []
        for k, tvec in enumerate(tgt_vecs):
            s = 0.0
            for g, wv in svec.items():
                tv = tvec.get(g)
                if tv is not None:
                    s += wv * tv
            if s >= min_score and s > 0.0:
                cands.append((s, k))
        # rank on round(score, 9): matches the engine's cross-engine
        # ulp-tie pin (operators/tfidf.py _score_one)
        cands.sort(key=lambda x: (-round(x[0], 9), x[1]))
        del cands[ntop:]
        # _get_mappings (tfidf_mapper.py:57-77): first occurrence per IRI
        # wins; stop after max_mappings distinct IRIs.
        seen: set[str] = set()
        for score, k in cands:
            if len(seen) == max_mappings:
                break
            iri = target_iris[k]
            if iri in seen:
                continue
            seen.add(iri)
            rows.append(
                {
                    "source_term": source_terms[i],
                    "source_term_id": source_term_ids[i],
                    "mapped_term_label": target_display_labels[k],
                    "mapped_term_iri": iri,
                    "mapping_score": round(score, 3),
                }
            )
    return rows
