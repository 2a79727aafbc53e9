"""Embedding similarity search (task brief: brute-force cosine top-k
baseline + LSH-bucketed scale variant) over ``embeddings(vec_id,
embedding array<float>, label)``.

- ``cosine_topk``: exact baseline. Query set is a broadcast dimension; the
  dot product is a native ``zip_with``/``aggregate`` expression (JVM,
  codegen) over the crossJoin; top-k per query via window. Cost
  O(|queries| x |corpus|) — correct-by-construction reference.
- ``lsh_cosine_topk``: sign-random-projection (SimHash-for-vectors) buckets:
  deterministic pseudo-hyperplanes derived from md5 of (plane, dim) so the
  result is reproducible everywhere; candidates share >= 1 of ``tables``
  bucket keys; exact cosine re-ranks candidates. Recall < 1 by design —
  the scale path when the corpus won't fit a crossJoin.
- ``ivf_cosine_topk``: the IVF scale path — driver-trained deterministic
  spherical-k-means coarse quantizer, broadcast centroids, vectorized
  Arrow list assignment, n_probe/n_lists corpus fraction scanned.
- ``cosine_neardup_pairs`` / ``lsh_cosine_neardup_pairs``: embedding-cosine
  near-duplicate detection — exact all-pairs baseline + bucketed verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """queries(query_id, query_vec) x embeddings(vec_id, embedding) ->
    (query_id, vec_id, cosine) top-k per query, ties by vec_id asc.
    Vectors are cast to double before arithmetic (stable across engines)."""
    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = queries.select(
        "query_id", F.col("query_vec").cast("array<double>").alias("qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task brief): all (a, b),
    a < b, with cosine >= threshold. Exact all-pairs baseline — the
    correct-by-construction reference for the LSH variant; the self-join
    broadcasts one side, so use it for verification corpora only."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine_similarity_col(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    planes_per_table: int = 8,
    tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Scale path for near-dup pairs: sign-random-projection buckets (same
    deterministic hyperplanes as ``lsh_cosine_topk``) generate candidates —
    pairs sharing >= 1 of ``tables`` bucket keys — then the exact cosine
    verifies >= threshold. The only join is bucket-equi (AQE skew-splits
    hot buckets); recall < 1 by design, pinned by a recall test."""
    bucketed = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn(
        "bucket",
        F.explode(_bucket_keys_col(F.col("vec"), planes_per_table, tables, dim)),
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), "bucket"
    )
    cand = (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return cand.select(
        "vec_a",
        "vec_b",
        cosine_similarity_col(F.col("va"), F.col("vb")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def _train_centroids(sample, n_lists: int, iters: int):
    """Deterministic spherical k-means on a driver-side sample (numpy).
    Init = first n_lists sample vectors (the sample is taken in pinned
    vec_id order, so training is reproducible). Returns l2-normalized
    centroids (n_lists x dim)."""
    x = np.asarray(sample, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = x[:n_lists].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_lists):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def train_ivf_centroids(
    sample_src: DataFrame,
    n_lists: int = 16,
    sample_size: int = 2048,
    kmeans_iters: int = 8,
) -> "np.ndarray":
    """Train the IVF coarse quantizer from a (small) embeddings relation —
    deterministic: lowest ``sample_size`` vec_ids, fixed-iteration
    spherical k-means. At corpus scale this is called ONCE on a fixed
    training-sample TABLE and the centroids are reused across every
    ``ivf_cosine_topk`` call (the executable form of the contract the r3
    docstring only prescribed): the 100 TB corpus is never rescanned for
    training."""
    sample = [
        r["vec"]
        for r in sample_src.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("vec")
        )
        .orderBy("vec_id")
        .limit(sample_size)
        .collect()
    ]
    if not sample:
        # empty corpus: no lists to train — short-circuit instead of letting
        # numpy raise an opaque shape error downstream (r2 ADVICE)
        raise ValueError(
            "train_ivf_centroids: embeddings corpus is empty — nothing to "
            "index"
        )
    n_lists = min(n_lists, len(sample))
    return _train_centroids(sample, n_lists, kmeans_iters)


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    kmeans_iters: int = 8,
    centroids: "np.ndarray | None" = None,
    sample_table: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN (task brief's 'IVF variant as the scale path'): a coarse
    spherical-k-means quantizer partitions the corpus into ``n_lists``
    inverted lists; each query scans only its ``n_probe`` nearest lists,
    re-ranked by exact cosine.

    Physical shape: centroids are trained ONCE driver-side on a
    deterministic dimension-scale sample (lowest vec_ids — at corpus scale,
    a fixed training-sample table) and broadcast; list assignment is a
    vectorized Arrow pandas UDF (one numpy matmul per batch, no per-row
    Python); the probe join is list-id equi (queries broadcast), so the
    scanned fraction is ~n_probe/n_lists of the corpus instead of all of
    it. Recall < 1 by design — pinned by a recall test like the LSH path.

    Training contract at scale: pass ``centroids`` (from
    :func:`train_ivf_centroids`, trained once and reused across calls) or
    ``sample_table`` (a fixed small training relation) — otherwise each
    call samples the CORPUS, a TakeOrdered over every partition that is
    fine at test scale but a pointless repeated scan at 100 TB."""
    if centroids is None:
        centroids = train_ivf_centroids(
            sample_table if sample_table is not None else embeddings,
            n_lists, sample_size, kmeans_iters,
        )
    n_lists = int(centroids.shape[0])

    # centroid dots are rounded to 9dp before argmax/argsort: numpy's
    # BLAS (pairwise/SIMD summation) and a sequential SQL engine can land
    # ~1 ulp apart on near-tied dots, which would flip a list assignment
    # and make an independent replay disagree — the same cross-engine
    # ulp-tie pin as the TF-IDF rank (tfidf.py _score_one)
    @F.pandas_udf("integer")
    def assign_list(vec: pd.Series) -> pd.Series:
        x = np.asarray(list(vec), dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        dots = np.round(x @ centroids.T, 9)
        return pd.Series(np.argmax(dots, axis=1).astype("int32"))

    @F.pandas_udf("array<int>")
    def probe_lists(vec: pd.Series) -> pd.Series:
        x = np.asarray(list(vec), dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        # stable sort: equal dots keep ascending list_id, matching the
        # DuckDB oracle's ORDER BY dot DESC, list_id ASC tie rule
        dots = np.round(x @ centroids.T, 9)
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn("list_id", assign_list(F.col("vec")))
    q = queries.select(
        "query_id", F.col("query_vec").cast("array<double>").alias("qvec")
    ).withColumn("list_id", F.explode(probe_lists(F.col("qvec"))))
    scored = corpus.join(F.broadcast(q), "list_id").select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: coefficient (p, d)
    = signed 16-bit int from md5("p:d") — reproducible everywhere."""
    coeffs = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        v = int(h[:4], 16) - 32768
        coeffs.append(float(v))
    return coeffs


def _bucket_keys_col(vec, planes_per_table: int, tables: int, dim: int):
    """Array of per-table bucket keys: sign-bit string of the vector against
    each table's deterministic hyperplanes."""
    all_planes = [
        _hyperplane(t * planes_per_table + p, dim)
        for t in range(tables)
        for p in range(planes_per_table)
    ]
    planes_lit = F.array(*[F.array(*[F.lit(c) for c in pl]) for pl in all_planes])
    signs = F.transform(
        planes_lit, lambda pl: F.when(_dot(pl, vec) >= 0, "1").otherwise("0")
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(tables - 1)),
        lambda t: F.concat(
            t.cast("string"),
            F.lit("_"),
            F.array_join(
                F.slice(signs, t * planes_per_table + 1, planes_per_table), ""
            ),
        ),
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes_per_table: int = 8,
    tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Bucketed ANN: bucket key per table = sign-bit string over that
    table's hyperplanes; candidates = corpus rows sharing any table bucket
    with the query; exact cosine re-rank, top-k."""
    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn(
        "bucket",
        F.explode(_bucket_keys_col(F.col("vec"), planes_per_table, tables, dim)),
    )
    q = queries.select(
        "query_id", F.col("query_vec").cast("array<double>").alias("qvec")
    ).withColumn(
        "bucket",
        F.explode(_bucket_keys_col(F.col("qvec"), planes_per_table, tables, dim)),
    )
    cand = (
        corpus.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id", "qvec", "vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
