"""Training-data operators: dedup (exact/jaccard/minhash/simhash), ANN,
text stats, multimodal plumbing — semantics checks on constructed inputs
(the DuckDB bit-parity check lives in tools/check_entry.py / the driver gate).
"""

import math

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.operators import dedup as dd
from ontology_mapper_spark.operators import textstats as ts
from ontology_mapper_spark.operators.multimodal import (
    decode_image_features,
    frame_sample_plan,
)
from ontology_mapper_spark.operators.similarity import cosine_topk, lsh_cosine_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different content here entirely unrelated words"),
    (4, "the quick brown fox leaps over the lazy dog"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


@pytest.mark.spark
def test_exact_dedup(spark, docs):
    groups = {r["content_hash"]: r for r in dd.exact_dedup_groups(docs).collect()}
    dup = [g for g in groups.values() if g["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0
    assert len(groups) == 4


@pytest.mark.spark
def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()
    }
    assert pairs[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] < 1.0  # one word differs
    assert not any(3 in p for p in pairs)  # unrelated doc has no pair
    # hand-check doc0 vs doc1 (9 words, last differs): 7 shingles each,
    # shingles 1-6 shared (only the last contains word 9) -> 6/(7+7-6)
    assert math.isclose(pairs[(0, 1)], 6 / 8, abs_tol=1e-6)


@pytest.mark.spark
def test_minhash_lsh_finds_dups(spark, docs):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()
    }
    assert (0, 2) in cand  # identical docs share every band
    assert not any(3 in p for p in cand)


@pytest.mark.spark
def test_minhash_estimator_quality(spark):
    """The r4 one-digest multiply-add family must remain a faithful MinHash:
    the signature-agreement fraction estimates true shingle Jaccard.
    Deterministic corpus (fixed constants, fixed texts): 40 doc pairs with
    true Jaccard spread over (0, 1); with 16 hashes the estimator std is
    sqrt(J(1-J)/16) <= 0.125, so mean |error| across 40 pairs must be well
    under one std — a biased family (e.g. XOR 'permutations', which
    preserve high-bit ordering) fails this."""
    words = [f"w{i}" for i in range(30)]
    rows, truths = [], {}

    def shingle_set(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for p in range(40):
        base = [words[(p * 7 + j) % 30] for j in range(20)]
        # overlap varies with p: replace a p-dependent suffix
        cut = 3 + (p % 14)
        other = base[:cut] + [words[(p * 11 + j) % 30] for j in range(3, 23 - cut)]
        a, b = shingle_set(base), shingle_set(other)
        truths[p] = len(a & b) / len(a | b)
        rows.append((2 * p, " ".join(base)))
        rows.append((2 * p + 1, " ".join(other)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {
        r["doc"]: r["sig"]
        for r in dd.minhash_signatures(df, num_hashes=16, k=3).collect()
    }
    errs = []
    for p, truth in truths.items():
        agree = sum(
            x == y for x, y in zip(sigs[2 * p], sigs[2 * p + 1])
        ) / 16.0
        errs.append(abs(agree - truth))
    mean_err = sum(errs) / len(errs)
    assert mean_err < 0.11, f"mean |est-true| {mean_err:.3f} (errs={errs})"


@pytest.mark.spark
def test_simhash_properties(spark, docs):
    sh = {r["doc"]: r["simhash"] for r in dd.simhash_profile(docs).collect()}
    assert all(len(v) == 32 and set(v) <= {"0", "1"} for v in sh.values())
    assert sh[0] == sh[2]  # identical content
    ham01 = sum(a != b for a, b in zip(sh[0], sh[1]))
    ham03 = sum(a != b for a, b in zip(sh[0], sh[3]))
    assert ham01 < ham03  # near-dup closer than unrelated


@pytest.mark.spark
def test_simhash_neardup_pairs_matches_bruteforce(spark):
    """Pigeonhole candidates + exact hamming verify == brute force over all
    pairs (r3). 60 docs: 20 base texts, each with an exact dup and a
    one-word-changed variant."""
    base = [
        " ".join(f"w{i}x{j}" for j in range(25)) for i in range(20)
    ]
    rows = []
    did = 0
    for i, t in enumerate(base):
        rows.append((did, t)); did += 1
        rows.append((did, t)); did += 1  # exact dup -> distance 0
        rows.append((did, t.replace(f"w{i}x7", "CHANGED")), ); did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_neardup_pairs(docs, max_dist=1, bits=32).collect()
    }
    prof = {r["doc"]: r["simhash"] for r in dd.simhash_profile(docs).collect()}
    ids = sorted(prof)
    expect = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            d = sum(x != y for x, y in zip(prof[a], prof[b]))
            if d <= 1:
                expect[(a, b)] = d
    assert got == expect
    # every exact-dup pair is present at distance 0
    for i in range(20):
        assert got[(3 * i, 3 * i + 1)] == 0


@pytest.mark.spark
def test_cosine_topk_and_lsh_recall(spark):
    import random

    rnd = random.Random(7)
    base = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    rows = [(i, v, 0) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, q, k=5).collect()
    # self-match is rank 1 with cosine ~1
    for r in exact:
        if r["rk"] == 1:
            assert r["vec_id"] == r["query_id"]
            assert abs(r["cosine"] - 1.0) < 1e-9
    approx = lsh_cosine_topk(emb, q, k=5, planes_per_table=4, tables=8, dim=16)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact}
    # self-matches always survive LSH (identical vectors share all buckets)
    assert {(i, i) for i in range(3)} <= a
    # recall sanity: at 8 tables x 4 planes, most true neighbors survive
    assert len(a & e) / len(e) >= 0.5


@pytest.mark.spark
def test_textstats(spark, docs):
    stats = {r["doc"]: r for r in ts.token_stats(docs).collect()}
    assert stats[0]["n_words"] == 9
    assert stats[0]["n_distinct_words"] == 8  # 'the' twice
    qual = {r["doc"]: r for r in ts.quality_score(docs).collect()}
    assert all(0 <= r["quality"] <= 1 for r in qual.values())
    langs = {r["doc"]: r["pred_lang"] for r in ts.lang_id(docs).collect()}
    assert langs[0] == "en"
    fp = {r["doc"]: r["fingerprint"] for r in ts.doc_fingerprint(docs).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[3]


@pytest.mark.spark
def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [("m1", bytearray(b"\x89PNGfake1")), ("m2", bytearray(b"\x89PNGfake2"))],
        ["media_id", "content"],
    )
    out = decode_image_features(media).collect()
    assert {r["media_id"] for r in out} == {"m1", "m2"}
    for r in out:
        assert r["n_bytes"] == 9
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["width"] >= 64 and r["height"] >= 64
    # deterministic across runs
    out2 = decode_image_features(media).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # strict mode surfaces the stub honestly
    with pytest.raises(Exception):
        decode_image_features(media, strict=True).collect()
    plan = frame_sample_plan(media, every_n=5).collect()
    assert len(plan) == 20
    assert {r["frame_idx"] for r in plan} == set(range(0, 50, 5))


@pytest.mark.spark
def test_cosine_neardup_exact_and_lsh_recall(spark):
    """Near-dup pairs: the exact all-pairs operator finds every planted
    cluster pair; the LSH-bucketed variant keeps precision 1 by
    construction (exact verify) and recall >= 0.95 on genuine near-dups
    (cosine ~0.99 — the regime LSH banding is built for)."""
    import numpy as np

    from ontology_mapper_spark.operators.similarity import (
        cosine_neardup_pairs,
        lsh_cosine_neardup_pairs,
    )

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(40):  # 40 clusters x 3 near-identical members
        base = rng.randn(64)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.randn(64) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    # every planted intra-cluster pair found (3 per cluster), none across
    assert len(exact) == 40 * 3
    assert all(a // 3 == b // 3 for a, b in exact)

    got = {
        (r["vec_a"], r["vec_b"])
        for r in lsh_cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert got <= exact  # precision 1: every emitted pair exact-verified
    assert len(got) / len(exact) >= 0.95, len(got) / len(exact)


@pytest.mark.spark
def test_ngram_jaccard_bucket_guard(spark, docs):
    """max_bucket makes the verification-only contract executable: a hot
    shingle bucket raises at action time instead of fanning out."""
    # guard off / above the hottest bucket: identical results (the default
    # 10k cap is far above any fixture bucket, so it behaves like None here)
    base = {(r["doc_a"], r["doc_b"]) for r in
            dd.ngram_jaccard_pairs(docs, threshold=0.2, max_bucket=None).collect()}
    ok = {(r["doc_a"], r["doc_b"]) for r in
          dd.ngram_jaccard_pairs(docs, threshold=0.2, max_bucket=100).collect()}
    default = {(r["doc_a"], r["doc_b"]) for r in
               dd.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert ok == base == default and base
    # the shared shingle bucket across 4 near-identical docs exceeds cap 2
    with pytest.raises(Exception, match="max_bucket"):
        dd.ngram_jaccard_pairs(docs, threshold=0.2, max_bucket=2).collect()


@pytest.mark.spark
def test_ngram_jaccard_guard_default_on(spark):
    """The quadratic blow-up path raises BY DEFAULT (r2 VERDICT #9): >10k
    docs sharing one shingle trips the cap without any caller opt-in."""
    hot = spark.range(10_500).select(
        F.col("id").alias("doc_id"),
        F.lit("same same same same").alias("text"),
    )
    with pytest.raises(Exception, match="max_bucket"):
        dd.ngram_jaccard_pairs(hot, threshold=0.9).collect()


@pytest.mark.spark
def test_ivf_cosine_topk_recall(spark):
    """IVF ANN: on planted clusters, a query's cluster-mates land in its
    probed lists — recall@3 >= 0.9 vs exact; rows-per-query capped at k."""
    import numpy as np

    from ontology_mapper_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for c in range(30):  # 30 clusters x 4 members
        base = rng.randn(64)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + rng.randn(64) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=3)
    got = ivf_cosine_topk(emb, queries, k=3, n_lists=16, n_probe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    assert len(g & e) / len(e) >= 0.9, len(g & e) / len(e)
    per_q = {}
    for q, _v in g:
        per_q[q] = per_q.get(q, 0) + 1
    assert max(per_q.values()) <= 3


@pytest.mark.spark
def test_multimodal_resize_plumbing(spark):
    from ontology_mapper_spark.operators.multimodal import resize_images

    media = spark.createDataFrame(
        [("m1", b"\x89PNG fake bytes"), ("m2", b"\xff\xd8 other bytes")],
        ["media_id", "content"],
    )
    out = resize_images(media, target_w=64, target_h=32).collect()
    assert len(out) == 2
    import hashlib as h
    for r in out:
        assert (r["target_w"], r["target_h"]) == (64, 32)
        payload = bytes(r["resized"])
        assert payload.startswith(b"resized:64x32:")
        assert r["resized_sha"] == h.sha256(payload).hexdigest()
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_images(media, strict=True).collect()


@pytest.mark.spark
def test_multimodal_codec_injection(spark):
    """r2 VERDICT #10: the codec is injectable like the API transports — a
    caller-supplied callable runs inside the Arrow kernel and fully
    replaces the stub (strict mode included)."""
    import struct

    # toy wire format: 4-byte BE width, 4-byte BE height, then pixel bytes
    def toy_decode(data: bytes):
        w, h = struct.unpack(">II", data[:8])
        px = data[8:8 + 4]
        return w, h, [b / 255.0 for b in px]

    def toy_resize(data: bytes, tw: int, th: int) -> bytes:
        return struct.pack(">II", tw, th) + data[8:]

    payload = struct.pack(">II", 640, 480) + bytes(range(16))
    media = spark.createDataFrame(
        [("m1", bytearray(payload))], "media_id string, content binary"
    )
    row = decode_image_features(media, codec=toy_decode, strict=True).collect()[0]
    assert (row["width"], row["height"]) == (640, 480)
    assert row["feature"] == [pytest.approx(b / 255.0) for b in range(4)]

    from ontology_mapper_spark.operators.multimodal import resize_images

    r = resize_images(media, target_w=32, target_h=16, codec=toy_resize,
                      strict=True).collect()[0]
    assert bytes(r["resized"])[:8] == struct.pack(">II", 32, 16)
    assert bytes(r["resized"])[8:] == payload[8:]


@pytest.mark.spark
def test_multimodal_pillow_parity(spark):
    """Real-codec parity (skipped where Pillow is absent, as here): the
    injected Pillow codec must report true dimensions through the same
    distributed plumbing the stub uses."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from io import BytesIO

    from PIL import Image

    from ontology_mapper_spark.operators.multimodal import pillow_codecs

    buf = BytesIO()
    Image.new("RGB", (40, 30), (255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [("img1", bytearray(buf.getvalue()))],
        "media_id string, content binary",
    )
    decode, resize = pillow_codecs()
    row = decode_image_features(media, codec=decode).collect()[0]
    assert (row["width"], row["height"]) == (40, 30)
    from ontology_mapper_spark.operators.multimodal import resize_images

    r = resize_images(media, target_w=8, target_h=8, codec=resize).collect()[0]
    assert Image.open(BytesIO(bytes(r["resized"]))).size == (8, 8)


@pytest.mark.spark
def test_deterministic_sample_is_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(2000)], "doc_id long, text string"
    )
    s1 = {r["doc_id"] for r in dd.deterministic_sample(docs, 0.25).collect()}
    s8 = {
        r["doc_id"]
        for r in dd.deterministic_sample(docs.repartition(8), 0.25).collect()
    }
    assert s1 == s8  # membership is a pure function of the id
    assert 0.15 < len(s1) / 2000 < 0.35  # roughly the asked fraction
    # edges: 0 keeps nothing, 1 keeps everything
    assert dd.deterministic_sample(docs, 0.0).count() == 0
    assert dd.deterministic_sample(docs, 1.0).count() == 2000
    with pytest.raises(ValueError):
        dd.deterministic_sample(docs, 1.5)


@pytest.mark.spark
def test_neardup_clusters_matches_union_find(spark):
    """Min-label propagation == classic union-find, including a long chain
    (propagation must cross the whole component, not just one hop)."""
    pairs = (
        [(i, i + 1) for i in range(10, 20)]        # chain of 11 nodes
        + [(100, 101), (101, 102), (100, 102)]     # triangle
        + [(200, 300)]                              # simple pair
    )
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc"]: r["cluster_id"] for r in dd.neardup_clusters(pdf).collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in pairs:
        union(a, b)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expect = {}
    for members in comps.values():
        m = min(members)
        for n in members:
            expect[n] = m
    assert got == expect


@pytest.mark.spark
def test_ivf_precomputed_centroids_reused(spark):
    """r3 VERDICT #5: the training-sample contract is executable — train
    centroids ONCE (train_ivf_centroids) and reuse across calls; results
    are identical to the per-call training path (same deterministic
    sample), and a sample_table arg trains from a fixed relation instead
    of the corpus."""
    import numpy as np

    from ontology_mapper_spark.operators.similarity import (
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(32)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    cents = train_ivf_centroids(emb, n_lists=8, sample_size=128)
    r_default = ivf_cosine_topk(
        emb, queries, k=3, n_lists=8, n_probe=3, sample_size=128
    )
    r_reuse1 = ivf_cosine_topk(emb, queries, k=3, n_probe=3, centroids=cents)
    r_reuse2 = ivf_cosine_topk(emb, queries, k=3, n_probe=3, centroids=cents)
    rows_of = lambda df: sorted(
        (r["query_id"], r["vec_id"], round(r["cosine"], 9), r["rk"])
        for r in df.collect()
    )
    assert rows_of(r_default) == rows_of(r_reuse1) == rows_of(r_reuse2)

    # sample_table path: training reads the fixed relation, not the corpus
    sample_tbl = emb.filter(F.col("vec_id") < 128)
    r_tbl = ivf_cosine_topk(
        emb, queries, k=3, n_lists=8, n_probe=3, sample_size=128,
        sample_table=sample_tbl,
    )
    assert rows_of(r_tbl) == rows_of(r_default)


@pytest.mark.spark
def test_neardup_clusters_deep_chain_logarithmic(spark):
    """r3 VERDICT #6: pointer doubling bounds convergence at O(log
    diameter). A 200-node chain must resolve well inside 12 rounds (the
    pre-doubling propagation needed ~200 and raised the 50-iteration
    guard), every node labeled with the chain's minimum."""
    pairs = [(i, i + 1) for i in range(1000, 1200)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc"]: r["cluster_id"]
        for r in dd.neardup_clusters(pdf, max_iterations=12).collect()
    }
    assert len(got) == 201
    assert set(got.values()) == {1000}


@pytest.mark.spark
def test_whitespace_edge_tokens_never_enter_shingles_or_simhash(spark):
    """Spark's trim() strips only ASCII 0x20, so splitting on \\s+ leaves
    empty edge tokens when the text starts/ends with tabs or newlines —
    they must be filtered before shingling/hashing (r4 review finding:
    docs identical up to a trailing newline stopped colliding, and the
    dedup gate queries would diverge from the DuckDB oracle's
    empty-filtered tokenization)."""
    df = spark.createDataFrame(
        [
            (1, "asthma attack case"),
            (2, "asthma attack case\n"),
            (3, "\tasthma attack case"),
            (4, "\n asthma attack case \t"),
        ],
        ["doc_id", "text"],
    )
    sh = {
        r["doc_id"]: sorted(r["s"])
        for r in df.select(
            "doc_id", dd.word_shingles(F.col("text")).alias("s")
        ).collect()
    }
    assert sh[1] == sh[2] == sh[3] == sh[4] == ["asthma attack case"]
    sim = {r["doc"]: r["simhash"] for r in dd.simhash_profile(df).collect()}
    assert sim[1] == sim[2] == sim[3] == sim[4]


def test_minhash_constant_family_invariants():
    """The widened 64-pair family must keep every property the overflow
    and portability arguments rely on: A odd in [1, 2^30) (product stays
    under 2^62 — identical signed-64 arithmetic in Spark and DuckDB),
    B in [0, P), all pairs distinct, and the FIRST 16 pairs frozen
    forever (published signatures must not change)."""
    P = dd.MINHASH_P
    assert len(dd.MINHASH_A) == len(dd.MINHASH_B) == 64
    assert all(a % 2 == 1 and 1 <= a < 2**30 for a in dd.MINHASH_A)
    assert all(0 <= b < P for b in dd.MINHASH_B)
    assert max(dd.MINHASH_A) * (P - 1) + max(dd.MINHASH_B) < 2**63
    assert len(set(zip(dd.MINHASH_A, dd.MINHASH_B))) == 64
    assert dd.MINHASH_A[:4] == [152210629, 918217649, 658508023, 437712405]
    assert dd.MINHASH_B[:4] == [1481503688, 1706964142, 1430083405, 3503532737]


@pytest.mark.spark
def test_minhash_32_hashes(spark, docs):
    """num_hashes beyond the original 16 works and the first 16 slots of
    a wider signature equal the 16-hash signature (same frozen pairs)."""
    s16 = {r["doc"]: r["sig"] for r in dd.minhash_signatures(docs, num_hashes=16).collect()}
    s32 = {r["doc"]: r["sig"] for r in dd.minhash_signatures(docs, num_hashes=32).collect()}
    assert all(len(v) == 32 for v in s32.values())
    assert all(s32[d][:16] == s16[d] for d in s16)
