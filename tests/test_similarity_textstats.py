"""Similarity search + text-analysis + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.functions.multimodal import (
    deterministic_media_fixture,
    extract_features,
    fake_decode,
    frame_sample_plan,
    real_decode_stub,
)
from bodhium_webscrapper_spark.functions.textstats import (
    lang_id,
    quality_score,
    token_count,
)
from bodhium_webscrapper_spark.operators.similarity import brute_force_topk, lsh_topk


def _emb(spark, n=200, dim=16):
    rng = np.random.RandomState(7)
    rows = [(i, rng.standard_normal(dim).astype(float).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_exact(spark):
    df = _emb(spark)
    out = brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    assert len(rows) == 12
    # verify against numpy ground truth for query 0
    data = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    q = data[0]
    sims = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in data.items() if i != 0
    }
    expected = [i for i, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    got = [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank) if r.query_id == 0]
    assert got == expected


def test_lsh_topk_reasonable_recall(spark):
    df = _emb(spark)
    queries = df.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(df, queries, k=3)
    approx = lsh_topk(df, queries, k=3, n_planes=2)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) > 0.3  # single-probe recall at n_planes=2


def test_lsh_multiprobe_recovers_one_bit_miss(spark):
    """Craft a near-neighbor whose bucket differs from its true neighbor's
    by EXACTLY one plane sign at n_planes=8: single-probe must miss it,
    multi-probe (1-bit-flip neighborhood) must surface it at rank 1."""
    n_planes, dim, seed = 8, 16, 42
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    powers = 1 << np.arange(n_planes)

    def bucket_of(v):
        return int(((v @ planes) > 0) @ powers)

    rng = np.random.RandomState(11)
    target = rng.standard_normal(dim)
    # deterministic scan for a small perturbation flipping exactly one bit
    query = None
    for trial in range(1000):
        cand = target + 0.15 * np.random.RandomState(1000 + trial).standard_normal(dim)
        if bin(bucket_of(cand) ^ bucket_of(target)).count("1") == 1:
            query = cand
            break
    assert query is not None, "no 1-bit-flip perturbation found (fixture broken)"

    corpus_rows = [(0, target.tolist())] + [
        (i, rng.standard_normal(dim).tolist()) for i in range(1, 120)
    ]
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame([(999, query.tolist())], ["vec_id", "embedding"])

    single = lsh_topk(corpus, queries, k=5, n_planes=n_planes, seed=seed)
    multi = lsh_topk(
        corpus, queries, k=5, n_planes=n_planes, seed=seed, multi_probe=True
    )
    assert 0 not in {r.neighbor_id for r in single.collect()}  # the miss
    m = {r.neighbor_id: r for r in multi.collect()}
    assert 0 in m and m[0].rank == 1  # recovered, and as the top hit
    # multi-probe candidates are a superset of single-probe's
    s_ids = {r.neighbor_id for r in single.collect()}
    assert s_ids <= set(m)


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is in the garden with a friend today ok"),
            (2, "der hund ist nicht mit der katze und der maus"),
            (3, "le chat est dans la maison avec le chien pour une"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_tok, r.lang, r.q)
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tok"),
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert out[1][0] == 13 and out[1][1] == "en"
    assert out[2][1] == "de"
    assert out[3][1] == "fr"
    assert out[4][0] == 0 and out[4][1] == "und"
    assert 0.0 <= out[1][2] <= 1.0


def test_media_features_shapes(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "bye")], ["doc_id", "text"])
    media = deterministic_media_fixture(docs, "text", "doc_id")
    feats = extract_features(media, "doc_id", "payload").collect()
    assert {r.media_id for r in feats} == {1, 2}
    assert all(r.feat_dim == 32 for r in feats)
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in feats)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"\x89PNG....")
    v = fake_decode(b"abc")
    assert v.shape == (32,) and abs(v.sum() - 1.0) < 1e-6


def test_frame_sample_plan_deterministic(spark):
    docs = spark.createDataFrame([(1, "video-bytes-a"), (2, "video-bytes-b")], ["doc_id", "text"])
    media = deterministic_media_fixture(docs, "text", "doc_id")
    a = sorted((r.media_id, r.frame_index) for r in frame_sample_plan(media, "doc_id", "payload").collect())
    b = sorted((r.media_id, r.frame_index) for r in frame_sample_plan(media, "doc_id", "payload").collect())
    assert a == b and len(a) > 0


def test_ivf_topk_recall(spark):
    from bodhium_webscrapper_spark.operators.similarity import ivf_topk

    df = _emb(spark)
    queries = df.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(df, queries, k=3)
    approx = ivf_topk(df, queries, k=3, n_centroids=8, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) > 0.4  # multi-probe IVF recall
    # determinism: same codebook, same result
    again = {(r.query_id, r.neighbor_id) for r in ivf_topk(df, queries, k=3, n_centroids=8, nprobe=3).collect()}
    assert a == again
