"""Dedup suite unit tests (exact / minhash-LSH / simhash / ngram-jaccard /
embedding near-dup)."""

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_text_dedup,
    first_wins_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today extra"),
    (3, "completely different text about spark dataframes and shuffle partitions here"),
    (4, "THE  QUICK brown fox jumps over the lazy dog near the river bank today"),
    (5, "another unrelated document mentioning parquet files and column pruning only"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_first_wins_dedup(spark):
    df = spark.createDataFrame(
        [("k1", 3), ("k1", 1), ("k2", 2), ("k1", 2)], ["k", "seq"]
    )
    out = first_wins_dedup(df, ["k"], [F.col("seq").asc()]).collect()
    assert {(r.k, r.seq) for r in out} == {("k1", 1), ("k2", 2)}


def test_exact_text_dedup(spark):
    # doc 4 is doc 1 modulo case/whitespace → exact dup under normalization
    out = exact_text_dedup(_docs(spark), "text", "doc_id")
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2, 3, 5}


def test_minhash_lsh_finds_neardups(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", n_hashes=32, bands=16, jaccard_threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert not any(3 in p or 5 in p for p in got)


def test_ngram_jaccard_threshold(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0  # identical after normalization
    assert 0.5 <= pairs[(1, 2)] < 1.0


def test_simhash_pairs(spark):
    got = {(r.id_a, r.id_b) for r in simhash_pairs(_docs(spark), "doc_id", "text").collect()}
    assert (1, 4) in got  # identical text → hamming 0
    assert not any((3 in p and 5 in p) for p in got)


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
        (4, [1.0, 0.0, 0.0, 0.0]),       # exact dup of 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(df, "vec_id", "embedding", threshold=0.99).collect()
    }
    assert (1, 4) in got and (1, 2) in got
    assert not any(3 in p for p in got)
