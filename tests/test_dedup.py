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


# ---------------------------------------------------------------- winnowing

def _py_winnow(text, k=20, w=16, base=257, p=1_000_000_007):
    """Reference winnowing (Schleimer et al. SIGMOD'03), straight-line."""
    import re as _re

    t = _re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < k:
        return set()
    grams = []
    for i in range(len(t) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc * base + ord(t[i + j])) % p
        grams.append(acc)
    n_windows = max(len(grams) - w + 1, 1)
    return {min(grams[i : i + w]) for i in range(n_windows)}


def test_winnow_fingerprints_twin_parity(spark):
    """Spark HOF winnowing == pure-Python reference, incl. edge docs."""
    from bodhium_webscrapper_spark.operators.dedup import winnow_fingerprints

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "THE  quick   brown fox jumps over the lazy dog!"),
        (2, "a tiny short doc"),  # shorter than k: no fingerprints
        (3, "just over twenty chars!"),  # fewer than `window` grams: single min
        (4, None),  # NULL text: no rows, no NULL fingerprints
        (5, "spark shuffles, catalyst plans, tungsten codegen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {i: set() for i, _ in rows}
    for r in winnow_fingerprints(df, "doc_id", "text").collect():
        assert r["fp"] is not None
        got[r["doc_id"]].add(r["fp"])
    for i, t in rows:
        expected = _py_winnow(t) if t is not None else set()
        assert got[i] == expected, f"doc {i}"


def test_winnow_pairs_planted_and_containment(spark):
    """Edited near-dup is found; unrelated docs are not; containment gate
    (100*shared >= pct*least(n_a, n_b)) prunes weak overlaps."""
    from bodhium_webscrapper_spark.operators.dedup import winnow_pairs

    base = ("spark executes the logical plan with catalyst and tungsten "
            "whole stage codegen over columnar parquet batches while the "
            "shuffle service moves sorted partitions between executors")
    rows = [
        (1, base),
        (2, base + " plus a short appended edit"),  # near-dup of 1
        (3, "completely different text about breadth first crawl ordering "
            "politeness budgets robots gating and url canonicalization"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, "doc_id", "text", min_shared=3, hot_cap=100)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    strict = winnow_pairs(
        df, "doc_id", "text", min_shared=3, hot_cap=100,
        min_containment_pct=101,  # impossible: shared <= least(n_a, n_b)
    )
    assert strict.count() == 0


def test_winnow_plan_shapes(spark):
    """impl="hof" is pure JVM (no Python eval nodes; the bound-lambda
    staging keeps the gram array out of inlined projections); the default
    fast impl is Arrow-batched, never row-at-a-time."""
    from bodhium_webscrapper_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "some text for the plan")], "doc_id long, text string")
    hof = winnow_fingerprints(df, "doc_id", "text", impl="hof")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in hof and "ArrowEvalPython" not in hof
    fast = winnow_fingerprints(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in fast and "BatchEvalPython" not in fast


def test_winnow_fast_twin_equals_hof(spark):
    """The numpy/Arrow winnowing pass must produce the identical
    fingerprint set as the pure-JVM HOF expression (same integers, same
    docs) — the strip_boilerplate_re twin-discipline applied here."""
    from bodhium_webscrapper_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(i, f"w{i} the quick brown fox jumps over dog number {i % 7} "
              f"and then runs around the barn {i % 3} more times") for i in range(60)]
        + [(100, "a tiny short doc"), (101, None),
           # non-ASCII: the fast twin's utf-32 codepoints must equal the
           # HOF ascii()-per-char definition beyond the ASCII plane too
           (102, "café naïve résumé — über "
                 "straße élève garçon à côté "
                 "du château pâté crème brûlée")],
        "doc_id long, text string",
    )
    a = {(r["doc_id"], r["fp"]) for r in
         winnow_fingerprints(docs, "doc_id", "text", impl="hof").collect()}
    b = {(r["doc_id"], r["fp"]) for r in
         winnow_fingerprints(docs, "doc_id", "text", impl="fast").collect()}
    assert a == b and len(a) > 0


def test_hamming_neardup_recall_guarantee(spark):
    """Pigeonhole recall: EVERY pair at hamming <= max is found, including
    pairs whose differing bits straddle several bands; pairs beyond max are
    verified away even when a band collides."""
    from bodhium_webscrapper_spark.operators.dedup import hamming_neardup_pairs

    def s64(v: int) -> int:  # wrap to the signed-long domain Spark stores
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123456789ABCDEF
    rows = [
        (0, s64(base)),
        (1, s64(base ^ 0b1)),                 # ham 1, low band
        (2, s64(base ^ (1 << 63))),           # ham 1, top band (sign bit)
        (3, s64(base ^ (1 << 15) ^ (1 << 16) ^ (1 << 47))),  # ham 3, 3 bands
        (4, s64(base ^ 0xF)),                 # ham 4: band-0 collision is
                                              # impossible but bands 1-3 match
                                              # -> candidate, verify kills it
        (5, 0x7EDCBA9876543210),              # unrelated
    ]
    df = spark.createDataFrame(rows, "id long, sig long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, "id", "sig", max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 1
    assert pairs[(0, 2)] == 1
    assert pairs[(0, 3)] == 3
    assert (0, 4) not in pairs  # ham 4 > max: verify rejects the candidate
    assert all(5 not in p for p in pairs)
    # symmetric closure of the planted neighbors, all <= 3 apart pairwise?
    # (1,2): differ in 2 bits -> must also be found
    assert pairs[(1, 2)] == 2


def test_hamming_neardup_rejects_too_few_bands(spark):
    import pytest as _pytest

    from bodhium_webscrapper_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame([(1, 2)], "id long, sig long")
    with _pytest.raises(ValueError):
        hamming_neardup_pairs(df, "id", "sig", max_hamming=3, n_bands=3)
