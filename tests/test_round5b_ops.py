"""Round-5 continuation operators: SURT keys, multi-epoch upsampling,
sliding-window chunking, BPE pair census."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.functions.canonicalize import surt_key
from bodhium_webscrapper_spark.operators.mixing import epoch_upsample
from bodhium_webscrapper_spark.operators.packing import chunk_documents
from bodhium_webscrapper_spark.operators.quality import bpe_pair_census


# --------------------------------------------------------------- surt_key

def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.surt for r in df.select(surt_key(F.col("url")).alias("surt")).collect()
    ]


def test_surt_key_basic_and_scheme_blind(spark):
    got = _surt(
        spark,
        [
            "https://shop.example.com/a/b?q=1",
            "http://shop.example.com/a/b?q=1",  # scheme-blind: same key
            "https://example.org/",
        ],
    )
    assert got[0] == "com,example,shop)/a/b?q=1"
    assert got[1] == got[0]
    assert got[2] == "org,example)/"


def test_surt_key_null_for_non_urls(spark):
    got = _surt(spark, ["not a url", "relative/path"])
    assert got == [None, None]


def test_surt_key_groups_domains_contiguously(spark):
    """The property the key exists for: under lexicographic sort, every URL
    of a registrable domain occupies ONE contiguous run — hosts interleaved
    in URL order become contiguous in SURT order."""
    urls = [
        "https://a.shop.example/x",
        "https://z.other.test/1",
        "https://b.shop.example/y",
        "https://other.test/2",
        "https://shop.example/z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = (
        df.select("url", surt_key(F.col("url")).alias("surt"))
        .orderBy("surt")
        .collect()
    )
    doms = [
        "example,shop" if "example,shop" in r.surt else "test,other" for r in rows
    ]
    # one contiguous run per domain
    runs = 1 + sum(1 for a, b in zip(doms, doms[1:]) if a != b)
    assert runs == 2, (doms, [r.surt for r in rows])


# ---------------------------------------------------------- epoch_upsample

def _epoch_fixture(spark, n=400):
    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(n)], ["doc_id", "source"]
    )
    epochs = spark.createDataFrame(
        [("src0", 0), ("src1", 500_000), ("src2", 1_000_000), ("src3", 2_250_000)],
        ["source", "epoch_ppm"],
    )
    return docs, epochs


def test_epoch_upsample_copy_counts(spark):
    docs, epochs = _epoch_fixture(spark)
    out = epoch_upsample(docs, epochs).toPandas()
    # excluded source emits nothing; exact-integer epochs emit exactly that
    assert not (out.source == "src0").any()
    src2 = out[out.source == "src2"]
    assert (src2.n_copies == 1).all() and len(src2) == 100
    # 2.25 epochs: every doc gets 2 copies, ~25% get a third
    src3 = out[out.source == "src3"].groupby("doc_id").copy.count()
    assert set(src3.unique()) <= {2, 3} and len(src3) == 100
    frac3 = (src3 == 3).mean()
    assert 0.10 < frac3 < 0.45, frac3
    # 0.5 epochs: subsample, roughly half survive with exactly one copy
    src1 = out[out.source == "src1"]
    assert (src1.n_copies == 1).all()
    assert 25 < len(src1) < 75, len(src1)
    # copy indices are dense 0..n_copies-1 per doc
    dense = out.groupby(["doc_id", "n_copies"]).copy.agg(["min", "max", "count"])
    assert (dense["min"] == 0).all()
    assert (dense["max"] == dense["count"] - 1).all()


def test_epoch_upsample_stable_under_other_source_growth(spark):
    """md5-threshold selection: adding docs to another source never flips
    this source's fractional-copy survivors."""
    docs, epochs = _epoch_fixture(spark, n=200)
    before = {
        (r.doc_id, r.copy)
        for r in epoch_upsample(docs, epochs).filter(F.col("source") == "src1").collect()
    }
    grown = docs.union(
        docs.sparkSession.createDataFrame(
            [(10_000 + i, "src2") for i in range(300)], ["doc_id", "source"]
        )
    )
    after = {
        (r.doc_id, r.copy)
        for r in epoch_upsample(grown, epochs).filter(F.col("source") == "src1").collect()
    }
    assert before == after


def test_epoch_upsample_plan_is_broadcast_no_doc_shuffle(spark):
    docs, epochs = _epoch_fixture(spark)
    df = epoch_upsample(docs, epochs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


# --------------------------------------------------------- chunk_documents

def test_chunk_documents_covers_every_token_once_when_disjoint(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(103))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    out = (
        chunk_documents(docs, chunk_size=10)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    d1 = [r for r in out if r.doc_id == 1]
    assert [r.tok_start for r in d1] == [i * 10 for i in range(11)]
    assert d1[-1].tok_end == 103
    rebuilt = " ".join(r.chunk_text for r in d1)
    assert rebuilt == " ".join(f"t{i}" for i in range(103))
    assert [r.chunk_text for r in out if r.doc_id == 2] == ["a b"]
    assert not [r for r in out if r.doc_id == 3]  # blank doc emits nothing


def test_chunk_documents_overlap_and_tail(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    rows = (
        chunk_documents(docs, chunk_size=4, stride=2)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.tok_start, r.tok_end, r.chunk_text) for r in rows] == [
        (0, 4, "a b c d"),
        (2, 6, "c d e f"),
        (4, 7, "e f g"),
    ]
    # short doc: one chunk, not padded, not repeated
    short = chunk_documents(
        docs.sparkSession.createDataFrame([(9, "x y")], ["doc_id", "text"]),
        chunk_size=4,
        stride=2,
    ).collect()
    assert [(r.chunk_id, r.chunk_text) for r in short] == [(0, "x y")]


def test_chunk_documents_param_validation(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=4, stride=0)


def test_chunk_documents_plan_zero_shuffle_no_python(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        chunk_documents(docs, chunk_size=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# --------------------------------------------------------- bpe_pair_census

def test_bpe_pair_census_hand_counts(spark):
    docs = spark.createDataFrame(
        [(1, "hello hello world"), (2, "Hell on wheels!")], ["doc_id", "text"]
    )
    got = {r.pair: r.pair_count for r in bpe_pair_census(docs, k=50).collect()}
    # 'he': hello x2 + hell + wheels = 4; 'll': hello x2 + hell = 3
    assert got["he"] == 4 and got["el"] == 4
    assert got["ll"] == 3 and got["lo"] == 2
    assert got["wo"] == 1 and got["ee"] == 1
    assert "on" in got  # 2-char words still contribute their single pair
    # single-char words contribute nothing: no pair contains a space
    assert all(" " not in p and len(p) == 2 for p in got)


def test_bpe_pair_census_two_phase_plan(spark):
    """Char-pair explode must hang off the vocabulary aggregate (two
    HashAggregate pairs), with zero Python evaluation."""
    docs = spark.createDataFrame([(1, "some words here")], ["doc_id", "text"])
    plan = (
        bpe_pair_census(docs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert plan.count("Generate") >= 2  # token explode + per-word pair explode
    assert "TakeOrderedAndProject" in plan  # small-k top-k, no global sort
