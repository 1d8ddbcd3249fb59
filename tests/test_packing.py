"""Sequence packing + mixture reweighting invariants (operators/packing.py,
operators/mixing.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bodhium_webscrapper_spark.operators.mixing import (
    PPM,
    mixture_keep_rates,
    mixture_select,
)
from bodhium_webscrapper_spark.operators.packing import (
    doc_token_offsets,
    pack_sequences,
)

SEQ_LEN = 64


@pytest.fixture(scope="module")
def docs(spark):
    # 200 docs, token counts 0..40 (incl. zero-token docs and docs longer
    # than SEQ_LEN via a few big outliers), unique ids
    rows = [(i, (i * 7) % 41) for i in range(200)]
    rows += [(1000 + i, SEQ_LEN * 3 + i) for i in range(3)]  # span >3 seqs
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_offsets_match_serial_cumsum(spark, docs):
    out = doc_token_offsets(docs, num_partitions=7).collect()
    out.sort(key=lambda r: r["doc_id"])
    acc = 0
    for r in out:
        assert r["g_off"] == acc, r
        acc += r["n_tokens"]


def test_pack_token_conservation_and_partition(spark, docs):
    packed = pack_sequences(docs, SEQ_LEN, num_partitions=5)
    rows = packed.collect()
    total = docs.agg(F.sum("n_tokens")).first()[0]
    # slices partition each doc's tokens exactly
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_sliced = 0
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["tok_start"])
        assert doc_rows[0]["tok_start"] == 0
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert a["tok_end"] == b["tok_start"]  # contiguous, no overlap
        n_sliced += doc_rows[-1]["tok_end"]
    assert n_sliced == total
    # every sequence is exactly full except the last
    per_seq: dict[int, int] = {}
    for r in rows:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # no holes
    for sid, n in per_seq.items():
        assert n == SEQ_LEN if sid != last else 0 < n <= SEQ_LEN
    # seq_pos is where the slice starts within its sequence: global offset
    # arithmetic must be consistent
    for r in rows:
        assert 0 <= r["seq_pos"] < SEQ_LEN
        assert 0 <= r["tok_start"] < r["tok_end"]


def test_pack_deterministic_across_partitionings(spark, docs):
    a = pack_sequences(docs, SEQ_LEN, num_partitions=3).collect()
    b = pack_sequences(docs.repartition(13), SEQ_LEN, num_partitions=11).collect()
    key = lambda r: (r["seq_id"], r["doc_id"])  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_no_single_partition_window(spark, docs):
    """The scale contract: the prefix sum must not plan a WindowExec (the
    unpartitioned-window form funnels the corpus through one task)."""
    plan = pack_sequences(docs, SEQ_LEN)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan  # the Arrow cumsum pass


def test_pack_zero_token_docs_emit_nothing(spark):
    docs = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(docs, 4).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_pack_rejects_bad_seq_len(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


# ---------------------------------------------------------------- mixing

@pytest.fixture(scope="module")
def corpus(spark):
    # three sources with counts 60 / 30 / 10
    rows = [(i, "a" if i < 60 else ("b" if i < 90 else "c")) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_keep_rates_anchor_and_ratios(spark, corpus):
    # target mix 50/25/25: source c (10 docs for a 25% share) is scarcest →
    # keeps 100%; b keeps ~(25/30)/(25/10)=1/3 of its docs scaled, etc.
    targets = spark.createDataFrame(
        [("a", 500_000), ("b", 250_000), ("c", 250_000)],
        "source string, target_ppm long",
    )
    rates = {r["source"]: r for r in mixture_keep_rates(corpus, targets).collect()}
    assert rates["c"]["keep_ppm"] == PPM  # the anchor source
    # integer replay of the spec arithmetic
    rs = {s: (rates[s]["target_ppm"] * PPM) // rates[s]["n_docs"] for s in rates}
    rmax = max(rs.values())
    for s in rates:
        assert rates[s]["ratio_scaled"] == rs[s]
        assert rates[s]["keep_ppm"] == (rs[s] * PPM) // rmax
        assert rates[s]["expect_kept"] == (
            rates[s]["n_docs"] * rates[s]["keep_ppm"]
        ) // PPM


def test_keep_rates_exact_past_double_precision(spark):
    """ratio_scaled * PPM can exceed 2^53, where double division rounds:
    floor(float(r*1e6)/float(r)) = 999_999 for r = 576_460_752_305 —
    regression for the anchor source silently keeping 999999/1e6 instead
    of the documented 100%. The arithmetic must be integer `div`."""
    docs = spark.createDataFrame(
        [(1, "big"), (2, "small"), (3, "small")],
        "doc_id long, source string",
    )
    # n_docs=1 for 'big' makes ratio_scaled = target_ppm * PPM exactly
    r = 576_460_752_305
    targets = spark.createDataFrame(
        [("big", r), ("small", 1)], "source string, target_ppm long"
    )
    rates = {x["source"]: x for x in mixture_keep_rates(docs, targets).collect()}
    assert rates["big"]["ratio_scaled"] == r * PPM
    assert rates["big"]["keep_ppm"] == PPM  # NOT 999_999
    assert rates["big"]["expect_kept"] == 1


def test_missing_target_drops_source(spark, corpus):
    targets = spark.createDataFrame(
        [("a", 500_000), ("b", 500_000)], "source string, target_ppm long"
    )
    kept = mixture_select(corpus, targets)
    assert kept.filter(F.col("source") == "c").count() == 0
    assert kept.filter(F.col("source") == "a").count() > 0


def test_select_deterministic_and_stable_under_growth(spark, corpus):
    """Adding docs to one source must not flip another source's survivors
    (the keep decision depends only on doc_id and that source's rate)."""
    targets = spark.createDataFrame(
        [("a", 500_000), ("b", 250_000), ("c", 250_000)],
        "source string, target_ppm long",
    )
    base = {
        r["doc_id"]
        for r in mixture_select(corpus, targets).filter(F.col("source") == "c").collect()
    }
    grown = corpus.union(
        spark.createDataFrame([(10_000 + i, "a") for i in range(50)], corpus.schema)
    )
    after = {
        r["doc_id"]
        for r in mixture_select(grown, targets).filter(F.col("source") == "c").collect()
    }
    assert base == after  # c's rate unchanged (still the anchor), ids stable
    # and the whole selection is reproducible run-to-run
    again = {
        r["doc_id"]
        for r in mixture_select(corpus, targets).filter(F.col("source") == "c").collect()
    }
    assert base == again


def test_select_plan_broadcasts_rates_no_doc_shuffle(spark, corpus):
    targets = spark.createDataFrame(
        [("a", 500_000), ("b", 250_000), ("c", 250_000)],
        "source string, target_ppm long",
    )
    plan = (
        mixture_select(corpus, targets)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dataset_job_pack_stage(spark, tmp_path, monkeypatch):
    """--pack-seq-len writes a <output>_packed manifest over the CLEANED
    corpus whose slices conserve the funnel's token total, and reports
    n_sequences = ceil(tokens_total / seq_len)."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    from pyspark.sql import SparkSession

    from jobs.dataset_job import main

    rows = [
        (i, "spark shuffles " + " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(8)
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "cleaned")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    argv = ["dataset_job", "--input", src, "--output", out,
            "--min-quality", "-1", "--pack-seq-len", "16",
            "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    manifest = spark.read.parquet(out + "_packed").collect()
    assert funnel["pack_manifest_rows"] == len(manifest)
    sliced = sum(r["tok_end"] - r["tok_start"] for r in manifest)
    assert sliced == funnel["tokens_total"]
    n_seq = len({r["seq_id"] for r in manifest})
    assert n_seq == funnel["n_sequences"]
    assert funnel["n_sequences"] == -(-funnel["tokens_total"] // 16)
