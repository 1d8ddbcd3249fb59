"""Webtext quality-filter suite: Gopher repetition, C4 heuristics,
exact duplicate spans (operators/quality.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.quality import (
    c4_signals,
    duplicate_spans,
    gopher_repetition_signals,
)


def test_gopher_repetition_hand_computed(spark):
    # doc 1: 3 lines, line "a b" repeated twice -> 1 dup line of 3 chars;
    # top 2-gram "a b" occurs 3 times (2 dup lines + once inside line 3).
    rows = [
        (1, "a b\nc d e\na b"),
        (2, "x y z"),  # no dups anywhere
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           gopher_repetition_signals(df, "doc_id", "text").collect()}
    d1 = out[1]
    assert d1["n_lines"] == 3
    assert d1["dup_lines"] == 1
    assert d1["dup_line_chars"] == 3          # one extra "a b"
    assert d1["total_chars"] == 3 + 5 + 3
    # normalized tokens: a b c d e a b -> 2-grams: ab bc cd de ea ab -> "a b" x2
    assert d1["top2_count"] == 2
    assert d1["top2_cover"] == 2 * len("a b")
    d2 = out[2]
    assert d2["dup_lines"] == 0 and d2["dup_line_chars"] == 0
    assert d2["top2_count"] == 1


def test_c4_signals_flags(spark):
    rows = [
        (1, "one two three four five. six seven eight nine ten."),
        (2, "short {curly}"),
        (3, "lorem ipsum dolor sit amet consectetur adipiscing"),
        (4, "no terminal punctuation here at all six words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = c4_signals(F.col("text"), min_words=5)
    out = {r["doc_id"]: r.asDict() for r in
           df.select("doc_id", *[c.alias(n) for n, c in sig.items()]).collect()}
    assert out[1]["n_sentences"] == 2 and out[1]["c4_keep"]
    assert out[2]["has_curly"] and not out[2]["c4_keep"]
    assert out[3]["has_lorem"] and not out[3]["c4_keep"]
    # a no-punctuation doc is one unterminated segment: counted as a single
    # sentence (split semantics), but zero terminal lines
    assert out[4]["n_sentences"] == 1 and out[4]["n_terminal_lines"] == 0
    assert out[1]["n_terminal_lines"] == 1


def test_duplicate_spans_merge_and_counts(spark):
    # Shared 6-word run "p q r s t u" in docs 1 and 2 -> two overlapping
    # 5-gram starts that must merge into ONE maximal span of 6 words.
    shared = "p q r s t u"
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"one two three {shared} four five six seven"),
        (3, "nothing in common with anybody else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           duplicate_spans(df, "doc_id", "text", k=5, min_docs=2).collect()}
    assert set(out) == {1, 2}  # doc 3 has no cross-doc 5-gram
    for i in (1, 2):
        assert out[i]["n_spans"] == 1
        assert out[i]["dup_words"] == 6  # merged maximal span, word-exact
    assert out[1]["n_words"] == 12


def test_duplicate_spans_cache_handle_released(spark):
    """cache_occurrences=True must hand back the persisted occurrence
    table so the caller can unpersist it — otherwise each call pins a
    gram-scale table in the block store for the session's lifetime."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f h")], "doc_id long, text string"
    )
    out = duplicate_spans(df, "doc_id", "text", k=5, cache_occurrences=True)
    assert out.count() == 2
    cache = out.occurrence_cache
    assert cache.storageLevel.useMemory  # actually persisted
    cache.unpersist(blocking=True)
    assert not cache.storageLevel.useMemory
    # default path exposes no handle (nothing was persisted)
    plain = duplicate_spans(df, "doc_id", "text", k=5)
    assert not hasattr(plain, "occurrence_cache")


def test_duplicate_spans_plan_is_linear_jvm(spark):
    """No Python eval nodes and no cartesian/broadcast-nested-loop pair
    join — the span plan must stay linear in the corpus."""
    df = spark.createDataFrame(
        [(i, f"w{i} x y z a b c") for i in range(20)], "doc_id long, text string"
    )
    plan = (
        duplicate_spans(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dataset_job_gates_and_winnow(spark, tmp_path, monkeypatch):
    """The C4 and Gopher gates drop exactly the planted docs, counted in
    the funnel; winnow near-dedup drops the planted near-copy."""
    import json
    import sys

    from jobs.dataset_job import main

    base = ("the quick brown fox jumps over the lazy dog and then the dog "
            "chases the fox around the old barn for a while longer today")
    rows = [
        (1, base + "."),
        (2, base + ". with a tiny appended edit"),        # near-dup of 1
        (3, "lorem ipsum dolor sit amet " + base),        # C4: lorem
        (4, base + " { curly }"),                          # C4: curly brace
        (5, "dup line here\ndup line here\ndup line here\nx"),  # Gopher
        (6, "an entirely different sentence about parquet shuffles "
            "and broadcast joins that survives every single gate."),
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "cleaned")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    argv = ["dataset_job", "--input", src, "--output", out,
            "--min-quality", "-1", "--c4", "--max-dup-line-pct", "20",
            "--neardedup", "winnow", "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    # main() ends with spark.stop(); build_session getOrCreate hands it the
    # suite's shared session, so neuter stop for the in-process call
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert funnel["input"] == 6
    assert funnel["after_c4"] == 4          # 3 (lorem) and 4 (curly) dropped
    assert funnel["after_gopher"] == 3      # 5 (dup lines) dropped
    assert funnel["after_near_dedup"] == 2  # 2 dropped as near-dup of 1
    rows_out = spark.read.parquet(out).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in rows_out) == [1, 6]


def test_decontaminate_hand_computed(spark):
    from bodhium_webscrapper_spark.operators.quality import decontaminate

    # k=3 grams. bench holds "the quick brown fox jumps" (3 grams).
    # doc 1 == bench text -> 3/3 grams hit (contaminated at 70%).
    # doc 2 shares only "quick brown fox" -> 1/4 grams (25%, clean).
    # doc 3 is 2 words -> n_grams=0, never contaminated.
    docs = spark.createDataFrame(
        [
            (1, "The  Quick brown fox JUMPS"),  # normalization folds this
            (2, "a quick brown fox runs home"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(
            docs, bench, "doc_id", "text", "text", k=3, min_hit_pct=70
        ).collect()
    }
    assert out[1] == {
        "doc_id": 1, "n_grams": 3, "hit_grams": 3, "contaminated": True
    }
    assert out[2] == {
        "doc_id": 2, "n_grams": 4, "hit_grams": 1, "contaminated": False
    }
    assert out[3] == {
        "doc_id": 3, "n_grams": 0, "hit_grams": 0, "contaminated": False
    }


def test_decontaminate_plan_broadcasts_bench(spark):
    """The bench side must reach the corpus as a broadcast of distinct gram
    hashes — never a sort-merge join — and the whole plan stays JVM-side."""
    from bodhium_webscrapper_spark.operators.quality import decontaminate

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"),
                 F.lit(" a b c d e f g h i j")).alias("text"),
    )
    bench = spark.range(5).select(
        F.concat(F.lit("b"), F.col("id").cast("string"),
                 F.lit(" a b c d e f g h")).alias("text"),
    )
    out = decontaminate(docs, bench, "doc_id", "text", "text", k=8)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_soft404_signals_hand_cases(spark):
    from pyspark.sql import functions as F

    from bodhium_webscrapper_spark.operators.quality import soft404_signals

    long_tail = " ".join(f"w{i}" for i in range(80))
    rows = [
        (1, "error 404 page not found"),            # short error -> soft404
        (2, "a review of error 404 pages " + long_tail),  # long mention -> keep
        (3, "perfectly ordinary content here"),     # clean -> keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = soft404_signals(F.col("text"))
    got = {
        r.doc_id: (r.has_error_marker, r.is_soft404)
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in sig.items()]
        ).collect()
    }
    assert got == {1: (True, True), 2: (True, False), 3: (False, False)}


def test_dataset_job_soft404_gate(spark, tmp_path, monkeypatch):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    from jobs.dataset_job import main

    long_doc = (
        "an entirely different sentence about parquet shuffles and "
        "broadcast joins that survives every single gate today. "
        + " ".join(f"word{i}" for i in range(60))
    )
    other_doc = (
        "a completely separate essay on watermarking late events in "
        "structured streaming pipelines. "
        + " ".join(f"token{i}" for i in range(60))
    )
    rows = [
        (1, long_doc),
        (2, "sorry this page could not be found"),       # soft 404
        (3, other_doc + " footnote: error 404 happens."),  # long mention
    ]
    src = str(tmp_path / "docs_s404")
    out = str(tmp_path / "cleaned_s404")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    argv = ["dataset_job", "--input", src, "--output", out,
            "--min-quality", "-1", "--drop-soft404", "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert funnel["input"] == 3
    assert funnel["after_soft404"] == 2
    rows_out = spark.read.parquet(out).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in rows_out) == [1, 3]


def test_char_ngram_familiarity_flags_gibberish(spark):
    from bodhium_webscrapper_spark.operators.quality import (
        char_ngram_familiarity,
    )

    fluent = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, fluent + f" extra words here {i}") for i in range(1, 9)]
    rows.append((9, "qz xj vw kq zx jq wz vq"))  # gibberish bigrams
    rows.append((10, "a"))                        # too short: zero grams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in char_ngram_familiarity(
            df, "doc_id", "text", rare_threshold=5
        ).collect()
    }
    assert len(out) == 10  # every doc present, including the gram-less one
    assert out[10].n_grams == 0 and out[10].min_count is None
    # the gibberish doc's rare share dominates; fluent docs' doesn't
    gib = out[9].n_rare / out[9].n_grams
    flu = max(out[i].n_rare / out[i].n_grams for i in range(1, 9))
    assert gib > 0.8 and flu < 0.3
    assert out[9].min_count < 5


def test_mojibake_map_matches_cp1252_roundtrip(spark):
    """Every MOJIBAKE_MAP entry must be exactly the cp1252 mis-decode of
    its repaired form — the table is derived, not eyeballed."""
    from bodhium_webscrapper_spark.functions.textstats import MOJIBAKE_MAP

    for bad, good in MOJIBAKE_MAP:
        assert bad == good.encode("utf-8").decode("cp1252"), (bad, good)


def test_fix_mojibake_repairs_and_flags(spark):
    from pyspark.sql import functions as F

    from bodhium_webscrapper_spark.functions.textstats import (
        fix_mojibake,
        has_mojibake,
    )

    clean = "café “quoted… don’t – über «q»"
    damaged = clean.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, damaged), (2, clean), (3, "plain ascii text")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            fix_mojibake(F.col("text")).alias("fixed"),
            has_mojibake(F.col("text")).alias("flag"),
        ).collect()
    }
    assert rows[1].fixed == clean and rows[1].flag
    # already-clean and plain text pass through untouched, unflagged
    assert rows[2].fixed == clean and not rows[2].flag
    assert rows[3].fixed == "plain ascii text" and not rows[3].flag


def test_dataset_job_line_dedup_and_mojibake_transforms(spark, tmp_path, monkeypatch):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    from jobs.dataset_job import main

    clean = "café “quoted… don’t – über «q»"
    damaged = clean.encode("utf-8").decode("cp1252")
    banner = "subscribe to our newsletter for fresh updates"
    body1 = ("an essay about shuffle partitions and broadcast joins that "
             "survives every gate. " + " ".join(f"w{i}" for i in range(40)))
    body2 = ("a separate piece on watermarking and state stores in streams. "
             + " ".join(f"t{i}" for i in range(40)))
    rows = [
        (1, body1 + "\n" + banner),
        (2, body2 + "\n" + banner + "\n" + damaged),
    ]
    src = str(tmp_path / "docs_ld")
    out = str(tmp_path / "cleaned_ld")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    argv = ["dataset_job", "--input", src, "--output", out,
            "--min-quality", "-1", "--fix-mojibake",
            "--dedup-lines-min-docs", "2", "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert funnel["dup_lines_removed"] == 2  # the banner, from both docs
    got = {
        r.doc_id: r.text
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got[1] == body1                     # banner gone
    assert got[2] == body2 + "\n" + clean      # banner gone, mojibake fixed


def test_crawl_to_curate_pipeline_e2e(spark, crawl_fixture, tmp_path, monkeypatch):
    """The full engine story: crawl job -> extracted() text -> dataset job.
    The crawl's extracted output IS a valid curation input (url_hash as the
    doc id), and the funnel accounts for every extracted page."""
    import io
    import json
    import os
    import sys
    from contextlib import redirect_stdout

    from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob
    from jobs.dataset_job import main

    tmp = str(tmp_path)
    job = CrawlJob(
        spark,
        crawl_fixture["pages"],
        spark.read.parquet(crawl_fixture["seeds"]),
        spark.read.parquet(crawl_fixture["robots"]),
        CrawlConfig(max_waves=2, max_urls_per_host_per_wave=5,
                    global_wave_limit=200),
        os.path.join(tmp, "crawl"),
    )
    job.run()
    src = os.path.join(tmp, "extracted")
    extracted = job.extracted()
    n_extracted = extracted.count()
    assert n_extracted > 0
    extracted.write.parquet(src)

    out = os.path.join(tmp, "curated")
    argv = ["dataset_job", "--input", src, "--output", out,
            "--id-col", "url_hash", "--text-col", "text",
            "--min-quality", "-1", "--dedup-lines-min-docs", "2",
            "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert funnel["input"] == n_extracted
    # fixture pages share nav/boilerplate lines across docs -> the line
    # pass must remove something, and outputs keep the crawl's key
    assert funnel["dup_lines_removed"] > 0
    cur = spark.read.parquet(out)
    assert "url_hash" in cur.columns and "n_tokens" in cur.columns
    assert 0 < cur.count() <= n_extracted


def test_quality_classifier_hand_computed(spark):
    """Integer weight/score arithmetic checked by hand: apple appears 3x
    (2 ref) -> 666666 ppm, banana 1x ref -> 1000000, cherry 1x non -> 0."""
    from bodhium_webscrapper_spark.operators.quality import (
        score_quality_classifier,
        train_token_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "Apple apple, banana!", True),
            (2, "apple CHERRY", False),
            (3, "???", False),  # tokenizes to nothing
        ],
        "doc_id long, text string, is_ref boolean",
    )
    w = train_token_weights(docs, "text", "is_ref")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"])
        for r in score_quality_classifier(docs, "doc_id", "text", w).collect()
    }
    assert got == {
        1: (3, (666666 + 666666 + 1000000) // 3),
        2: (2, (666666 + 0) // 2),
        3: (0, None),
    }


def test_quality_classifier_separates_splits_on_corpus(spark):
    """Trained on the real documents table, mean score of the reference
    split must exceed the non-reference split (the filter is usable)."""
    import os

    import pytest

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} missing")
    from pyspark.sql import functions as F

    from bodhium_webscrapper_spark.operators.quality import (
        score_quality_classifier,
        train_token_weights,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            "doc_id",
            "text",
            (F.substring("source", 4, 10).cast("int") % 4 == 0).alias("is_ref"),
        )
    )
    w = train_token_weights(docs, "text", "is_ref")
    scored = score_quality_classifier(docs, "doc_id", "text", w).join(
        docs.select("doc_id", "is_ref"), "doc_id"
    )
    means = dict(
        scored.groupBy("is_ref").agg(F.avg("score_ppm").alias("m")).collect()
    )
    assert means[True] > means[False]


def test_dataset_job_model_gate(spark, tmp_path, monkeypatch):
    """--model-ref trains the hashed-token classifier on reference-vs-input
    and the gate drops the docs sharing no vocabulary with the reference."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    from jobs.dataset_job import main

    ref_rows = [(i, "parquet shuffle broadcast join executor stage task "
                    "partition schema column row filter") for i in range(4)]
    rows = [
        (1, "the parquet shuffle needs a broadcast join per stage and a "
            "schema for every column row and partition filter today"),
        (2, "zzz qqq xxx vvv kkk jjj www yyy uuu hhh zzz qqq xxx vvv kkk "
            "jjj www yyy uuu hhh"),  # vocabulary disjoint from reference
        (3, "executor task partition schema column row filter stage join "
            "broadcast shuffle parquet again and again and once more"),
    ]
    src = str(tmp_path / "docs")
    refp = str(tmp_path / "ref")
    out = str(tmp_path / "cleaned")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    spark.createDataFrame(
        ref_rows, "doc_id long, text string"
    ).write.parquet(refp)

    argv = ["dataset_job", "--input", src, "--output", out,
            "--min-quality", "-1", "--model-ref", refp,
            "--model-min-ppm", "300000", "--master", "local[4]"]
    monkeypatch.setattr(sys, "argv", argv)
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main() == 0
    funnel = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert funnel["input"] == 3
    assert funnel["after_model"] == 2       # doc 2 scores ~0 ppm
    assert funnel["after_near_dedup"] == 2
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 3]
    # gate internals never leak into the output contract
    assert "_model_ppm" not in spark.read.parquet(out).columns


def test_common_phrases_census_and_recovery(spark):
    """The planted footer's interior 5-grams win the census; singleton
    grams fall below min_docs; top-k compiles to TakeOrderedAndProject
    (per-partition top-k, no single-partition sort stage)."""
    from bodhium_webscrapper_spark.operators.quality import common_phrases

    footer = "subscribe to our weekly newsletter for updates"
    rows = [(i, f"doc {i} unique words here alpha{i} beta{i} " + footer)
            for i in range(20)]
    rows += [(100 + i, f"other {i} text entirely") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = common_phrases(df, "doc_id", "text", n=5, k=3, min_docs=10)
    got = out.collect()
    assert all(r["n_docs"] == 20 for r in got)  # only footer grams reach 20
    assert any("newsletter" in r["phrase"] for r in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
