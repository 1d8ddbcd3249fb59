"""Round-3 fix regressions: retry-budget carry through dedup, robots join
strategy cutover, compaction idempotence/atomicity, SnapshotStore local-FS
contract, JVM magic sniffing, and single-execution funnel stages."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dedup_first_wins_preserves_retry_budget(spark):
    """A pending retry rediscovered as a fresh outlink must keep its retry
    count (max over the group), whichever row wins the priority order —
    otherwise re-linked permanently-missing URLs never exhaust max_retries."""
    from bodhium_webscrapper_spark.plans.frontier import dedup_first_wins_frontier

    rows = [
        # (url_hash, canonical_url, host, depth, priority, retry_count)
        (1, "https://a/x", "a", 2, 1.0, 2),   # the pending retry
        (1, "https://a/x", "a", 3, 0.5, 0),   # rediscovered outlink, lower prio
        (2, "https://a/y", "a", 1, 2.0, 0),   # rediscovery wins on priority...
        (2, "https://a/y", "a", 4, 0.25, 1),  # ...but retry budget must survive
    ]
    df = spark.createDataFrame(
        rows,
        "url_hash long, canonical_url string, host string, depth int, "
        "priority double, retry_count int",
    )
    out = {r.url_hash: r for r in dedup_first_wins_frontier(df).collect()}
    assert len(out) == 2
    assert out[1].priority == 1.0 and out[1].retry_count == 2
    assert out[2].priority == 2.0 and out[2].retry_count == 1


def test_robots_gate_shuffle_strategy(spark):
    """Above the broadcast threshold the gate must switch to a shuffle join
    with identical results (plan flips, semantics don't)."""
    from bodhium_webscrapper_spark.operators.robots import robots_gate

    df = spark.createDataFrame(
        [("a.example", "https://a.example/private/x"),
         ("a.example", "https://a.example/public"),
         ("b.example", "https://b.example/private/x")],
        ["host", "canonical_url"],
    )
    robots = spark.createDataFrame(
        [("a.example", ["/private"], 0)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    bcast = robots_gate(df, robots, strategy="broadcast")
    shuf = robots_gate(df, robots, strategy="shuffle")
    assert sorted(r.canonical_url for r in bcast.collect()) == sorted(
        r.canonical_url for r in shuf.collect()
    )
    assert "BroadcastHashJoin" in plan_of(bcast)
    p = plan_of(shuf)
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p
    with pytest.raises(ValueError):
        robots_gate(df, robots, strategy="nope")


def test_crawljob_flips_robots_strategy(spark, crawl_fixture, tmp_path):
    """CrawlJob's one-time rules count must pick the shuffle gate above the
    threshold, and the crawl output must be identical either side of it."""
    from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob

    seeds = spark.read.parquet(crawl_fixture["seeds"])
    robots = spark.read.parquet(crawl_fixture["robots"])
    lo = CrawlJob(
        spark, crawl_fixture["pages"], seeds, robots,
        CrawlConfig(robots_broadcast_threshold=0, max_waves=2),
        os.path.join(str(tmp_path), "rs_lo"),
    )
    hi = CrawlJob(
        spark, crawl_fixture["pages"], seeds, robots,
        CrawlConfig(max_waves=2),
        os.path.join(str(tmp_path), "rs_hi"),
    )
    assert lo._robots_strategy == "shuffle"
    assert hi._robots_strategy == "broadcast"
    lo.run()
    hi.run()
    a = [(r.wave, r.seq, r.canonical_url) for r in lo.crawl_order().collect()]
    b = [(r.wave, r.seq, r.canonical_url) for r in hi.crawl_order().collect()]
    assert a == b and len(a) > 0


def test_compact_deltas_same_wave_noop_and_atomic(spark, tmp_path):
    """Re-compacting at the same upto_wave must be a no-op (the rewrite
    would otherwise scan the very base directory it deletes), and the base
    must land via tmp-dir + atomic rename."""
    from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore

    store = SnapshotStore(os.path.join(str(tmp_path), "st"))
    for w in range(3):
        store.write(w, "scheduled", spark.range(w * 10, w * 10 + 10))
    store.compact_deltas(spark, "scheduled", 1)
    base = store.compact_dir("scheduled", 1)
    assert os.path.exists(base) and not os.path.exists(base + ".tmp")
    stamp = os.path.getmtime(base)
    listing = sorted(os.listdir(base))

    store.compact_deltas(spark, "scheduled", 1)  # same wave → no-op
    assert os.path.getmtime(base) == stamp
    assert sorted(os.listdir(base)) == listing

    # compacted base + tail dir still reads the full delta set
    got = sorted(r.id for r in store.read_deltas(spark, "scheduled", 2).collect())
    assert got == list(range(30))

    # advancing the base works and re-registers
    store.compact_deltas(spark, "scheduled", 2)
    assert store.manifest()["compacted"]["scheduled"] == 2
    got = sorted(r.id for r in store.read_deltas(spark, "scheduled", 2).collect())
    assert got == list(range(30))


def test_snapshot_store_rejects_remote_root(tmp_path):
    from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore

    for bad in ("s3://bucket/ckpt", "hdfs://nn/ckpt"):
        with pytest.raises(ValueError, match="local filesystem"):
            SnapshotStore(bad)
    # file:// is local — accepted and normalized
    st = SnapshotStore("file://" + os.path.join(str(tmp_path), "ok"))
    assert os.path.isdir(st.root)


def test_magic_kind_jvm_sniff(spark):
    """Container-kind sniffing from magic bytes — pure JVM when-chain."""
    from bodhium_webscrapper_spark.functions.multimodal import magic_kind

    payloads = [
        (1, b"\x89PNG\r\n\x1a\nrest", "png"),
        (2, b"\xff\xd8\xffrest", "jpeg"),
        (3, b"RIFFxxxxWAVE", "riff"),
        (4, b"GIF89a", "gif"),
        (5, b"<html><body>", "html"),
        (6, b"<!DOCTYPE html>", "html"),
        (7, b"plain text", "unknown"),
        (8, b"", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in payloads], "id int, payload binary"
    )
    got = {r.id: r.kind for r in df.select("id", magic_kind(F.col("payload")).alias("kind")).collect()}
    assert got == {i: k for i, _, k in payloads}
    assert "EvalPython" not in plan_of(df.select(magic_kind(F.col("payload"))))


def test_funnel_stages_execute_once(spark, tmp_path):
    """The curation funnel's per-stage counts must read the previous stage's
    cache, not re-run the full upstream lineage (quality scoring + lang-id +
    dedup + LSH) from the source parquet — the jobs/dataset_job.py and
    __spark_entry__.q_curation_funnel discipline."""
    from bodhium_webscrapper_spark.functions.textstats import lang_id, quality_score
    from bodhium_webscrapper_spark.operators.dedup import exact_text_dedup

    src = os.path.join(str(tmp_path), "docs")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the and of to in is that with for was word"),
                 (F.col("id") % 50).cast("string")).alias("text"),
    ).write.parquet(src)
    docs = spark.read.parquet(src)

    scored = docs.withColumn("quality", quality_score(F.col("text"))).withColumn(
        "lang_pred", lang_id(F.col("text"))
    ).persist()
    try:
        scored.count()
        q1 = scored.filter(F.col("quality") >= 0.0)
        p1 = plan_of(q1)
        # the stage reads the cache: any parquet scan may appear only BELOW
        # the InMemoryRelation boundary (the cache-build plan explain echoes),
        # never in the live execution path above it
        assert "InMemoryTableScan" in p1
        assert "Scan parquet" not in p1.split("InMemoryRelation")[0]

        q3 = exact_text_dedup(q1, "text", "doc_id").persist()
        try:
            q3.count()
            p3 = plan_of(q3.groupBy().count())
            assert "InMemoryTableScan" in p3
            assert "Scan parquet" not in p3.split("InMemoryRelation")[0]
        finally:
            q3.unpersist()
    finally:
        scored.unpersist()
