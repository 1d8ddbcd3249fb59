"""Structured Streaming tests: file source → stateful ops → memory sink,
all with availableNow triggers (bounded, no network)."""

import os

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.streaming.frontier_stream import (
    host_rate_metrics,
    stream_dedup_urls,
    stream_pages,
    stream_per_host_budget,
)


def _write_pages(spark, path, n=200):
    df = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5).cast("string"),
                 F.lit(".example/p"), (F.col("id") % 50).cast("string")).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), F.col("id").cast("string")), "utf-8").alias("html"),
        F.col("id").cast("string").alias("text"),
        F.lit("en").alias("lang"),
    ).withColumn("url_hash", F.xxhash64("url"))
    df.coalesce(4).write.mode("overwrite").parquet(path)
    return df


def _run_stream(q_df, name, ckpt, mode="append"):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedup(spark, tmp_path):
    src = os.path.join(str(tmp_path), "pages")
    _write_pages(spark, src)  # ids 0..199 → 50 distinct urls per host pattern
    pages = stream_pages(spark, src)
    q = _run_stream(
        stream_dedup_urls(pages), "dedup_sink", os.path.join(str(tmp_path), "ck1")
    )
    out = spark.sql("select * from dedup_sink")
    n_distinct = out.select("url_hash").distinct().count()
    assert out.count() == n_distinct  # exactly-once per url_hash
    assert n_distinct == 50  # 200 rows collapse to 50 distinct urls
    q.stop()


def test_stream_per_host_budget(spark, tmp_path):
    src = os.path.join(str(tmp_path), "pages2")
    _write_pages(spark, src)
    urls = stream_pages(spark, src).select(
        F.parse_url("url", F.lit("HOST")).alias("host"), "url", "url_hash"
    )
    q = _run_stream(
        stream_per_host_budget(urls, budget=7),
        "budget_sink",
        os.path.join(str(tmp_path), "ck2"),
    )
    out = spark.sql("select host, count(*) as n from budget_sink group by host").collect()
    assert len(out) == 5
    assert all(r.n <= 7 for r in out)  # cross-micro-batch budget respected
    q.stop()


def test_stream_per_host_budget_chunked_identical(spark, tmp_path):
    """The running top-`room` selection must be chunk-boundary-invariant:
    with tiny Arrow batches (many chunks per host group) the admitted rows
    equal the global sort+head of the whole group — and memory stays
    bounded at room + one chunk by construction."""
    src = os.path.join(str(tmp_path), "pages4")
    df = _write_pages(spark, src)
    expected = (
        df.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .select("host", "url", "url_hash")
        .toPandas()
        .sort_values(["host", "url_hash"], kind="mergesort")
        .groupby("host", sort=False)
        .head(7)
    )
    exp = sorted(map(tuple, expected[["host", "url"]].values.tolist()))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        urls = stream_pages(spark, src).select(
            F.parse_url("url", F.lit("HOST")).alias("host"), "url", "url_hash"
        )
        q = _run_stream(
            stream_per_host_budget(urls, budget=7),
            "budget_chunk_sink",
            os.path.join(str(tmp_path), "ck4"),
        )
        got = sorted(
            (r.host, r.url)
            for r in spark.sql("select host, url from budget_chunk_sink").collect()
        )
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == exp


def test_host_rate_metrics(spark, tmp_path):
    src = os.path.join(str(tmp_path), "pages3")
    _write_pages(spark, src)
    pages = stream_pages(spark, src)
    # complete mode: with availableNow the watermark never passes the last
    # windows before termination, so append would emit nothing
    q = _run_stream(
        host_rate_metrics(pages, window="1 minute"),
        "rate_sink",
        os.path.join(str(tmp_path), "ck3"),
        mode="complete",
    )
    out = spark.sql("select * from rate_sink")
    # 200 rows over 200 s → 4 windows × 5 hosts; totals must conserve
    assert out.agg(F.sum("n_pages")).first()[0] == 200
    assert out.select("host").distinct().count() == 5
    q.stop()
