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


def test_stream_budget_crawl_delay_parity_with_batch(spark, tmp_path):
    """Round-5 twin parity: with crawl-delay budgets active, the stream's
    admitted set equals the batch politeness operator's on the same input —
    across Arrow chunk boundaries (tiny batches force many chunks/group).
    The batch side is ordered on bare url_hash (the stream's documented
    admission order; cross-batch priority order stays batch-loop-only)."""
    from bodhium_webscrapper_spark.operators.politeness import (
        per_host_budget,
        with_crawl_delay_budget,
    )

    src = os.path.join(str(tmp_path), "pages5")
    df = _write_pages(spark, src)  # hosts h0..h4, 40 rows each
    robots = spark.createDataFrame(
        [("h1.example", 2000), ("h3.example", 10000)],
        "host string, crawl_delay_ms int",
    )  # wave 10s: h1 -> budget 5, h3 -> budget 1, others default
    static = df.withColumn("host", F.parse_url("url", F.lit("HOST"))).select(
        "host", "url", "url_hash"
    )
    batch = per_host_budget(
        with_crawl_delay_budget(static, robots, 7, 10_000),
        7,
        order_by=[F.col("url_hash").asc()],
        budget_col="_host_budget",
    )
    exp = sorted((r.host, r.url) for r in batch.select("host", "url").collect())

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        urls = stream_pages(spark, src).select(
            F.parse_url("url", F.lit("HOST")).alias("host"), "url", "url_hash"
        )
        gated = with_crawl_delay_budget(urls, robots, 7, 10_000)
        q = _run_stream(
            stream_per_host_budget(gated, 7, budget_col="_host_budget"),
            "budget_delay_sink",
            os.path.join(str(tmp_path), "ck5"),
        )
        got = sorted(
            (r.host, r.url)
            for r in spark.sql("select host, url from budget_delay_sink").collect()
        )
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == exp
    # and the reduced budgets really bound the per-host admissions
    per_host = {}
    for h, _u in got:
        per_host[h] = per_host.get(h, 0) + 1
    assert per_host["h1.example"] == 5 and per_host["h3.example"] == 1
    assert per_host["h0.example"] == 7
