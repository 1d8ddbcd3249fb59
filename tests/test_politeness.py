"""Per-host budget window: exactness under salting + skew behavior."""

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.politeness import per_host_budget
from bodhium_webscrapper_spark.operators.robots import robots_gate
from bodhium_webscrapper_spark.operators.union import (
    source_priority_union,
    source_priority_union_df,
)


def _frontier(spark, n=2000):
    # megahost gets half the rows (skew), others spread over 20 hosts
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("megahost.example"))
        .otherwise(F.concat(F.lit("host"), (F.col("id") % 20).cast("string")))
        .alias("host"),
        F.concat(F.lit("https://h/p"), F.col("id")).alias("canonical_url"),
        F.xxhash64(F.concat(F.lit("p"), F.col("id"))).alias("url_hash"),
        (F.col("id") % 7).cast("double").alias("priority"),
    )


def test_budget_respected_and_salting_exact(spark):
    df = _frontier(spark)
    unsalted = per_host_budget(df, 10, salt_buckets=1)
    salted = per_host_budget(df, 10, salt_buckets=16)
    a = sorted(r.url_hash for r in unsalted.collect())
    b = sorted(r.url_hash for r in salted.collect())
    assert a == b  # salting is a pure physical optimization
    counts = salted.groupBy("host").count().collect()
    assert all(r["count"] <= 10 for r in counts)
    # top-k really is top-priority-first
    mega = salted.filter(F.col("host") == "megahost.example").collect()
    assert all(r.priority == 6.0 for r in mega)


def test_robots_gate(spark):
    df = spark.createDataFrame(
        [
            ("a.example", "https://a.example/private/x"),
            ("a.example", "https://a.example/public"),
            ("b.example", "https://b.example/private/x"),
        ],
        ["host", "canonical_url"],
    )
    robots = spark.createDataFrame(
        [("a.example", ["/private"], 0)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    kept = sorted(r.canonical_url for r in robots_gate(df, robots).collect())
    # b.example has no rules → allowed
    assert kept == ["https://a.example/public", "https://b.example/private/x"]


def test_source_priority_union(spark):
    empty = spark.createDataFrame([], "url string")
    sitemap = spark.createDataFrame([("s1",), ("s2",)], ["url"])
    cc = spark.createDataFrame([("c1",)], ["url"])
    # sitemap non-empty → cc ignored (app.py:305-374 fallback semantics)
    assert {r.url for r in source_priority_union([sitemap, cc]).collect()} == {"s1", "s2"}
    assert {r.url for r in source_priority_union([empty, cc]).collect()} == {"c1"}
    assert {r.url for r in source_priority_union_df([empty, cc, sitemap]).collect()} == {"c1"}
    assert {r.url for r in source_priority_union_df([sitemap, cc]).collect()} == {"s1", "s2"}
