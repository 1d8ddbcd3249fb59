"""Blocklist gate: domain bans cover subdomains (eTLD+1 match), substring
bans cover any URL, NULL hosts pass the domain gate, broadcast and shuffle
strategies are row-identical, and the crawl loop never schedules a banned
URL."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.blocklist import blocklist_gate


def _bl(spark):
    return spark.createDataFrame(
        [
            ("domain", "bad.example"),
            ("substring", "/casino/"),
            ("future-kind", "ignored"),  # unknown kinds must be ignored
        ],
        "kind string, pattern string",
    )


def _frontier(spark):
    rows = [
        (1, "bad.example", "https://bad.example/a"),          # banned domain
        (2, "www.bad.example", "https://www.bad.example/a"),  # subdomain ban
        (3, "deep.cdn.bad.example", "https://deep.cdn.bad.example/a"),
        (4, "good.example", "https://good.example/a"),         # survives
        (5, "good.example", "https://good.example/casino/x"),  # substring ban
        (6, None, "https://[weird]/a"),                        # NULL host
        (7, "goodbad.example", "https://goodbad.example/a"),   # NOT a subdomain
    ]
    return spark.createDataFrame(
        rows, "id long, host string, canonical_url string"
    )


def test_blocklist_gate_semantics(spark):
    kept = sorted(
        r["id"]
        for r in blocklist_gate(_frontier(spark), _bl(spark)).collect()
    )
    # 1-3 banned via eTLD+1, 5 via substring; NULL host and the
    # lookalike registrable domain survive
    assert kept == [4, 6, 7]


def test_blocklist_strategies_row_identical(spark):
    fr, bl = _frontier(spark), _bl(spark)
    b = sorted(r["id"] for r in blocklist_gate(fr, bl, strategy="broadcast").collect())
    s = sorted(r["id"] for r in blocklist_gate(fr, bl, strategy="shuffle").collect())
    assert b == s == [4, 6, 7]
    with pytest.raises(ValueError):
        blocklist_gate(fr, bl, strategy="nope")


def test_blocklist_never_fans_out(spark):
    """Duplicate blocklist rows must not duplicate frontier rows (anti-joins
    + the operator's defensive distinct)."""
    bl = spark.createDataFrame(
        [("domain", "bad.example")] * 3 + [("substring", "/casino/")] * 2,
        "kind string, pattern string",
    )
    out = blocklist_gate(_frontier(spark), bl)
    assert out.count() == out.select("id").distinct().count() == 3


def test_crawl_job_blocklist_gates_frontier(spark, crawl_fixture, tmp_path):
    """e2e: a blocklist banning one fixture domain removes every URL under
    it from the schedule, and total scheduled strictly drops vs ungated."""
    from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob

    pages = spark.read.parquet(crawl_fixture["pages"])
    # pick the fixture's busiest registrable domain so the ban must bite
    from bodhium_webscrapper_spark.functions.canonicalize import (
        host_of,
        registrable_domain,
    )

    top = (
        pages.select(registrable_domain(host_of(F.col("url"))).alias("d"))
        .groupBy("d").count().orderBy(F.desc("count")).first()["d"]
    )
    bl = spark.createDataFrame([("domain", top)], "kind string, pattern string")

    def run(workdir, blocklist):
        job = CrawlJob(
            spark,
            crawl_fixture["pages"],
            spark.read.parquet(crawl_fixture["seeds"]),
            spark.read.parquet(crawl_fixture["robots"]),
            CrawlConfig(max_waves=2, max_urls_per_host_per_wave=5,
                        global_wave_limit=200),
            os.path.join(str(tmp_path), workdir),
            blocklist=blocklist,
        )
        with redirect_stdout(io.StringIO()):
            summary = job.run()
        return job, summary

    job_g, gated = run("gated", bl)
    job_u, ungated = run("ungated", None)
    assert gated["total_scheduled"] < ungated["total_scheduled"]
    sched = job_g.crawl_order()
    hosts = sched.select(
        registrable_domain(host_of(F.col("canonical_url"))).alias("d")
    ).distinct()
    assert hosts.filter(F.col("d") == top).count() == 0
