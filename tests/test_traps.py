"""Crawler-trap host detection (operators/traps.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.traps import trap_host_signals


def _rows(df):
    return {r["host"]: r.asDict() for r in df.collect()}


def test_trap_signals_hand_computed(spark):
    rows = [
        # trap.example: 3 urls, ONE fingerprint, looping /a/b/a/b/a paths
        ("trap.example", "https://trap.example/a/b/a/b/a/1", "fp0"),
        ("trap.example", "https://trap.example/a/b/a/b/a/2", "fp0"),
        ("trap.example", "https://trap.example/a/b/a/b/a/3", "fp0"),
        # ok.example: distinct content, shallow paths, one 3-param url
        ("ok.example", "https://ok.example/p/1", "fp1"),
        ("ok.example", "https://ok.example/p/2?x=1&y=2&z=3", "fp2"),
        ("ok.example", "https://ok.example/", "fp3"),
    ]
    df = spark.createDataFrame(rows, "host string, url string, fp string")
    out = _rows(trap_host_signals(df, "host", "url", "fp", min_urls=3))

    t = out["trap.example"]
    assert t["n_urls"] == 3 and t["n_fps"] == 1
    assert t["max_depth"] == 6          # a b a b a <id>
    assert t["n_repeat_urls"] == 3      # 'a' occurs 3x in every path
    assert t["is_trap"] is True

    o = out["ok.example"]
    assert o["n_urls"] == 3 and o["n_fps"] == 3
    assert o["max_depth"] == 2
    assert o["n_repeat_urls"] == 0
    assert o["max_params"] == 3
    assert o["is_trap"] is False


def test_trap_min_urls_gate(spark):
    # content collapse alone must not flag a host below the url floor
    # (20 urls / 1 fp = 5%, inside the 10% collapse threshold)
    rows = [("h", f"https://h/x/{i}", "same") for i in range(20)]
    df = spark.createDataFrame(rows, "host string, url string, fp string")
    assert _rows(trap_host_signals(df, "host", "url", "fp", min_urls=21))["h"][
        "is_trap"
    ] is False
    assert _rows(trap_host_signals(df, "host", "url", "fp", min_urls=20))["h"][
        "is_trap"
    ] is True


def test_trap_plan_single_agg_jvm_side(spark):
    """One linear scan + one host aggregate; HOFs stay JVM-side (no Python
    eval nodes) and partial aggregation is present (map-side combine)."""
    df = spark.range(200).select(
        F.concat(F.lit("h"), (F.col("id") % 4).cast("string")).alias("host"),
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    out = trap_host_signals(df, "host", "url", "fp")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2  # count_distinct expand + final host agg


def test_url_template_shapes(spark):
    """Hand-checked template generalization: hex before digits, query
    values masked with names/order kept, no-query URLs stay path-only."""
    from bodhium_webscrapper_spark.operators.traps import url_template

    cases = {
        "https://h.example/2024/03/item8234?page=7&sid=ab12cd34ef":
            "/N/N/itemN?page=V&sid=V",
        "https://h.example/s/deadbeef0123": "/s/H",     # hex run -> one H
        "https://h.example/s/dead": "/s/dead",          # <8 hex chars: kept
        "https://h.example/plain/path": "/plain/path",
        "https://h.example/a1b2/x?q=": "/aNbN/x?q=V",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["t"] for r in df.select("url", url_template(F.col("url")).alias("t")).collect()}
    assert got == cases


def test_url_template_census_minting_family(spark):
    """A minting family (distinct URLs, one template) is visible as
    n_distinct == n_urls under a single (host, template) row."""
    from bodhium_webscrapper_spark.operators.traps import url_template_census

    rows = [(f"https://t.example/cal/2024/{i}",) for i in range(50)]
    rows += [("https://t.example/about",)] * 3  # repeated fetches, one url
    df = spark.createDataFrame(rows, "url string")
    out = {r["template"]: r for r in url_template_census(df, "url").collect()}
    cal = out["/cal/N/N"]
    assert cal["n_urls"] == 50 and cal["n_distinct"] == 50  # minting shape
    ab = out["/about"]
    assert ab["n_urls"] == 3 and ab["n_distinct"] == 1
    plan = url_template_census(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
