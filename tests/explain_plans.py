"""Physical-plan inspection: verify the plans are the ones we designed.

Checks (prints PASS/WARN per assertion; exits 1 on hard failures):
- parquet scans carry PushedFilters + pruned ReadSchema (no full-width reads)
- the fetch join is a BroadcastHashJoin with pages on the streamed side
- aggregations are partial+final (no single-stage global shuffles)
- non-UDF stages sit inside WholeStageCodegen spans

Usage: python tests/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bodhium_webscrapper_spark.session import build_session  # noqa: E402

FAILS = []


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, cond: bool, hard: bool = True):
    tag = "PASS" if cond else ("FAIL" if hard else "WARN")
    print(f"{tag}  {name}")
    if not cond and hard:
        FAILS.append(name)


def main():
    spark = build_session("local[4]", "explain", 4)
    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    # 1. filter + projection pushdown
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    check("pushdown: PushedFilters reaches parquet scan", "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p)
    check("pruning: ReadSchema only 3 cols", "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate" in p)

    # 2. fetch join shape: small side broadcast, big side streamed
    from bodhium_webscrapper_spark.sources.datagen import generate_crawl_fixture, prepare_pages
    fx = os.path.join(os.path.dirname(__file__), "..", "build", "fixtures")
    paths = generate_crawl_fixture(os.path.abspath(fx), n_pages=4000)
    pages_path = prepare_pages(spark, paths["pages_raw"], os.path.join(os.path.abspath(fx), "pages"), 8)
    pages = spark.read.parquet(pages_path).select("url_hash", "html")
    wave = spark.range(100).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
                                   F.lit("u").alias("canonical_url"))
    fetch = pages.join(F.broadcast(wave), "url_hash")
    p = plan_of(fetch)
    check("fetch join: BroadcastHashJoin", "BroadcastHashJoin" in p)
    check("fetch join: pages NOT shuffled (no Exchange hashpartitioning on pages scan side)",
          p.count("Exchange hashpartitioning") == 0)

    # 3. partial aggregation (map-side combine); codegen only shows in the
    # FINAL adaptive plan, so execute first
    agg = li.groupBy("l_returnflag").agg(F.sum(F.col("l_quantity").cast("long")).alias("s"))
    p = plan_of(agg)
    check("agg: partial+final HashAggregate pair", p.count("HashAggregate") >= 2)
    agg.collect()
    p = plan_of(agg)
    check("agg: whole-stage codegen present (final AQE plan)",
          "codegen id :" in p and "isFinalPlan=true" in p)

    # 4. textstats stay JVM-side (no BatchEvalPython / ArrowEvalPython)
    from bodhium_webscrapper_spark.functions.textstats import lang_id, quality_score, token_count
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    q = docs.select(token_count(F.col("text")), quality_score(F.col("text")), lang_id(F.col("text")))
    p = plan_of(q)
    check("textstats: zero Python eval nodes", "EvalPython" not in p)

    # 5. minhash signatures stay JVM-side
    from bodhium_webscrapper_spark.operators.dedup import distinct_shingles_col, minhash_signature
    q = docs.select(minhash_signature(distinct_shingles_col(F.col("text"), 3), 16))
    p = plan_of(q)
    check("minhash: zero Python eval nodes", "EvalPython" not in p)

    # 6. canonicalizer is Arrow-batched (ArrowEvalPython, NOT BatchEvalPython)
    from bodhium_webscrapper_spark.functions.canonicalize import with_canonical_url
    seeds = spark.createDataFrame([("https://x.example/a",)], ["url"])
    p = plan_of(with_canonical_url(seeds))
    check("canonicalizer: ArrowEvalPython (vectorized), not row-at-a-time",
          "ArrowEvalPython" in p and "BatchEvalPython" not in p)

    spark.stop()
    print(f"\n{len(FAILS)} hard failures")
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
