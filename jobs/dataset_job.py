"""spark-submit entry for the training-data cleaning pipeline.

Runs the documents table through the standard web-text curation stages a
100 TB training-data pipeline needs (all engine operators):

  boilerplate strip (optional) → PII scrub (optional) →
  quality filter (C4/Gopher-style score) → language filter →
  exact dedup (md5 of normalized text) → near-dup removal (MinHash-LSH,
  exact-Jaccard-verified, keep-min-id survivor) → token accounting

Usage:
    spark-submit --py-files build/engine.zip jobs/dataset_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output build/cleaned --min-quality 0.2 --langs en \
        --jaccard 0.8 --pii-scrub --strip-boilerplate

Prints one JSON line with stage-by-stage row counts (the curation funnel).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.2)
    p.add_argument("--langs", default="", help="comma list; empty = keep all")
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--pii-scrub", action="store_true",
                   help="redact emails/SSNs/phones/IPv4s before scoring")
    p.add_argument("--strip-boilerplate", action="store_true",
                   help="drop copyright/nav/share chrome lines before scoring")
    p.add_argument("--master", default=os.environ.get("SPARK_MASTER", "local[*]"))
    args = p.parse_args()

    from pyspark.sql import functions as F

    from bodhium_webscrapper_spark.functions.textstats import (
        lang_id,
        pii_scrub,
        quality_score,
        strip_boilerplate,
        token_count,
    )
    from bodhium_webscrapper_spark.operators.dedup import (
        exact_text_dedup,
        minhash_lsh_pairs,
    )
    from bodhium_webscrapper_spark.session import build_session

    spark = build_session(master=args.master, app_name="dataset_job")
    docs = spark.read.parquet(args.input)
    # text rewrites happen BEFORE scoring so quality/lang see clean content;
    # both are narrow per-row column expressions fused into the scoring scan
    if args.strip_boilerplate:
        docs = docs.withColumn(args.text_col, strip_boilerplate(F.col(args.text_col)))
    if args.pii_scrub:
        docs = docs.withColumn(args.text_col, pii_scrub(F.col(args.text_col)))

    # Funnel discipline: every stage is persisted (MEMORY_AND_DISK) so its
    # prefix executes exactly once — a per-stage .count() without the cache
    # re-runs quality scoring + lang-id + dedup + LSH from the source
    # parquet, ~5x the whole pipeline at 100 TB. Caches are released as
    # soon as the next stage is materialized, so at most two stages are
    # resident at a time.
    scored = docs.withColumn("quality", quality_score(F.col(args.text_col))).withColumn(
        "lang_pred", lang_id(F.col(args.text_col))
    ).persist()
    funnel = {"input": scored.count()}

    kept = scored.filter(F.col("quality") >= args.min_quality)
    funnel["after_quality"] = kept.count()

    if args.langs:
        langs = [x.strip() for x in args.langs.split(",") if x.strip()]
        kept = kept.filter(F.col("lang_pred").isin(langs))
    funnel["after_lang"] = kept.count()

    kept = exact_text_dedup(kept, args.text_col, args.id_col).persist()
    funnel["after_exact_dedup"] = kept.count()
    scored.unpersist()
    deduped = kept

    # near-dup removal: survivor = min id of each near-dup pair component.
    # Pair→drop-list (greedy: drop the larger id of every verified pair) —
    # standard near-dedup policy, deterministic.
    pairs = minhash_lsh_pairs(
        deduped, args.id_col, args.text_col, jaccard_threshold=args.jaccard
    )
    drops = pairs.select(F.col("id_b").alias(args.id_col)).distinct()
    kept = deduped.join(drops, args.id_col, "left_anti")

    # final stage is WRITTEN (it is the job's output anyway); its row count
    # and token total come from the written files, not a recompute
    out = kept.withColumn("n_tokens", token_count(F.col(args.text_col)))
    out.write.mode("overwrite").parquet(args.output)
    deduped.unpersist()
    final = spark.read.parquet(args.output)
    funnel["after_near_dedup"] = final.count()
    funnel["tokens_total"] = final.agg(F.sum("n_tokens")).first()[0]
    print(json.dumps(funnel))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
