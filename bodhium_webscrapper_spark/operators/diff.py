"""Crawl snapshot diff — classify URLs across two crawls of the same site.

The reference re-scrapes a site per job and overwrites state keyed on URL
(RDS MERGE upsert, /root/reference/RDS/app.py); the diff between two crawl
snapshots (what appeared, vanished, or changed) is the incremental-crawl
primitive a recurring 100 TB pipeline needs — it bounds re-fetch work to
the changed frontier instead of re-processing the whole corpus.

Shape: one FULL OUTER equi-join between the two snapshots on the URL key,
comparing content hashes. At scale both snapshots should be stored
bucketed on the join key (plans/bucketed_fetch.write_bucketed — the same
layout the fetch path amortizes), making the diff a zero-exchange
storage-partitioned join: each task streams two co-located sorted buckets.
Nothing else shuffles: the classification is a projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(key, status) for every URL in either snapshot.

    ``old`` / ``new`` carry one row per ``key`` with a content hash in
    ``hash_col`` (callers dedup first — first_wins_dedup — so the join is
    1:1 and output cardinality is |old ∪ new|).
    """
    o = old.select(F.col(key), F.col(hash_col).alias("_h_old"))
    n = new.select(F.col(key), F.col(hash_col).alias("_h_new"))
    j = o.join(n, key, "full_outer")
    status: Column = (
        F.when(F.col("_h_old").isNull(), F.lit(ADDED))
        .when(F.col("_h_new").isNull(), F.lit(REMOVED))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return j.select(F.col(key), status.alias("status"))


def diff_counts(diff: DataFrame) -> DataFrame:
    """Per-status row counts — the report row an incremental scheduler
    reads to size the next crawl's re-fetch budget."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_urls"))
