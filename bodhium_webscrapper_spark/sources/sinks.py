"""Report/export sinks mirroring the reference's output surfaces.

- CSV sink: all-products / unique-products exports (``app.py:705-730``)
- JSON report: one nested document per run — session metadata, per-source
  URL rollups, token/cost accounting, product dedup stats
  (``/root/reference/app.py:732-814``) — computed as aggregations and
  rendered with ``to_json(struct(...))`` instead of driver-side dict
  building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def csv_sink(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def crawl_report(
    crawl_order: DataFrame,
    extracted: DataFrame,
    metrics: DataFrame,
    job_id: str,
) -> DataFrame:
    """One-row DataFrame with a nested ``report`` JSON string (S8).

    Mirrors the reference report's sections (app.py:732-814): session
    summary (A4), per-wave rollup (A3-flavored), extraction byte totals
    (A5) — all computed as one aggregation plan.
    """
    per_wave = (
        crawl_order.groupBy("wave")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("wave")
        .agg(F.collect_list(F.struct("wave", "n_urls")).alias("waves"))
    )
    totals = crawl_order.agg(
        F.count(F.lit(1)).alias("total_scheduled"),
        F.countDistinct("canonical_url").alias("distinct_urls"),
    )
    ext = extracted.agg(
        F.count(F.lit(1)).alias("pages_extracted"),
        F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("bytes_extracted"),
    )
    met = metrics.agg(
        F.coalesce(F.sum(F.when(F.col("stage") == "fetched", F.col("rows"))), F.lit(0))
        .alias("fetched_rows"),
        F.countDistinct("partition_id").alias("partitions_reporting"),
    )
    row = (
        totals.crossJoin(ext).crossJoin(met).crossJoin(per_wave)
        .select(
            F.lit(job_id).alias("job_id"),
            F.to_json(
                F.struct(
                    F.lit(job_id).alias("job_id"),
                    F.col("total_scheduled"),
                    F.col("distinct_urls"),
                    F.col("pages_extracted"),
                    F.col("bytes_extracted"),
                    F.col("fetched_rows"),
                    F.col("partitions_reporting"),
                    F.col("waves"),
                )
            ).alias("report"),
        )
    )
    return row
