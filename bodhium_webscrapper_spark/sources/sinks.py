"""Report/export sinks mirroring the reference's output surfaces.

- CSV sink: all-products / unique-products exports (``app.py:705-730``)
- JSON report: one nested document per run — session metadata, per-source
  URL rollups, token/cost accounting, product dedup stats
  (``/root/reference/app.py:732-814``) — computed as aggregations and
  rendered with ``to_json(struct(...))`` instead of driver-side dict
  building.
- JSON report reader (U3): the ``from_json`` edge back from a stored report
  string to typed columns (the reference's json.loads at report consumption,
  ``app.py:845-852`` RDS result parsing) — with PERMISSIVE corrupt-record
  handling so a malformed report row degrades to nulls, not a job failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REPORT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("total_scheduled", T.LongType()),
        T.StructField("distinct_urls", T.LongType()),
        T.StructField("pages_extracted", T.LongType()),
        T.StructField("bytes_extracted", T.LongType()),
        T.StructField("fetched_rows", T.LongType()),
        T.StructField("partitions_reporting", T.LongType()),
        T.StructField(
            "waves",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("wave", T.IntegerType()),
                        T.StructField("n_urls", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_report(df: DataFrame, report_col: str = "report") -> DataFrame:
    """U3: typed columns back out of a stored report JSON string.

    PERMISSIVE mode: malformed JSON yields a null struct (flagged via
    ``report_ok``) instead of failing the job — the scalable stance for a
    10^10-row pipeline where a handful of corrupt rows must not kill a run.
    """
    parsed = F.from_json(F.col(report_col), REPORT_SCHEMA, {"mode": "PERMISSIVE"})
    return df.withColumn("_parsed", parsed).select(
        F.col("_parsed.*"),
        # PERMISSIVE from_json maps malformed JSON to a struct of nulls (not
        # a null struct) — detect corruption via the always-present job_id
        F.col("_parsed.job_id").isNotNull().alias("report_ok"),
    )


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
