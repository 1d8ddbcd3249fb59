"""Per-partition lineage + metrics emission.

Reference analogues: ``CrawlMetrics`` pydantic rows accumulated in a Python
list (``/root/reference/app.py:74-82,226``) and DynamoDB orchestration events
(``app.py:817-860``, pk=job_id / sk=timestamp#uuid8). The engine emits both
as table rows, computed per *physical partition* (``spark_partition_id()``)
so a 1000-executor run reports balance/skew per task, not one blob per job.

Determinism note: partition ids depend on the physical plan, so metrics are
observability output, NOT part of the deterministic-resume contract (crawl
order and seen membership are; metrics are advisory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "job_id string, wave int, event_seq long, event string, "
    "partition_id int, details map<string,string>"
)


def partition_metrics(
    df: DataFrame,
    wave: int,
    stage: str,
    bytes_col: str | None = None,
) -> DataFrame:
    """(wave, stage, partition_id, rows, bytes) per physical partition."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if bytes_col is not None:
        aggs.append(F.coalesce(F.sum(F.length(F.col(bytes_col))), F.lit(0)).alias("bytes"))
    else:
        aggs.append(F.lit(0).cast("long").alias("bytes"))
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(*aggs)
        .select(
            F.lit(wave).alias("wave"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
            "bytes",
        )
    )


def lineage_event(
    spark: SparkSession,
    job_id: str,
    wave: int,
    event_seq: int,
    event: str,
    details: dict[str, str],
) -> DataFrame:
    """One orchestration-event row (analogue of app.py:829-837 put_item)."""
    row = [(job_id, wave, event_seq, event, -1, {k: str(v) for k, v in details.items()})]
    return spark.createDataFrame(row, LINEAGE_SCHEMA)
