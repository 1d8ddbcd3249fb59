"""Upsert / job-registry operators (reference Postgres sinks re-expressed).

The reference upserts products row-at-a-time — ``SELECT by product_hash``
then ``INSERT ... RETURNING`` (``/root/reference/RDS/app.py:446-508``) — and
maintains a job registry with status transitions + trigger-stamped
timestamps (``RDS/app.py:256-444``). On Iceberg these are single
``MERGE INTO`` statements; on the parquet snapshot shim we express the same
semantics as set operations:

- new rows        = staged LEFT-ANTI existing on the hash key   [J2]
- merged snapshot = existing ∪ new                              [S10]
- ingest stats    = counts of new / existing / linked           [A7]
- link table      = dropDuplicates append                       [J3]
- status update   = column rewrite with completed_at stamping   [S11]

Determinism: timestamps are injected by the caller (never current_timestamp
in the data plane).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRODUCT_COLS = [
    "productname", "description", "current_price", "original_price",
    "rating", "review", "image_url", "source_url",
]


def valid_products(products: DataFrame) -> DataFrame:
    """P8: drop rows unusable as products — blank/missing name or source
    URL (the reference skips these before its row-at-a-time upsert,
    RDS/app.py:446-470; here one vectorized filter)."""
    return products.filter(
        F.col("productname").isNotNull()
        & (F.trim(F.col("productname")) != "")
        & F.col("source_url").isNotNull()
        & (F.trim(F.col("source_url")) != "")
    )


def truncate_content(col, max_chars: int = 4000):
    """P9: cap a text column at ``max_chars`` characters (the reference
    truncates page text before LLM submission, app.py:255-270). Pure JVM
    substring — safe in the hot path."""
    return F.substring(col, 1, max_chars)


def with_product_hash(products: DataFrame) -> DataFrame:
    """sha256(name + source_url + current_price) — RDS/app.py:459-460."""
    return products.withColumn(
        "product_hash",
        F.sha2(F.concat_ws("", "productname", "source_url", "current_price"), 256),
    )


@dataclass
class UpsertResult:
    merged: DataFrame
    new_rows: DataFrame
    n_new: int
    n_existing: int
    cached: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the tagged-join cache once merged/new_rows have been
        materialized — long-lived sessions calling upsert per batch would
        otherwise accumulate pinned blocks."""
        if self.cached is not None:
            self.cached.unpersist()


def upsert_by_key(
    existing: DataFrame, staged: DataFrame, key: str, ts_col_value=None
) -> UpsertResult:
    """MERGE-INTO semantics: insert staged rows whose key is absent.

    ``ts_col_value``: optional literal/column for created_at/updated_at
    stamping (the trigger analogue, RDS/app.py:306-348).
    """
    # single pass: tag each staged row with key-existence via one left join,
    # persist the tagged set, and take both counts from one aggregation —
    # the old two-count formulation re-ran dropDuplicates + anti-join twice
    # (and a third time when `merged` was materialized)
    existing_keys = (
        existing.select(key).dropDuplicates([key]).withColumn("_exists", F.lit(True))
    )
    tagged = staged.dropDuplicates([key]).join(existing_keys, key, "left").persist()
    counts = tagged.agg(
        F.count(F.lit(1)).alias("n_staged"),
        F.coalesce(F.sum(F.when(F.col("_exists"), 1).otherwise(0)), F.lit(0)).alias(
            "n_existing"
        ),
    ).first()
    new_rows = tagged.filter(F.col("_exists").isNull()).drop("_exists")
    if ts_col_value is not None:
        new_rows = new_rows.withColumn("created_at", ts_col_value).withColumn(
            "updated_at", ts_col_value
        )
    merged = existing.unionByName(new_rows, allowMissingColumns=True)
    n_existing = int(counts["n_existing"])
    n_new = int(counts["n_staged"]) - n_existing
    return UpsertResult(
        merged=merged,
        new_rows=new_rows,
        n_new=n_new,
        n_existing=n_existing,
        cached=tagged,
    )


def link_table(pairs: DataFrame, left_key: str, right_key: str) -> DataFrame:
    """Many-to-many link rows, dup-safe (ON CONFLICT DO NOTHING analogue,
    RDS/app.py:494-498)."""
    return pairs.select(left_key, right_key).dropDuplicates([left_key, right_key])


def deterministic_job_id(raw: str) -> str:
    """P12 (RDS/app.py:350-366): pass through UUIDs, otherwise derive a
    deterministic uuid5(NAMESPACE_DNS, raw). Driver-side scalar — job ids
    are control-plane values, never data-plane columns."""
    import uuid

    try:
        return str(uuid.UUID(raw))
    except ValueError:
        return str(uuid.uuid5(uuid.NAMESPACE_DNS, raw))


JOB_STATUSES = ["JOB_CREATED", "JOB_RUNNING", "JOB_SUCCESS", "JOB_FAILED"]


def job_status_transition(
    jobs: DataFrame,
    job_id: str,
    new_status: str,
    at,  # Column or literal timestamp — injected for determinism
    error_message: str | None = None,
) -> DataFrame:
    """Status transition with completed_at stamping (RDS/app.py:417-444):
    completed_at is set only when entering a terminal status."""
    if new_status not in JOB_STATUSES:
        raise ValueError(f"unknown status {new_status}")
    is_target = F.col("job_id") == job_id
    terminal = new_status in ("JOB_SUCCESS", "JOB_FAILED")
    out = jobs.withColumn(
        "status", F.when(is_target, F.lit(new_status)).otherwise(F.col("status"))
    ).withColumn("updated_at", F.when(is_target, at).otherwise(F.col("updated_at")))
    if terminal:
        out = out.withColumn(
            "completed_at", F.when(is_target, at).otherwise(F.col("completed_at"))
        )
    if error_message is not None:
        out = out.withColumn(
            "error_message",
            F.when(is_target, F.lit(error_message)).otherwise(F.col("error_message")),
        )
    return out
