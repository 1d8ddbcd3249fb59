"""Per-host politeness budget — skew-proof top-k per host.

Reference analogue: the global ``MAX_URLS=100`` cap and the 1 s inter-URL
sleep (``/root/reference/app.py:303,973-974``) — one global queue, one host
at a time. The engine's politeness is a *per-host* budget per scheduling
wave: at most ``budget`` URLs per host, highest priority first.

Skew: a mega-host (20% of the frontier in the fixture) would make the naive
``row_number() over (partition by host)`` window a straggler — AQE fixes
join skew but not window skew. We use salted two-phase top-k:

  phase 1: row_number over (host, salt) — salt = xxhash64(url_hash, C) % S —
           keeps at most ``budget`` rows per (host, salt) cell, so the
           mega-host's partition work is spread over S cells;
  phase 2: exact row_number over host on the pre-filtered set, whose size is
           bounded by budget*S per host — no straggler possible.

Result is exactly the global per-host top-k because any row in the true
top-k is also in the top-k of its salt cell. Ordering (priority desc,
url_hash) is a pure function of the data → deterministic scheduling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_SEED = 0x5A17


def per_host_budget(
    df: DataFrame,
    budget: int,
    host_col: str = "host",
    order_by: list[Column] | None = None,
    salt_buckets: int = 16,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``budget`` rows per host under a deterministic order."""
    order = order_by or [F.col("priority").desc(), F.col("url_hash").asc()]
    out = df
    if salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col("url_hash"), F.lit(SALT_SEED)), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(host_col), F.col("_salt")).orderBy(*order)
        out = (
            out.withColumn("_salt", salt)
            .withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= budget)
            .drop("_salt", "_rn1")
        )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    out = out.withColumn("_rn", F.row_number().over(w2)).filter(F.col("_rn") <= budget)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")
