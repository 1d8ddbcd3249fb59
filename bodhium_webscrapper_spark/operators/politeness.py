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

Note (Spark ≥3.5/4): for CONSTANT budgets at or below
``spark.sql.optimizer.windowGroupLimitThreshold`` (default 1000) the
optimizer already pushes a map-side window-group-limit, which bounds the
straggler much like salting's phase 1. Salting remains the load-bearing
defense in exactly the regimes that pushdown does not cover — budgets above
the threshold (real crawls schedule 10^4-10^5 URLs/host/wave) and per-host
``budget_col`` caps (non-constant limit, no pushdown) — verified by the
wall-clock skew test (tests/test_politeness.py).
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
    budget_col: str | None = None,
    count_split: bool = False,
) -> DataFrame:
    """Keep the top ``budget`` rows per host under a deterministic order.

    ``budget_col``: optional per-row column holding a host-specific budget
    (≤ ``budget``, e.g. reduced by crawl-delay); ``budget`` stays the global
    upper bound so the salted phase-1 prefilter remains a superset.

    ``count_split`` (exact): rows of hosts whose TOTAL count is within
    their budget pass through untouched — no exchange, no sort — and only
    over-budget hosts enter the window. The per-host counts are one hash
    aggregation (map-side combine shrinks it to ~|hosts| rows) whose
    over-budget survivors broadcast back as a semi-join filter. On a Zipf
    frontier nearly all HOSTS are under budget, and at large budgets nearly
    all ROWS are too, so the sort — the politeness stage's dominant,
    hardest-to-scale cost (row_number windows sort every row of the wave) —
    shrinks to the head of the distribution. Exactness does not depend on
    the counts being tight: any superset of the truly-over hosts routes
    extra hosts through the window, where a cap ≥ count is a no-op filter.
    Ignored when ``rank_col`` is requested (every row then needs its rank,
    so every row must be sorted anyway). OFF by default because ``df`` is
    consumed three times (counts, semi, anti): callers at scale — the wave
    loop above its salt-activation threshold — persist ``df`` first; for
    small inputs the extra aggregation is pure overhead.
    """
    order = order_by or [F.col("priority").desc(), F.col("url_hash").asc()]
    cap = F.least(F.lit(budget), F.col(budget_col)) if budget_col else F.lit(budget)
    out = df
    passthrough = None
    if count_split and rank_col is None:
        per_host_cap = (
            F.min(cap).alias("_cap") if budget_col else F.lit(budget).alias("_cap")
        )
        over = (
            df.groupBy(host_col)
            .agg(F.count(F.lit(1)).alias("_n"), per_host_cap)
            .filter(F.col("_n") > F.col("_cap"))
            .select(F.col(host_col).alias("_over_host"))
        )
        # NULL-SAFE key: groupBy keeps a NULL-host group, but a plain
        # equi-join would match it to nothing — every NULL row would slip
        # into passthrough uncapped, where the plain-window path caps the
        # NULL partition at the budget. eqNullSafe routes an over-budget
        # NULL group through the window exactly like any other host.
        cond = F.col(host_col).eqNullSafe(F.col("_over_host"))
        passthrough = out.join(F.broadcast(over), cond, "left_anti")
        out = out.join(F.broadcast(over), cond, "left_semi")
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
    out = out.withColumn("_rn", F.row_number().over(w2)).filter(F.col("_rn") <= cap)
    if budget_col:
        out = out.drop(budget_col)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    out = out.drop("_rn")
    if passthrough is not None:
        if budget_col:
            passthrough = passthrough.drop(budget_col)
        out = out.unionByName(passthrough)
    return out


def host_budget_map(
    robots: DataFrame, default_budget: int, wave_period_ms: int
) -> DataFrame:
    """(host, _host_budget) for hosts declaring a positive crawl delay.

    Wave-invariant (a pure function of the rules table): loop callers
    compute it once and persist (CrawlJob does)."""
    delays = (
        robots.groupBy("host")
        .agg(F.max("crawl_delay_ms").alias("_delay_ms"))
        .filter(F.col("_delay_ms") > 0)
    )
    return delays.select(
        "host",
        F.least(
            F.lit(default_budget),
            F.greatest(F.lit(1), F.floor(F.lit(wave_period_ms) / F.col("_delay_ms"))),
        )
        .cast("int")
        .alias("_host_budget"),
    )


def with_crawl_delay_budget(
    df: DataFrame,
    robots: DataFrame | None,
    default_budget: int,
    wave_period_ms: int,
    host_col: str = "host",
    out_col: str = "_host_budget",
    budgets: DataFrame | None = None,
) -> DataFrame:
    """W3: map a host's declared robots crawl-delay to a per-wave budget.

    The reference's only pacing is a global ``asyncio.sleep(1)`` between URLs
    (``/root/reference/app.py:973-974``). In a batch wave there is no sleep;
    the politeness contract becomes a rate: a host declaring
    ``crawl_delay_ms`` can be hit at most ``wave_period_ms / crawl_delay_ms``
    times per wave (floored, min 1), capped by the default budget. Hosts
    without a declared delay keep the default (explicit coalesce — Spark's
    greatest()/least() skip nulls, so an un-gated formula would collapse an
    undelayed host to budget 1). Deterministic: a pure function of the rules
    table, no clocks. Pass a precomputed ``budgets`` (host_budget_map) to
    skip the per-call aggregation.
    """
    b = budgets if budgets is not None else host_budget_map(
        robots, default_budget, wave_period_ms
    )
    b = b.select(F.col("host").alias("_d_host"), F.col("_host_budget").alias("_hb"))
    return (
        df.join(F.broadcast(b), df[host_col] == F.col("_d_host"), "left")
        .withColumn(out_col, F.coalesce(F.col("_hb"), F.lit(default_budget)))
        .drop("_d_host", "_hb")
    )
