"""robots.txt gate as a broadcast join + higher-order-function filter.

The reference has NO robots handling (grep over /root/reference finds none;
SURVEY.md §2.9 U5) — its only politeness is ``asyncio.sleep(1)``
(``app.py:973-974``). The target spec requires a robots gate; we model it as
a small per-host rules table (host, disallow_prefixes array, crawl_delay_ms)
broadcast to every executor, with the prefix test expressed via
``F.exists(...startswith...)`` — pure JVM expressions, whole-stage codegen,
no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_rules(robots: DataFrame) -> DataFrame:
    """One (host, disallow_prefixes) row per host, PREFIX-BEARING hosts only.

    Duplicate host rows in a raw rules table would fan out frontier rows
    through robots_gate's left join, and the duplicates would then be
    scheduled separately — flatten all prefix lists per host first. Hosts
    whose flattened prefix list is empty are dropped: they gate nothing
    (absent host ⇒ allowed, exists() over an empty array ⇒ allowed — same
    answer), and in a realistic corpus most hosts declare no disallows, so
    keeping them multiplies the per-wave broadcast build for free. This is
    wave-invariant: callers running a loop should compute it once and
    persist (CrawlJob does)."""
    return (
        robots.groupBy("host")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("disallow_prefixes"))).alias(
                "disallow_prefixes"
            )
        )
        .filter(F.size("disallow_prefixes") > 0)
    )


def robots_gate(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "canonical_url",
    host_col: str = "host",
    flat: bool = False,
    strategy: str = "broadcast",
) -> DataFrame:
    """Drop rows whose URL path starts with any disallowed prefix for its host.

    Hosts absent from the rules table are allowed (standard robots default).
    ``flat=True`` promises ``robots`` is already one-row-per-host (e.g. a
    persisted ``flatten_rules`` output), skipping the per-call aggregation.

    ``strategy``: ``"broadcast"`` (default — realistic robots corpora are
    MBs) or ``"shuffle"`` for a rules table too large to broadcast (10^8
    hosts with rules would blow past executor memory as a broadcast build);
    the shuffle join partitions both sides by host, the same cutover pattern
    as the wave loop's attr join. CrawlJob flips this automatically above
    ``robots_broadcast_threshold`` rules rows.
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be broadcast|shuffle, got {strategy!r}")
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    flattened = robots if flat else flatten_rules(robots)
    rules = flattened.select(
        F.col("host").alias("_r_host"),
        F.col("disallow_prefixes").alias("_r_prefixes"),
    )
    if strategy == "broadcast":
        rules = F.broadcast(rules)
    else:
        rules = rules.hint("shuffle_hash")
    joined = df.join(rules, df[host_col] == F.col("_r_host"), "left")
    blocked = F.exists("_r_prefixes", lambda p: F.startswith(path, p))
    return joined.filter(~F.coalesce(blocked, F.lit(False))).drop(
        "_r_host", "_r_prefixes"
    )
