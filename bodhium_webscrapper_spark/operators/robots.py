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


def parse_robots_txt(
    df: DataFrame,
    txt_col: str = "robots_txt",
    host_col: str = "host",
    agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt TEXT into the rules table ``robots_gate`` and
    ``host_budget_map`` consume: ``(host, disallow_prefixes array<string>,
    crawl_delay_ms long)``.

    RFC 9309 group semantics, entirely in JVM expressions (split/posexplode
    + two window functions + two aggregations — no Python in the path):

    - lines are ``#``-comment-stripped and parsed as ``key: value``;
      unknown keys are ignored (forward-compatible per §2.2.4);
    - consecutive ``User-agent`` lines stack onto ONE group (§2.2.1); a
      ``User-agent`` line after rule lines starts a NEW group;
    - rule lines before any ``User-agent`` line belong to no group and are
      ignored;
    - group selection per host: a group naming ``agent`` exactly
      (case-insensitive product token, the RFC longest-match rule
      simplified to exact-token-or-``*``) beats the ``*`` group; ALL
      groups at the winning specificity merge (§2.2.1 "combine");
    - empty ``Disallow:`` values mean allow-all and contribute no prefix;
      ``Crawl-delay`` (a de-facto extension, not in the RFC) parses as
      seconds, merged with ``min`` (the most conservative reading is the
      smallest delay only if budgets divide by it — the politeness
      operator treats larger delay = fewer fetches, so ``min`` here keeps
      the LARGEST per-wave budget conservative callers can then clamp;
      non-numeric values are ignored).

    Hosts whose robots.txt matches no group (and has no ``*`` group) are
    absent from the output — the gate's absent-host-means-allowed default.

    Scale shape: one ``posexplode`` (rows = total lines, the raw bytes
    already sharded by host), two narrow window functions partitioned by
    host (robots files are KBs — no skew concern), then two hash
    aggregations ending keyed by host. Nothing is collected; nothing
    broadcasts. At 10^8 hosts this is a single shuffle round on
    (host, group) then host.

    Reference: the reference has no robots handling at all (its politeness
    is ``asyncio.sleep(1)``, ``/root/reference/app.py:973-974``); this is
    target-spec surface (SURVEY.md §2.9 U5) made end-to-end: raw text in,
    gate-ready rules out.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\r?\n")).alias("_pos", "_raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", ""))
    kv = lines.select(
        "host",
        "_pos",
        F.lower(F.trim(F.regexp_extract(clean, r"^([^:]+):", 1))).alias("_key"),
        F.trim(F.regexp_extract(clean, r"^[^:]*:(.*)$", 1)).alias("_val"),
    )
    w = Window.partitionBy("host").orderBy("_pos")
    is_ua = F.col("_key") == "user-agent"
    prev_ua = F.lag(is_ua, 1, False).over(w)
    grouped = kv.withColumn(
        "_grp", F.sum((is_ua & ~prev_ua).cast("int")).over(w)
    ).filter(F.col("_grp") > 0)
    groups = grouped.groupBy("host", "_grp").agg(
        F.collect_set(F.when(is_ua, F.lower(F.col("_val")))).alias("_agents"),
        F.collect_set(
            F.when(
                (F.col("_key") == "disallow") & (F.col("_val") != ""),
                F.col("_val"),
            )
        ).alias("_disallows"),
        F.min(
            F.when(
                F.col("_key") == "crawl-delay",
                # try_cast: non-numeric Crawl-delay values are ignored, not
                # a job-killing ANSI cast error on one bad robots.txt
                F.col("_val").try_cast("double"),
            )
        ).alias("_delay_s"),
    )
    rank = (
        F.when(F.array_contains("_agents", agent.lower()), F.lit(1))
        .when(F.array_contains("_agents", "*"), F.lit(2))
    )
    ranked = groups.withColumn("_rank", rank).filter(F.col("_rank").isNotNull())
    wh = Window.partitionBy("host")
    best = ranked.withColumn("_minr", F.min("_rank").over(wh)).filter(
        F.col("_rank") == F.col("_minr")
    )
    return best.groupBy("host").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_disallows")))
        ).alias("disallow_prefixes"),
        F.floor(F.min("_delay_s") * 1000).cast("long").alias("crawl_delay_ms"),
    )


def parse_robots_sitemaps(
    df: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """``Sitemap:`` lines from raw robots.txt — ``(host, sitemap_url)``.

    Per RFC 9309 §2.2.4 / sitemaps.org these are GROUP-INDEPENDENT (valid
    anywhere in the file), so this is a separate one-aggregation pass, not
    part of :func:`parse_robots_txt`'s group machinery. Output feeds the S1
    sitemap seed scan. Case-insensitive key; absolute URLs kept verbatim
    (canonicalization is the seed pipeline's job); distinct per host."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), r"\r?\n")).alias("_raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(clean, r"^([^:]+):", 1)))
    val = F.trim(F.regexp_extract(clean, r"^[^:]*:(.*)$", 1))
    return (
        lines.select("host", key.alias("_key"), val.alias("sitemap_url"))
        .filter((F.col("_key") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
        .distinct()
    )
