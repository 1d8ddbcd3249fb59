"""Domain/URL blocklist gate — the third frontier gate next to robots and
politeness.

The reference crawls whatever its seed list reaches (no blocklist anywhere
in ``/root/reference/app.py``); production web-scale pipelines gate the
frontier against curated blocklists (UT1, FineWeb §3.1's adult filtering):
millions of banned registrable domains plus a small list of banned URL
substrings.

Spark-first shape, by the two lists' very different cardinalities:

- **domains** (potentially 10^6-10^7 rows): an equi anti-join on the
  frontier row's eTLD+1. Broadcast by default (a UT1-size list is tens of
  MB); ``strategy="shuffle"`` repartitions both sides on the domain key for
  lists too large to broadcast — the same cutover pattern as robots_gate.
  Subdomains of a banned domain are banned with it (matching on eTLD+1, not
  host), which is the UT1 contract.
- **substrings** (config-sized, dozens): a broadcast "nested-loop" anti-join
  (``contains`` is a non-equi predicate). The build side is tiny by
  contract; the probe stays one linear frontier scan.

Both gates are NULL-safe: a frontier row with no parsable host fails no
domain rule (nothing to match), and rows never fan out (anti-joins cannot
duplicate the probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.functions.canonicalize import (
    registrable_domain,
)


def blocklist_gate(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "canonical_url",
    host_col: str = "host",
    strategy: str = "broadcast",
) -> DataFrame:
    """Drop frontier rows banned by ``blocklist`` (`kind` in
    {'domain','substring'}, `pattern` string).

    Domain rows ban a registrable domain and every host under it;
    substring rows ban any URL containing the pattern. Unknown kinds are
    ignored (forward-compatible blocklist files)."""
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be broadcast|shuffle, got {strategy!r}")
    domains = (
        blocklist.filter(F.col("kind") == "domain")
        .select(F.col("pattern").alias("_bl_domain"))
        .distinct()
    )
    subs = (
        blocklist.filter(F.col("kind") == "substring")
        .select(F.col("pattern").alias("_bl_sub"))
        .distinct()
    )
    key = registrable_domain(F.col(host_col))
    if strategy == "broadcast":
        out = df.join(
            F.broadcast(domains), key == F.col("_bl_domain"), "left_anti"
        )
    else:
        # both sides partition on the domain key; no broadcast build at
        # 10^7-row blocklists
        out = df.withColumn("_bl_key", key).join(
            domains.hint("shuffle_hash"),
            F.col("_bl_key") == F.col("_bl_domain"),
            "left_anti",
        ).drop("_bl_key")
    return out.join(
        F.broadcast(subs),
        F.col(url_col).contains(F.col("_bl_sub")),
        "left_anti",
    )
