"""Source-priority fallback union (SURVEY.md SET1).

Reference semantics (``/root/reference/app.py:305-374``): try the sitemap
seeder; only if it returns nothing, query the Common Crawl index; only if
that is empty too, fall back to a static path list. NOT a blind union —
later sources contribute only when every earlier source is empty.

Two implementations:

- ``source_priority_union``: driver-side short-circuit (``limit(1)`` probe
  per source, cheapest-first). Mirrors the reference's control flow; each
  probe is O(first row) thanks to lazy evaluation, and losing sources are
  never fully evaluated.
- ``source_priority_union_df``: single-plan variant — tag each source with
  its rank, keep rows of the minimum non-empty rank. Useful when the chain
  must live inside one DataFrame (e.g. per-seed fallback), at the cost of
  evaluating all sources once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_priority_union(sources: list[DataFrame]) -> DataFrame:
    for df in sources[:-1]:
        if df.limit(1).count() > 0:
            return df
    return sources[-1]


def source_priority_union_df(sources: list[DataFrame], rank_col: str = "_src_rank") -> DataFrame:
    tagged = None
    for rank, df in enumerate(sources):
        t = df.withColumn(rank_col, F.lit(rank))
        tagged = t if tagged is None else tagged.unionByName(t)
    best = tagged.agg(F.min(rank_col).alias("_best_rank"))
    return (
        tagged.join(F.broadcast(best), F.col(rank_col) == F.col("_best_rank"))
        .drop(rank_col, "_best_rank")
    )
