"""Round-5 schedule-stage probe: what the giant-wave schedule actually pays,
and why round-3 advice (b) — "repartition once by url_hash so dedup +
anti-join reuse one Exchange" — was superseded rather than applied.

Why exchange reuse does not apply to the full-recrawl schedule:
  - wave 0's seen set is an EMPTY LocalRelation, so the optimizer's
    PropagateEmptyRelation deletes the anti-join outright — there is no
    second consumer of the dedup window's url_hash Exchange to reuse it;
  - the politeness stage needs HOST distribution, not url_hash (its agg is
    its own small exchange; its probe joins are broadcasts that preserve
    whatever came before);
  - the only other url_hash consumer is the BUCKETED write's
    repartition(64, url_hash), whose partition count (the bucket spec,
    fixed across cluster sizes) differs from the window's
    spark.sql.shuffle.partitions — different partitioning, no reuse.

So the round-5 lever is removing the dedup Exchange+Sort itself where it is
semantically vacuous: a full-recrawl seed list from the engine's own
deduped dump is distinct by construction (CrawlConfig.seeds_distinct).

usage: probe_schedule_r5.py local[N] [variant ...]
variants:
  dedup    — window dedup + count-split politeness + plain write (old path)
  nodedup  — seeds_distinct schedule: politeness only + plain write
  nodedup_bkt — nodedup + FULL-WIDTH bucketBy(url_hash) wave-table write
                (the round-4 bucketed-fetch trade: strings ride the
                bucket exchange)
  nodedup_narrow — nodedup + plain full write + NARROW numeric-only
                bucketBy twin read back from the artifact's pruned
                footers (the round-5 loop path: strings never enter the
                bucket exchange)
Prints one JSON line per variant with wall seconds.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
n = int(sys.argv[1][len("local["):-1])
try:
    os.sched_setaffinity(0, set(range(n)))
except OSError:
    pass
from pyspark.sql import functions as F  # noqa: E402

from bodhium_webscrapper_spark.operators.politeness import per_host_budget  # noqa: E402
from bodhium_webscrapper_spark.plans.bucketed_fetch import write_bucketed  # noqa: E402
from bodhium_webscrapper_spark.plans.frontier import dedup_first_wins_frontier  # noqa: E402
from bodhium_webscrapper_spark.session import build_session  # noqa: E402

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "build", "bench")
OUT = os.path.join(FIX, f"probe_sched_r5_{n}")
variants = sys.argv[2:] or ["dedup", "nodedup", "nodedup_bkt", "nodedup_narrow"]

spark = build_session(sys.argv[1], "probe_sched_r5", n)
seeds = (
    spark.read.parquet(os.path.join(FIX, "pages_16000000", "pages"))
    .filter(~F.col("url").rlike("WWW|:443"))
    .select(
        F.col("url_hash"),
        F.col("url").alias("canonical_url"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.lit(0).alias("depth"),
        F.lit(1.0).alias("priority"),
        F.lit(0).alias("retry_count"),
    )
)
# warm the FULL-WIDTH scan (a url_hash-only count would leave the url
# column cold and bill it to whichever variant runs first)
seeds.agg(F.count("canonical_url"), F.count("host")).first()
BUDGET = 100_000
REPS = int(os.environ.get("PROBE_REPS", "2"))

from pyspark import StorageLevel  # noqa: E402

out = {}
for v in variants:
    best = None
    for _ in range(REPS):
        t0 = time.time()
        fr = seeds if v.startswith("nodedup") else dedup_first_wins_frontier(seeds)
        gated = fr.persist(StorageLevel.MEMORY_AND_DISK)
        capped = per_host_budget(gated, BUDGET, salt_buckets=16, count_split=True)
        capped = capped.withColumn("wave", F.lit(0))
        if v == "nodedup_bkt":
            write_bucketed(capped, "probe_sched_wave", 64, os.path.join(OUT, v))
            spark.sql("DROP TABLE IF EXISTS probe_sched_wave")
        elif v == "nodedup_narrow":
            capped.write.mode("overwrite").parquet(os.path.join(OUT, v))
            narrow = spark.read.parquet(os.path.join(OUT, v)).select(
                "url_hash", "depth", "priority", "wave"
            )
            write_bucketed(
                narrow, "probe_sched_wave_n", 64, os.path.join(OUT, v + "_bkt")
            )
            spark.sql("DROP TABLE IF EXISTS probe_sched_wave_n")
        else:
            capped.write.mode("overwrite").parquet(os.path.join(OUT, v))
        gated.unpersist()
        took = round(time.time() - t0, 2)
        best = took if best is None else min(best, took)
    out[v] = best
print("PROBEJSON:" + json.dumps({"level": n, **out}))
spark.stop()
