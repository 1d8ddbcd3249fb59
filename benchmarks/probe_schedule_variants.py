"""Time schedule-stage physical variants at one pinned level.

usage: probe_schedule_variants.py local[N] [variant ...]
variants: full (current), narrow (narrow-payload dedup + string recovery)
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1][len("local["):-1])
try:
    os.sched_setaffinity(0, set(range(n)))
except OSError:
    pass
from pyspark import StorageLevel
from pyspark.sql import Window, functions as F
from bodhium_webscrapper_spark.session import build_session
from bodhium_webscrapper_spark.operators.politeness import per_host_budget
from bodhium_webscrapper_spark.operators.robots import flatten_rules, robots_gate

variants = sys.argv[2:] or ["full", "narrow"]
spark = build_session(sys.argv[1], "probe_sched", n)

# frontier-like input: canonicalized seed dump (read from parquet to skip
# the UDF — we are isolating the schedule's JVM stages)
sched_src = spark.read.parquet("build/bench/pages_16000000/pages").select(
    F.col("url_hash"),
    F.col("url").alias("canonical_url"),
    F.expr("parse_url(url, 'HOST')").alias("host"),
    F.lit(0).alias("depth"),
    F.lit(1.0).alias("priority"),
    F.lit(0).alias("retry_count"),
)
robots = spark.read.parquet("build/bench/pages_16000000/robots.parquet")
rules = flatten_rules(robots).persist()
rules.count()
sched_src.select(F.count("url_hash")).first()  # warm scan
BUDGET = 100_000

def dedup_full(fr):
    w = Window.partitionBy("url_hash").orderBy(
        F.col("priority").desc(), F.col("depth").asc(), F.col("retry_count").desc())
    return (fr.withColumn("_rn", F.row_number().over(w))
            .withColumn("retry_count", F.max("retry_count").over(Window.partitionBy("url_hash")))
            .filter(F.col("_rn") == 1).drop("_rn"))

def dedup_narrow(fr):
    # sort only 28-byte rows; strings recovered by min-agg (all equal per key)
    w = Window.partitionBy("url_hash").orderBy(
        F.col("priority").desc(), F.col("depth").asc(), F.col("retry_count").desc())
    narrow = (fr.select("url_hash", "depth", "priority", "retry_count")
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("retry_count", F.max("retry_count").over(Window.partitionBy("url_hash")))
              .filter(F.col("_rn") == 1).drop("_rn"))
    strings = fr.groupBy("url_hash").agg(
        F.min("canonical_url").alias("canonical_url"), F.min("host").alias("host"))
    return narrow.join(strings, "url_hash").select(
        "url_hash", "canonical_url", "host", "depth", "priority", "retry_count")

for name in variants:
    t0 = time.time()
    dd = dedup_full(sched_src) if name == "full" else dedup_narrow(sched_src)
    new = dd  # seen empty on wave 0
    gated = robots_gate(new, rules, flat=True, strategy="broadcast")
    gated = gated.persist(StorageLevel.MEMORY_AND_DISK)
    capped = per_host_budget(gated, BUDGET, host_col="host", salt_buckets=16,
                             count_split=True)
    capped.withColumn("wave", F.lit(0)).write.mode("overwrite").parquet(
        f"/tmp/probe_sched_{name}")
    gated.unpersist()
    print("VARIANT", name, round(time.time() - t0, 2), flush=True)
spark.stop()
