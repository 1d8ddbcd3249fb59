"""Micro-bench: window row_number vs max_by aggregation for frontier dedup."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from bodhium_webscrapper_spark.session import build_session
from bodhium_webscrapper_spark.plans.frontier import dedup_first_wins_frontier

N = 48_000_000
KEYS = 16_000_000
spark = build_session("local[16]", "dedup_forms", 16)

frontier = spark.range(N).select(
    F.xxhash64((F.col("id") % KEYS).cast("string")).alias("url_hash"),
    F.concat(F.lit("https://host"), ((F.col("id") % KEYS) % 50000).cast("string"),
             F.lit(".example/path/page"), (F.col("id") % KEYS).cast("string")).alias("canonical_url"),
    F.concat(F.lit("host"), ((F.col("id") % KEYS) % 50000).cast("string"),
             F.lit(".example")).alias("host"),
    (F.col("id") % 7).cast("int").alias("depth"),
    (F.lit(1.0) / ((F.col("id") % 13) + 1)).alias("priority"),
    (F.col("id") % 3).cast("int").alias("retry_count"),
)
frontier.count()  # warm

def windowed(fr):
    w = Window.partitionBy("url_hash").orderBy(
        F.col("priority").desc(), F.col("depth").asc(), F.col("retry_count").desc())
    return (fr.withColumn("_rn", F.row_number().over(w))
            .withColumn("retry_count", F.max("retry_count").over(Window.partitionBy("url_hash")))
            .filter(F.col("_rn") == 1).drop("_rn"))

for name, fn in [("window", windowed), ("max_by_agg", dedup_first_wins_frontier)]:
    for rep in range(2):
        t0 = time.time()
        n = fn(frontier).select(F.count("url_hash"), F.sum(F.crc32(F.col("canonical_url"))),
                                F.sum("retry_count"), F.sum("depth"), F.sum("priority")).collect()
        print(name, rep, round(time.time() - t0, 2), n[0])
spark.stop()
