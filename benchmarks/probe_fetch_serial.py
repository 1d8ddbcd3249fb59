"""Isolate the serial costs of the giant fetch stage at one level.

usage: probe_fetch_serial.py local[N]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1][len("local["):-1])
try:
    os.sched_setaffinity(0, set(range(n)))
except OSError:
    pass
from pyspark.sql import functions as F
from bodhium_webscrapper_spark.session import build_session

spark = build_session(sys.argv[1], "probe_fetch", n)
pages = spark.read.parquet("build/bench/pages_16000000/pages").select("url_hash", "url", "html")
sched = spark.read.parquet("build/bench/ckpt_gsmoke16/wave=0000/scheduled")
keys = sched.select("url_hash")
keys.count()  # warm scan

# 1. broadcast BUILD+SEND only (tiny probe side)
t0 = time.time()
pages.limit(100).join(F.broadcast(keys), "url_hash", "left_semi").count()
print("bcast_build_probe_tiny", round(time.time() - t0, 2))

# 2. scan+semi-probe, no UDF, no write (reuses broadcast? new broadcast per plan)
t0 = time.time()
pages.join(F.broadcast(keys), "url_hash", "left_semi").select(
    F.sum(F.length("url"))).collect()
print("scan_semi_probe", round(time.time() - t0, 2))

# 3. + extraction UDF, no write
from bodhium_webscrapper_spark.functions.extract import make_extract_page_outlinks_udf
udf = make_extract_page_outlinks_udf("host")
t0 = time.time()
pages.join(F.broadcast(keys), "url_hash", "left_semi").withColumn(
    "_p", udf(F.col("html"), F.col("url"))).select(
    F.sum(F.length("_p.text"))).collect()
print("scan_semi_udf", round(time.time() - t0, 2))

# 4. full replica with write (the real fetch stage, fallback path)
attrs = sched.select("url_hash", "depth", "priority", "wave")
from bodhium_webscrapper_spark.functions.canonicalize import host_of
raw = (pages.join(F.broadcast(keys), "url_hash", "left_semi")
       .withColumn("_page", udf(F.col("html"), F.col("url")))
       .select(F.col("url_hash"), F.col("url").alias("canonical_url"),
               host_of(F.col("url")).alias("host"),
               F.col("_page.text").alias("text"),
               F.col("_page.outlinks").alias("outlinks"),
               F.size(F.col("_page.outlinks")).alias("n_links")))
plan = raw.join(attrs, "url_hash").select(
    "url_hash", "canonical_url", "host", "depth", "priority", "wave",
    "text", "outlinks", "n_links")
t0 = time.time()
plan.write.mode("overwrite").parquet("/tmp/probe_fetch_out")
print("full_fetch_write", round(time.time() - t0, 2))
spark.stop()
