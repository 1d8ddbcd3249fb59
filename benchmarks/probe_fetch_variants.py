"""Time three fetch-stage physical variants at one pinned level.

usage: probe_fetch_variants.py local[N] [variant ...]
variants: smj, shj, fused
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
from bodhium_webscrapper_spark.functions.canonicalize import host_of
from bodhium_webscrapper_spark.functions.extract import make_extract_page_outlinks_udf

variants = sys.argv[2:] or ["smj", "shj", "fused"]
spark = build_session(sys.argv[1], "probe_variants", n)
pages = spark.read.parquet("build/bench/pages_16000000/pages").select("url_hash", "url", "html")
sched = spark.read.parquet("build/bench/ckpt_gs2hi/wave=0000/scheduled")
udf = make_extract_page_outlinks_udf("host")
sched.count()  # warm

derived = [F.col("url").alias("canonical_url"), host_of(F.col("url")).alias("host")]
extract = [
    F.col("_page.text").alias("text"),
    F.col("_page.outlinks").alias("outlinks"),
    F.size(F.col("_page.outlinks")).alias("n_links"),
]
final_cols = ["url_hash", "canonical_url", "host", "depth", "priority", "wave",
              "text", "outlinks", "n_links"]
attrs = sched.select("url_hash", "depth", "priority", "wave")

def plan_smj():
    raw = (pages.join(F.broadcast(sched.select("url_hash")), "url_hash", "left_semi")
           .withColumn("_page", udf(F.col("html"), F.col("url")))
           .select(F.col("url_hash"), *derived, *extract))
    return raw.join(attrs, "url_hash").select(*final_cols)

def plan_shj():
    raw = (pages.join(F.broadcast(sched.select("url_hash")), "url_hash", "left_semi")
           .withColumn("_page", udf(F.col("html"), F.col("url")))
           .select(F.col("url_hash"), *derived, *extract))
    return raw.join(attrs.hint("shuffle_hash"), "url_hash").select(*final_cols)

def plan_fused():
    return (pages.join(F.broadcast(attrs), "url_hash")
            .withColumn("_page", udf(F.col("html"), F.col("url")))
            .select(F.col("url_hash"), *derived,
                    F.col("depth"), F.col("priority"), F.col("wave"), *extract))

plans = {"smj": plan_smj, "shj": plan_shj, "fused": plan_fused}
for name in variants:
    t0 = time.time()
    plans[name]().write.mode("overwrite").parquet(f"/tmp/probe_var_{name}")
    print("VARIANT", name, round(time.time() - t0, 2), flush=True)
spark.stop()
