"""Giant-wave fetch: bucketed storage-partitioned join vs broadcast.

usage: probe_bucketed_fetch.py prep            # one-time bucketed rewrite
       probe_bucketed_fetch.py local[N] [...]  # timed variants at N pinned
variants: bucketed, broadcast
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from bodhium_webscrapper_spark.session import build_session

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "build", "bench")
PAGES = os.path.join(FIX, "pages_16000000", "pages")
WAVE = os.path.join(FIX, "ckpt_g16_1", "wave=0000", "scheduled")
BKT = os.path.join(FIX, "bucketed")
N_BUCKETS = 64

if sys.argv[1] == "prep":
    from pyspark.sql import functions as F
    from bodhium_webscrapper_spark.plans.bucketed_fetch import write_bucketed

    spark = build_session("local[32]", "bkt_prep", 32)
    pages = spark.read.parquet(PAGES).select("url_hash", "url", "html")
    write_bucketed(pages, "pages16_bkt", N_BUCKETS, os.path.join(BKT, "pages"))
    print("PREP DONE")
    spark.stop()
    sys.exit(0)

n = int(sys.argv[1][len("local["):-1])
try:
    os.sched_setaffinity(0, set(range(n)))
except OSError:
    pass
from pyspark.sql import functions as F
from bodhium_webscrapper_spark.functions.canonicalize import host_of
from bodhium_webscrapper_spark.functions.extract import make_extract_page_outlinks_udf
from bodhium_webscrapper_spark.plans.bucketed_fetch import (
    bucketed_fetch_join,
    write_bucketed,
)

variants = sys.argv[2:] or ["bucketed", "broadcast"]
spark = build_session(sys.argv[1], "bkt_probe", n)
spark.sql(
    f"CREATE TABLE IF NOT EXISTS pages16_bkt (url_hash BIGINT, url STRING, html BINARY) "
    f"USING parquet CLUSTERED BY (url_hash) SORTED BY (url_hash) INTO {N_BUCKETS} BUCKETS "
    f"LOCATION '{os.path.join(BKT, 'pages')}'"
)
sched = spark.read.parquet(WAVE).select("url_hash", "depth", "priority", "wave")
udf = make_extract_page_outlinks_udf("host")
# warm: worker pool + page cache sample
spark.read.parquet(PAGES).select("url_hash", "url", "html").filter(
    F.col("url_hash") % 101 == 0
).select(udf(F.col("html"), F.col("url")).alias("p")).select(
    F.sum(F.length("p.text"))
).first()

post = lambda df: df.withColumn(
    "_page", udf(F.col("html"), F.col("url"))
).select(
    F.col("url_hash"),
    F.col("url").alias("canonical_url"),
    host_of(F.col("url")).alias("host"),
    F.col("depth"), F.col("priority"), F.col("wave"),
    F.col("_page.text").alias("text"),
    F.col("_page.outlinks").alias("outlinks"),
    F.size(F.col("_page.outlinks")).alias("n_links"),
)

for name in variants:
    if name == "bucketed":
        t0 = time.time()
        # wave side written bucketed (counted in the wall — it replaces
        # nothing: the broadcast path reads the same parquet artifact)
        write_bucketed(sched, "wave16_bkt", N_BUCKETS, os.path.join(BKT, f"wave_{n}"))
        joined = bucketed_fetch_join(spark, "pages16_bkt", "wave16_bkt")
        post(joined).write.mode("overwrite").parquet(f"/tmp/bkt_out_{name}")
        print("VARIANT bucketed", round(time.time() - t0, 2), flush=True)
        spark.sql("DROP TABLE IF EXISTS wave16_bkt")
    else:
        t0 = time.time()
        pages = spark.read.parquet(PAGES).select("url_hash", "url", "html")
        joined = pages.join(F.broadcast(sched), "url_hash")
        post(joined).write.mode("overwrite").parquet(f"/tmp/bkt_out_{name}")
        print("VARIANT broadcast", round(time.time() - t0, 2), flush=True)
spark.stop()
