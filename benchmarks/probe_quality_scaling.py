"""Round-5 probe: N->4N scaling of the new curation operators.

Amplifies the sf0.1 documents table AMPLIFY-fold (deterministic id-offset
copies with per-copy token tags so the amplified corpus has the same
near-dup density as the base, not AMPLIFY-times more) and runs each new
operator to completion (count action) at the given parallelism.

usage: probe_quality_scaling.py local[N] [op ...]
ops: winnow | spans | gopher | pagerank | gq | dsir   (default: the
round-5-early four; gq = the per-row Gopher A1.2 gate, dsir = the full
DSIR train+score+select chain)
Prints one JSON line per op: {"op": ..., "cores": N, "wall_s": ..., "rows": ...}

Pair two runs (local[4], local[16]) to compute the efficiency the same way
bench.py does: eff = wall_lo / (4 * wall_hi).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.session import build_session

AMPLIFY = int(os.environ.get("QPROBE_AMPLIFY", "20"))
AMP_PARTS = int(os.environ.get("QPROBE_PARTS", "64"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_docs(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    # per-copy NONCE INTERLEAVING: copy r replaces every inter-word gap
    # with a copy-unique token (" q{r}z "), so every char 20-gram of copy r
    # (which always spans a gap for realistic word lengths) differs from
    # every other copy's — no cross-copy near-dups at ANY amplification.
    # (Alphabet rotation was tried first: it caps at 26 distinct copies,
    # and amplify>26 produced exact clones and 481k clone-driven pairs.)
    # Within a copy the base corpus's natural dup density is preserved.
    if AMPLIFY > 64:
        # row-identical crossJoin form: a union fold of hundreds of
        # branches costs Catalyst O(branches^2) analysis; the crossJoin
        # with a range keeps the plan constant-size at any amplification
        reps = spark.range(AMPLIFY).select(F.col("id").alias("_r"))
        out = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_r") * 1_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit(" q"), F.col("_r").cast("string"), F.lit("z ")),
            ).alias("text"),
        )
    else:
        copies = [
            docs.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.regexp_replace(F.col("text"), " ", f" q{r}z ").alias("text"),
            )
            for r in range(AMPLIFY)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
    # fixed LEVEL-INDEPENDENT layout: the sf0.1 documents parquet is a
    # single file, and the crossJoin preserves the streamed side's
    # partitioning — without this the whole amplified corpus persists as
    # ONE partition and every op runs single-threaded at every level
    # (measured: gopher read eff=1/ratio exactly, the serial telltale).
    # 64 hash partitions on doc_id is identical at both pair levels.
    return out.repartition(AMP_PARTS, "doc_id")


def main() -> int:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    ops = sys.argv[2:] or ["winnow", "spans", "gopher", "pagerank"]
    try:
        cores = int(master[len("local["):-1])
    except ValueError:  # local[*] / bare local — mirror session.py's guard
        cores = os.cpu_count() or 8
    if os.environ.get("QPROBE_PIN", "1") == "1" and cores <= (os.cpu_count() or 1):
        # pin BEFORE the JVM starts so every measurement thread inherits the
        # mask — same methodology as bench.run_frontier (BASELINE.md §2)
        os.sched_setaffinity(0, set(range(cores)))
    spark = build_session(master, "probe_quality_scaling", shuffle_partitions=cores)
    docs = amplified_docs(spark)
    docs.persist().count()  # isolate the operator from fixture generation

    from bodhium_webscrapper_spark.operators.dedup import winnow_pairs
    from bodhium_webscrapper_spark.operators.pagerank import pagerank_fixed_point
    from bodhium_webscrapper_spark.operators.quality import (
        duplicate_spans,
        gopher_repetition_signals,
    )

    def run(op):
        if op == "winnow":
            out = winnow_pairs(docs, "doc_id", "text", min_containment_pct=60,
                               parallelism=cores)
        elif op == "spans":
            out = duplicate_spans(docs, "doc_id", "text", k=5, min_docs=2)
        elif op == "gopher":
            out = gopher_repetition_signals(
                docs.withColumn("text", F.regexp_replace("text", " rep", "\nrep")),
                "doc_id", "text",
            )
        elif op == "pagerank":
            n = docs.count()
            edges = docs.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 3 + 1) % n).alias("dst"),
            )
            out = pagerank_fixed_point(edges, iterations=3)
        elif op == "gq":
            from bodhium_webscrapper_spark.operators.quality import (
                gopher_quality_signals,
            )

            sig = gopher_quality_signals(F.col("text"))
            out = docs.select(
                "doc_id", *[c.alias(n) for n, c in sig.items()]
            ).filter(F.col("gopher_keep") | (F.col("n_words") >= 0))
        elif op == "dsir":
            from bodhium_webscrapper_spark.operators.mixing import (
                dsir_importance_weights,
                dsir_score,
                dsir_select,
            )

            lab = docs.withColumn("_is_t", F.col("doc_id") % 4 == 0)
            w = dsir_importance_weights(lab, "text", "_is_t")
            s = dsir_score(lab, "doc_id", "text", w)
            out = dsir_select(
                s.join(lab.filter(~F.col("_is_t")).select("doc_id"), "doc_id"),
                100,
            )
        else:
            raise SystemExit(f"unknown op {op}")
        t0 = time.time()
        rows = out.count()
        return time.time() - t0, rows

    for op in ops:
        wall, rows = run(op)
        print(json.dumps({"op": op, "cores": cores, "wall_s": round(wall, 2),
                          "rows": rows, "amplify": AMPLIFY}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
