"""Clean-window hunter for the giant-wave N→4N measurement.

The sandbox's N-vs-4N numbers swing ±0.1-0.15 efficiency between multi-hour
host windows (BENCH/BASELINE.md §5; the identical pinned control job has
measured 0.98, 0.84, and 0.84 across rounds 3-5). Per the round-4 verdict's
methodology, a recorded giant-wave number only counts as clean if a
same-window control row is ≥ ~0.95 — so this script measures the CONTROL
FIRST (pinned narrow-int dedup shuffle, 64M rows → 16M keys, ~1 min/level)
and only spends the ~12 min on the giant-wave pair when the window clears
the gate. Results append to build/bench/window_hunt.jsonl either way.

usage: python benchmarks/window_hunt.py [--gate 0.93] [--force-giant]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "build", "bench", "window_hunt.jsonl")


def control_level(n: int) -> float:
    """One pinned dedup-shuffle control run; returns seconds."""
    code = (
        "import os,sys,time\n"
        f"os.sched_setaffinity(0, set(range({n})))\n"
        f"sys.path.insert(0, {ROOT!r})\n"
        "from bodhium_webscrapper_spark.session import build_session\n"
        "from pyspark.sql import functions as F\n"
        f"spark = build_session('local[{n}]', 'ctl', {n})\n"
        "dd = spark.range(64_000_000).select((F.col('id') % 16_000_000)"
        ".alias('k'), F.col('id').alias('v'))\n"
        "dd.limit(1000).groupBy('k').agg(F.min('v')).count()\n"  # warm
        "best = 1e9\n"
        "for _ in range(2):\n"
        "    t0 = time.time()\n"
        "    dd.groupBy('k').agg(F.min('v')).select(F.count('k')).first()\n"
        "    best = min(best, time.time() - t0)\n"
        "print('CTL:%.3f' % best)\n"
        "spark.stop()\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=ROOT)
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("CTL:"):
            return float(line[4:])
    raise RuntimeError(f"control failed: {r.stderr[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=0.93)
    ap.add_argument("--force-giant", action="store_true")
    ap.add_argument("--n-pages", type=int, default=16_000_000)
    args = ap.parse_args()

    import bench  # host_probe lives with the bench so artifacts share it

    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    rec["host"] = bench.host_probe()
    rec["membw"] = bench.membw_probe()
    print("host:", rec["host"])
    lo = control_level(4)
    hi = control_level(16)
    rec["control"] = {"local[4]": lo, "local[16]": hi,
                      "eff": round((lo / hi) / 4, 3)}
    print("control:", rec["control"])

    if rec["control"]["eff"] >= args.gate or args.force_giant:
        import bench

        fixture = bench._fixture(args.n_pages)
        genv = {
            "SPARK_GRAFT_BENCH_BUDGET": "100000",
            "SPARK_GRAFT_BENCH_WAVES": "1",
            "SPARK_GRAFT_BENCH_SEED_ALL": "1",
            "SPARK_GRAFT_BENCH_FETCH": bench._giant_fetch(),
        }
        glo = bench.run_frontier("local[4]", fixture, "hunt4", args.n_pages, genv)
        ghi = bench.run_frontier("local[16]", fixture, "hunt16", args.n_pages, genv)
        rec["giant"] = {
            "fetch": genv["SPARK_GRAFT_BENCH_FETCH"],
            "local[4]": glo, "local[16]": ghi,
            "eff": round((glo["seconds"] / ghi["seconds"]) / 4, 3),
            "wave_eff": round(
                (glo["per_wave"][0]["seconds"] / ghi["per_wave"][0]["seconds"]) / 4, 3
            ),
        }
        print("giant:", json.dumps(rec["giant"]))
    else:
        print(f"window dirty (control {rec['control']['eff']} < {args.gate}); "
              "skipping giant pair")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
