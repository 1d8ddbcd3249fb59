"""One-shot clean-window scaling measurement.

Runs the bench's frontier measurements (6-wave pair + giant-wave pair,
best-of-2 reps per level, host probes bracketing) WITHOUT the ~45-min
query phase, so the whole measurement fits inside a single verified-clean
host window (see benchmarks/window_hunt.py for the hunt protocol). Appends
the record to build/bench/window_hunt.jsonl and prints it.

usage: python benchmarks/clean_window_run.py [--reps 2] [--skip-sixwave]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "build", "bench", "window_hunt.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n-pages", type=int, default=16_000_000)
    ap.add_argument("--skip-sixwave", action="store_true")
    args = ap.parse_args()

    import bench

    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "kind": "clean_window_run"}
    rec["host_before"] = bench.host_probe()
    print("host before:", rec["host_before"], flush=True)

    fixture = bench._fixture(args.n_pages)

    if not args.skip_sixwave:
        lo_runs = [bench.run_frontier("local[4]", fixture, f"cw4_{i}",
                                      args.n_pages) for i in range(args.reps)]
        hi_runs = [bench.run_frontier("local[16]", fixture, f"cw16_{i}",
                                      args.n_pages) for i in range(args.reps)]
        lo = min(lo_runs, key=lambda r: r["seconds"])
        hi = min(hi_runs, key=lambda r: r["seconds"])
        curve = []
        for k in range(min(len(r["per_wave"]) for r in lo_runs + hi_runs)):
            slo = min(r["per_wave"][k]["seconds"] for r in lo_runs)
            shi = min(r["per_wave"][k]["seconds"] for r in hi_runs)
            curve.append({"wave": k,
                          "scheduled": lo["per_wave"][k]["scheduled"],
                          "sec_lo": slo, "sec_hi": shi,
                          "eff": round((slo / shi) / 4, 3)})
        ss_lo = sum(w["sec_lo"] for w in curve[1:])
        ss_hi = sum(w["sec_hi"] for w in curve[1:])
        rec["sixwave"] = {
            "local[4]": lo, "local[16]": hi,
            "eff": round((lo["seconds"] / hi["seconds"]) / 4, 3),
            "steady_state_eff": round((ss_lo / ss_hi) / 4, 3),
            "per_wave": curve,
        }
        print("sixwave:", json.dumps({k: rec["sixwave"][k] for k in
                                      ("eff", "steady_state_eff")}), flush=True)

    genv = {
        "SPARK_GRAFT_BENCH_BUDGET": "100000",
        "SPARK_GRAFT_BENCH_WAVES": "1",
        "SPARK_GRAFT_BENCH_SEED_ALL": "1",
        "SPARK_GRAFT_BENCH_FETCH": bench._giant_fetch(),
    }
    glo_runs = [bench.run_frontier("local[4]", fixture, f"cwg4_{i}",
                                   args.n_pages, genv) for i in range(args.reps)]
    ghi_runs = [bench.run_frontier("local[16]", fixture, f"cwg16_{i}",
                                   args.n_pages, genv) for i in range(args.reps)]
    glo = min(glo_runs, key=lambda r: r["seconds"])
    ghi = min(ghi_runs, key=lambda r: r["seconds"])
    rec["giant"] = {
        "fetch": genv["SPARK_GRAFT_BENCH_FETCH"],
        "local[4]": glo, "local[16]": ghi,
        "eff": round((glo["seconds"] / ghi["seconds"]) / 4, 3),
        "all_runs_lo": [r["seconds"] for r in glo_runs],
        "all_runs_hi": [r["seconds"] for r in ghi_runs],
    }
    print("giant:", json.dumps({k: rec["giant"][k] for k in
                                ("eff", "all_runs_lo", "all_runs_hi")}),
          flush=True)

    rec["host_after"] = bench.host_probe()
    print("host after:", rec["host_after"], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
