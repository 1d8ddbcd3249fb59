"""ABBA-paired N->4N scaling runner for the curation operators.

Re-measures BENCH/quality_scaling.json with the round-5 §2.7 methodology
(BENCH/BASELINE.md): each op runs lo,hi,hi,lo in pinned subprocesses
(probe_quality_scaling.py pins itself before the JVM starts), the record
carries per-rep efficiencies so lo-leg-only pollution splits the two
readings apart, and bracketing pure-CPU host-parity probes (bench.host_probe
at the pair's own core counts) calibrate the window. Appends every run to
build/bench/window_hunt.jsonl as kind=quality_scaling; rewrites
BENCH/quality_scaling.json when the probes clear --gate.

usage: python benchmarks/quality_scaling_run.py [--lo 4] [--hi 16]
         [--amplify 40] [--ops winnow spans gopher pagerank] [--gate 0.90]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
HUNT = os.path.join(ROOT, "build", "bench", "window_hunt.jsonl")
OUT = os.path.join(ROOT, "BENCH", "quality_scaling.json")


def run_level(cores: int, op: str, amplify: int) -> dict:
    env = {**os.environ, "QPROBE_AMPLIFY": str(amplify), "QPROBE_PIN": "1"}
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "probe_quality_scaling.py"),
         f"local[{cores}]", op],
        capture_output=True, text=True, cwd=ROOT, env=env,
    )
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"probe failed for {op}@{cores}: {r.stderr[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--amplify", type=int, default=40)
    ap.add_argument("--ops", nargs="*", default=["winnow", "spans", "gopher", "pagerank"])
    ap.add_argument("--gate", type=float, default=0.90,
                    help="min bracketing host-parity to rewrite the artifact")
    ap.add_argument("--amplify-op", nargs="*", default=[], metavar="OP=N",
                    help="per-op amplify overrides, e.g. gopher=640 "
                    "(sub-second ops need a bigger corpus to leave the "
                    "fixed-cost regime)")
    args = ap.parse_args()
    ratio = args.hi / args.lo
    amplify_map = dict(kv.split("=") for kv in (args.amplify_op or []))

    import bench

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from window_hunt import control_level

    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "kind": "quality_scaling",
           "amplify": args.amplify, "pair": [args.lo, args.hi]}
    rec["probe_before"] = bench.host_probe(lo=args.lo, hi=args.hi)
    print("probe_before:", rec["probe_before"], flush=True)
    # same-window dedup-shuffle control at the pair's OWN core counts —
    # the comparison row for shuffle-bound ops: on this host the control
    # itself reads well below 1.0 (0.617-0.841 idle at 2→8, §2.7), so an
    # op that TRACKS the control is scaling as well as the host lets any
    # shuffle scale, while an op well below it has a real deficit.
    c_lo, c_hi = control_level(args.lo), control_level(args.hi)
    rec["control_before"] = {"wall_lo": c_lo, "wall_hi": c_hi,
                             "eff": round(c_lo / (ratio * c_hi), 3)}
    print("control_before:", rec["control_before"], flush=True)

    ops = {}
    for op in args.ops:
        amp = int(amplify_map.get(op, args.amplify))
        # ABBA: lo, hi, hi, lo — per-rep effs (lo1/hi1, lo2/hi2) split
        # apart if load hits only one leg's window
        lo1 = run_level(args.lo, op, amp)
        hi1 = run_level(args.hi, op, amp)
        hi2 = run_level(args.hi, op, amp)
        lo2 = run_level(args.lo, op, amp)
        e1 = lo1["wall_s"] / (ratio * hi1["wall_s"])
        e2 = lo2["wall_s"] / (ratio * hi2["wall_s"])
        wall_lo = min(lo1["wall_s"], lo2["wall_s"])
        wall_hi = min(hi1["wall_s"], hi2["wall_s"])
        ops[op] = {
            "amplify": amp,
            "wall_lo": wall_lo, "wall_hi": wall_hi,
            "eff": round(wall_lo / (ratio * wall_hi), 3),
            "rep_effs": [round(e1, 3), round(e2, 3)],
            "rows": lo1["rows"],
        }
        print(op, ops[op], flush=True)
        if lo1["rows"] != hi1["rows"]:
            raise RuntimeError(f"{op}: row mismatch lo={lo1['rows']} hi={hi1['rows']}")
    rec["ops"] = ops
    rec["probe_after"] = bench.host_probe(lo=args.lo, hi=args.hi)
    print("probe_after:", rec["probe_after"], flush=True)
    c_lo, c_hi = control_level(args.lo), control_level(args.hi)
    rec["control_after"] = {"wall_lo": c_lo, "wall_hi": c_hi,
                            "eff": round(c_lo / (ratio * c_hi), 3)}
    print("control_after:", rec["control_after"], flush=True)

    os.makedirs(os.path.dirname(HUNT), exist_ok=True)
    with open(HUNT, "a") as f:
        f.write(json.dumps(rec) + "\n")

    parity = min(rec["probe_before"]["parity"], rec["probe_after"]["parity"])
    if parity >= args.gate:
        art = {"amplify": args.amplify, "pair": [args.lo, args.hi],
               "probe_before": rec["probe_before"],
               "probe_after": rec["probe_after"],
               "control_before": rec["control_before"],
               "control_after": rec["control_after"], "ops": ops}
        # merge: keep ops from a prior clean artifact at the SAME pair that
        # this run did not re-measure (two gated runs at different per-op
        # amplifies compose into one artifact)
        if os.path.exists(OUT):
            try:
                prev = json.load(open(OUT))
                if prev.get("pair") == art["pair"]:
                    for op, v in (prev.get("ops") or {}).items():
                        art["ops"].setdefault(op, v)
            except (json.JSONDecodeError, OSError):
                pass
        with open(OUT, "w") as f:
            json.dump(art, f, indent=1)
        print(f"artifact rewritten (parity {parity:.3f} >= {args.gate})")
    else:
        print(f"window dirty (parity {parity:.3f} < {args.gate}); "
              "record appended to window_hunt.jsonl only")


if __name__ == "__main__":
    main()
