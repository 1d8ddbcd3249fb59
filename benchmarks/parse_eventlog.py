"""Decompose a Spark event log into per-phase job walls, task-time sums and
driver-serial gaps.

The wave loop labels every phase via ``setJobDescription`` (``w3:schedule``),
so each Spark job in the log attributes to a phase. For a job: wall =
completion - submission; task_s = sum of task run times (executor side);
parallel efficiency at N cores = task_s / (wall * N). Gap = time between a
phase's first job submission and its predecessor's completion (driver-serial
planning / py4j / footer-read work the executors never see).

usage: python benchmarks/parse_eventlog.py <eventlog-file> <cores>
"""
import json
import sys
from collections import defaultdict


def parse(path: str, cores: int) -> dict:
    jobs = {}  # id -> {desc, sub, done}
    stage_task_s = defaultdict(float)  # stage id -> task run time sum (ms)
    stage_jobs = {}  # stage id -> job id
    for line in open(path):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            jobs[jid] = {"desc": desc, "sub": ev["Submission Time"], "done": None}
            for sid in ev.get("Stage IDs", []):
                stage_jobs[sid] = jid
        elif k == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["done"] = ev["Completion Time"]
        elif k == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            sid = ev.get("Stage ID")
            stage_task_s[sid] += m.get("Executor Run Time", 0)
    job_task_ms = defaultdict(float)
    for sid, ms in stage_task_s.items():
        if sid in stage_jobs:
            job_task_ms[stage_jobs[sid]] += ms
    phases = defaultdict(lambda: {"jobs": 0, "wall_s": 0.0, "task_s": 0.0,
                                  "gap_s": 0.0})
    prev_done = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["done"] is None:
            continue
        ph = j["desc"] or "(warmup/unlabeled)"
        p = phases[ph]
        p["jobs"] += 1
        p["wall_s"] += (j["done"] - j["sub"]) / 1e3
        p["task_s"] += job_task_ms[jid] / 1e3
        if prev_done is not None and j["sub"] > prev_done:
            p["gap_s"] += (j["sub"] - prev_done) / 1e3
        prev_done = j["done"]
    out = {}
    for ph, p in phases.items():
        out[ph] = {
            "jobs": p["jobs"],
            "wall_s": round(p["wall_s"], 2),
            "task_s": round(p["task_s"], 2),
            "par_eff": round(p["task_s"] / (p["wall_s"] * cores), 2)
            if p["wall_s"] else None,
            "pre_gap_s": round(p["gap_s"], 2),
        }
    return out


def rollup(per_phase: dict) -> dict:
    agg = defaultdict(lambda: defaultdict(float))
    for ph, p in per_phase.items():
        base = ph.split(":", 1)[1] if ":" in ph else ph
        for k in ("jobs", "wall_s", "task_s", "pre_gap_s"):
            agg[base][k] += p[k]
    return {b: {k: round(v, 2) for k, v in d.items()} for b, d in agg.items()}


if __name__ == "__main__":
    per_phase = parse(sys.argv[1], int(sys.argv[2]))
    for ph in sorted(per_phase):
        print(f"{ph:28s} {json.dumps(per_phase[ph])}")
    print("---- rollup by phase kind")
    for b, d in sorted(rollup(per_phase).items()):
        print(f"{b:20s} {json.dumps(d)}")
