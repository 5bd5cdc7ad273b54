"""Summarize the r5 TPU benchmark jsonl rows into BENCHMARKS.md tables."""
import json
import sys

import numpy as np

BASE = sys.argv[1] if len(sys.argv) > 1 else "log/tpu_benchmark"


def load(name):
    try:
        return [json.loads(l) for l in open(f"{BASE}/{name}.jsonl")]
    except FileNotFoundError:
        return []


def summarize(rows):
    ok = [r for r in rows
          if r["total_flight_time"] is not None
          and r["total_flight_time"] < 1e8 and not r["is_collided"]
          and r["vel_excess_ratio"] == 0 and r["acc_excess_ratio"] == 0]
    if not rows:
        return None
    fts = [r["total_flight_time"] for r in ok]
    return {
        "clean": f"{len(ok)}/{len(rows)}",
        "ft": (f"{np.mean(fts):.1f} / {np.median(fts):.1f} / "
               f"{np.max(fts):.1f}" if fts else "-"),
        "dist": f"{np.mean([r['total_flight_distance'] for r in ok]):.1f}"
                if ok else "-",
        "min_safety": f"{min(r['safety_ratio_agent'] for r in rows):.3f}",
        "plan_avg": f"{np.mean([r['planning_time_avg_ms'] for r in rows]):.0f}",
        "plan_max": f"{max(r['planning_time_max_ms'] for r in rows):.0f}",
        "mapf_max": f"{max(r['mapf_time_max_ms'] for r in rows):.0f}",
        "fails": [r["mission"] for r in rows if r not in ok],
    }


for s in ("forest10", "maze10_sparse", "maze10_dense"):
    for suffix, label in (("", "LSC"), ("_dlsc", "DLSC")):
        rows = load(s + suffix)
        if rows:
            r = summarize(rows)
            print(f"{s} {label}: {r['clean']} clean | ft {r['ft']} | "
                  f"safety {r['min_safety']} | plan {r['plan_avg']}/"
                  f"{r['plan_max']} ms | mapf max {r['mapf_max']} ms")
            if r["fails"]:
                print(f"   fails: {r['fails']}")

ow = load("dlsc_openworld")
if ow:
    okc = [r for r in ow if r.get("success")]
    print(f"dlsc_openworld: {len(okc)}/{len(ow)} clean")
try:
    rl = [json.loads(l) for l in open(f"{BASE}/rerun_latency.jsonl")]
    print("rerun_latency:", [(r["run"], r["plan_max_ms"]) for r in rl])
except FileNotFoundError:
    pass
