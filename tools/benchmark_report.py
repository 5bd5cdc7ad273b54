"""Render BENCHMARKS.md from log/benchmark/*.jsonl — the committed
90-mission reference-benchmark results table (the reference's
test_all_* integration suite, README.md:58-72)."""

import json
import os
import statistics as st
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETS = ["forest10", "maze10_sparse", "maze10_dense"]
# the two committed reference rows (log/summary_LSC_10agents.csv:2-3)
REF_ROWS = {
    ("forest10", "forest10_10.json"): (15.8, 103.163, 1.02144),
    ("maze10_dense", "maze10_1.json"): (51.2, 155.464, 1.00228),
}


def load(setname):
    path = f"log/benchmark/{setname}.jsonl"
    if not os.path.exists(path):
        return []
    return [json.loads(l) for l in open(path)]


def main():
    out = []
    out.append("# Reference benchmark results — 90 missions\n")
    out.append(
        "Configuration: LSC planner, grid_based_planner goal mode, "
        "PIBT/ECBS MAPF, 10 agents, 2D (z = 0.6 m), M = 10, n = 5, "
        "dt = 0.2 s, communication range 3 m — the reference's "
        "`test_all_forest` / `test_all_maze_*` launch configuration "
        "(launch/simulation.launch:44-80). Success = collision-free "
        "(safety ratio ≥ 1), zero velocity/acceleration excess, finite "
        "flight time. Raw rows: `log/benchmark/*.jsonl` + reference-"
        "schema summary CSVs alongside.\n")
    out.append("| Set | Success | Flight time (mean / median / max) [s] | "
               "Distance mean [m] | Min safety ratio | Excess |")
    out.append("|---|---|---|---|---|---|")
    total_ok = total = 0
    for s in SETS:
        rows = load(s)
        if not rows:
            continue
        ok = [r for r in rows if not r["is_collided"] and not r["qp_failed"]
              and r["total_flight_time"] < 1e9]
        total_ok += len(ok)
        total += len(rows)
        ft = [r["total_flight_time"] for r in ok]
        dist = [r["total_flight_distance"] for r in ok]
        smin = min(r["safety_ratio_agent"] for r in rows)
        vex = max(r["vel_excess_ratio"] for r in rows)
        aex = max(r["acc_excess_ratio"] for r in rows)
        out.append(
            f"| {s} | {len(ok)}/{len(rows)} | "
            f"{st.mean(ft):.1f} / {st.median(ft):.1f} / {max(ft):.1f} | "
            f"{st.mean(dist):.1f} | {smin:.3f} | {vex:g} / {aex:g} |"
        )
    out.append("")
    out.append(f"**Total: {total_ok}/{total} missions collision-free with "
               "zero dynamic-limit excess.**\n")

    out.append("## Head-to-head vs the reference's committed rows\n")
    out.append("| Mission | Metric | Reference | This repo |")
    out.append("|---|---|---|---|")
    for (s, mission), (ft_ref, dist_ref, safety_ref) in REF_ROWS.items():
        row = next((r for r in load(s) if r["mission"] == mission), None)
        if row is None:
            continue
        out.append(f"| {mission} | flight time [s] | {ft_ref} | "
                   f"{row['total_flight_time']:.1f} |")
        out.append(f"| | distance [m] | {dist_ref:.1f} | "
                   f"{row['total_flight_distance']:.1f} |")
        out.append(f"| | min safety ratio | {safety_ref:.3f} | "
                   f"{row['safety_ratio_agent']:.3f} |")
    out.append("")
    out.append("Source: reference `log/summary_LSC_10agents.csv:2-3` "
               "(authors' CPU, CPLEX Threads=6).\n")

    with open("BENCHMARKS.md", "w") as f:
        f.write("\n".join(out))
    print("\n".join(out))


if __name__ == "__main__":
    main()
