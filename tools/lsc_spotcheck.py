"""LSC-mode spot-check across the three benchmark sets (r5).

The r5 planner changes are identity or bit-identical for LSC dt-mode
on the reference suite by construction (CLSC feasibility guard — the
guard is always satisfied under stop-at-horizon; fused SFC —
bit-identical; adaptive windows — identity for ≤10-agent groups); the
two recovery-path changes (group-scoped retreat vetting, at-goal
escalation guard) only alter behavior inside wedge-recovery episodes.
This spot-check re-runs 12 representative missions (the two
head-to-head headliners, the spike mission forest10_16, and corridor /
dense cases) on the TPU backend and compares flight times to the
committed r4 full-suite rows (log/tpu_benchmark/*.jsonl @ 9cb135b).

Usage: python tools/lsc_spotcheck.py  (axon platform, from repo cwd)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"
CASES = {
    "forest10": ([1, 10, 16, 22],
                 f"{REF}/missions/forest10", f"{REF}/world/forest"),
    "maze10_sparse": ([1, 2, 15, 30],
                      f"{REF}/missions/maze10_sparse",
                      f"{REF}/world/maze/sparse"),
    "maze10_dense": ([1, 4, 10, 20],
                     f"{REF}/missions/maze10_dense",
                     f"{REF}/world/maze/dense"),
}


def main():
    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import Mission
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    import subprocess
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))).stdout.strip()

    out_path = "log/tpu_benchmark/lsc_spotcheck.jsonl"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    done = set()
    if os.path.exists(out_path):
        for line in open(out_path):
            try:
                done.add(json.loads(line)["mission"])
            except Exception:
                pass

    for set_name, (idxs, mdir, wdir) in CASES.items():
        # r4 baseline rows for comparison
        base = {}
        r4_path = f"/root/repo/log/tpu_benchmark/{set_name}.jsonl"
        if os.path.exists(r4_path):
            for line in open(r4_path):
                r = json.loads(line)
                base[r["mission"]] = r["total_flight_time"]
        prefix = "forest10_" if set_name == "forest10" else "maze10_"
        wprefix = ("forest" if set_name == "forest10" else "maze")
        for i in idxs:
            name = f"{prefix}{i}.json"
            if name in done:
                continue
            mf = f"{mdir}/{name}"
            wf = f"{wdir}/{wprefix}{i}.csv"
            p = Param(world_dimension=2, world_use_octomap=True,
                      communication_range=3.0, profile_stages=False,
                      multisim_max_planner_iteration=600)
            m = Mission.load(mf, world_file=wf, world_dimension=2,
                             world_z_2d=p.world_z_2d)
            sim = MultiSyncSimulator(p, m, log_dir="/tmp/lsc_spot")
            t0 = time.time()
            r = sim.run()
            row = {
                "mission": name, "set": set_name, "git_commit": commit,
                "flight_time": r["total_flight_time"],
                "r4_flight_time": base.get(name),
                "safety": r["safety_ratio_agent"],
                "collided": r["is_collided"],
                "vel_excess": r["vel_excess_ratio"],
                "acc_excess": r["acc_excess_ratio"],
                "plan_avg_ms": r["planning_time_avg_ms"],
                "plan_max_ms": r["planning_time_max_ms"],
                "wall_s": round(time.time() - t0, 1),
            }
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            ok = (not row["collided"] and row["vel_excess"] == 0
                  and np.isfinite(row["flight_time"]))
            print(f"{name}: flight={row['flight_time']:.1f}s "
                  f"(r4 {row['r4_flight_time']}) "
                  f"safety={row['safety']:.3f} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
