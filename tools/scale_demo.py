"""Scale demonstration toward the pod-scale BASELINE config.

Runs the "scaled forest" configurations (BASELINE.json north star —
fleets beyond the reference's 10 agents) on generated missions:

  * 64 agents, forest-like world — full run to goals, collision-free,
    with per-step latency stats
  * 256 agents — N-step smoke (latency + safety audit, no full flight)

Usage:
    python tools/scale_demo.py [--agents 64] [--smoke-agents 256]
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = os.environ.get("SCALE_DEMO_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_forest_mission(n_agents: int, seed: int = 0):
    """Antipodal agents around a forest of columns, reference forest
    density (~0.3 trees/m²) scaled to the fleet extent."""
    from lsc_dr_planner_tpu.mission import generate_random_mission

    side = max(8.0, 1.55 * np.sqrt(n_agents) * 1.2)
    half = side / 2
    m = generate_random_mission(
        n_agents, [-half, -half, 0.0], [half, half, 2.5], seed=seed,
        min_separation=1.0,
    )
    rng = np.random.default_rng(seed + 1)
    s = m.stacked()
    keep = np.concatenate([s["start"][:, :2], s["goal"][:, :2]], 0)
    trees = []
    target = int(0.12 * side * side)
    for _ in range(target * 4):
        if len(trees) >= target:
            break
        c = rng.uniform(-half + 0.5, half - 0.5, 2)
        if np.min(np.linalg.norm(keep - c, axis=-1)) > 0.6:
            trees.append([c[0], c[1], 0.5, 0.3, 0.3, 1.0])
    m.world_boxes = np.asarray(trees) if trees else np.zeros((0, 6))
    return m


def run_scale(n_agents: int, max_iter: int, full: bool, log_dir: str):
    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m = make_forest_mission(n_agents)
    param = Param(
        world_dimension=2, world_use_octomap=True, communication_range=3.0,
        multisim_save_result=False, multisim_max_planner_iteration=max_iter,
        max_obstacles=16,
    )
    sim = MultiSyncSimulator(param, m, log_dir=log_dir)
    t0 = time.time()
    step_times = []
    for it in range(max_iter):
        if full and sim.is_finished():
            break
        ts = time.time()
        if it > 0:
            sim.do_step()
        sim.decentralized_mapp()
        ok = sim.plan()
        sim.save_simulation_result()
        step_times.append(time.time() - ts)
        if not ok:
            break
    sim.total_flight_time = (
        sim.sim_time if full and sim.is_finished() else float("inf")
    )
    st = np.asarray(step_times[2:])  # skip compile steps
    out = {
        "agents": n_agents,
        "steps": len(step_times),
        "flight_time_s": sim.total_flight_time,
        "distance_m": sim.total_distance(),
        "safety_ratio_agent": float(sim.safety_ratio_agent),
        "collided": bool(sim.is_collided),
        "qp_failed": bool(sim.qp_failed),
        "step_ms_mean": float(st.mean() * 1e3) if len(st) else None,
        "step_ms_p99": float(np.percentile(st, 99) * 1e3) if len(st) else None,
        "wall_s": time.time() - t0,
        "platform": jax.default_backend(),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--smoke-agents", type=int, default=256)
    ap.add_argument("--max-iter", type=int, default=400)
    ap.add_argument("--smoke-iter", type=int, default=15)
    ap.add_argument("--log-dir", default="log/scale")
    ap.add_argument("--skip-smoke", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.log_dir, exist_ok=True)
    results = []
    r = run_scale(args.agents, args.max_iter, full=True, log_dir=args.log_dir)
    print(json.dumps(r), flush=True)
    results.append(r)
    if not args.skip_smoke:
        r = run_scale(args.smoke_agents, args.smoke_iter, full=False,
                      log_dir=args.log_dir)
        print(json.dumps(r), flush=True)
        results.append(r)
    with open(os.path.join(args.log_dir, "scale_demo.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
