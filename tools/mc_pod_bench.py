"""Pod-config Monte-Carlo throughput: A agents × S scenarios in one
vmapped device call per step, host MAPF threaded across scenarios
(BASELINE.json pod config: 1024 agents × 256 scenarios; this measures
the single-chip slice A×S and reports host/device split so the S-axis
cost is visible).

Usage: python tools/mc_pod_bench.py [--A 1024] [--S 8] [--steps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--A", type=int, default=1024)
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.montecarlo import MonteCarloSimulator

    A, S = args.A, args.S
    half = max(6.0, 0.7 * float(np.sqrt(A)))
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        mission = generate_random_mission(
            A, [-half, -half, 0], [half, half, 2.5], seed=0,
        )
        param = Param(world_use_octomap=False, communication_range=3.0,
                      profile_stages=False)
        mc = MonteCarloSimulator(param, mission, n_scenarios=S,
                                 max_noise=0.25, log_dir="/tmp/mc_pod")
    t_build = time.perf_counter() - t0
    print(json.dumps({"built_s": round(t_build, 1), "A": A, "S": S}),
          flush=True)

    # warm-up (compile)
    mc.step(0)
    import lsc_dr_planner_tpu.sim.montecarlo as mcmod
    import jax as _jax, numpy as _np

    t0 = time.perf_counter()
    phase = {"host": 0.0, "stack": 0.0, "device": 0.0, "apply": 0.0}
    for it in range(1, args.steps + 1):
        h0 = time.perf_counter()
        inputs = list(mc._pool.map(
            lambda sim: (sim.do_step() if (not sim.is_finished() and it > 0) else None,
                         sim.decentralized_mapp(), sim._build_step_inputs())[-1],
            mc.sims))
        h1 = time.perf_counter(); phase["host"] += h1 - h0
        stacked = _jax.tree_util.tree_map(lambda *l: _np.stack(l), *inputs)
        h2 = time.perf_counter(); phase["stack"] += h2 - h1
        outs = mc._vstep(mc.fleet, stacked)
        outs_np = _jax.tree_util.tree_map(
            lambda x: _np.asarray(x) if x is not None else None, outs)
        h3 = time.perf_counter(); phase["device"] += h3 - h2
        for s2, sim in enumerate(mc.sims):
            out_s = _jax.tree_util.tree_map(
                lambda x: x[s2] if x is not None else None, outs_np)
            sim._apply_step_outputs(out_s)
            sim.save_simulation_result()
        phase["apply"] += time.perf_counter() - h3
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "A": A, "S": S, "steps": args.steps,
        "step_s": round(dt, 3),
        "agent_scenario_steps_per_s": round(A * S / dt, 1),
        "phases_s": {k: round(v / args.steps, 3) for k, v in phase.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
