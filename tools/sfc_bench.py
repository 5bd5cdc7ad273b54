"""SFC stage microbenchmark: time the vmapped expand/update in isolation
across fleet sizes and clamp radii, to localize the A=1024 cliff.

Usage: python tools/sfc_bench.py [--sizes 128,256,512,768,1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="128,256,512,768,1024")
    ap.add_argument("--clamps", default="30")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsc_dr_planner_tpu.ops import sfc as sfcmod
    from lsc_dr_planner_tpu.world.grid import build_grid_world

    rng = np.random.default_rng(0)
    # the A=1024 bench world: 42.4 m, 0.25 trees/m^2
    half = 0.6 * 32 + 2.0
    n_trees = int(0.25 * (2 * half) ** 2)
    trees = np.stack([
        rng.uniform(-half + 0.5, half - 0.5, n_trees),
        rng.uniform(-half + 0.5, half - 0.5, n_trees),
        np.full(n_trees, 0.5), np.full(n_trees, 0.3),
        np.full(n_trees, 0.3), np.full(n_trees, 1.0),
    ], 1)
    wmin = np.array([-half, -half, 0.0])
    wmax = np.array([half, half, 1.0])
    world = build_grid_world(trees, wmin, wmax, 0.1, 0.15)

    dev = jax.devices()[0]
    for clamp in [int(c) for c in args.clamps.split(",")]:
        for A in [int(s) for s in args.sizes.split(",")]:
            pos = np.stack([
                rng.uniform(-half + 1, half - 1, A),
                rng.uniform(-half + 1, half - 1, A),
                np.full(A, 0.6),
            ], 1).astype(np.float32)
            goal = -pos + rng.normal(0, 0.1, (A, 3)).astype(np.float32)
            goal[:, 2] = 0.6

            M = 10

            def one(pos_i, goal_i):
                lo, hi, ok = sfcmod.initialize_sfc(
                    world, pos_i, M, max_radius_cells=clamp)
                hull = jnp.stack([pos_i, goal_i], 0)
                lo2, hi2, ok2 = sfcmod.construct_sfc_from_hull(
                    world, lo, hi, hull, goal_i, max_radius_cells=clamp)
                return lo2, hi2

            fn = jax.jit(jax.vmap(one))
            pj = jax.device_put(jnp.asarray(pos), dev)
            gj = jax.device_put(jnp.asarray(goal), dev)
            out = fn(pj, gj)
            out[0].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(pj, gj)
            out[0].block_until_ready()
            dt = (time.perf_counter() - t0) / args.reps
            print(json.dumps({"A": A, "clamp": clamp,
                              "sfc_ms": round(dt * 1e3, 2),
                              "per_agent_us": round(dt / A * 1e6, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
