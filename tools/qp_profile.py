"""Pallas QP go/no-go profiler (SURVEY §7 phase 4 / VERDICT r1 item 10).

Measures the batched ADMM trajectory QP on the current accelerator and
decides whether a fused Pallas kernel is worth building:

  * setup cost (KKT assembly + batched Cholesky + inverse) vs iteration
    loop cost, at A ∈ {128, 1024};
  * per-ADMM-chunk wall time vs a bandwidth/latency speed-of-light
    estimate (all iteration state resident: ξ, z, y, Kinv, normals);
  * verdict: GO if the measured chunk time exceeds ~3× the
    speed-of-light estimate (i.e., XLA is leaving >2/3 on the table —
    enough to justify a hand-fused VMEM-resident kernel), else NO-GO.

Writes log/qp_profile.json and prints one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def profile(A: int, iters_timed: int = 10):
    from bench import build_fleet, make_evolve_step
    from lsc_dr_planner_tpu.ops import qp

    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        p, planner, fleet, inp = build_fleet(A)
        fleet = jax.tree_util.tree_map(np.asarray, fleet)
        inp = jax.tree_util.tree_map(np.asarray, inp)
    fleet = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), fleet)
    inp = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), inp)

    # drive a few full steps to get a realistic mid-flight QP problem
    step = make_evolve_step(p, planner, fleet)
    for _ in range(3):
        inp, _ = step(inp)

    # capture QP inputs via the debug path (eager) once
    planner.debug = True
    out = planner._step_impl(fleet, inp)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    planner.debug = False
    cfg = planner.qp_cfg

    dim, M, n, N = cfg.dim, cfg.M, cfg.n, cfg.N
    f32 = jnp.float32
    dbg = planner._dbg
    ls = dbg["ls"]
    qp_inp = qp.QPInputs(
        p0=inp.pos[:, :dim].astype(f32),
        v0=inp.vel[:, :dim].astype(f32),
        a0=inp.acc[:, :dim].astype(f32),
        goal=dbg["new_goal"][:, :dim].astype(f32),
        terminal_mask=dbg["terminal_mask"],
        lsc_normals=ls.normals[..., :dim].astype(f32),
        lsc_rhs=dbg["rhs"].astype(f32),
        lsc_active=dbg["active"],
        vmax=fleet.max_vel[:, :dim].astype(f32),
        amax=fleet.max_acc[:, :dim].astype(f32),
        lb=dbg["lb"], ub=dbg["ub"],
        comm_halfrange=jnp.full((A,), 1.35, f32),
        x0=dbg["initial_ctrl"][..., :dim].transpose(0, 3, 1, 2).astype(f32),
    )

    # (a) full solve
    solve = jax.jit(lambda i: qp.solve(cfg, i))
    r = solve(qp_inp); r.x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters_timed):
        r = solve(qp_inp)
    r.x.block_until_ready()
    t_full = (time.perf_counter() - t0) / iters_timed

    # (b) two-point slope: solves capped at 1 chunk vs 5 chunks isolate
    # per-chunk cost from the fixed setup (assembly + Cholesky + inverse)
    def timed(max_iter):
        cfgk = cfg._replace(max_iter=max_iter)
        fn = jax.jit(lambda i: qp.solve(cfgk, i))
        rr = fn(qp_inp); rr.x.block_until_ready()
        best = np.inf
        for _ in range(iters_timed):
            t0 = time.perf_counter()
            rr = fn(qp_inp)
            rr.x.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best, rr

    t_1, r1 = timed(8)
    t_5, r5 = timed(40)
    ck1 = max(1, int(np.asarray(r1.iterations).max()) // 8)
    ck5 = max(1, int(np.asarray(r5.iterations).max()) // 8)
    if ck5 > ck1 and t_5 > t_1:
        t_chunk = (t_5 - t_1) / (ck5 - ck1)
    else:
        t_chunk = t_5 / max(ck5, 1)
    t_setup = max(t_1 - ck1 * t_chunk, 0.0)

    it = int(np.asarray(r.iterations).max())
    t_loop = max(t_full - t_setup, 1e-9)

    # speed-of-light estimate for one chunk (8 iterations): the dominant
    # resident state is Kinv [A, dK, dK] (read once per iteration for the
    # matvec) + iterate vectors; HBM BW ~ 819 GB/s on v5e. If everything
    # but Kinv fits VMEM, a fused kernel still re-reads Kinv.
    from lsc_dr_planner_tpu.ops.qp import _solver_statics
    st = _solver_statics(cfg)
    dK = dim * st["K"]
    bytes_per_iter = A * dK * dK * 4  # Kinv matvec read
    HBM_BW = 819e9 if jax.default_backend() == "tpu" else 100e9
    t_sol_chunk = 8 * bytes_per_iter / HBM_BW

    verdict = "GO" if t_chunk > 3 * t_sol_chunk else "NO-GO"
    row = {
        "A": A,
        "backend": jax.default_backend(),
        "dK": int(dK),
        "iterations_max": it,
        "t_full_ms": round(t_full * 1e3, 3),
        "t_setup_ms": round(t_setup * 1e3, 3),
        "t_loop_ms": round(t_loop * 1e3, 3),
        "t_chunk_ms": round(t_chunk * 1e3, 4),
        "t_chunk_speed_of_light_ms": round(t_sol_chunk * 1e3, 4),
        "xla_vs_sol": round(t_chunk / max(t_sol_chunk, 1e-12), 1),
        "pallas_verdict": verdict,
    }
    return row


def main():
    rows = []
    for A in (128, 1024):
        row = profile(A)
        print(json.dumps(row), flush=True)
        rows.append(row)
    os.makedirs("log", exist_ok=True)
    with open("log/qp_profile.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
