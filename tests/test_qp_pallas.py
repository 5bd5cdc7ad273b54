"""Pallas ADMM kernel equivalence (interpret mode on CPU).

The kernel (ops/qp_pallas.py) must solve the same QPs as the XLA
reference loop: identical converged set, feasible rows, and matching
objectives to solver tolerance. Exact iterate equality is NOT expected —
the kernel exits per block and drops the redundant dual-residual gate —
so the contract is the one the planner relies on: feasibility at the
gate + near-optimal objective.
"""

import os

import numpy as np
import pytest

from lsc_dr_planner_tpu.config import GoalMode, Param


def _mini_qp(A=5, seed=0):
    """A realistic batched QP from the bench fleet (crossing agents with
    active LSC rows)."""
    import jax
    import jax.numpy as jnp

    from lsc_dr_planner_tpu.ops import qp, trajectory
    from lsc_dr_planner_tpu.planner.pipeline import (
        FleetArrays, FleetPlanner, StepInputs,
    )
    from lsc_dr_planner_tpu.world.grid import build_grid_world

    rng = np.random.default_rng(seed)
    p = Param(world_use_octomap=False, goal_mode=GoalMode.STATIC,
              communication_range=3.0, max_obstacles=6,
              qp_max_iter=400, qp_rescue_iter=1600)
    # ring of agents stepping one radian clockwise: active LSC rows
    # between neighbors, goals ~1 m out — a well-conditioned instance
    # both solvers certify (far-goal cold starts are the straggler
    # regime and converge past the iteration budget in BOTH paths)
    ang = 2 * np.pi * np.arange(A) / A
    pos2 = 1.6 * np.stack([np.cos(ang), np.sin(ang)], -1) \
        + rng.uniform(-0.05, 0.05, (A, 2))
    ang2 = ang + 0.7
    goal2 = 1.6 * np.stack([np.cos(ang2), np.sin(ang2)], -1) \
        + rng.uniform(-0.05, 0.05, (A, 2))
    world = build_grid_world(np.zeros((0, 6)), [-6, -6, 0], [6, 6, 1.5],
                             p.world_resolution, 0.15)
    planner = FleetPlanner(p, world, A, max_dynobs=0, agent_radius=0.15)
    f32 = jnp.float32
    pos = np.concatenate([pos2, np.full((A, 1), p.world_z_2d)], 1)
    goal = np.concatenate([goal2, np.full((A, 1), p.world_z_2d)], 1)
    fleet = FleetArrays(
        radius=jnp.full((A,), 0.15, f32), downwash=jnp.full((A,), 2.0, f32),
        max_vel=jnp.ones((A, 3), f32), max_acc=jnp.full((A, 3), 2.0, f32),
        nominal_velocity=jnp.full((A,), 1.0, f32),
    )
    posj = jnp.asarray(pos, f32)
    ctrl = trajectory.const_vel_ctrl(posj, jnp.zeros((A, 3), f32), p.M,
                                     p.n, p.dt)
    inp = StepInputs(
        pos=posj, vel=jnp.zeros((A, 3), f32), acc=jnp.zeros((A, 3), f32),
        prev_ctrl=ctrl, has_prev=jnp.zeros((A,), bool),
        is_disturbed=jnp.zeros((A,), bool),
        desired_goal=jnp.asarray(goal, f32), current_goal=jnp.asarray(goal, f32),
        next_waypoint=posj,  # waypoint box must contain the pinned start
        sfc_lo=jnp.zeros((A, p.M, 3), jnp.int32),
        sfc_hi=jnp.zeros((A, p.M, 3), jnp.int32),
        sfc_initialized=jnp.zeros((A,), bool),
        planner_seq=jnp.int32(1),
        dynobs_pos=jnp.zeros((0, 3), f32), dynobs_vel=jnp.zeros((0, 3), f32),
        dynobs_radius=jnp.zeros((0,), f32), dynobs_downwash=jnp.zeros((0,), f32),
        dynobs_max_acc=jnp.zeros((0,), f32), dynobs_valid=jnp.zeros((0,), bool),
    )
    d = planner._step_impl(fleet, inp, defer_qp=True)
    return planner.qp_cfg, d.qp_inp, planner.feas_tol


def test_pallas_interpret_matches_xla():
    cfg, qp_inp, feas_tol = _mini_qp()
    from lsc_dr_planner_tpu.ops import qp

    os.environ["LSC_QP_PALLAS"] = "0"
    try:
        ref = qp.solve(cfg, qp_inp, feas_tol=feas_tol)
        os.environ["LSC_QP_PALLAS"] = "interpret"
        out = qp.solve(cfg, qp_inp, feas_tol=feas_tol)
    finally:
        os.environ.pop("LSC_QP_PALLAS", None)

    ref_conv = np.asarray(ref.converged)
    out_conv = np.asarray(out.converged)
    # both paths must certify every agent on this feasible instance
    assert ref_conv.all(), np.asarray(ref.primal_residual)
    assert out_conv.all(), np.asarray(out.primal_residual)
    # matching objectives to exit-time slop (the kernel exits per block
    # and drops the redundant dual-residual gate, so iterates stop at
    # slightly different ε-optimal points)
    obj_ref = np.asarray(ref.objective)
    obj_out = np.asarray(out.objective)
    assert np.allclose(obj_ref, obj_out,
                       rtol=2e-2, atol=2e-2), (obj_ref, obj_out)
    # feasibility of the kernel's control points at the planner gate
    assert np.asarray(out.primal_residual).max() < feas_tol
    # trajectories agree to solver tolerance
    assert np.max(np.abs(np.asarray(ref.x) - np.asarray(out.x))) < 0.1
