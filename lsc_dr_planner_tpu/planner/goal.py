"""Goal planning / deadlock-resolution layer.

Capability parity with the reference's goal planning (reference:
src/traj_planner.cpp — dispatch :433-464, static :466-468, right-hand
rule :470-479, priority-based :481-538, grid-based (DR) :540-550) and
its helpers: the 1-D goal LP (src/goal_optimizer.cpp:109-164 — replaced
by a closed form), LOS-free goal selection + recursive sphere raycast
(src/grid_based_planner.cpp:539-601).

The goal LP is solved in closed form: minimizing t ∈ [0, 1] for
goal = (g_cur − w)·t + w subject to half-space constraints a·t ≥ b is a
max over per-constraint ratios — no LP solver needed; fully batched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6


def goal_lp(
    current_goal,  # [A, 3]
    next_waypoint,  # [A, 3]
    lsc_normals_last,  # [A, O, 3]  LSC normals at (m = M−1, i = n)
    lsc_anchor_last,  # [A, O, 3]
    lsc_margin_last,  # [A, O]
    lsc_valid,  # [A, O] bool
    sfc_lo_last,  # [A, 3] last-segment SFC box (world coords)
    sfc_hi_last,  # [A, 3]
    world_dimension: int,
    use_sfc: bool = True,
):
    """Pull the goal toward the next waypoint as far as the last-segment
    constraints allow: goal = (g − w)·t + w, minimize t ∈ [0, 1+ε]
    subject to  n·(goal − c) ≥ d  for each last-control-point LSC and
    each SFC face.

    Closed form: each constraint reads a·t ≥ b with a = n·(g − w),
    b = d + n·(c − w); so t ≥ b/a when a > 0, t ≤ b/a when a < 0.
    t* = clamp(max over lower ratios, 0, 1).

    Reference: GoalOptimizer::solve + populatebyrow,
    src/goal_optimizer.cpp:7-164 (a CPLEX 1-variable LP).
    """
    d = world_dimension
    g = current_goal[..., :d]
    w = next_waypoint[..., :d]
    gw = g - w  # [A, d]

    # LSC rows
    n_l = lsc_normals_last[..., :d]  # [A, O, d]
    a_l = jnp.einsum("aod,ad->ao", n_l, gw)
    b_l = lsc_margin_last + jnp.einsum(
        "aod,aod->ao", n_l, lsc_anchor_last[..., :d] - w[:, None, :]
    )
    valid_l = lsc_valid & (jnp.linalg.norm(n_l, axis=-1) > _EPS)

    lower_l = jnp.where(valid_l & (a_l > _EPS), b_l / a_l, -jnp.inf)
    upper_l = jnp.where(valid_l & (a_l < -_EPS), b_l / a_l, jnp.inf)
    # a ≈ 0 rows: feasibility requires b ≤ 0; if violated no t helps —
    # fall back to t = 1 (keep current goal), like the reference's
    # failsafe on LP failure.
    infeas_l = valid_l & (jnp.abs(a_l) <= _EPS) & (b_l > _EPS)

    lower = jnp.max(lower_l, axis=-1)
    upper = jnp.min(upper_l, axis=-1)

    if use_sfc:
        # SFC faces: w + t·gw ∈ [lo, hi] per axis
        lo = sfc_lo_last[..., :d]
        hi = sfc_hi_last[..., :d]
        # axis k: gw_k·t ≥ lo_k − w_k  and  −gw_k·t ≥ w_k − hi_k
        for sign, bound in ((1.0, lo), (-1.0, hi)):
            a_s = sign * gw
            b_s = sign * (bound - w)
            lower_s = jnp.where(a_s > _EPS, b_s / a_s, -jnp.inf)
            upper_s = jnp.where(a_s < -_EPS, b_s / a_s, jnp.inf)
            lower = jnp.maximum(lower, jnp.max(lower_s, axis=-1))
            upper = jnp.minimum(upper, jnp.min(upper_s, axis=-1))

    t = jnp.clip(jnp.maximum(lower, 0.0), 0.0, 1.0 + _EPS)
    infeasible = (t > upper + 1e-5) | jnp.any(infeas_l, axis=-1)
    t = jnp.where(infeasible, 1.0, t)

    goal = gw * t[..., None] + w
    if d == 2:
        goal = jnp.concatenate([goal, current_goal[..., 2:]], axis=-1)
    return goal, infeasible


def right_hand_goal(position, desired_goal, is_deadlock):
    """Right-hand-rule detour: rotate the goal direction about +z.

    Reference: goalPlanningWithRightHandRule, src/traj_planner.cpp:470-479.
    """
    z = jnp.asarray([0.0, 0.0, 1.0])
    detour = position + jnp.cross(desired_goal - position, z)
    return jnp.where(is_deadlock[..., None], detour, desired_goal)


def is_deadlock(planner_seq, velocity, position, desired_goal,
                vel_threshold: float, seq_threshold: int):
    """Velocity-threshold deadlock detection.

    Reference: TrajPlanner::isDeadlock, src/traj_planner.cpp:904-923.
    """
    dist = jnp.linalg.norm(position - desired_goal, axis=-1)
    speed = jnp.linalg.norm(velocity, axis=-1)
    return (
        (planner_seq > seq_threshold) & (speed < vel_threshold) & (dist > 0.2)
    )


# ----------------------------------------------------------------------
# LOS-free goal (host-side; used by the priority-based goal mode)
# ----------------------------------------------------------------------


def cast_ray(distance_fn, p0, p1, radius, world_max_dist=1.0, world_resolution=0.1,
             _depth=0) -> bool:
    """Recursive bisection sphere-check raycast.

    Reference: GridBasedPlanner::castRay,
    src/grid_based_planner.cpp:569-601.
    """
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    dist_to_goal = np.linalg.norm(p0 - p1)
    thresh = np.sqrt(0.25 * dist_to_goal**2 + radius**2)
    d0 = float(distance_fn(p0))
    d1 = float(distance_fn(p1))
    if d0 < radius + 0.5 * world_resolution - 1e-6:
        return False
    if d1 < radius + 0.5 * world_resolution - 1e-6:
        return False
    if thresh < world_max_dist and d0 > thresh and d1 > thresh:
        return True
    if _depth > 40:
        return True
    mid = 0.5 * (p0 + p1)
    return cast_ray(distance_fn, p0, mid, radius, world_max_dist,
                    world_resolution, _depth + 1) and cast_ray(
        distance_fn, mid, p1, radius, world_max_dist, world_resolution,
        _depth + 1)


def find_los_free_goal(distance_fn, current_position, path, goal_position,
                       radius, world_max_dist=1.0, world_resolution=0.1):
    """Walk the grid path (+ final goal); keep the farthest point with a
    collision-free straight line from `current_position`.

    Reference: GridBasedPlanner::findLOSFreeGoal,
    src/grid_based_planner.cpp:539-567.
    """
    los_free = np.asarray(current_position, dtype=np.float64)
    pts = list(path) + [np.asarray(goal_position, dtype=np.float64)]
    for p in pts:
        if cast_ray(distance_fn, current_position,
                    p, radius + 0.5 * world_resolution,
                    world_max_dist, world_resolution):
            los_free = np.asarray(p, dtype=np.float64)
        else:
            break
    if np.linalg.norm(los_free - np.asarray(current_position)) < 1e-6 and len(pts) > 2:
        los_free = np.asarray(pts[1], dtype=np.float64)
    return los_free
