"""Linear Safe Corridor (LSC) family construction — batched over
(agent × obstacle × segment).

Capability parity with the reference's constraint generation (reference:
src/traj_planner.cpp — generateLSC :611-657, generateCLSC :659-706,
generateBVC :708-736, generateReciprocalRSFC :581-609,
normalVectorBetweenPolys :1179-1205 via openGJK, downwashBetween
:1229-1260, coordinate transform :1262-1267).

Everything is a fixed-shape tensor op:

  inputs  initial_ctrl [A, M, N, 3]          (agent initial trajectories)
          obs_ctrl     [A, O, M, N, 3]       (predicted obstacle trajs,
                                              per agent — each agent sees
                                              its own neighbor set)
          obs_mask     [A, O]                (valid neighbor slots)
  output  normals      [A, O, M, 3]
          anchors      [A, O, M, N, 3]       (obs control points)
          margins      [A, O, M, N]

An LSC row means   (x_{m,i} − anchor_{o,m,i})·normal_{o,m} ≥ margin_{o,m,i}
(reference LSC definition: collision_constraints.hpp:17-19).

Padded (masked) slots produce zero normals, which the QP assembly turns
into vacuous rows — same convention the reference uses to skip
zero-normal constraints (traj_optimizer.cpp:421-423).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lsc_dr_planner_tpu.ops import geometry

_EPS_F = 1e-6


class LSCSet(NamedTuple):
    normals: jnp.ndarray  # [A, O, M, 3]
    anchors: jnp.ndarray  # [A, O, M, N, 3]
    margins: jnp.ndarray  # [A, O, M, N]


def downwash_between(agent_radius, agent_downwash, obs_radius, obs_downwash, obs_is_agent):
    """Pairwise combined downwash coefficient.

    Reference: TrajPlanner::downwashBetween, src/traj_planner.cpp:1229-1242.
    """
    dw_agent = (agent_downwash * agent_radius + obs_downwash * obs_radius) / (
        agent_radius + obs_radius
    )
    dw_obs = (agent_radius + obs_downwash * obs_radius) / (agent_radius + obs_radius)
    return jnp.where(obs_is_agent, dw_agent, dw_obs)


def _z_scale(x, dw):
    """Divide the z component by dw (broadcast over trailing dims)."""
    z = x[..., 2] / dw
    return jnp.concatenate([x[..., :2], z[..., None]], axis=-1)


def build_lsc(
    initial_ctrl,  # [A, M, N, 3]
    obs_ctrl,  # [A, O, M, N, 3]
    obs_pred_sizes,  # [A, O, M, N] (radius + uncertainty inflation)
    agent_radius,  # [A]
    agent_downwash,  # [A]
    obs_radius,  # [A, O]
    obs_downwash,  # [A, O]
    obs_is_agent,  # [A, O] bool
    obs_position,  # [A, O, 3] current obstacle positions (normal fallback)
    current_goal,  # [A, 3]
    obs_mask,  # [A, O] bool
) -> LSCSet:
    """LSC (RAL-2022): normal from the closest point between the origin
    and the hull of relative control points in downwash-scaled
    coordinates; margin ½(r_i+r_j + rel·n) for agents, predicted size +
    radius for dynamic obstacles.

    Reference: TrajPlanner::generateLSC, src/traj_planner.cpp:611-657.
    """
    A, O, M, N, _ = obs_ctrl.shape
    dw = downwash_between(
        agent_radius[:, None],
        agent_downwash[:, None],
        obs_radius,
        obs_downwash,
        obs_is_agent,
    )  # [A, O]
    dwb = dw[..., None, None]  # [A, O, 1, 1] broadcast over (M, N)

    init_b = jnp.broadcast_to(initial_ctrl[:, None], obs_ctrl.shape)
    init_t = _z_scale(init_b, dwb)
    obs_t = _z_scale(obs_ctrl, dwb)
    rel = init_t - obs_t  # [A, O, M, N, 3]

    closest, dist = geometry.closest_point_origin_to_hull(rel)  # [A,O,M,3], [A,O,M]
    normal = closest / jnp.maximum(dist[..., None], _EPS_F)

    # degenerate-hull fallback: direction from obstacle to the agent's goal
    fallback_dir = _z_scale(
        current_goal[:, None, :] - obs_position, dw
    )
    fallback = fallback_dir / jnp.maximum(
        jnp.linalg.norm(fallback_dir, axis=-1, keepdims=True), _EPS_F
    )
    degenerate = dist[..., None] < _EPS_F  # [A, O, M, 1]
    normal = jnp.where(degenerate, fallback[:, :, None, :], normal)

    # margins
    collision_dist = (agent_radius[:, None] + obs_radius)[..., None, None]  # [A,O,1,1]
    proj = jnp.einsum("aomnd,aomd->aomn", rel, normal)
    d_agent = 0.5 * (collision_dist + proj)
    d_dyn = obs_pred_sizes + agent_radius[:, None, None, None]
    margins = jnp.where(obs_is_agent[..., None, None], d_agent, d_dyn)

    # back to world coordinates: n_z /= downwash
    normal = jnp.concatenate(
        [normal[..., :2], (normal[..., 2] / dw[..., None])[..., None]], axis=-1
    )

    normal = jnp.where(obs_mask[..., None, None], normal, 0.0)
    return LSCSet(normals=normal, anchors=obs_ctrl, margins=margins)


def build_clsc(
    initial_ctrl,
    obs_ctrl,
    obs_goal,  # [A, O, 3] neighbor goal points
    agent_radius,
    agent_downwash,
    obs_radius,
    obs_downwash,
    obs_is_agent,
    current_goal,
    obs_mask,
    world_dimension: int,
) -> LSCSet:
    """Communication-aware LSC (used with the DR layer): segments
    m < M−1 like plain LSC; the last segment's constraint is built from
    the closest points between the line segments (obs end → obs goal)
    and (agent end → agent goal), anchored at the obstacle-side closest
    point.

    Reference: TrajPlanner::generateCLSC, src/traj_planner.cpp:659-706
    (in 2D no downwash transform is applied, :668-674).
    """
    A, O, M, N, _ = obs_ctrl.shape
    dw = downwash_between(
        agent_radius[:, None],
        agent_downwash[:, None],
        obs_radius,
        obs_downwash,
        obs_is_agent,
    )
    if world_dimension == 2:
        dw_eff = jnp.ones_like(dw)
    else:
        dw_eff = dw
    dwb = dw_eff[..., None, None]

    init_b = jnp.broadcast_to(initial_ctrl[:, None], obs_ctrl.shape)
    init_t = _z_scale(init_b, dwb)
    obs_t = _z_scale(obs_ctrl, dwb)
    rel = init_t - obs_t

    closest, dist = geometry.closest_point_origin_to_hull(rel)
    normal_poly = closest / jnp.maximum(dist[..., None], _EPS_F)

    collision_dist = (agent_radius[:, None] + obs_radius)[..., None, None]
    proj = jnp.einsum("aomnd,aomd->aomn", rel, normal_poly)
    margins_poly = 0.5 * (collision_dist + proj)

    # ---- last segment: line-segment-to-line-segment construction
    obs_last = obs_t[..., M - 1, N - 1, :]  # [A, O, 3]
    agent_last = init_t[..., M - 1, N - 1, :]  # [A, O, 3] (same per O)
    obs_goal_t = _z_scale(obs_goal, dw_eff)
    agent_goal_t = _z_scale(
        jnp.broadcast_to(current_goal[:, None, :], (A, O, 3)), dw_eff
    )

    cp_obs, cp_agent, seg_dist = geometry.closest_between_segments(
        obs_last, obs_goal_t, agent_last, agent_goal_t
    )
    normal_last = (cp_agent - cp_obs) / jnp.maximum(seg_dist[..., None], _EPS_F)
    margin_last = 0.5 * (collision_dist[..., 0, 0] + seg_dist)  # [A, O]

    # Feasibility guard (DLSC sub-step): the line-to-line plane supports
    # the SEGMENT [traj end → goal], so in LSC dt-mode the initial last
    # segment — a stationary point at the trajectory end, ON that line
    # (stop-at-horizon) — always satisfies it. In sub-step mode the
    # initial last segment is the subSegment-reparameterized previous
    # segment, a real moving arc whose interior control points can sit
    # BEHIND the plane (measured 0.16 m at contact wedges,
    # maze10_sparse DLSC): the hold trajectory itself becomes
    # infeasible, the QP failsafes every step, and the body freezes
    # permanently. Where the initial last segment violates the CLSC
    # plane, fall back to the per-control-point hull plane (feasible by
    # construction, same as the m < M−1 rows).
    init_last = init_t[..., M - 1, :, :]  # [A, O, N, 3] (scaled frame)
    proj_init = jnp.einsum(
        "aond,aod->aon", init_last - cp_obs[..., None, :], normal_last
    )
    clsc_ok = jnp.all(
        proj_init >= margin_last[..., None] - 1e-4, axis=-1
    )  # [A, O]

    normal_m1 = jnp.where(
        clsc_ok[..., None], normal_last, normal_poly[..., M - 1, :]
    )
    margins_m1 = jnp.where(
        clsc_ok[..., None], margin_last[..., None],
        margins_poly[..., M - 1, :],
    )
    anchors_m1 = jnp.where(
        clsc_ok[..., None, None],
        jnp.broadcast_to(cp_obs[..., None, :], (A, O, N, 3)),
        obs_ctrl[..., M - 1, :, :],
    )

    # assemble: m < M-1 from hull, m = M-1 from segments (guarded)
    normal = normal_poly.at[..., M - 1, :].set(normal_m1)
    margins = margins_poly.at[..., M - 1, :].set(margins_m1)
    anchors = obs_ctrl.at[..., M - 1, :, :].set(anchors_m1)

    # back to world coords
    normal = jnp.concatenate(
        [normal[..., :2], (normal[..., 2] / dw[..., None])[..., None]], axis=-1
    )
    normal = jnp.where(obs_mask[..., None, None], normal, 0.0)
    return LSCSet(normals=normal, anchors=anchors, margins=margins)


def build_bvc(
    initial_ctrl,
    obs_ctrl,
    agent_radius,
    agent_downwash,
    obs_radius,
    obs_downwash,
    obs_is_agent,
    obs_mask,
) -> LSCSet:
    """Buffered Voronoi Cell: one constant separating plane per neighbor
    from current positions only.

    Reference: TrajPlanner::generateBVC, src/traj_planner.cpp:708-736.
    """
    A, O, M, N, _ = obs_ctrl.shape
    dw = downwash_between(
        agent_radius[:, None],
        agent_downwash[:, None],
        obs_radius,
        obs_downwash,
        obs_is_agent,
    )
    pa = _z_scale(jnp.broadcast_to(initial_ctrl[:, None, 0, 0, :], (A, O, 3)), dw)
    po = _z_scale(obs_ctrl[..., 0, 0, :], dw)
    rel = pa - po
    dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    normal = rel / jnp.maximum(dist, _EPS_F)
    collision_dist = (agent_radius[:, None] + obs_radius)[..., None]
    d = 0.5 * (collision_dist + jnp.sum(rel * normal, axis=-1, keepdims=True))

    normal = jnp.concatenate(
        [normal[..., :2], (normal[..., 2] / dw)[..., None]], axis=-1
    )
    normal = jnp.broadcast_to(normal[..., None, :], (A, O, M, 3))
    margins = jnp.broadcast_to(d[..., None], (A, O, M, N))
    normal = jnp.where(obs_mask[..., None, None], normal, 0.0)
    return LSCSet(normals=normal, anchors=obs_ctrl, margins=margins)


def build_reciprocal_rsfc(
    initial_ctrl,
    obs_ctrl,
    obs_pred_sizes,
    agent_radius,
    agent_downwash,
    obs_radius,
    obs_downwash,
    obs_is_agent,
    obs_mask,
) -> LSCSet:
    """Reciprocal RSFC (RAL-2021): per segment, normal from the closest
    approach of the two simultaneously-parameterized straight-line paths
    (segment start→end); margins from predicted sizes, averaged when the
    paths are already in conflict.

    Reference: TrajPlanner::generateReciprocalRSFC,
    src/traj_planner.cpp:581-609.
    """
    A, O, M, N, _ = obs_ctrl.shape
    obs_p1 = obs_ctrl[..., 0, :]  # [A, O, M, 3]
    obs_p2 = obs_ctrl[..., N - 1, :]
    ag_p1 = jnp.broadcast_to(initial_ctrl[:, None, :, 0, :], (A, O, M, 3))
    ag_p2 = jnp.broadcast_to(initial_ctrl[:, None, :, N - 1, :], (A, O, M, 3))

    cp_obs, cp_agent, dist = geometry.closest_between_line_paths(
        obs_p1, obs_p2, ag_p1, ag_p2
    )
    normal = (cp_agent - cp_obs) / jnp.maximum(dist[..., None], _EPS_F)

    size_sum = obs_pred_sizes + agent_radius[:, None, None, None]  # [A,O,M,N]
    in_conflict = obs_is_agent[..., None, None] & (
        dist[..., None] < size_sum
    )
    d = jnp.where(in_conflict, 0.5 * (size_sum + dist[..., None]), size_sum)

    dw = downwash_between(
        agent_radius[:, None],
        agent_downwash[:, None],
        obs_radius,
        obs_downwash,
        obs_is_agent,
    )
    # reference scales n_z by 1/downwash² here (traj_planner.cpp:602-604)
    normal = jnp.concatenate(
        [normal[..., :2], (normal[..., 2] / (dw[..., None] ** 2))[..., None]],
        axis=-1,
    )
    normal = jnp.where(obs_mask[..., None, None], normal, 0.0)
    return LSCSet(normals=normal, anchors=obs_ctrl, margins=d)
