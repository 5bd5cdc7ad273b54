"""Batched piecewise-Bézier trajectory operations.

A trajectory is a plain array of control points `ctrl` with shape
[..., M, n+1, D] (uniform segment time dt). All ops batch over the
leading axes — agents, obstacles, scenarios.

Capability parity with the reference's Trajectory/Segment classes
(reference: include/trajectory.hpp:9-76, src/trajectory.cpp): evaluation
(:111-148), state via derivative control points (:151-199), subSegment
re-parameterization (:14-49), constant-velocity initialization (:79-91),
downwash coordinate transform (:207-219).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lsc_dr_planner_tpu.ops import bernstein


def const_vel_ctrl(pos, vel, M: int, n: int, dt: float):
    """Constant-velocity trajectory control points.

    pos, vel: [..., D] → ctrl [..., M, n+1, D] with
    ctrl[m, i] = pos + vel·(m + i/n)·dt (control points of a linear
    curve are uniformly spaced along it).

    Reference: Trajectory::planConstVelTraj, src/trajectory.cpp:79-91.
    (The reference accumulates time across the segment boundary one
    extra dt/n per segment, yielding a slightly discontinuous curve;
    we build the exactly continuous constant-velocity curve instead.)
    """
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    m = jnp.arange(M, dtype=pos.dtype)[:, None]
    i = jnp.arange(n + 1, dtype=pos.dtype)[None, :]
    t = (m + i / n) * dt  # [M, n+1]
    return pos[..., None, None, :] + vel[..., None, None, :] * t[..., :, :, None]


def derivative_ctrl(ctrl, dt: float):
    """Derivative trajectory control points: [..., M, n+1, D] → [..., M, n, D].

    Reference: Trajectory::derivative, src/trajectory.cpp:181-198.
    """
    n = ctrl.shape[-2] - 1
    return (ctrl[..., 1:, :] - ctrl[..., :-1, :]) * (n / dt)


def eval_at(ctrl, t, dt: float):
    """Evaluate the trajectory at time t (segment-local Bernstein basis).

    ctrl: [..., M, n+1, D]; t scalar or broadcastable to the batch shape.
    Returns [..., D].
    Reference: Trajectory::getPointAt, src/trajectory.cpp:111-148.
    """
    M, n_ctrl, _ = ctrl.shape[-3:]
    n = n_ctrl - 1
    batch = ctrl.shape[:-3]
    t = jnp.broadcast_to(jnp.asarray(t, dtype=ctrl.dtype), batch)
    seg = jnp.clip(jnp.floor(t / dt), 0, M - 1).astype(jnp.int32)
    tau = jnp.clip(t / dt - seg.astype(ctrl.dtype), 0.0, 1.0)
    basis = bernstein.bernstein_basis(n, tau)  # [..., n+1]
    c = jnp.take_along_axis(ctrl, seg[..., None, None, None], axis=-3)[..., 0, :, :]
    return jnp.einsum("...i,...id->...d", basis, c)


def state_at(ctrl, t, dt: float):
    """(position, velocity, acceleration) at time t.

    Reference: Trajectory::getStateAt, src/trajectory.cpp:155-170.
    """
    d1 = derivative_ctrl(ctrl, dt)
    d2 = derivative_ctrl(d1, dt)
    return (
        eval_at(ctrl, t, dt),
        eval_at(d1, t, dt),
        eval_at(d2, t, dt),
    )


def shift_one_segment(ctrl):
    """LSC previous-solution shift: drop the first segment, repeat the
    last point as a stationary final segment.

    ctrl: [..., M, n+1, D] → same shape;
    out[m] = ctrl[m+1] for m < M−1, out[M−1][i] = ctrl[M−1][n] ∀i.

    Reference: obstaclePredictionWithPrevSol / initialTrajPlanningPrevSol,
    src/traj_planner.cpp:286-296, 402-411.
    """
    last_pt = ctrl[..., -1:, -1:, :]
    n_ctrl = ctrl.shape[-2]
    hold = jnp.broadcast_to(last_pt, ctrl.shape[:-3] + (1, n_ctrl, ctrl.shape[-1]))
    return jnp.concatenate([ctrl[..., 1:, :, :], hold], axis=-3)


def subsegment_first(ctrl, frac: float):
    """DLSC sub-step shift: re-parameterize the first segment to
    [frac, 1] and keep the rest — C⁰-continuous relaxed-LSC prediction.

    Reference: src/traj_planner.cpp:298-305 and Segment::subSegment,
    src/trajectory.cpp:14-49.
    """
    n = ctrl.shape[-2] - 1
    S = jnp.asarray(bernstein.subsegment_matrix(n, frac, 1.0), dtype=ctrl.dtype)
    first = jnp.einsum("ij,...id->...jd", S, ctrl[..., 0, :, :])
    return jnp.concatenate([first[..., None, :, :], ctrl[..., 1:, :, :]], axis=-3)


def downwash_transform(ctrl, downwash):
    """Scale z by 1/downwash (ellipsoidal → spherical collision model).

    downwash: scalar or [...] broadcastable over ctrl[..., M, n+1, 3].
    Reference: Trajectory::coordinateTransform, src/trajectory.cpp:207-219.
    """
    dw = jnp.asarray(downwash)[..., None, None]
    z = ctrl[..., 2] / dw
    return jnp.concatenate([ctrl[..., :2], z[..., None]], axis=-1)


def start_point(ctrl):
    return ctrl[..., 0, 0, :]


def last_point(ctrl):
    return ctrl[..., -1, -1, :]


def total_length(ctrl, dt: float, samples_per_seg: int = 10):
    """Approximate arc length by uniform sampling (for flight-distance
    style metrics)."""
    M = ctrl.shape[-3]
    ts = np.linspace(0.0, M * dt, M * samples_per_seg + 1)
    pts = jnp.stack([eval_at(ctrl, t, dt) for t in ts], axis=-2)
    seglen = jnp.linalg.norm(jnp.diff(pts, axis=-2), axis=-1)
    return jnp.sum(seglen, axis=-1)
