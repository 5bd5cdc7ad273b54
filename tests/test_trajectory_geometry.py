"""Tests for batched trajectory ops and closest-point geometry."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linprog

from lsc_dr_planner_tpu.ops import geometry, trajectory

M, N, DT = 10, 5, 0.2


def test_const_vel_traj_eval():
    pos = jnp.array([[1.0, 2.0, 0.5], [0.0, -1.0, 0.0]])
    vel = jnp.array([[0.5, -0.25, 0.0], [1.0, 0.0, 0.1]])
    ctrl = trajectory.const_vel_ctrl(pos, vel, M, N, DT)
    assert ctrl.shape == (2, M, N + 1, 3)
    for t in [0.0, 0.37, 1.0, 1.99]:
        p = trajectory.eval_at(ctrl, t, DT)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(pos + vel * t), atol=1e-5
        )
    p, v, a = trajectory.state_at(ctrl, 0.73, DT)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-3)


def test_shift_one_segment():
    rng = np.random.default_rng(3)
    ctrl = jnp.asarray(rng.normal(size=(4, M, N + 1, 3)).astype(np.float32))
    out = trajectory.shift_one_segment(ctrl)
    np.testing.assert_allclose(np.asarray(out[:, :-1]), np.asarray(ctrl[:, 1:]))
    last = np.asarray(ctrl[:, -1, -1])
    for i in range(N + 1):
        np.testing.assert_allclose(np.asarray(out[:, -1, i]), last)


def test_subsegment_first_continuity():
    """After a sub-step shift by frac, the new first segment evaluated at 0
    equals the old trajectory at frac*dt."""
    rng = np.random.default_rng(4)
    ctrl = jnp.asarray(rng.normal(size=(M, N + 1, 3)))
    frac = 0.5
    out = trajectory.subsegment_first(ctrl, frac)
    p_new = trajectory.eval_at(out, 0.0, DT)
    p_old = trajectory.eval_at(ctrl, frac * DT, DT)
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_old), atol=1e-6)
    # and at the old segment end
    p_new1 = trajectory.eval_at(out, DT * 0.999999, DT)
    p_old1 = trajectory.eval_at(ctrl, DT * 0.999999, DT)
    np.testing.assert_allclose(np.asarray(p_new1), np.asarray(p_old1), atol=1e-4)


def test_downwash_transform():
    ctrl = jnp.ones((2, M, N + 1, 3))
    out = trajectory.downwash_transform(ctrl, jnp.array([2.0, 4.0]))
    expected = np.array([0.5, 0.25])[:, None, None] * np.ones((2, M, N + 1))
    np.testing.assert_allclose(np.asarray(out[..., 2]), expected)
    np.testing.assert_allclose(np.asarray(out[..., :2]), 1.0)


# ----------------------------------------------------------------------
# geometry
# ----------------------------------------------------------------------


def test_closest_point_on_segment():
    p = jnp.array([0.0, 1.0, 0.0])
    a = jnp.array([-1.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    cp = geometry.closest_point_on_segment(p, a, b)
    np.testing.assert_allclose(np.asarray(cp), [0, 0, 0], atol=1e-7)
    # beyond the end
    p2 = jnp.array([5.0, 1.0, 0.0])
    cp2 = geometry.closest_point_on_segment(p2, a, b)
    np.testing.assert_allclose(np.asarray(cp2), [1, 0, 0], atol=1e-7)


def test_closest_between_segments_crossing():
    p1 = jnp.array([-1.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    q1 = jnp.array([0.0, -1.0, 1.0])
    q2 = jnp.array([0.0, 1.0, 1.0])
    cp, cq, d = geometry.closest_between_segments(p1, p2, q1, q2)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cp), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cq), [0, 0, 1], atol=1e-6)


def test_closest_between_segments_parallel():
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    q1 = jnp.array([0.0, 2.0, 0.0])
    q2 = jnp.array([1.0, 2.0, 0.0])
    _, _, d = geometry.closest_between_segments(p1, p2, q1, q2)
    np.testing.assert_allclose(float(d), 2.0, atol=1e-6)


def test_closest_between_line_paths():
    # P(t) from (0,0,0) to (1,0,0); Q(t) from (1,1,0) to (0,1,0):
    # rel(t) = Q-P = (1-2t, 1, 0); min |rel| at t=0.5 → dist 1
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    q1 = jnp.array([1.0, 1.0, 0.0])
    q2 = jnp.array([0.0, 1.0, 0.0])
    cp, cq, d = geometry.closest_between_line_paths(p1, p2, q1, q2)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cp), [0.5, 0, 0], atol=1e-6)


def _hull_dist_lp(points):
    """Oracle: distance from origin to conv(points) by solving the
    min-norm QP with scipy (projected support via LP on random dirs is
    weak; use cvxopt-free active-set via scipy.optimize.minimize)."""
    from scipy.optimize import minimize

    K = len(points)

    def obj(lam):
        x = lam @ points
        return x @ x

    def jac(lam):
        x = lam @ points
        return 2 * points @ x

    cons = [{"type": "eq", "fun": lambda lam: lam.sum() - 1,
             "jac": lambda lam: np.ones(K)}]
    bounds = [(0, 1)] * K
    best = None
    for seed in range(3):
        rng = np.random.default_rng(seed)
        lam0 = rng.random(K)
        lam0 /= lam0.sum()
        res = minimize(obj, lam0, jac=jac, bounds=bounds, constraints=cons,
                       method="SLSQP", options={"maxiter": 200, "ftol": 1e-14})
        if best is None or res.fun < best:
            best = res.fun
    return np.sqrt(max(best, 0.0))


def test_closest_point_origin_to_hull_random():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(20, 6, 3)) + np.array([1.5, 0.5, 0.2])
    best, dist = geometry.closest_point_origin_to_hull(jnp.asarray(pts))
    for b in range(20):
        ref = _hull_dist_lp(pts[b])
        np.testing.assert_allclose(float(dist[b]), ref, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(best[b])), float(dist[b]), atol=1e-6
        )


def test_closest_point_origin_inside_hull():
    pts = np.array(
        [[1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1], [-1, -1, -1], [0.5, 0.5, 0.5]],
        dtype=float,
    )
    best, dist = geometry.closest_point_origin_to_hull(jnp.asarray(pts))
    np.testing.assert_allclose(float(dist), 0.0, atol=1e-7)


def test_hull_query_is_odd_under_negation():
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(8, 6, 3)) + np.array([2.0, 0.0, 0.0])
    b1, d1 = geometry.closest_point_origin_to_hull(jnp.asarray(pts))
    b2, d2 = geometry.closest_point_origin_to_hull(jnp.asarray(-pts))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(b1), -np.asarray(b2), atol=1e-7)


def test_distances():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([0.0, 0.0, 1.0])
    assert float(geometry.l_infinity_distance(a, b)) == 2.0
    np.testing.assert_allclose(
        float(geometry.ellipsoidal_distance(a, b, 2.0)),
        np.sqrt(1 + 4 + 1), atol=1e-6,
    )
