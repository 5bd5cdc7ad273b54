"""Golden tests for the Bernstein math core against closed forms."""

import numpy as np
import pytest

from lsc_dr_planner_tpu.ops import bernstein


def _bernstein_ref(n, i, t):
    from math import comb

    return comb(n, i) * t**i * (1 - t) ** (n - i)


def test_basis_matrix_monomial_expansion():
    n = 5
    B = bernstein.basis_matrix(n)
    ts = np.linspace(0, 1, 11)
    for i in range(n + 1):
        # row i = monomial coefficients of b_{i,n}
        vals_from_B = np.polyval(B[i][::-1][::1][::-1], ts)  # coeffs low->high
        vals_from_B = sum(B[i, j] * ts**j for j in range(n + 1))
        vals_ref = [_bernstein_ref(n, i, t) for t in ts]
        np.testing.assert_allclose(vals_from_B, vals_ref, atol=1e-12)


def test_basis_matrix_inverse():
    for n in (3, 5, 7):
        B = bernstein.basis_matrix(n)
        Binv = bernstein.basis_matrix_inv(n)
        np.testing.assert_allclose(B @ Binv, np.eye(n + 1), atol=1e-9)


def test_bernstein_basis_partition_of_unity():
    taus = np.linspace(0, 1, 13)
    vals = np.asarray(bernstein.bernstein_basis(5, taus))
    np.testing.assert_allclose(vals.sum(-1), 1.0, atol=1e-6)
    # endpoint values
    np.testing.assert_allclose(np.asarray(bernstein.bernstein_basis(5, 0.0)),
                               [1, 0, 0, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(bernstein.bernstein_basis(5, 1.0)),
                               [0, 0, 0, 0, 0, 1], atol=1e-7)


def test_subsegment_matrix_evaluates_subcurve():
    n = 5
    rng = np.random.default_rng(0)
    c = rng.normal(size=(n + 1,))
    t0, tf = 0.3, 0.8
    S = bernstein.subsegment_matrix(n, t0, tf)
    c_sub = c @ S

    def eval_bez(coeffs, t):
        return sum(coeffs[i] * _bernstein_ref(n, i, t) for i in range(n + 1))

    for tau in np.linspace(0, 1, 9):
        np.testing.assert_allclose(
            eval_bez(c_sub, tau), eval_bez(c, t0 + (tf - t0) * tau), atol=1e-10
        )


def test_endpoint_difference_matrices_match_reference_n5():
    # Reference hardcodes these for n=5 (src/traj_optimizer.cpp:184-197)
    A0_ref = np.array(
        [
            [1, 0, 0, 0, 0, 0],
            [-1, 1, 0, 0, 0, 0],
            [1, -2, 1, 0, 0, 0],
            [-1, 3, -3, 1, 0, 0],
            [1, -4, 6, -4, 1, 0],
            [-1, 5, -10, 10, -5, 1],
        ],
        dtype=float,
    )
    AT_ref = np.array(
        [
            [0, 0, 0, 0, 0, 1],
            [0, 0, 0, 0, -1, 1],
            [0, 0, 0, 1, -2, 1],
            [0, 0, -1, 3, -3, 1],
            [0, 1, -4, 6, -4, 1],
            [-1, 5, -10, 10, -5, 1],
        ],
        dtype=float,
    )
    A0, AT = bernstein.endpoint_difference_matrices(5)
    np.testing.assert_allclose(A0, A0_ref, atol=0)
    np.testing.assert_allclose(AT, AT_ref, atol=0)


def test_jerk_cost_matrix_matches_numeric_integral():
    """cᵀQc must equal ∫₀^dt p'''(t)² dt for the Bézier with ctrl pts c."""
    n, phi, dt = 5, 3, 0.2
    Q = bernstein.jerk_cost_matrix(n, phi, 1, dt)
    rng = np.random.default_rng(1)
    c = rng.normal(size=(n + 1,))

    # third derivative control points (chain through dt scaling)
    d = c.copy()
    deg = n
    T = dt
    for _ in range(phi):
        d = np.diff(d) * deg / T
        deg -= 1
    # d: degree n-phi Bernstein coefficients of p'''(t/\dt normalized)
    ts = np.linspace(0, 1, 20001)
    vals = sum(
        d[i] * _bernstein_ref(n - phi, i, ts) for i in range(n - phi + 1)
    )
    integral = np.trapezoid(vals**2, ts) * dt
    np.testing.assert_allclose(c @ Q @ c, integral, rtol=1e-6)


def test_continuity_matrix_zero_for_smooth_trajectory():
    """A trajectory whose segments are one global polynomial (re-based per
    segment) satisfies the junction-continuity rows exactly."""
    M, n, phi, dt = 4, 5, 3, 0.2
    A = bernstein.continuity_matrix(M, n, phi, dt)
    # Build a single degree-5 polynomial sampled into per-segment Bézier form
    rng = np.random.default_rng(2)
    mono = rng.normal(size=(n + 1,))  # global monomial coeffs over t in [0, M*dt]

    Binv = bernstein.basis_matrix_inv(n)
    ctrl = np.zeros((M, n + 1))
    for m in range(M):
        # local monomial coeffs: p(m*dt + tau*dt) expanded in tau
        local = np.zeros(n + 1)
        for j in range(n + 1):
            # (m dt + dt tau)^j
            for k in range(j + 1):
                local[k] += (
                    mono[j]
                    * bernstein.binom(j, k)
                    * (dt**k)
                    * ((m * dt) ** (j - k))
                )
        ctrl[m] = local @ Binv
    x = ctrl.reshape(-1)
    np.testing.assert_allclose(A @ x, 0.0, atol=1e-6)


def test_uncertainty_growth_ctrl_matches_polynomial():
    n, dt, amax, m = 5, 0.2, 2.0, 3
    c = bernstein.uncertainty_growth_ctrl(n, dt, amax, m)
    for tau in np.linspace(0, 1, 7):
        val = sum(c[i] * _bernstein_ref(n, i, tau) for i in range(n + 1))
        t = (m + tau) * dt
        np.testing.assert_allclose(val, 0.5 * amax * t * t, atol=1e-9)


def test_min_distance_between_curves_matches_bruteforce():
    """Batched curve–curve closest approach vs dense sampling.

    Reference semantics (distanceBetweenPolys, polynomial.hpp:176-279):
    interior local minima of ‖rel(t)‖ isolated from g = f·f′ sign
    changes; nearer endpoint when no interior minimum exists.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, B = 5, 64
    ca = rng.normal(0, 2.0, (B, n + 1, 3))
    cb = rng.normal(0, 2.0, (B, n + 1, 3))
    rel = jnp.asarray(ca - cb)

    dist, point = bernstein.min_distance_between_curves(rel)
    dist = np.asarray(dist)
    point = np.asarray(point)

    # brute force on a fine grid
    ts = np.linspace(0, 1, 4001)
    basis = np.asarray(bernstein.bernstein_basis(n, ts))  # [T, n+1]
    vals = np.einsum("ti,bid->btd", basis, ca - cb)
    d_all = np.linalg.norm(vals, axis=-1)  # [B, T]
    d_min = d_all.min(axis=1)

    # interior-minimum cases must match the global interior/endpoint
    # structure: the kernel's value is a true local minimum or endpoint,
    # and when the global min is interior it must be found
    interior = (d_all.argmin(axis=1) > 0) & (d_all.argmin(axis=1) < len(ts) - 1)
    np.testing.assert_allclose(dist[interior], d_min[interior], rtol=5e-3, atol=5e-4)
    # returned point is on the curve at the returned distance
    np.testing.assert_allclose(np.linalg.norm(point, axis=-1), dist, rtol=1e-5, atol=1e-6)
    # never below the true minimum
    assert (dist >= d_min - 1e-4).all()


def test_min_distance_between_curves_endpoint_fallback():
    """Monotonically separating curves: min is at t=0 (reference picks the
    nearer endpoint when no interior g<0→g>0 crossing exists)."""
    import jax.numpy as jnp

    n = 5
    # relative curve moving straight away from the origin
    rel = np.linspace(1.0, 3.0, n + 1)[:, None] * np.array([1.0, 0.0, 0.0])
    dist, point = bernstein.min_distance_between_curves(jnp.asarray(rel[None]))
    np.testing.assert_allclose(np.asarray(dist)[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(point)[0], [1.0, 0.0, 0.0], atol=1e-5)
