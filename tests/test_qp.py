"""Batched ADMM trajectory-QP tests against scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

from lsc_dr_planner_tpu.ops import qp

DIM, M, N_DEG, PHI, DT = 2, 10, 5, 3, 0.2
NN = N_DEG + 1


def make_cfg(n_obs=1, use_comm=False, stop=True, max_iter=500, rho=1.0):
    return qp.QPConfig(
        dim=DIM, M=M, n=N_DEG, phi=PHI, n_obs=n_obs,
        use_comm=use_comm, stop_at_horizon=stop, dt=DT,
        control_input_weight=0.01, terminal_weight=1.0,
        rho=rho, rho_eq=0.0, sigma=1e-6, alpha=1.6,
        max_iter=max_iter, eps_abs=1e-5,
    )


def make_inputs(cfg, p0, goal, n_agents=1, lsc_normals=None, lsc_rhs=None,
                lsc_active=None, vmax=1.0, amax=2.0, lb=-100.0, ub=100.0,
                terminal_segments=1, comm_halfrange=1e19):
    A = n_agents
    O = cfg.n_obs
    tm = np.zeros((A, M))
    tm[:, M - terminal_segments:] = 1.0
    zeros = np.zeros((A, DIM))
    shape_full = (A, DIM, M, NN)
    p0 = np.broadcast_to(np.asarray(p0, np.float32), (A, DIM)).copy()
    goal = np.broadcast_to(np.asarray(goal, np.float32), (A, DIM)).copy()
    x0 = np.broadcast_to(p0[:, :, None, None], shape_full).copy()
    return qp.QPInputs(
        p0=jnp.asarray(p0), v0=jnp.asarray(zeros, jnp.float32),
        a0=jnp.asarray(zeros, jnp.float32), goal=jnp.asarray(goal),
        terminal_mask=jnp.asarray(tm, jnp.float32),
        lsc_normals=jnp.asarray(
            lsc_normals if lsc_normals is not None else np.zeros((A, O, M, DIM)),
            jnp.float32),
        lsc_rhs=jnp.asarray(
            lsc_rhs if lsc_rhs is not None else np.zeros((A, O, M, NN)),
            jnp.float32),
        lsc_active=jnp.asarray(
            lsc_active if lsc_active is not None else np.zeros((A, O, M, NN), bool)),
        vmax=jnp.full((A, DIM), vmax, jnp.float32),
        amax=jnp.full((A, DIM), amax, jnp.float32),
        lb=jnp.full(shape_full, lb, jnp.float32),
        ub=jnp.full(shape_full, ub, jnp.float32),
        comm_halfrange=jnp.full((A,), comm_halfrange, jnp.float32),
        x0=jnp.asarray(x0, jnp.float32),
    )


def _oracle(cfg, inp, agent=0):
    """f64 trust-constr solve of the reduced (nullspace) problem."""
    leaf = jax.tree_util.tree_map(lambda x: x[agent], inp)
    N_null, X_pin = qp._equality_basis(cfg.M, cfg.n, cfg.phi, cfg.dt,
                                       cfg.stop_at_horizon)
    Kdim = N_null.shape[1]
    pins = np.asarray(
        qp.pinned_values(cfg, leaf.p0[None], leaf.v0[None], leaf.a0[None])[0],
        np.float64)
    xpart = (X_pin @ pins.T).T  # [dim, MN]

    # reduced constraint matrix in f64 via basis push
    def rows_full(x_full):
        return np.asarray(
            qp.constraint_rows(cfg, jnp.asarray(x_full, jnp.float32),
                               leaf.lsc_normals), np.float64)

    C = rows_full(np.zeros((cfg.dim, cfg.M, cfg.N))).shape[0]
    An = np.zeros((C, cfg.dim * Kdim))
    for d in range(cfg.dim):
        for k in range(Kdim):
            e = np.zeros((cfg.dim, Kdim)); e[d, k] = 1
            xf = (N_null @ e.T).T.reshape(cfg.dim, cfg.M, cfg.N)
            An[:, d * Kdim + k] = rows_full(xf)
    b_off = rows_full(xpart.reshape(cfg.dim, cfg.M, cfg.N))
    l, u, _ = (np.asarray(v, np.float64) for v in qp.constraint_bounds(cfg, leaf))
    ln, un = l - b_off, u - b_off

    P_seg, tdiag, q = qp.cost_matrices(cfg, leaf)
    P_blk = np.kron(np.eye(cfg.M), np.asarray(P_seg, np.float64))
    tvec = np.zeros((cfg.M, cfg.N)); tvec[:, cfg.n] = np.asarray(tdiag)
    P_dim = P_blk + np.diag(tvec.reshape(-1))
    Pn_dim = N_null.T @ P_dim @ N_null
    Pn = np.kron(np.eye(cfg.dim), Pn_dim)
    qn = np.concatenate([
        N_null.T @ (np.asarray(q, np.float64)[d].reshape(-1) + P_dim @ xpart[d])
        for d in range(cfg.dim)
    ])

    xi0 = np.zeros(cfg.dim * Kdim)
    res = sopt.minimize(
        lambda xi: 0.5 * xi @ Pn @ xi + qn @ xi,
        xi0, jac=lambda xi: Pn @ xi + qn, hess=lambda xi: Pn,
        method="trust-constr",
        constraints=[sopt.LinearConstraint(An, ln, un)],
        options={"maxiter": 3000, "gtol": 1e-10, "xtol": 1e-12},
    )
    xi = res.x.reshape(cfg.dim, Kdim)
    x = (N_null @ xi.T).T + xpart
    obj_const = 0.0
    fo = res.fun + sum(
        0.5 * xpart[d] @ P_dim @ xpart[d] * 0 for d in range(cfg.dim))
    # convert reduced objective to full-x objective
    xf = x
    fo_full = sum(0.5 * xf[d] @ P_dim @ xf[d] +
                  np.asarray(q, np.float64)[d].reshape(-1) @ xf[d]
                  for d in range(cfg.dim))
    return x.reshape(cfg.dim, cfg.M, cfg.N), fo_full


def test_constraint_rows_semantics():
    """Hand-check the structured row operator on a random x."""
    cfg = make_cfg(n_obs=2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(DIM, M, NN)).astype(np.float32)
    normals = rng.normal(size=(2, M, DIM)).astype(np.float32)
    rows = np.asarray(qp.constraint_rows(cfg, jnp.asarray(x), jnp.asarray(normals)))
    nb = qp.row_blocks(cfg)
    off = 0
    lsc = rows[off:off + nb["lsc"]].reshape(2, M, NN)
    np.testing.assert_allclose(
        lsc, np.einsum("omk,kmi->omi", normals, x), rtol=1e-5)
    off += nb["lsc"]
    vel = rows[off:off + nb["vel"]].reshape(DIM, M, N_DEG)
    np.testing.assert_allclose(vel, np.diff(x, axis=-1), rtol=1e-5)
    off += nb["vel"] + nb["acc"]
    if nb["comm"]:
        off += nb["comm"]
    bound = rows[off:off + nb["bound"]].reshape(DIM, M, NN)
    np.testing.assert_allclose(bound, x, rtol=1e-6)


def test_unconstrained_reach_goal():
    cfg = make_cfg(n_obs=1)
    inp = make_inputs(cfg, p0=[0.0, 0.0], goal=[0.3, 0.2], terminal_segments=5)
    out = qp.solve(cfg, inp)
    assert bool(out.converged[0]), float(out.primal_residual[0])
    x = np.asarray(out.x[0])
    np.testing.assert_allclose(x[:, 0, 0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(x[:, 0, 1], x[:, 0, 0], atol=1e-6)
    np.testing.assert_allclose(x[:, M - 1, N_DEG], [0.3, 0.2], atol=2e-2)

    xo, fo = _oracle(cfg, inp)
    f = float(out.objective[0])
    assert abs(f - fo) < 1e-2 * max(1.0, abs(fo)), (f, fo)
    np.testing.assert_allclose(x, xo, atol=2e-2)


def test_velocity_limited():
    cfg = make_cfg(n_obs=1, max_iter=1500)
    inp = make_inputs(cfg, p0=[0.0, 0.0], goal=[4.0, 0.0], vmax=1.0, amax=2.0)
    out = qp.solve(cfg, inp)
    assert float(out.primal_residual[0]) < 5e-3
    x = np.asarray(out.x[0])
    dvel = np.diff(x, axis=-1) * (N_DEG / DT)
    assert np.abs(dvel).max() <= 1.0 + 5e-2
    # continuity is exact by construction: check junctions
    np.testing.assert_allclose(x[:, :-1, N_DEG], x[:, 1:, 0], atol=1e-5)
    # stop at horizon
    np.testing.assert_allclose(x[:, M - 1, N_DEG], x[:, M - 1, N_DEG - 1], atol=1e-5)
    xo, fo = _oracle(cfg, inp)
    assert abs(float(out.objective[0]) - fo) < 0.05 * abs(fo)


def test_lsc_constraint_respected():
    cfg = make_cfg(n_obs=1)
    normals = np.zeros((1, 1, M, DIM)); normals[..., 0] = -1.0
    rhs = np.full((1, 1, M, NN), 0.2)
    active = np.ones((1, 1, M, NN), bool)
    active[0, 0, 0, :PHI] = False
    inp = make_inputs(cfg, p0=[-1.0, 0.0], goal=[1.0, 0.0],
                      lsc_normals=normals, lsc_rhs=rhs, lsc_active=active)
    out = qp.solve(cfg, inp)
    assert float(out.primal_residual[0]) < 5e-3
    x = np.asarray(out.x[0])
    assert x[0].max() <= -0.2 + 5e-3, x[0].max()
    assert x[0, M - 1, N_DEG] == pytest.approx(-0.2, abs=2e-2)
    xo, fo = _oracle(cfg, inp)
    np.testing.assert_allclose(x, xo, atol=3e-2)


def test_batched_solve_matches_single():
    cfg = make_cfg(n_obs=1)
    inp3 = make_inputs(cfg, p0=[0.0, 0.0], goal=[0.5, -0.4], n_agents=3)
    out = qp.solve(cfg, inp3)
    assert bool(jnp.all(out.converged))
    x = np.asarray(out.x)
    np.testing.assert_allclose(x[0], x[1], atol=1e-6)
    np.testing.assert_allclose(x[0], x[2], atol=1e-6)


def test_sfc_bounds_respected():
    cfg = make_cfg(n_obs=1)
    inp = make_inputs(cfg, p0=[0.0, 0.0], goal=[2.0, 2.0], lb=-0.5, ub=0.5)
    out = qp.solve(cfg, inp)
    assert float(out.primal_residual[0]) < 5e-3
    x = np.asarray(out.x[0])
    assert x.max() <= 0.5 + 5e-3 and x.min() >= -0.5 - 5e-3


def test_comm_range_coupling():
    cfg = make_cfg(n_obs=1, use_comm=True)
    inp = make_inputs(cfg, p0=[0.0, 0.0], goal=[4.0, 0.0], comm_halfrange=0.35)
    out = qp.solve(cfg, inp)
    assert float(out.primal_residual[0]) < 5e-3
    x = np.asarray(out.x[0])
    # segment endpoints never more than 0.35 from any earlier segment start
    for mi in range(M):
        for m in range(mi, M):
            assert abs(x[0, m, N_DEG] - x[0, mi, 0]) <= 0.35 + 5e-3


def test_warm_start_fast():
    """Re-solving from the previous solution must converge quickly."""
    cfg = make_cfg(n_obs=1)
    inp = make_inputs(cfg, p0=[0.0, 0.0], goal=[4.0, 0.0])
    out1 = qp.solve(cfg, inp)
    inp2 = inp._replace(x0=out1.x)
    out2 = qp.solve(cfg, inp2)
    assert int(out2.iterations[0]) <= int(out1.iterations[0])
    assert float(out2.primal_residual[0]) < 5e-3
