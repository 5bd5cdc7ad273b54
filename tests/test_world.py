"""Tests for world preprocessing: rasterization, blocked mask, integral
image queries, analytic distance field, obstacle models."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsc_dr_planner_tpu.world import grid as gridmod
from lsc_dr_planner_tpu.world.obstacles import ObstacleGenerator
from lsc_dr_planner_tpu.mission import ObstacleSpec

RES = 0.1
R = 0.15


def _small_world():
    # one 0.5x0.5 column box centered at (0.05, 0.05) like the forest worlds
    boxes = np.array([[0.05, 0.05, 1.25, 0.5, 0.5, 2.5]])
    return gridmod.build_grid_world(boxes, [-2, -2, 0], [2, 2, 2.5], RES, R)


def test_rasterization_counts():
    gw = _small_world()
    occ = np.asarray(gw.occ)
    # box x range: [0.05-0.25, 0.05+0.25] -> cells round(-0.2/0.1)=-2 .. round(0.3/0.1)=3 -> 5 cells
    assert occ.sum() == 5 * 5 * 25
    # occupied cell centers
    ii, jj, kk = np.nonzero(occ)
    xs = (ii + gw.origin_idx[0] + 0.5) * RES
    assert xs.min() == pytest.approx(-0.15)
    assert xs.max() == pytest.approx(0.25)


def _brute_blocked(gw, j_idx):
    """Reference semantics: lattice point blocked iff L-inf distance to the
    closest point of some occupied cell's box < R."""
    occ = np.asarray(gw.occ)
    p = (np.asarray(j_idx) + gw.origin_idx) * RES
    ii, jj, kk = np.nonzero(occ)
    lo = (np.stack([ii, jj, kk], -1) + gw.origin_idx) * RES
    hi = lo + RES
    cp = np.clip(p, lo, hi)
    dinf = np.max(np.abs(cp - p), axis=-1)
    return bool((dinf < R - 1e-9).any() or (dinf < R + 1e-9).any())


def test_blocked_mask_matches_bruteforce():
    gw = _small_world()
    blocked = np.asarray(gw.blocked)
    rng = np.random.default_rng(0)
    X, Y, Z = gw.dims
    for _ in range(200):
        j = [rng.integers(0, X + 1), rng.integers(0, Y + 1), rng.integers(0, Z + 1)]
        assert blocked[tuple(j)] == _brute_blocked(gw, j), j


def test_integral_image_box_query():
    gw = _small_world()
    blocked = np.asarray(gw.blocked)
    rng = np.random.default_rng(1)
    X, Y, Z = gw.dims
    for _ in range(100):
        lo = np.array([rng.integers(0, X), rng.integers(0, Y), rng.integers(0, Z)])
        hi = np.array(
            [
                rng.integers(lo[0], X),
                rng.integers(lo[1], Y),
                rng.integers(lo[2], Z),
            ]
        )
        cnt = int(
            gw.box_blocked_count(jnp.asarray(lo), jnp.asarray(hi))
        )
        ref = int(
            blocked[lo[0] : hi[0] + 1, lo[1] : hi[1] + 1, lo[2] : hi[2] + 1].sum()
        )
        assert cnt == ref


def test_distance_to_obstacle_matches_bruteforce():
    gw = _small_world()
    occ = np.asarray(gw.occ)
    ii, jj, kk = np.nonzero(occ)
    centers = (np.stack([ii, jj, kk], -1) + gw.origin_idx + 0.5) * RES
    rng = np.random.default_rng(2)
    pts = rng.uniform([-2, -2, 0], [2, 2, 2.5], size=(50, 3))
    dist, cc = gw.distance_to_obstacle(jnp.asarray(pts))
    for i, p in enumerate(pts):
        ref = np.linalg.norm(centers - p, axis=-1).min()
        np.testing.assert_allclose(float(dist[i]), ref, atol=1e-5)


def test_empty_world_distance():
    gw = gridmod.build_grid_world(np.zeros((0, 6)), [-1, -1, 0], [1, 1, 1], RES, R)
    d, c = gw.distance_to_obstacle(jnp.array([0.0, 0.0, 0.5]))
    assert np.isinf(float(d))


# ----------------------------------------------------------------------
# obstacle models
# ----------------------------------------------------------------------


def test_straight_obstacle_profile():
    spec = ObstacleSpec(
        type="straight", radius=0.2, max_acc=2.0, downwash=1.0,
        start=np.array([0.0, 0, 1]), goal=np.array([4.0, 0, 1]), speed=1.0,
    )
    gen = ObstacleGenerator([spec])
    s0 = gen.states_at(0.0)[0]
    np.testing.assert_allclose(s0.position, [0, 0, 1], atol=1e-9)
    # cruise phase: t=2 -> pos = 0.25 (accel dist) .. start+0.5*a*t1^2 + v(t-t1)
    t1 = 1.0 / 2.0
    s2 = gen.states_at(2.0)[0]
    np.testing.assert_allclose(s2.position[0], 0.5 * 2 * t1**2 + 1.0 * (2 - t1))
    np.testing.assert_allclose(s2.velocity, [1, 0, 0], atol=1e-9)
    # long after arrival
    s9 = gen.states_at(9.0)[0]
    np.testing.assert_allclose(s9.position, [4, 0, 1], atol=1e-9)
    np.testing.assert_allclose(s9.velocity, 0, atol=1e-9)


def test_spin_obstacle_circle():
    spec = ObstacleSpec(
        type="spin", radius=0.2, max_acc=10.0, downwash=1.0,
        axis_position=np.array([0.0, 0, 1]), axis_ori=np.array([0.0, 0, 1]),
        start=np.array([1.0, 0, 1]), speed=1.0,
    )
    gen = ObstacleGenerator([spec])
    for t in [0.0, 0.5, 1.7, 3.1]:
        s = gen.states_at(t)[0]
        # stays on the unit circle at z=1
        np.testing.assert_allclose(np.linalg.norm(s.position[:2]), 1.0, atol=1e-9)
        np.testing.assert_allclose(s.position[2], 1.0, atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(s.velocity), 1.0, atol=1e-9)
        # velocity tangential
        np.testing.assert_allclose(np.dot(s.velocity[:2], s.position[:2]), 0, atol=1e-9)


def test_patrol_obstacle_cycles():
    wps = np.array([[0.0, 0, 1], [2.0, 0, 1], [2.0, 2, 1]])
    spec = ObstacleSpec(
        type="patrol", radius=0.2, max_acc=2.0, downwash=1.0,
        waypoints=wps, speed=1.0,
    )
    gen = ObstacleGenerator([spec])
    s0 = gen.states_at(0.0)[0]
    np.testing.assert_allclose(s0.position, [0, 0, 1], atol=1e-9)


def test_gaussian_obstacle_reproducible():
    spec = ObstacleSpec(
        type="gaussian", radius=0.2, max_acc=1.0, downwash=1.0,
        start=np.array([0.0, 0, 1]), initial_vel=np.array([0.5, 0, 0]),
        max_vel=1.0, stddev_acc=0.5, acc_update_cycle=0.1,
    )
    g1 = ObstacleGenerator([spec], seed=42)
    g2 = ObstacleGenerator([spec], seed=42)
    p1 = g1.states_at(3.3)[0].position
    p2 = g2.states_at(3.3)[0].position
    np.testing.assert_allclose(p1, p2)
    assert np.linalg.norm(g1.states_at(5.0)[0].velocity) <= 1.0 + 1e-9


def test_chasing_obstacle_moves_toward_goal():
    spec = ObstacleSpec(
        type="chasing", radius=0.2, max_acc=2.0, downwash=1.0,
        start=np.array([0.0, 0, 1]), max_vel=1.0, gamma_target=1.0, gamma_obs=1.0,
    )
    gen = ObstacleGenerator([spec])
    gen.models[0].set_goal([5.0, 0, 1])
    x_prev = 0.0
    for t in np.arange(0.1, 2.0, 0.1):
        s = gen.states_at(t)[0]
    assert s.position[0] > 0.1


def test_update_sfc_fused_equivalence():
    """The fused-lane SFC update (one batched greedy loop) must be
    bit-identical to the sequential composition it replaced
    (initialize + construct_from_{hull,point}/substep + init select)."""
    import jax.numpy as jnp

    from lsc_dr_planner_tpu.ops import sfc
    from lsc_dr_planner_tpu.world.grid import build_grid_world

    rng = np.random.default_rng(0)
    boxes = []
    for _ in range(25):
        c = rng.uniform(-4, 4, 2)
        boxes.append([c[0], c[1], 0.5, 0.35, 0.35, 1.0])
    gw = build_grid_world(np.asarray(boxes), [-5, -5, 0], [5, 5, 1],
                          0.1, 0.15)
    M = 10
    for trial in range(6):
        pos = np.append(rng.uniform(-4.5, 4.5, 2), 0.6).astype(np.float32)
        last_pt = (pos + np.append(rng.uniform(-0.5, 0.5, 2), 0)).astype(
            np.float32)
        cgoal = (pos + np.append(rng.uniform(-1.5, 1.5, 2), 0)).astype(
            np.float32)
        wpt = (pos + np.append(rng.uniform(-1.0, 1.0, 2), 0)).astype(
            np.float32)
        ictrl = jnp.asarray(
            np.repeat(np.linspace(pos, cgoal, M)[:, None, :], 6, axis=1),
            jnp.float32)
        slo = jnp.asarray(np.tile(
            np.asarray(gw.point_to_lattice_floor(jnp.asarray(pos))) - 2,
            (M, 1)))
        shi = jnp.asarray(np.tile(
            np.asarray(gw.point_to_lattice_ceil(jnp.asarray(pos))) + 2,
            (M, 1)))
        for init_done in (False, True):
            for mode in ("hull", "point", "substep"):
                idn = jnp.asarray(init_done)
                f_lo, f_hi = sfc.update_sfc_fused(
                    gw, mode, slo, shi, idn, jnp.asarray(last_pt),
                    jnp.asarray(cgoal), jnp.asarray(wpt),
                    jnp.asarray(pos), ictrl, 0.15, max_radius_cells=40)
                ilo, ihi, _ = sfc.initialize_sfc(
                    gw, jnp.asarray(pos), M, max_radius_cells=40)
                hull = jnp.stack(
                    [jnp.asarray(last_pt), jnp.asarray(cgoal)], axis=0)
                if mode == "substep":
                    ulo, uhi, _ = sfc.construct_sfc_substep(
                        gw, slo, shi, hull, jnp.asarray(wpt), ictrl,
                        0.15, max_radius_cells=40)
                elif mode == "hull":
                    ulo, uhi, _ = sfc.construct_sfc_from_hull(
                        gw, slo, shi, hull, jnp.asarray(wpt),
                        max_radius_cells=40)
                else:
                    ulo, uhi, _ = sfc.construct_sfc_from_point(
                        gw, slo, shi, jnp.asarray(last_pt),
                        jnp.asarray(cgoal), max_radius_cells=40)
                s_lo = jnp.where(idn, ulo, ilo)
                s_hi = jnp.where(idn, uhi, ihi)
                np.testing.assert_array_equal(
                    np.asarray(f_lo), np.asarray(s_lo),
                    err_msg=f"{trial} {mode} {init_done}")
                np.testing.assert_array_equal(
                    np.asarray(f_hi), np.asarray(s_hi),
                    err_msg=f"{trial} {mode} {init_done}")
