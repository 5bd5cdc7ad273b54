"""Octomap .bt I/O, local sensing, and map-merging tests."""

import numpy as np
import pytest

from lsc_dr_planner_tpu.config import Param
from lsc_dr_planner_tpu.mission import generate_random_mission
from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator
from lsc_dr_planner_tpu.world.grid import (
    _blocked_lattice_mask,
    blocked_cumsum_jnp,
    build_grid_world,
    rasterize_boxes,
)
from lsc_dr_planner_tpu.world.map_manager import MapManager
from lsc_dr_planner_tpu.world.octomap import read_bt, write_bt


# ======================================================================
# .bt round trip
# ======================================================================


def test_bt_roundtrip_random_occ(tmp_path):
    rng = np.random.default_rng(0)
    res = 0.1
    occ = rng.random((20, 16, 8)) < 0.2
    origin_idx = np.array([-10, -8, 0])
    path = str(tmp_path / "w.bt")
    write_bt(path, occ, origin_idx, res)

    boxes, res_read = read_bt(path)
    assert res_read == pytest.approx(res)
    # rasterize the boxes back onto the same grid
    world_min = origin_idx * res
    world_max = (origin_idx + np.array(occ.shape)) * res
    occ2, _, oi2, _ = rasterize_boxes(boxes, world_min, world_max, res)
    np.testing.assert_array_equal(oi2, origin_idx)
    np.testing.assert_array_equal(occ2, occ)


def test_bt_pruning_produces_coarse_leaves(tmp_path):
    # an aligned 4x4x4 occupied block must prune to fewer boxes than cells
    res = 0.5
    occ = np.zeros((8, 8, 8), bool)
    occ[0:4, 0:4, 0:4] = True
    path = str(tmp_path / "block.bt")
    write_bt(path, occ, np.zeros(3, int), res)
    boxes, _ = read_bt(path)
    assert len(boxes) < 64
    # volume is preserved
    vol = np.sum(boxes[:, 3] * boxes[:, 4] * boxes[:, 5])
    assert vol == pytest.approx(64 * res**3)


def test_bt_world_loads_like_csv(tmp_path):
    """A .bt written from a CSV world's rasterization loads to the same
    occupancy through the Mission world path."""
    from lsc_dr_planner_tpu.mission import Mission

    boxes_csv = np.array([
        [1.0, 1.0, 1.25, 0.5, 0.5, 2.5],
        [-1.2, 0.4, 1.25, 0.6, 0.8, 2.5],
    ])
    res = 0.1
    wmin, wmax = [-3, -3, 0], [3, 3, 2.5]
    occ, _, origin_idx, _ = rasterize_boxes(boxes_csv, wmin, wmax, res)
    bt_path = str(tmp_path / "w.bt")
    write_bt(bt_path, occ, origin_idx, res)

    m = Mission()
    m.load_world(bt_path)
    occ2, _, oi2, _ = rasterize_boxes(m.world_boxes, wmin, wmax, res)
    np.testing.assert_array_equal(occ2, occ)


# ======================================================================
# device blocked/cumsum build
# ======================================================================


def test_blocked_cumsum_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    occ = rng.random((12, 10, 6)) < 0.25
    res, radius = 0.1, 0.15
    host_blocked = _blocked_lattice_mask(occ, res, radius)
    S_host = np.zeros(tuple(d + 1 for d in host_blocked.shape), np.int32)
    S_host[1:, 1:, 1:] = np.cumsum(
        np.cumsum(np.cumsum(host_blocked, 0), 1), 2
    )

    blk, S = blocked_cumsum_jnp(jnp.asarray(occ), res, radius)
    np.testing.assert_array_equal(np.asarray(blk), host_blocked)
    np.testing.assert_array_equal(np.asarray(S), S_host)

    # batched (leading agent axis)
    occ_b = np.stack([occ, np.zeros_like(occ)])
    blk_b, S_b = blocked_cumsum_jnp(jnp.asarray(occ_b), res, radius)
    np.testing.assert_array_equal(np.asarray(blk_b[0]), host_blocked)
    assert not np.asarray(blk_b[1]).any()


# ======================================================================
# sensing + merging
# ======================================================================


def _mm(n_agents=2):
    boxes = np.array([
        [1.0, 0.0, 0.5, 0.2, 0.2, 1.0],   # near
        [2.5, 2.5, 0.5, 0.2, 0.2, 1.0],   # far
    ])
    return MapManager(boxes, [-3, -3, 0], [3, 3, 1], 0.1, n_agents,
                      use_global_map=False)


def test_sense_reveals_only_in_range():
    mm = _mm()
    assert not mm.known.any()
    mm.sense(np.array([[0.0, 0.0, 0.5], [-2.0, -2.0, 0.5]]), sensor_range=1.5)
    # agent 0 sees the near pillar only; agent 1 sees nothing
    occ0 = mm.known[0]
    occ1 = mm.known[1]
    assert occ0.any() and not occ1.any()
    idx = np.argwhere(occ0)
    centers = (idx + mm.origin_idx + 0.5) * mm.resolution
    d = np.linalg.norm(centers - np.array([0.0, 0.0, 0.5]), axis=-1)
    assert (d <= 1.5 + 1e-9).all()
    # the far pillar is undiscovered
    far = np.argwhere(mm.occ_true) @ np.array([1, 1, 0])
    assert occ0.sum() < mm.occ_true.sum()


def test_merge_unions_within_range():
    mm = _mm()
    mm.sense(np.array([[0.6, 0.0, 0.5], [2.5, 2.0, 0.5]]), sensor_range=1.0)
    k0, k1 = mm.known[0].copy(), mm.known[1].copy()
    assert k0.any() and k1.any() and not (k0 & k1).any()
    # out of comm range: no change
    mm.merge(np.array([[0.6, 0.0, 0.5], [2.5, 2.0, 0.5]]), comm_range=1.0)
    np.testing.assert_array_equal(mm.known[0], k0)
    # in range: both get the union
    mm.merge(np.array([[0.6, 0.0, 0.5], [2.5, 2.0, 0.5]]), comm_range=10.0)
    np.testing.assert_array_equal(mm.known[0], k0 | k1)
    np.testing.assert_array_equal(mm.known[1], k0 | k1)


def test_global_map_mode_knows_everything():
    boxes = np.array([[1.0, 0.0, 0.5, 0.2, 0.2, 1.0]])
    mm = MapManager(boxes, [-3, -3, 0], [3, 3, 1], 0.1, 3,
                    use_global_map=True)
    for a in range(3):
        np.testing.assert_array_equal(mm.known[a], mm.occ_true)


# ======================================================================
# pipeline equivalence + end-to-end
# ======================================================================


def test_full_knowledge_equals_global_map(tmp_path):
    """With every agent's known map equal to the global map, the
    local-sensing pipeline must produce the same trajectories as the
    global-map pipeline."""
    m = generate_random_mission(3, [-3, -3, 0], [3, 3, 2.5], seed=11,
                                min_separation=1.5)
    m.world_boxes = np.array([[0.0, 1.2, 1.25, 0.5, 0.5, 2.5]])
    m.world_file_name = "mini.csv"

    p_g = Param(world_use_octomap=True, qp_max_iter=150,
                multisim_max_planner_iteration=12)
    p_l = Param(world_use_octomap=True, world_use_global_map=False,
                sensor_range=3.0, qp_max_iter=150,
                multisim_max_planner_iteration=12)

    sim_g = MultiSyncSimulator(p_g, m, log_dir=str(tmp_path))
    sim_l = MultiSyncSimulator(p_l, m, log_dir=str(tmp_path))
    # force full knowledge
    sim_l.map_manager.known[:] = sim_l.map_manager.occ_true[None]

    for it in range(6):
        if it > 0:
            sim_g.do_step()
            sim_l.do_step()
            sim_l.map_manager.known[:] = sim_l.map_manager.occ_true[None]
        sim_g.decentralized_mapp()
        sim_l.decentralized_mapp()
        assert sim_g.plan() and sim_l.plan()
        np.testing.assert_allclose(
            sim_l.desired_ctrl, sim_g.desired_ctrl, atol=1e-5
        )


def test_local_sensing_mission_completes(tmp_path):
    """End-to-end local-sensing run: agents discover the world as they
    fly, never collide, and reach their goals."""
    m = generate_random_mission(3, [-3, -3, 0], [3, 3, 2.5], seed=7,
                                min_separation=1.5)
    m.world_boxes = np.array([
        [0.0, 1.5, 1.25, 0.5, 0.5, 2.5],
        [-1.0, -1.0, 1.25, 0.4, 0.4, 2.5],
    ])
    m.world_file_name = "mini.csv"
    p = Param(world_use_octomap=True, world_use_global_map=False,
              sensor_range=3.0, qp_max_iter=150,
              multisim_max_planner_iteration=150)
    sim = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    res = sim.run()
    assert not res["is_collided"]
    assert res["safety_ratio_agent"] >= 1.0
    assert np.isfinite(res["total_flight_time"])
    # the fleet actually discovered obstacles along the way
    assert sim.map_manager.union_occ().any()
