"""Tests for auxiliary subsystems: Kalman filter, replayer, priority
goals, timing stats."""

import numpy as np
import pytest

from lsc_dr_planner_tpu.utils.kalman import LinearKalmanFilter, kf_init, kf_step
from lsc_dr_planner_tpu.utils.timing import PlanningTime
from lsc_dr_planner_tpu.sim import replay


def test_kalman_tracks_constant_velocity():
    rng = np.random.default_rng(0)
    kf = LinearKalmanFilter(sigma_r=(0.01, 0.01, 0.01))
    v_true = np.array([1.0, -0.5, 0.2])
    for k in range(100):
        t = 0.02 * k
        z = v_true * t + rng.normal(0, 0.003, 3)
        pos, vel = kf.observe(z, t)
    np.testing.assert_allclose(vel, v_true, atol=0.1)
    np.testing.assert_allclose(pos, v_true * t, atol=0.02)


def test_kalman_batched():
    st = kf_init(np.zeros((4, 3)))
    st = kf_step(st, np.ones((4, 3)) * 0.1, 0.1)
    assert st.x.shape == (4, 6)


def test_planning_time_stats():
    pt = PlanningTime()
    for v in (1.0, 3.0, 2.0):
        pt.update(v)
    assert pt.min == 1.0 and pt.max == 3.0
    assert pt.average == pytest.approx(2.0)
    assert pt.N == 3


def test_replay_roundtrip(tmp_path):
    # write a 2-agent, 1-obstacle wide CSV in reference schema
    path = tmp_path / "simulation_test.csv"
    header = ",".join(
        ["id,t,px,py,pz,vx,vy,vz,ax,ay,az,planning_time"] * 2
        + ["obs_id,t,px,py,pz,size"]
    )
    rows = []
    for k in range(5):
        t = 0.1 * k
        cols = []
        for qi in range(2):
            cols += [str(qi), f"{t}", f"{qi + t}", "0", "0.6",
                     "1", "0", "0", "0", "0", "0", "0.01"]
        cols += ["0", f"{t}", "3", "3", "0.6", "0.4"]
        rows.append(",".join(cols))
    path.write_text(header + "\n" + "\n".join(rows) + "\n")

    log = replay.read_csv(str(path))
    assert log.qn == 2 and log.on == 1
    st = replay.state_at(log, 0.25)
    np.testing.assert_allclose(st[0, 0], 0.25, atol=1e-9)  # agent 0 px
    np.testing.assert_allclose(st[1, 0], 1.25, atol=1e-9)
    frames = list(replay.replay(log, rate_hz=20))
    assert len(frames) == 9
    png = replay.render_png(log, str(tmp_path / "out.png"))
    import os

    assert os.path.getsize(png) > 0


def test_prior_based_mode_runs(tmp_path):
    from lsc_dr_planner_tpu.config import GoalMode, Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m = generate_random_mission(3, [-3, -3, 0], [3, 3, 2.5], seed=2,
                                min_separation=1.5)
    p = Param(world_use_octomap=False, goal_mode=GoalMode.PRIOR_BASED,
              multisim_max_planner_iteration=40, qp_max_iter=120)
    sim = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    res = sim.run()
    assert not res["is_collided"]
    assert res["safety_ratio_agent"] >= 1.0


# ======================================================================
# checkpoint / resume
# ======================================================================


def _drive(sim, start, stop):
    for it in range(start, stop):
        if it > 0:
            sim.do_step()
        sim.decentralized_mapp()
        assert sim.plan()


def test_checkpoint_resume_bit_identical(tmp_path):
    """A run resumed from a checkpoint continues exactly like the
    uninterrupted run (the reference has no mid-run checkpointing at
    all — SURVEY §5.4)."""
    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m = generate_random_mission(4, [-3, -3, 0], [3, 3, 2.5], seed=3,
                                min_separation=1.2)
    m.world_boxes = np.array([[0.0, 1.2, 1.25, 0.5, 0.5, 2.5]])
    m.world_file_name = "mini.csv"
    p = Param(world_use_octomap=True, qp_max_iter=120)

    ref = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    _drive(ref, 0, 16)

    half = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    _drive(half, 0, 8)
    ck = str(tmp_path / "ck.npz")
    half.save_checkpoint(ck)

    res = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    res.load_checkpoint(ck)
    assert res.planner_seq == half.planner_seq
    _drive(res, 8, 16)

    np.testing.assert_array_equal(res.pos, ref.pos)
    np.testing.assert_array_equal(res.prev_ctrl, ref.prev_ctrl)
    np.testing.assert_array_equal(res.current_goal, ref.current_goal)
    np.testing.assert_array_equal(res.next_waypoint, ref.next_waypoint)
    assert res.sim_time == ref.sim_time
    assert res.safety_ratio_agent == ref.safety_ratio_agent


def test_checkpoint_local_maps_roundtrip(tmp_path):
    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m = generate_random_mission(2, [-3, -3, 0], [3, 3, 2.5], seed=5,
                                min_separation=1.5)
    m.world_boxes = np.array([[0.0, 1.0, 1.25, 0.5, 0.5, 2.5]])
    m.world_file_name = "mini.csv"
    p = Param(world_use_octomap=True, world_use_global_map=False,
              qp_max_iter=100)
    sim = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    _drive(sim, 0, 4)
    ck = str(tmp_path / "ck.npz")
    sim.save_checkpoint(ck)

    sim2 = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    sim2.load_checkpoint(ck)
    np.testing.assert_array_equal(sim2.map_manager.known,
                                  sim.map_manager.known)
    _drive(sim, 4, 8)
    _drive(sim2, 4, 8)
    np.testing.assert_array_equal(sim2.pos, sim.pos)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m4 = generate_random_mission(4, [-3, -3, 0], [3, 3, 2.5], seed=3)
    m3 = generate_random_mission(3, [-3, -3, 0], [3, 3, 2.5], seed=3)
    p = Param(world_use_octomap=False, qp_max_iter=60)
    a = MultiSyncSimulator(p, m4, log_dir=str(tmp_path))
    _drive(a, 0, 2)
    ck = str(tmp_path / "ck.npz")
    a.save_checkpoint(ck)
    b = MultiSyncSimulator(p, m3, log_dir=str(tmp_path))
    with pytest.raises(ValueError):
        b.load_checkpoint(ck)


def test_debug_frame_render(tmp_path):
    """render_debug_frame draws the four internal artifact classes (SFC
    boxes, LSC half-planes, waypoints/grid paths, comm groups) from a
    live simulator without disturbing its state."""
    import numpy as np

    from lsc_dr_planner_tpu.config import Param
    from lsc_dr_planner_tpu.mission import generate_random_mission
    from lsc_dr_planner_tpu.sim.replay import render_debug_frame
    from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

    m = generate_random_mission(4, [-3, -3, 0], [3, 3, 2.5], seed=3,
                                min_separation=1.2)
    p = Param(world_use_octomap=False, multisim_max_planner_iteration=50,
              qp_max_iter=60)
    sim = MultiSyncSimulator(p, m, log_dir=str(tmp_path))
    for it in range(3):
        if sim.planner_seq > 0:
            sim.do_step()
        sim.decentralized_mapp()
        assert sim.plan()
    state_before = (sim.planner_seq, sim.desired_goal.copy(),
                    sim.current_goal.copy())
    out = render_debug_frame(sim, str(tmp_path / "dbg.png"))
    assert (tmp_path / "dbg.png").stat().st_size > 10000
    assert sim.planner_seq == state_before[0]
    np.testing.assert_array_equal(sim.desired_goal, state_before[1])
    np.testing.assert_array_equal(sim.current_goal, state_before[2])
