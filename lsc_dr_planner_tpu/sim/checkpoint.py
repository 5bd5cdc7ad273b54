"""True mid-run checkpoint/resume for the synchronous simulator.

The reference has NO mid-run checkpointing — its only state capture is
the per-step trajectory CSV plus the saved mission JSON, and "resume"
exists only as visualization replay (SURVEY §5.4; reference:
multi_sync_simulator.cpp:586-656, multi_sync_replayer.cpp:54-110).
The planner state is small (control points, goals, waypoints, RNG
bookkeeping), so full-fidelity checkpointing is cheap; a resumed run
continues bit-identically to an uninterrupted one (asserted in
tests/test_aux.py).

Format: a single `.npz` per checkpoint. Arrays are stored natively;
non-array state (MAPF plan cache, planner-state enum, metrics) rides in
one pickled object field.
"""

from __future__ import annotations

import pickle

import numpy as np

_VERSION = 3

# mutable ndarray attributes copied verbatim
_ARRAY_FIELDS = (
    "pos", "vel", "acc", "start_point", "desired_goal", "current_goal",
    "next_waypoint", "prev_ctrl", "desired_ctrl", "has_prev",
    "sfc_lo", "sfc_hi", "sfc_initialized", "qp_y",
    "_pin_steps", "_pin_anchor", "vel_excess_ratio", "acc_excess_ratio",
    "_mcp_mode", "_dist_best", "_no_progress", "mapf_elapsed",
)

# plain scalar attributes
_SCALAR_FIELDS = (
    "planner_seq", "sim_time", "safety_ratio_agent", "safety_ratio_obs",
    "total_flight_time", "is_collided", "qp_failed",
    "_coarse_version",
)


def save_checkpoint(sim, path: str) -> None:
    """Capture the simulator's full mutable state."""
    from lsc_dr_planner_tpu.utils.timing import PlanningTimeStatistics

    arrays = {k: np.asarray(getattr(sim, k)) for k in _ARRAY_FIELDS}
    aux = {
        "version": _VERSION,
        "scalars": {k: getattr(sim, k) for k in _SCALAR_FIELDS},
        "planner_state": sim.planner_state.name,
        "group_plans": sim._group_plans,
        "events": sim.events,
        "obs_rng": sim._obs_rng,
        "planning_time": sim.planning_time,
        "traj_history": sim.traj_history,
        "sim_csv_rows": sim._sim_csv_rows,
        "mission_start_time": sim.mission_start_time,
    }
    if sim.local_maps:
        arrays["map_known"] = sim.map_manager.known
        arrays["map_version"] = sim.map_manager._version
    np.savez_compressed(
        path, __aux__=np.frombuffer(pickle.dumps(aux), dtype=np.uint8),
        **arrays,
    )


def load_checkpoint(sim, path: str) -> None:
    """Restore state saved by `save_checkpoint` into a simulator built
    with the same Param + Mission (static config is NOT checkpointed —
    reconstruct the simulator first, then restore)."""
    from lsc_dr_planner_tpu.sim.simulator import PlannerState

    data = np.load(path, allow_pickle=False)
    aux = pickle.loads(data["__aux__"].tobytes())
    if aux["version"] != _VERSION:
        raise ValueError(f"checkpoint version {aux['version']} unsupported")

    for k in _ARRAY_FIELDS:
        cur = getattr(sim, k)
        val = data[k]
        if isinstance(cur, np.ndarray) and cur.shape != val.shape:
            raise ValueError(
                f"checkpoint field {k}: shape {val.shape} != simulator "
                f"{cur.shape} — was the simulator built with the same "
                f"mission/param?"
            )
        setattr(sim, k, val.copy())
    for k, v in aux["scalars"].items():
        setattr(sim, k, v)
    sim.planner_state = PlannerState[aux["planner_state"]]
    sim._group_plans = aux["group_plans"]
    sim.events = aux["events"]
    sim._obs_rng = aux["obs_rng"]
    sim.planning_time = aux["planning_time"]
    sim.traj_history = aux["traj_history"]
    sim._sim_csv_rows = aux["sim_csv_rows"]
    sim.mission_start_time = aux["mission_start_time"]
    if sim.local_maps:
        sim.map_manager.known = data["map_known"].copy()
        sim.map_manager._version = data["map_version"].copy()
        # force a coarse-grid rebuild from the restored maps
        sim._coarse_version = -1
