"""Synchronous multi-agent simulator (the global step loop).

Capability parity with MultiSyncSimulator (reference:
src/multi_sync_simulator.cpp — run loop :81-129, doStep :152-158,
decentralizedMAPP group formation + waypoint vetting :160-303,
broadcast :305-352, sequential plan :354-374 [here: one batched call],
finish check :401-424, safety audit :448-584, CSV logging :586-709) and
AgentManager (src/agent_manager.cpp — ideal doStep :29-50, state
machine :225-240).

Host orchestration: the communication-group formation and the MAPF
waypoint layer run host-side (sequential, tiny); everything else is the
single fused jitted pipeline step for the whole fleet.
"""

from __future__ import annotations

import os
import time
from enum import Enum
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from lsc_dr_planner_tpu.config import GoalMode, MAPFMode, Param, PlannerMode
from lsc_dr_planner_tpu.mapf import ecbs as ecbsmod
from lsc_dr_planner_tpu.mapf import native as pibtmod
from lsc_dr_planner_tpu.mapf.grid import CoarseGrid, build_coarse_grid
from lsc_dr_planner_tpu.mission import Mission
from lsc_dr_planner_tpu.ops import trajectory
from lsc_dr_planner_tpu.planner.pipeline import (
    FleetArrays,
    FleetPlanner,
    StepInputs,
)
from lsc_dr_planner_tpu.utils.timing import PlanningTimeStatistics, Timer
from lsc_dr_planner_tpu.world.grid import GridWorld, build_grid_world
from lsc_dr_planner_tpu.world.obstacles import ObstacleGenerator



def _state_at_np(ctrl, t, dt):
    """Numpy (pos, vel, acc) trajectory sampling — audit-only path; the
    planner itself samples on device (ops/trajectory.py::state_at).
    Bernstein evaluation at segment-local tau, float64."""
    from math import comb

    ctrl = np.asarray(ctrl, np.float64)

    def deriv(c):
        n = c.shape[-2] - 1
        return (c[..., 1:, :] - c[..., :-1, :]) * (n / dt)

    def ev(c):
        M, n1, _ = c.shape[-3:]
        n = n1 - 1
        seg = int(np.clip(np.floor(t / dt), 0, M - 1))
        tau = float(np.clip(t / dt - seg, 0.0, 1.0))
        binom = np.array([comb(n, i) for i in range(n + 1)])
        basis = binom * tau ** np.arange(n + 1) \
            * (1 - tau) ** (n - np.arange(n + 1))
        return np.einsum("i,...id->...d", basis, c[..., seg, :, :])

    d1 = deriv(ctrl)
    d2 = deriv(d1)
    return ev(ctrl), ev(d1), ev(d2)


class PlannerState(Enum):
    WAIT = 0
    GOTO = 1
    PATROL = 2
    GOBACK = 3
    LAND = 4


class MultiSyncSimulator:
    def __init__(self, param: Param, mission: Mission, log_dir: str = "log",
                 seed: int = 0, save_result: Optional[bool] = None,
                 share_static_from: "Optional[MultiSyncSimulator]" = None):
        """`share_static_from`: reuse another simulator's immutable
        preprocessed state (rasterized world, coarse MAPF grids, fleet
        planner + compiled step) instead of rebuilding it — the
        Monte-Carlo scenario axis spawns S replicas over ONE world, so
        duplicating the heavy statics S times (the r2 design) is pure
        waste. Only per-scenario mutable state is fresh."""
        self.param = param
        self.mission = mission
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        p = param
        s = mission.stacked()
        self.A = mission.qn
        self.s = s

        if share_static_from is not None:
            base = share_static_from
            self.world = base.world
            self.local_maps = base.local_maps
            # the map manager is MUTABLE in local-sensing mode (sense()
            # writes discovered occupancy every step) — each replica gets
            # its own copy so noise-perturbed scenarios can't
            # cross-contaminate each other's discovered maps; with the
            # global map it is read-only and safely shared
            if base.local_maps:
                import copy as _copy

                self.map_manager = _copy.deepcopy(base.map_manager)
            else:
                self.map_manager = base.map_manager
            self._coarse_version = base._coarse_version
            self.coarse = base.coarse
            self.coarse_nomargin = base.coarse_nomargin
            self.planner = base.planner
            self.fleet = base.fleet
            self.mapf_backend = base.mapf_backend
            self._init_mutable_state(seed, save_result)
            return

        # world preprocessing
        if p.world_use_octomap:
            self.world = build_grid_world(
                mission.world_boxes, mission.world_min, mission.world_max,
                p.world_resolution, float(s["radius"][0]),
            )
        else:
            self.world = build_grid_world(
                np.zeros((0, 6)), mission.world_min, mission.world_max,
                p.world_resolution, float(s["radius"][0]),
            )

        # coarse grid for the MAPF layer
        def linf_distance(points):
            # L∞ distance from points to nearest occupied cell box
            if self.world.n_boxes == 0:
                return np.full(len(points), np.inf)
            d, centers = self.world.distance_to_obstacle(jnp.asarray(points))
            centers = np.asarray(centers)
            lo = centers - 0.5 * p.world_resolution
            hi = centers + 0.5 * p.world_resolution
            cp = np.clip(points, lo, hi)
            return np.max(np.abs(cp - points), axis=-1)

        # local-sensing mode (world_use_global_map=False): per-agent
        # known-occupancy maps, revealed by simulated sensing and shared
        # by in-range map merging (reference: map_manager.cpp:111-144,
        # 231-260; driven at agent_manager.cpp:46-48 and
        # multi_sync_simulator.cpp:335-337)
        self.local_maps = p.world_use_octomap and not p.world_use_global_map
        if self.local_maps:
            from lsc_dr_planner_tpu.world.map_manager import MapManager

            self.map_manager = MapManager(
                mission.world_boxes, mission.world_min, mission.world_max,
                p.world_resolution, self.A, use_global_map=False,
            )
        else:
            self.map_manager = None
        self._coarse_version = -1

        coarse_fn = (
            linf_distance
            if p.world_use_octomap and not self.local_maps
            else None
        )
        self.coarse = build_coarse_grid(
            mission.world_min, mission.world_max, p.grid_resolution,
            p.world_dimension, p.world_z_2d,
            distance_fn=coarse_fn,
            agent_radius=float(s["radius"][0]) + p.grid_margin,
        )
        # margin-free fallback grid (same geometry, reference occupancy
        # semantics — used when the margined grid disconnects a goal)
        self.coarse_nomargin = (
            build_coarse_grid(
                mission.world_min, mission.world_max, p.grid_resolution,
                p.world_dimension, p.world_z_2d,
                distance_fn=coarse_fn,
                agent_radius=float(s["radius"][0]),
            )
            if p.grid_margin > 0 else self.coarse
        )

        # MAPF backend: assert which solver implementation serves this
        # run (native C++ vs Python fallback — bit-identical results,
        # ~25× apart in speed; a silent fallback is a perf cliff)
        self.mapf_backend = pibtmod.backend_name()
        if (param.goal_mode == GoalMode.GRID_BASED_PLANNER
                and self.mapf_backend != "native"):
            import warnings

            warnings.warn(
                "native MAPF backend unavailable — using the ~25× slower "
                "Python solvers (g++ missing or compile failed)",
                RuntimeWarning,
            )

        self.planner = FleetPlanner(
            param, self.world, self.A, max_dynobs=mission.on,
            agent_radius=float(s["radius"][0]),
            max_vel_hint=float(np.max(s["max_vel"])),
        )

        self.fleet = FleetArrays(
            radius=jnp.asarray(s["radius"], jnp.float32),
            downwash=jnp.asarray(s["downwash"], jnp.float32),
            max_vel=jnp.asarray(s["max_vel"], jnp.float32),
            max_acc=jnp.asarray(s["max_acc"], jnp.float32),
            nominal_velocity=jnp.asarray(s["nominal_velocity"], jnp.float32),
        )
        self._init_mutable_state(seed, save_result)

    # ==================================================================
    def _init_mutable_state(self, seed: int, save_result: Optional[bool]):
        """Per-scenario mutable state (everything a Monte-Carlo replica
        owns privately; the heavy preprocessed statics are shared)."""
        p = self.param
        s = self.s
        mission = self.mission
        self.obstacle_generator = ObstacleGenerator(mission.obstacles, seed=seed)
        self._obs_rng = np.random.default_rng(seed + 0x0B5)

        # mutable simulation state (host numpy)
        self.pos = s["start"].astype(np.float64).copy()
        if p.world_dimension == 2:
            self.pos[:, 2] = p.world_z_2d
        self.vel = np.zeros((self.A, 3))
        self.acc = np.zeros((self.A, 3))
        self.start_point = s["start"].copy()
        self.desired_goal = s["goal"].copy()
        self.current_goal = self.pos.copy()
        self.next_waypoint = self.pos.copy()
        self.prev_ctrl = np.asarray(
            trajectory.const_vel_ctrl(
                jnp.asarray(self.pos, jnp.float32),
                jnp.zeros((self.A, 3), jnp.float32), p.M, p.n, p.dt,
            )
        )
        self.desired_ctrl = self.prev_ctrl.copy()
        self.has_prev = np.zeros(self.A, bool)
        self.sfc_lo = np.zeros((self.A, p.M, 3), np.int32)
        self.sfc_hi = np.zeros((self.A, p.M, 3), np.int32)
        self.sfc_initialized = np.zeros(self.A, bool)
        # ADMM dual warm start (zeros = cold; always a real array so the
        # jitted step keeps ONE signature across the whole mission)
        from lsc_dr_planner_tpu.ops import qp as qpmod

        self.qp_y = np.zeros(
            (self.A, qpmod.n_rows(self.planner.qp_cfg)), np.float32
        )
        self.planner_seq = 0
        self._group_plans = {}
        # margined-grid viability cache: after repeated MAPF failures on
        # the margined grid (static per coarse version), commits go
        # straight to the margin-free grid
        self._margined_fails = 0
        # waypoint-layer event log: (planner_seq, event, detail) — cheap,
        # bounded; surfaces stall resets / yields / plan commits for
        # debugging and the regression tests
        self.events: List[tuple] = []
        self._pin_steps = np.zeros(self.A, dtype=int)
        self._pin_anchor = self.pos.copy()
        # hybrid waypoint layer state: per-step (reference semantics)
        # until escalation, committed-MCP for knotted groups
        self._mcp_mode = np.zeros(self.A, dtype=bool)
        self._dist_best = np.full(self.A, np.inf)
        self._no_progress = np.zeros(self.A, dtype=int)
        self.mapf_elapsed = np.zeros(self.A, dtype=np.int64)
        self._ps_memo = {}  # per-step solve memo, keyed by exact config
        self._layer = self._resolve_layer()
        self.planner_state = (
            PlannerState.PATROL if p.multisim_patrol else PlannerState.GOTO
        )
        self.sim_time = 0.0

        # metrics
        self.planning_time = PlanningTimeStatistics()
        self.safety_ratio_agent = np.inf
        self.safety_ratio_obs = np.inf
        self.vel_excess_ratio = np.zeros(3)
        self.acc_excess_ratio = np.zeros(3)
        self.total_flight_time = np.inf
        self.traj_history: List[np.ndarray] = []
        self.is_collided = False
        self.qp_failed = False

        self.save_result = (
            p.multisim_save_result if save_result is None else save_result
        )
        self.mission_start_time = str(time.time())
        self.file_name_param = (
            f"{p.planner_mode_str()}_{self.A}agents"
        )
        self._sim_csv_rows: List[str] = []

        if self.local_maps:
            self.map_manager.sense(self.pos, p.sensor_range)

    # ==================================================================
    def run(self, max_iterations: Optional[int] = None, verbose: bool = False,
            checkpoint_path: Optional[str] = None, checkpoint_every: int = 0,
            frame_every: int = 0, frame_dir: Optional[str] = None):
        p = self.param
        max_iter = max_iterations or p.multisim_max_planner_iteration
        for it in range(max_iter):
            if self.is_finished() or it == max_iter - 1:
                break
            if checkpoint_path and checkpoint_every and it > 0 \
                    and it % checkpoint_every == 0:
                self.save_checkpoint(checkpoint_path)
            if self.planner_seq > 0 or it > 0:
                self.do_step()
            self.decentralized_mapp()
            ok = self.plan()
            if not ok:
                self.qp_failed = True
                break
            if frame_every and self.planner_seq % frame_every == 0:
                # internal-artifact debug frame (SFC/LSC/waypoints/groups)
                from lsc_dr_planner_tpu.sim.replay import render_debug_frame

                fd = frame_dir or self.log_dir
                os.makedirs(fd, exist_ok=True)
                render_debug_frame(self, os.path.join(
                    fd, f"frame_{self.planner_seq:04d}.png"
                ))
            # LAND runs the planner but stops recording/auditing —
            # landing agents intentionally descend through each other's
            # altitude band (reference: multi_sync_simulator.cpp:365-371)
            if self.planner_state != PlannerState.LAND:
                self.save_simulation_result()
            if verbose and it % 10 == 0:
                d = np.linalg.norm(self.pos - self.desired_goal, axis=-1)
                print(
                    f"iter {it}: t={self.sim_time:.1f}s max dist to goal "
                    f"{d.max():.2f} plan {self.planning_time.total_planning_time.current*1e3:.1f} ms"
                )
        self.summarize()
        return self.summary()

    # ==================================================================
    def save_checkpoint(self, path: str) -> None:
        """Full-fidelity mid-run checkpoint (see sim/checkpoint.py)."""
        from lsc_dr_planner_tpu.sim.checkpoint import save_checkpoint

        save_checkpoint(self, path)

    def load_checkpoint(self, path: str) -> None:
        """Restore a checkpoint into this simulator (same Param+Mission)."""
        from lsc_dr_planner_tpu.sim.checkpoint import load_checkpoint

        load_checkpoint(self, path)

    # ==================================================================
    # Planner-state service surface (reference ROS services
    # /start_planning, /stop_planning [land], /patrol, /stop_patrol —
    # multi_sync_simulator.cpp:733-755).
    def start_planning(self) -> None:
        self.planner_state = PlannerState.GOTO

    def land(self) -> None:
        """Stop the mission: keep planning (collision avoidance stays
        live) but stop recording/auditing; in 3-D the goals drop to
        ground level under each agent."""
        self.planner_state = PlannerState.LAND

    def patrol(self) -> None:
        self.planner_state = PlannerState.PATROL

    def stop_patrol(self) -> None:
        self.planner_state = PlannerState.GOBACK

    # ==================================================================
    def is_finished(self) -> bool:
        if self.planner_state in (PlannerState.PATROL, PlannerState.LAND):
            return False
        target = (
            self.start_point
            if self.planner_state == PlannerState.GOBACK
            else self.desired_goal
        )
        dist = np.linalg.norm(self.pos - target, axis=-1)
        if np.all(dist <= self.param.goal_threshold):
            self.total_flight_time = self.sim_time
            return True
        return False

    # ==================================================================
    def do_step(self):
        """Ideal dynamics: sample own planned trajectory at +Δt.

        Reference: AgentManager::doStep, src/agent_manager.cpp:29-50.
        Sampled HOST-SIDE in float64 (same Bernstein evaluation as the
        safety audit): it is exact, backend-independent (CPU and TPU
        runs integrate identical dynamics from identical control
        points), and saves a device round-trip per step — significant
        over the TPU tunnel (~60-150 ms per dispatch).
        """
        p = self.param
        pos, vel, acc = _state_at_np(
            self.desired_ctrl, p.multisim_time_step, p.dt
        )
        self.pos = np.asarray(pos, np.float64)
        self.vel = np.asarray(vel, np.float64)
        self.acc = np.asarray(acc, np.float64)
        if p.world_dimension == 2:
            self.pos[:, 2] = p.world_z_2d
        self.sim_time += p.multisim_time_step
        # simulated local sensing (agent_manager.cpp:46-48)
        if self.local_maps:
            self.map_manager.sense(self.pos, p.sensor_range)

    # ==================================================================
    def _groups(self) -> List[List[int]]:
        """Connected components under L∞ communication range.

        Reference: multi_sync_simulator.cpp:160-194 (O(A²) pairwise scan
        + BFS). Here: kd-tree range pairs (L∞ metric) + sparse
        connected components — fully vectorized, O(A·k log A) for
        bounded density. At A=1024 this is ~5 ms vs 40 ms for the
        earlier Python union-find (the host-phase floor of the
        Monte-Carlo pod config is A·S of these per step).
        """
        p = self.param
        A = self.A
        if p.communication_range <= 0:
            return [list(range(A))]
        R = p.communication_range
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components
        from scipy.spatial import cKDTree

        pairs = cKDTree(self.pos).query_pairs(
            r=R, p=np.inf, output_type="ndarray"
        )
        if len(pairs):
            # query_pairs is closed (≤ R); the reference's check is
            # strict (< R) — filter the boundary
            d = np.max(
                np.abs(self.pos[pairs[:, 0]] - self.pos[pairs[:, 1]]),
                axis=1,
            )
            pairs = pairs[d < R]
        graph = coo_matrix(
            (np.ones(len(pairs), np.int8), (pairs[:, 0], pairs[:, 1])),
            shape=(A, A),
        )
        _, labels = connected_components(graph, directed=False)
        comps: dict = {}
        for i in range(A):
            comps.setdefault(labels[i], []).append(i)
        return [sorted(v) for v in sorted(comps.values())]

    # ==================================================================
    def decentralized_mapp(self):
        """Per-group MAPF + next-waypoint vetting.

        Reference: MultiSyncSimulator::decentralizedMAPP,
        src/multi_sync_simulator.cpp:160-303.
        """
        p = self.param
        if p.goal_mode != GoalMode.GRID_BASED_PLANNER:
            return

        # DLSC sub-step mode: the waypoint layer advances at the SEGMENT
        # cadence (dt), not the replanning cadence. Its dynamics — one
        # grid cell per step, progress/pin windows, comm-range boxes —
        # are calibrated to bodies that traverse ~one cell per segment;
        # at sub-step cadence the virtual waypoints outrun the bodies
        # (jerk-limited starts cover ~(ts/dt)³ of a segment per sub-step)
        # and pairs wedge side-by-side at single-file passages (measured
        # on forest10_2 DLSC). The trajectory layer still replans every
        # sub-step — that is DLSC's actual contribution.
        if p.multisim_time_step < p.dt:
            k = max(1, int(round(p.dt / p.multisim_time_step)))
            if self.planner_seq % k != 0:
                return

        # local-sensing mode: the MAPF grid reflects only DISCOVERED
        # obstacles (reference: GridBasedPlanner occupancy comes from the
        # agent's own distmap, grid_based_planner.cpp:102-139; after
        # in-range merging the group members' maps coincide)
        if self.local_maps and self.map_manager.version() != self._coarse_version:
            self._rebuild_coarse_from_known()

        EPS = 1e-5  # SP_EPSILON_FLOAT (reference sp_const.hpp:4)

        # --- waypoint RETREAT: targeted virtual→physical re-sync ----------
        # The virtual waypoint config can diverge from the physical fleet:
        # a goal LP gets pinned short of its waypoint (contact-tight CLSC
        # when two crossing bodies meet mid-transit) while the body stops,
        # yet the MAPF layer keeps planning from the fictional waypoint
        # cell. Detection is WINDOWED against an anchor position, so a
        # pinned agent that micro-oscillates (contact-margin limit
        # cycles move the body a few cm/step without progress) still
        # counts as pinned. A pinned agent gets two escapes, in order:
        #   1. its goal-LP convergence gate relaxes to contact scale
        #      (0.6·grid cell) — a leader pinned ½(r_i+r_j) short of its
        #      waypoint by a neighbor's CLSC can then take its next
        #      (typically away-leading) plan cell, unknotting the queue;
        #   2. if its waypoint CELL differs from its body's cell
        #      (virtual/physical divergence), the waypoint retreats to
        #      the body's cell (if free); the memo key contains the
        #      config, so the next solve re-plans from true state.
        # This replaces the earlier blanket stall resets/yield
        # escalation, which thrashed healthy plans.
        RETREAT_K = 20
        # communication groups, shared by the retreat valve and the
        # per-group loop below. The occupancy/vetting semantics are
        # PER-GROUP (reference: desired_waypoints vetting inside the
        # group loop, multi_sync_simulator.cpp:214-291): an out-of-range
        # agent's parked waypoint must not block a retreat — measured
        # wedge (fuzz seed 1007): singleton agents pinned forever
        # because a finished agent far across the map held their cell.
        groups_list = self._groups()
        group_label = np.empty(self.A, dtype=int)
        for _gi, _g in enumerate(groups_list):
            group_label[list(_g)] = _gi
        diverged = (
            np.linalg.norm(self.current_goal - self.next_waypoint, axis=-1)
            > EPS
        )
        far = (
            np.linalg.norm(self.pos - self._pin_anchor, axis=-1)
            > 0.5 * p.grid_resolution
        )
        reset = far | ~diverged
        self._pin_anchor = np.where(reset[:, None], self.pos, self._pin_anchor)
        self._pin_steps = np.where(reset, 0, self._pin_steps + 1)
        pinned_mask = self._pin_steps >= RETREAT_K
        pinned = np.nonzero(pinned_mask)[0]
        if len(pinned):
            # cell -> set of waypoint holders: planar cells CAN be shared
            # (merged comm groups, 3-D agents at different altitudes), so
            # a plain cell->agent dict would collapse duplicates and
            # corrupt/KeyError on the second retreat from a shared cell
            wp_cells = self._waypoint_cell_holders()
            for i in pinned:
                cell = self.coarse.point_to_node(self.pos[i])
                cell[2] = 0
                key = tuple(cell[:2])
                mine = tuple(
                    self.coarse.point_to_node(self.next_waypoint[i])[:2]
                )
                if key == mine:
                    continue  # synced cells: escape 1 (gate relax) applies
                if any(group_label[j] == group_label[i]
                       for j in wp_cells.get(key, set()) if j != i):
                    continue  # an IN-GROUP waypoint holds our cell
                wpp = self.coarse.node_to_point(cell)
                wpp[2] = (
                    self.pos[i][2] if p.world_dimension == 3 else p.world_z_2d
                )
                wp_cells.get(mine, set()).discard(i)
                wp_cells.setdefault(key, set()).add(i)
                self.next_waypoint[i] = wpp
                self._pin_steps[i] = 0
                self._log("retreat", (int(i), key))

        # --- MCP escalation (hybrid layer) --------------------------------
        # Groups flow under the reference's per-step re-solve semantics —
        # fast on open maps — until a member shows a genuine knot; its
        # whole group then switches to committed-plan MCP (deadlock-free
        # by construction) until the plan completes. Two triggers:
        #   1. PIN (20 steps): body wedged at contact while its goal LP
        #      stays diverged — the contact-wedge signature.
        #   2. NO-PROGRESS (60 steps): no 5 cm improvement of
        #      distance-to-goal — catches per-step-ECBS livelocks where
        #      orbiting members feed all-wait rows to the rest (the LP
        #      converges onto a never-advancing waypoint, so trigger 1
        #      stays silent; measured on maze10_sparse_2). The window is
        #      deliberately LONG: a 25-step version escalated healthy
        #      queue waits and wrecked their flow (measured deadlocks on
        #      forest10_8 / sparse mazes).
        NO_PROGRESS_K = 60
        dgoal = np.linalg.norm(self.pos - self.desired_goal, axis=-1)
        at_goal_now = dgoal < p.goal_threshold
        rebase = dgoal > self._dist_best + 1.0  # patrol swap / goal change
        self._dist_best = np.where(rebase, dgoal, self._dist_best)
        improved = dgoal < self._dist_best - 0.05
        self._dist_best = np.minimum(self._dist_best, dgoal)
        self._no_progress = np.where(
            improved | at_goal_now, 0, self._no_progress + 1
        )

        occ2d = self.coarse.occ2d().copy()
        seen_sigs = set()
        for group in groups_list:
            timer = Timer()
            garr = np.asarray(group)
            cells_start = [tuple(r) for r in
                           self.coarse.point_to_node(self.start_point[garr])[:, :2].tolist()]
            cells_cur = [tuple(r) for r in
                         self.coarse.point_to_node(self.next_waypoint[garr])[:, :2].tolist()]
            cells_goal = [tuple(r) for r in
                          self.coarse.point_to_node(self.desired_goal[garr])[:, :2].tolist()]

            # the all-in-MCP guard must ignore AT-GOAL members: finished
            # agents return to the flow layer (mcp_mode=False), so a
            # group containing them would otherwise re-escalate every
            # waypoint step — each escalation re-syncs waypoints and
            # invalidates the committed plan before it can execute a
            # single handoff (measured thrash loop: 458 escalations,
            # forest10_22 DLSC, the last r4 forest failure)
            if self._layer == "hybrid" and bool(np.any(
                (pinned_mask[garr]
                 | (self._no_progress[garr] >= NO_PROGRESS_K))
                & ~at_goal_now[garr]
            )) and not all(self._mcp_mode[garr] | at_goal_now[garr]):
                # sub-step mode: preserve no-progress accrual for members
                # ALREADY in MCP — bodies lag the virtual waypoints, so
                # group-membership churn re-escalates often and a full
                # reset starves the MCP_FALLBACK valve forever (measured
                # livelock: escalate×7 cycling, forest10_2 DLSC)
                if p.multisim_time_step < p.dt:
                    newly = [i for i in group if not self._mcp_mode[i]]
                    self._no_progress[newly] = 0
                else:
                    self._no_progress[list(group)] = 0
                self._mcp_mode[list(group)] = True
                # re-sync the group's virtual waypoints to the bodies'
                # actual cells (where free): the per-step phase can leave
                # waypoints ahead of contact-wedged bodies, and a
                # committed plan solved from that fictional config
                # inherits the wedge instead of resolving it
                wp_cells = self._waypoint_cell_holders()
                n_retreat = 0
                for i in group:
                    cell = self.coarse.point_to_node(self.pos[i])
                    cell[2] = 0
                    key = tuple(cell[:2])
                    mine = tuple(
                        self.coarse.point_to_node(self.next_waypoint[i])[:2]
                    )
                    if key == mine:
                        continue
                    if any(group_label[j] == group_label[i]
                           for j in wp_cells.get(key, set()) if j != i):
                        continue
                    wpp = self.coarse.node_to_point(cell)
                    wpp[2] = (
                        self.pos[i][2] if p.world_dimension == 3
                        else p.world_z_2d
                    )
                    wp_cells.get(mine, set()).discard(i)
                    wp_cells.setdefault(key, set()).add(i)
                    self.next_waypoint[i] = wpp
                    n_retreat += 1
                if n_retreat:
                    cells_cur = [
                        tuple(self.coarse.point_to_node(self.next_waypoint[i])[:2])
                        for i in group
                    ]
                self._log("escalate", (tuple(group), n_retreat))

            # Reverse escalation: the committed-MCP layer can wedge on
            # terminal two-agent knots (goal-LP pinned against a
            # neighbor whose committed plan is already finished —
            # measured on maze10_dense_4/8/10/20, which the per-step
            # layer finishes). A group stuck for MCP_FALLBACK_K steps
            # runs per-step (greedy row-1 + carried-elapsed PIBT
            # pressure) until progress resumes; no_progress then resets
            # and the group returns to committed plans re-solved from
            # the current config.
            # Trigger on long no-progress AND a currently diverged goal
            # LP — the terminal-wedge signature. Committed-mode queue
            # members legitimately park for 20 s+ while a corridor
            # clears, but their goal LP sits converged on their
            # waypoint, so they never trip this (a pure progress
            # trigger cost maze10_dense_1 8 s; a pure pin trigger never
            # fires in wedges whose retreat escape keeps resetting it).
            # Instance-adaptive windows (VERDICT r4 #2): the fallback
            # thresholds were tuned on ≤10-agent reference groups; a
            # large group's committed plan legitimately takes
            # O(group·corridor) steps to drain its follow-chains, so a
            # fixed window fires mid-drain and thrashes healthy plans.
            # Scale by group size beyond the tuned regime (identity for
            # the 90-mission suite and small OOD groups).
            gscale = max(0, len(group) - 10)
            MCP_FALLBACK_K = 150 + 10 * gscale
            PIN_FALLBACK_K = 50 + 2 * gscale
            lp_diverged = (
                np.linalg.norm(
                    self.current_goal[garr] - self.next_waypoint[garr],
                    axis=1,
                ) > EPS
            )
            force_ps = self._layer == "mcp" and bool(np.any(
                ((self._pin_steps[garr] >= PIN_FALLBACK_K)
                 | ((self._no_progress[garr] >= MCP_FALLBACK_K)
                    & lp_diverged))
                & ~at_goal_now[garr]
            ))
            if force_ps:
                self._log("mcp_fallback", tuple(group))
            use_mcp = not force_ps and (
                self._layer == "mcp"
                or any(self._mcp_mode[i] for i in group)
            )
            if not use_mcp:
                # ---- per-step mode (reference semantics) -----------------
                # Per-step re-solve, memoized by the exact (group, config,
                # goals, grid) signature: the solver is deterministic, so
                # when nothing moved the identical plan would come back —
                # skip the solve entirely.
                ps_sig = (tuple(group), tuple(cells_cur),
                          tuple(cells_goal), self._coarse_version)
                if ps_sig in self._ps_memo:
                    paths = self._ps_memo[ps_sig]
                else:
                    paths = self._solve_group(
                        occ2d, group, cells_start, cells_cur, cells_goal,
                        use_ecbs=(
                            p.mapf_mode == MAPFMode.ECBS
                            or (p.mapf_commit_ecbs
                                and len(group) <= p.mapf_ecbs_max_agents)
                        ),
                        rows=2,  # per-step mode consumes only row 1
                    )
                    self._ps_memo[ps_sig] = paths
                    while len(self._ps_memo) > 256:  # bounded memo
                        self._ps_memo.pop(next(iter(self._ps_memo)))
                self.planning_time.mapf_time.update(timer.stop())
                if paths is not None:
                    self._perstep_execute(
                        group, cells_cur, cells_goal, paths, EPS
                    )
                self._goal_walk(group, cells_goal, EPS)
                continue

            # --- committed joint plan + simultaneous-handoff MCP ----------
            # The reference re-solves MAPF from scratch every step and
            # follows plan row 1 under mutual-occupancy vetting
            # (multi_sync_simulator.cpp:214-291). That row-1 semantics
            # fits GREEDY solvers (PIBT: every row is progress-dense) but
            # breaks for SCHEDULED plans: ECBS's SOC objective makes
            # leading waits and step-asides cost-free, so executing only
            # row 1 of a fresh solve either does nothing (all-wait rows)
            # or flip-flops between two configs whose optimal plans undo
            # each other (both measured on maze10_dense). Here each group
            # COMMITS to one bounded-ECBS joint plan (PIBT fallback) and
            # executes it ORDER-PRESERVINGLY (MCP — Ma & Koenig / Hönig
            # et al.) with simultaneous handoff: an agent enters a cell
            # when every earlier visitor has left it or leaves it this
            # very step (greatest fixpoint below) — so follow-chains
            # advance in lockstep exactly like the reference's vetting,
            # while scheduling waits are realized by visit order instead
            # of being lost. A valid swap-free plan executed this way
            # cannot deadlock; re-solves happen only when the group, its
            # goals, the grid, or the virtual config (retreats) change.
            sig = (tuple(group), tuple(cells_goal), self._coarse_version)
            seen_sigs.add(sig)
            plan = self._group_plans.get(sig)
            if plan is not None:
                # desync (a retreat moved a waypoint off-plan)?
                for gi in range(len(group)):
                    if plan["paths"][gi][plan["ptr"][gi]] != cells_cur[gi]:
                        plan = None
                        break

            if plan is None:
                paths = self._solve_group(
                    occ2d, group, cells_start, cells_cur, cells_goal,
                    use_ecbs=(
                        p.mapf_mode == MAPFMode.ECBS
                        or (p.mapf_commit_ecbs
                            and len(group) <= p.mapf_ecbs_max_agents)
                    ),
                )
                if paths is not None:
                    plan = self._commit_plan(group, cells_cur, paths)
                    self._group_plans[sig] = plan
            self.planning_time.mapf_time.update(timer.stop())
            if plan is None:
                continue  # MAPF failed: keep previous waypoints (:295-297)

            paths, ptr, visits = plan["paths"], plan["ptr"], plan["visits"]
            T = len(paths[0])
            # fast-forward waits (per-cell visit order unaffected; MCP
            # lets agents run ahead of schedule as long as order holds)
            for gi in range(len(group)):
                k = ptr[gi]
                while k + 1 < T and paths[gi][k + 1] == paths[gi][k]:
                    k += 1
                ptr[gi] = k

            # candidate set: agents with a next plan cell whose gates
            # pass — comm-range reachability (:217-252) and goal-LP
            # convergence (:245-248), exact like the reference except
            # for persistently-PINNED agents (see the pin detector
            # above), whose gate relaxes to contact scale: the targeted
            # liveness valve for mid-transit contact wedges. A merely
            # near-converged gate for everyone was measured to pack
            # bodies to contact distance and freeze whole queues.
            cand = {}
            gate_blocks = {"comm": 0, "lp": 0, "done": 0}
            for gi, i in enumerate(group):
                k = ptr[gi]
                if k + 1 >= T:
                    gate_blocks["done"] += 1
                    # committed plan finished: the knot this MCP episode
                    # was escalated for is resolved — return the agent
                    # to the per-step flow layer
                    self._mcp_mode[i] = False
                    continue  # plan finished → goal walk below
                v = paths[gi][k + 1]
                wpp = self.coarse.node_to_point(np.array([v[0], v[1], 0]))
                if p.world_dimension == 3:
                    # the MAPF layer is planar (the reference collapses
                    # z, problem.cpp:148-201); fly at the goal altitude
                    wpp[2] = self.desired_goal[i][2]
                if p.communication_range > 0:
                    pts = [self.desired_ctrl[i, m, 0] for m in range(p.M)]
                    pts.append(self.desired_ctrl[i, -1, -1])
                    if not self.has_prev[i]:
                        pts = [self.pos[i]]
                    if any(
                        np.max(np.abs(wpp - q))
                        > 0.5 * p.communication_range - EPS
                        for q in pts
                    ):
                        gate_blocks["comm"] += 1
                        continue
                tol = (
                    0.6 * p.grid_resolution if pinned_mask[i] else EPS
                )
                if np.linalg.norm(
                    self.current_goal[i] - self.next_waypoint[i]
                ) > tol:
                    gate_blocks["lp"] += 1
                    continue
                cand[gi] = (v, wpp)
            n_cand = len(cand)

            # simultaneous-handoff order gate (greatest fixpoint): keep
            # a candidate entering v only if every earlier visitor of v
            # has left (ptr > t_out) or leaves v in this same step (it
            # sits at the end of its visit, ptr == t_out, and is itself
            # advancing)
            changed = True
            while changed and cand:
                changed = False
                for gi in list(cand):
                    v = cand[gi][0]
                    k = ptr[gi]
                    for (t_in, t_out, gj) in visits[v]:
                        if t_in < k + 1 and ptr[gj] <= t_out:
                            if not (gj in cand and ptr[gj] == t_out):
                                del cand[gi]
                                changed = True
                                break
                    if changed:
                        break

            if len(group) > 1 or any(gate_blocks.values()):
                self._log("gates", (len(group), dict(gate_blocks),
                                    n_cand, len(cand)))
            for gi, (v, wpp) in cand.items():
                i = group[gi]
                self.next_waypoint[i] = wpp
                ptr[gi] += 1
                self._pin_steps[i] = 0
                self._pin_anchor[i] = self.pos[i]

            self._goal_walk(group, cells_goal, EPS)

        # evict plans whose signature no longer exists (group membership,
        # goals, or grid changed) — their MCP state can never be consumed
        self._group_plans = {
            s: pl for s, pl in self._group_plans.items() if s in seen_sigs
        }

    # ==================================================================
    def _waypoint_cell_holders(self) -> dict:
        """Planar waypoint cell -> set of agents whose next_waypoint sits
        in it (duplicates are real: merged groups / 3-D altitudes)."""
        holders: dict = {}
        cells = self.coarse.point_to_node(self.next_waypoint)[:, :2]
        for j in range(self.A):
            holders.setdefault(tuple(cells[j]), set()).add(j)
        return holders

    # ==================================================================
    def _resolve_layer(self) -> str:
        """Resolve mapf_layer="auto" per map: measure the fraction of
        free coarse cells that sit in 1-cell-wide passages (≤ 4 free
        cells in their 3×3 neighborhood), on both the margined and the
        margin-free grids. Corridor/maze maps run committed-MCP from
        the start — contact wedges and per-step-ECBS livelocks never
        form there; open maps run the hybrid per-step flow layer, which
        matches the reference's flight times (forest10_10 15.8 s =
        reference). Thresholds from the full 90-world sweep: forest
        margined ≤ 0.159 / nomargin ≤ 0.112, sparse mazes margined
        ≥ 0.211 (nomargin ≈ 0.09 — walls vanish without the margin, so
        both grids are tested), dense mazes ≥ 0.171 on both."""
        p = self.param
        if p.mapf_layer != "auto":
            return p.mapf_layer

        def corridor_frac(grid):
            free = ~grid.occ2d()
            if not free.any():
                return 0.0
            f = free.astype(int)
            pad = np.pad(f, 1)
            s = sum(
                pad[1 + dx : 1 + dx + f.shape[0],
                    1 + dy : 1 + dy + f.shape[1]]
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            )
            return ((s <= 4) & free).sum() / free.sum()

        if (corridor_frac(self.coarse) > 0.165
                or corridor_frac(self.coarse_nomargin) > 0.15):
            return "mcp"
        return "hybrid"

    # ==================================================================
    def _solve_group(self, occ2d, group, cells_start, cells_cur, cells_goal,
                     use_ecbs: bool, rows: Optional[int] = None):
        """One joint MAPF solve for a group, with margined-grid →
        margin-free fallback (grid_based_planner.cpp:262-283 cell
        unblocking; occupancy semantics :102-139). `use_ecbs` selects
        bounded native ECBS (committed-MCP mode) vs PIBT with carried
        elapsed priorities (per-step mode). `rows` truncates the
        RETURNED paths (per-step mode consumes only row 1 — full-path
        tuple conversion dominated the host phase at fleet scale)."""
        p = self.param

        def solve(occ):
            if use_ecbs:
                # native C++ ECBS (bit-identical to mapf/ecbs.py, ~25×
                # faster; falls back to Python). Budgets are
                # node/expansion counts (deterministic); the wall-clock
                # limit is only a generous backstop so host load cannot
                # change planning outcomes.
                # the node budget is the deterministic limiter; the
                # wall-clock backstop is set far above any observed
                # solve (max 8.9 s) so HOST LOAD cannot flip the PIBT
                # fallback and change planning outcomes between runs
                # (observed: contended benchmark runs deadlocked
                # missions that solo runs finish)
                paths = pibtmod.solve_ecbs(
                    occ, cells_start, cells_cur, cells_goal,
                    max_hl_nodes=p.mapf_hl_nodes,
                    time_limit_s=p.mapf_time_limit_s,
                    max_rows=rows,
                )
                if paths is not None or p.mapf_mode == MAPFMode.ECBS:
                    self._log("solve", ("ecbs", len(group),
                                        paths is not None))
                    return paths
                self._log("solve", ("ecbs_fail", len(group), False))
            # PIBT with carried elapsed priorities: the reference resets
            # priorities every re-solve (pibt.cpp:30-44); carrying them
            # across the simulator's successive calls gives blocked
            # agents monotone pressure, breaking waypoint limit cycles
            # (see mapf/pibt.py docstring)
            paths = pibtmod.solve_pibt(
                occ, cells_start, cells_cur, cells_goal, seed=0,
                init_elapsed=[int(self.mapf_elapsed[i]) for i in group],
                max_rows=rows,
            )
            if not use_ecbs:
                self._log("solve_ps", ("pibt", len(group),
                                       paths is not None))
            else:
                self._log("solve", ("pibt", len(group), paths is not None))
            return paths

        occ_grp = occ2d.copy()
        for c in cells_cur + cells_goal:
            occ_grp[c] = False
        try_margined = self._margined_fails < 3
        paths = solve(occ_grp) if try_margined else None
        if paths is None and self.coarse_nomargin is not self.coarse:
            # margin-free fallback (narrow corridors the margined grid
            # blocks entirely)
            if try_margined:
                self._margined_fails += 1
            occ_nm = self.coarse_nomargin.occ2d().copy()
            for c in cells_cur + cells_goal:
                occ_nm[c] = False
            paths = solve(occ_nm)
        elif try_margined and paths is not None:
            self._margined_fails = 0
        return paths

    # ==================================================================
    def _perstep_execute(self, group, cells_cur, cells_goal, paths, EPS):
        """Reference-semantics waypoint update: desired waypoint = plan
        row 1 of a fresh per-step solve, gated by comm-range
        reachability + goal-LP convergence, then mutual-occupancy
        vetting (candidates check other candidates' DESIRED cells, so
        follow-chains advance in lockstep). Fully vectorized over the
        group — groups reach fleet size on open maps, and the earlier
        per-agent Python loops (O(n²) vetting) were the host wall at
        A=1024 (measured 19 s/step in the Monte-Carlo pod bench).

        Reference: multi_sync_simulator.cpp:214-291.
        """
        p = self.param
        n_grp = len(group)
        g = np.asarray(group)

        dcell = np.array(
            [paths[gi][min(1, len(paths[gi]) - 1)] for gi in range(n_grp)],
            dtype=np.int64,
        )  # [n, 2]
        wpp = self.coarse.node_to_point(
            np.concatenate([dcell, np.zeros((n_grp, 1), np.int64)], axis=1)
        )  # [n, 3] (z = flight altitude in 2-D worlds)
        if p.world_dimension == 3:
            # the MAPF layer is planar (the reference collapses z,
            # problem.cpp:148-201); fly at the goal altitude
            wpp[:, 2] = self.desired_goal[g, 2]

        ccur = np.asarray(cells_cur, dtype=np.int64)
        moved = np.any(dcell != ccur, axis=1)

        # comm-range reachability (vectorized over agents × segment
        # starts); fresh agents gate against the current position
        if p.communication_range > 0:
            seg_pts = np.concatenate(
                [self.desired_ctrl[g][:, :, 0],
                 self.desired_ctrl[g][:, -1:, -1]], axis=1,
            )  # [n, M+1, 3]
            reach_traj = np.max(
                np.abs(wpp[:, None] - seg_pts), axis=(1, 2)
            ) < 0.5 * p.communication_range - EPS
            reach_pos = np.max(
                np.abs(wpp - self.pos[g]), axis=1
            ) < 0.5 * p.communication_range - EPS
            reach = np.where(self.has_prev[g], reach_traj, reach_pos)
        else:
            reach = np.ones(n_grp, bool)

        # goal-LP convergence gate (:245-248), exact: advancing on a
        # merely NEAR-converged LP was measured to pack bodies to
        # contact distance and freeze whole queues
        lp_ok = (
            np.linalg.norm(self.current_goal[g] - self.next_waypoint[g],
                           axis=1) < EPS
        )
        cand = moved & reach & lp_ok
        gate_blocks = {
            "done": int(np.sum(~moved)),
            "comm": int(np.sum(moved & ~reach)),
            "lp": int(np.sum(moved & reach & ~lp_ok)),
        }
        n_cand = int(cand.sum())

        # mutual-occupancy vetting (multi_sync_simulator.cpp:259-291):
        # drop candidates whose desired cell coincides with another
        # agent's NEXT waypoint cell — current for non-candidates,
        # desired for candidates — until a full pass is clean.
        # Vectorized fixpoint: per pass, count cell occupancies of the
        # projected next config and kill colliding candidates.
        if n_grp > 1 and cand.any():
            key_cur = ccur[:, 0] * 10_000_019 + ccur[:, 1]
            key_des = dcell[:, 0] * 10_000_019 + dcell[:, 1]
            while cand.any():
                # (a) candidate dies on a NON-candidate's current cell
                noncand_keys = np.unique(key_cur[~cand])
                dies = cand & np.isin(key_des, noncand_keys)
                # (b) several candidates desire the same cell: the
                # sequential reference scan kills all but the highest
                # index (each earlier one sees the later's desired cell
                # and drops out first)
                ci = np.nonzero(cand)[0]
                order = np.argsort(key_des[ci], kind="stable")
                sk = key_des[ci][order]
                si = ci[order]
                if len(sk) > 1:
                    not_last = np.concatenate([sk[1:] == sk[:-1], [False]])
                    dies[si[not_last]] = True
                if not dies.any():
                    break
                cand = cand & ~dies

        if n_grp > 1 or any(gate_blocks.values()):
            self._log("gates_ps", (n_grp, dict(gate_blocks),
                                   n_cand, int(cand.sum())))
        idx = g[cand]
        self.next_waypoint[idx] = wpp[cand]
        self._pin_steps[idx] = 0
        self._pin_anchor[idx] = self.pos[idx]

    # ==================================================================
    def _goal_walk(self, group, cells_goal, EPS):
        """Once the waypoint reaches the goal CELL, walk it to the exact
        goal POINT one grid step at a time (bridges altitude in 3-D and
        off-grid goals without violating the comm-range waypoint bound;
        the reference's mission goals sit on the grid, so its waypoints
        ARE the exact goals). Also updates the carried PIBT elapsed
        priorities (in-plan PIBT elapsed analog, pibt.cpp:78).
        Vectorized over the group (host-scalability: fleet-size groups).
        """
        p = self.param
        g = np.asarray(group)
        wp_cells = self.coarse.point_to_node(self.next_waypoint[g])[:, :2]
        at_goal = np.all(
            wp_cells == np.asarray(cells_goal, dtype=wp_cells.dtype), axis=1
        )

        delta = np.clip(
            self.desired_goal[g] - self.next_waypoint[g],
            -p.grid_resolution, p.grid_resolution,
        )
        wpp = self.next_waypoint[g] + delta
        # same comm-range reachability gate as the plan-cell candidates
        # (multi_sync_simulator.cpp:217-252): a waypoint farther than
        # ½·comm_range from the current trajectory makes the QP's comm
        # box infeasible (pinned start can't reach it), the f32 ADMM
        # reports divergence, and the failsafe then freezes the agent
        # permanently — measured on the 3-D vertical-crossing test
        # where the walk ran 2 m ahead of a CLSC-blocked body. Fresh
        # agents gate against the current position (:233-235).
        if p.communication_range > 0:
            seg_pts = np.concatenate(
                [self.desired_ctrl[g][:, :, 0],
                 self.desired_ctrl[g][:, -1:, -1]], axis=1,
            )  # [n, M+1, 3]
            ok_traj = np.max(
                np.abs(wpp[:, None] - seg_pts), axis=(1, 2)
            ) < 0.5 * p.communication_range - EPS
            ok_pos = np.max(
                np.abs(wpp - self.pos[g]), axis=1
            ) < 0.5 * p.communication_range - EPS
            ok = np.where(self.has_prev[g], ok_traj, ok_pos)
        else:
            ok = np.ones(len(g), bool)

        take = at_goal & ok
        self.next_waypoint[g[take]] = wpp[take]
        # persistent PIBT priority: agents stuck away from their goals
        # accumulate priority for the next per-step solve
        self.mapf_elapsed[g] = np.where(
            at_goal, 0, self.mapf_elapsed[g] + 1
        )

    # ==================================================================
    @staticmethod
    def _commit_plan(group, cells_cur, paths):
        """Normalize a fresh joint plan for MCP execution: per-agent cell
        sequences starting at the current virtual config, padded to equal
        length, plus per-cell visit intervals (t_in, t_out, agent index)
        in plan order."""
        n = len(group)
        # Row 0 of a PIBT solution is the mission-start config
        # (pibt.cpp:44) while rows 1.. evolve from the CURRENT config;
        # replace row 0 with the current config JOINTLY so all agents
        # share one timeline ([cur, cfg1, cfg2, …]). ECBS paths already
        # start at the current config.
        if all(len(paths[gi]) and paths[gi][0] == cells_cur[gi]
               for gi in range(n)):
            norm = [list(paths[gi]) for gi in range(n)]
        else:
            # keep a length-1 path's single cell as a real move when it
            # differs from the current cell (otherwise the row-0
            # replacement would silently drop it)
            norm = [
                [cells_cur[gi]]
                + (list(paths[gi])[1:] if len(paths[gi]) > 1
                   else [c for c in paths[gi] if c != cells_cur[gi]])
                for gi in range(n)
            ]
        T = max(len(pth) for pth in norm)
        for pth in norm:
            pth.extend([pth[-1]] * (T - len(pth)))

        visits = {}
        for gi in range(n):
            t = 0
            while t < T:
                t_out = t
                while t_out + 1 < T and norm[gi][t_out + 1] == norm[gi][t]:
                    t_out += 1
                visits.setdefault(norm[gi][t], []).append((t, t_out, gi))
                t = t_out + 1
        for v in visits:
            visits[v].sort()
        return {"paths": norm, "ptr": [0] * n, "visits": visits}

    # ==================================================================
    def _rebuild_coarse_from_known(self):
        """Rebuild the coarse MAPF grid from the union of the fleet's
        discovered occupancy."""
        p = self.param
        mm = self.map_manager
        occ = mm.union_occ()
        idx = np.argwhere(occ)
        res = p.world_resolution
        centers = (idx + self.world.origin_idx + 0.5) * res

        if len(centers) == 0:
            fn = None
        else:
            def fn(points):
                # L∞ distance to the Euclidean-nearest occupied cell's
                # box (same approximation as the global-map path)
                out = np.empty(len(points))
                for i0 in range(0, len(points), 512):
                    pb = points[i0 : i0 + 512]
                    d = np.linalg.norm(pb[:, None] - centers[None], axis=-1)
                    c = centers[np.argmin(d, axis=1)]
                    cp = np.clip(pb, c - 0.5 * res, c + 0.5 * res)
                    out[i0 : i0 + 512] = np.max(np.abs(cp - pb), axis=-1)
                return out

        self.coarse = build_coarse_grid(
            self.mission.world_min, self.mission.world_max,
            p.grid_resolution, p.world_dimension, p.world_z_2d,
            distance_fn=fn,
            agent_radius=float(self.s["radius"][0]) + p.grid_margin,
        )
        self.coarse_nomargin = (
            build_coarse_grid(
                self.mission.world_min, self.mission.world_max,
                p.grid_resolution, p.world_dimension, p.world_z_2d,
                distance_fn=fn,
                agent_radius=float(self.s["radius"][0]),
            )
            if p.grid_margin > 0 else self.coarse
        )
        self._coarse_version = mm.version()
        self._margined_fails = 0
        self._layer = self._resolve_layer()  # discovered walls can flip it

    # ==================================================================
    def _log(self, event: str, detail) -> None:
        if len(self.events) < 100000:
            self.events.append((self.planner_seq, event, detail))

    # ==================================================================
    def plan(self) -> bool:
        timer = Timer()
        # peer map merging within communication range, once per step
        # (multi_sync_simulator.cpp:335-337 in broadcastMsgs)
        if self.local_maps:
            self.map_manager.merge(self.pos, self.param.communication_range)
        inp = self._build_step_inputs()
        out = self.planner.step(self.fleet, inp)
        self._apply_step_outputs(out)  # blocks on the batched fetch
        elapsed = timer.stop()
        if self.planner_seq == 1:
            # the first call pays the one-off XLA compile; re-run the
            # (pure) jitted step for a steady-state timing sample so the
            # summary's min/max planning times aren't polluted by the
            # compile (reference stats are per-step wall times,
            # multi_sync_simulator.cpp:579-583)
            t2 = Timer()
            out2 = self.planner.step(self.fleet, inp)
            self._apply_step_outputs(out2)  # idempotent (same inputs)
            elapsed = t2.stop()
        # per-agent statistics parity: the batched solve serves all agents
        # at once; record the whole-step wall time as the per-step planning
        # time (the reference records per-agent times and averages).
        self.planning_time.total_planning_time.update(elapsed)

        # periodic per-stage sampling by compiled-prefix differences
        # (the fused jit has no internal timers)
        if self.param.profile_stages and (
            self.planner_seq == 2 or self.planner_seq % 25 == 0
        ):
            st = self.planner.measure_stage_times(self.fleet, inp, repeats=1)
            pt = self.planning_time
            pt.obstacle_prediction_time.update(st["obstacle_prediction"])
            pt.initial_traj_planning_time.update(st["initial_traj"])
            pt.lsc_generation_time.update(st["lsc"])
            pt.sfc_generation_time.update(st["sfc"])
            pt.goal_planning_time.update(st["goal"])
            pt.traj_optimization_time.update(st["traj_opt"])
        return True

    # ==================================================================
    def _build_step_inputs(self) -> StepInputs:
        p = self.param
        self.planner_seq += 1

        # planning-state transition (agent_manager.cpp:225-240)
        if self.planner_state == PlannerState.GOTO:
            self.desired_goal = self.mission.stacked()["goal"].copy()
            if p.world_dimension == 2:
                self.desired_goal[:, 2] = p.world_z_2d
        elif self.planner_state == PlannerState.PATROL:
            reached = (
                np.linalg.norm(self.pos - self.desired_goal, axis=-1)
                < p.goal_threshold
            )
            for i in np.nonzero(reached)[0]:
                self.desired_goal[i], self.start_point[i] = (
                    self.start_point[i].copy(),
                    self.desired_goal[i].copy(),
                )
        elif self.planner_state == PlannerState.GOBACK:
            self.desired_goal = self.start_point.copy()
        elif self.planner_state == PlannerState.LAND:
            # reference parity: LAND keeps the previous desired goal
            # (agent_manager.cpp:225-240 has no LAND branch) — the
            # descent itself happens off-planner on the vehicle. In 3-D
            # simulation we additionally bring the goal to ground level
            # under each agent so the state is observable in the sim.
            if p.world_dimension == 3:
                self.desired_goal = self.pos.copy()
                self.desired_goal[:, 2] = (
                    float(self.mission.world_min[2]) + self.s["radius"]
                )

        # dynamic obstacle states at current sim time
        OD = self.mission.on
        if OD > 0:
            # planner-side observation (optionally noisy — reference hook
            # obstacle_generator.hpp:95-108); the audit (below) always
            # evaluates the TRUE obstacle states
            obs_states = self.obstacle_generator.states_at(
                self.sim_time, noise_std=p.multisim_observer_stddev,
                rng=self._obs_rng,
            )
            dyn_pos = np.stack([o.position for o in obs_states])
            dyn_vel = np.stack([o.velocity for o in obs_states])
            dyn_r = np.array([o.radius for o in obs_states])
            dyn_dw = np.array([o.downwash for o in obs_states])
            dyn_acc = np.array([o.max_acc for o in obs_states])
            dyn_valid = np.ones(OD, bool)
        else:
            dyn_pos = np.zeros((0, 3))
            dyn_vel = np.zeros((0, 3))
            dyn_r = dyn_dw = dyn_acc = np.zeros(0)
            dyn_valid = np.zeros(0, bool)

        # priority-based goal mode: host-side goal computation
        if p.goal_mode == GoalMode.PRIOR_BASED:
            from lsc_dr_planner_tpu.planner.priority import prior_based_goal

            s = self.s
            prev_end = self.desired_ctrl[:, -1, -1]
            dist_fn = (
                (lambda q: float(self.world.distance_to_obstacle(
                    jnp.asarray(q, jnp.float32))[0]))
                if p.world_use_octomap and self.world.n_boxes
                else None
            )
            new_goals = self.current_goal.copy()
            for i in range(self.A):
                nbrs = [
                    j for j in range(self.A)
                    if j != i and (
                        p.communication_range <= 0
                        or np.max(np.abs(self.pos[j] - self.pos[i]))
                        < p.communication_range
                    )
                ]
                new_goals[i] = prior_based_goal(
                    i, self.pos, self.vel, self.desired_goal, prev_end,
                    s["radius"], s["downwash"], nbrs, self.coarse,
                    dist_fn, p,
                )
            self.current_goal = new_goals

        # disturbance: observed state must match own prediction start
        pred_start = self.prev_ctrl[:, 0, 0]
        disturbed = self.has_prev & (
            np.linalg.norm(pred_start - self.pos, axis=-1) > p.reset_threshold
        )

        # numpy leaves: one host->device transfer at the jit boundary,
        # and the Monte-Carlo layer can stack S scenarios host-side
        # before a single device_put
        f32 = np.float32
        inp = StepInputs(
            pos=np.asarray(self.pos, f32),
            vel=np.asarray(self.vel, f32),
            acc=np.asarray(self.acc, f32),
            prev_ctrl=np.asarray(self.prev_ctrl, f32),
            has_prev=np.asarray(self.has_prev),
            is_disturbed=np.asarray(disturbed),
            desired_goal=np.asarray(self.desired_goal, f32),
            current_goal=np.asarray(self.current_goal, f32),
            next_waypoint=np.asarray(self.next_waypoint, f32),
            sfc_lo=np.asarray(self.sfc_lo),
            sfc_hi=np.asarray(self.sfc_hi),
            sfc_initialized=np.asarray(self.sfc_initialized),
            planner_seq=np.int32(self.planner_seq),
            dynobs_pos=np.asarray(dyn_pos, f32),
            dynobs_vel=np.asarray(dyn_vel, f32),
            dynobs_radius=np.asarray(dyn_r, f32),
            dynobs_downwash=np.asarray(dyn_dw, f32),
            dynobs_max_acc=np.asarray(dyn_acc, f32),
            dynobs_valid=np.asarray(dyn_valid),
            occ_known=(
                np.asarray(self.map_manager.known)
                if self.local_maps else None
            ),
            qp_y0=self.qp_y,
        )
        return inp

    # ==================================================================
    def _apply_step_outputs(self, out) -> None:
        # ONE batched device→host transfer for every leaf the host
        # consumes (per-leaf np.asarray costs a full tunnel round trip
        # EACH on the remote TPU — ~8 RTTs/step ≈ tens of ms of pure
        # latency; device_get overlaps the fetches)
        import jax as _jax

        desired, goal, lo, hi, init, conv, y = _jax.device_get(
            (out.desired_ctrl, out.current_goal, out.sfc_lo, out.sfc_hi,
             out.sfc_initialized, out.qp_converged, out.qp_y)
        )
        self.desired_ctrl = np.asarray(desired, np.float64)
        self.prev_ctrl = self.desired_ctrl.copy()
        self.current_goal = np.asarray(goal, np.float64)
        self.sfc_lo = np.asarray(lo)
        self.sfc_hi = np.asarray(hi)
        self.sfc_initialized = np.asarray(init)
        self.has_prev[:] = True
        self.qp_converged = np.asarray(conv)
        if y is not None:
            self.qp_y = np.asarray(y, np.float32)

    # ==================================================================
    def save_simulation_result(self):
        """Safety/dynamics audit + trajectory history.

        Reference: saveSimulationResult, multi_sync_simulator.cpp:448-584.
        """
        p = self.param
        s = self.s
        rec = p.multisim_save_time_step
        future = 0.0
        ctrl = self.desired_ctrl
        while future < p.multisim_time_step - 1e-6:
            pos, vel, acc = _state_at_np(ctrl, future, p.dt)
            self.traj_history.append(pos.copy())

            # agent-agent safety (ellipsoidal downwash distance)
            r = s["radius"]
            dw = s["downwash"]
            dw_pair = (dw[:, None] * r[:, None] + dw[None, :] * r[None, :]) / (
                r[:, None] + r[None, :]
            )
            diff = pos[:, None] - pos[None, :]
            dist = np.sqrt(
                diff[..., 0] ** 2
                + diff[..., 1] ** 2
                + (diff[..., 2] / dw_pair) ** 2
            )
            ratio = dist / (r[:, None] + r[None, :])
            np.fill_diagonal(ratio, np.inf)
            mr = ratio.min()
            if mr < self.safety_ratio_agent:
                self.safety_ratio_agent = mr
            if mr < 1:
                self.is_collided = True

            # agent-obstacle safety
            if self.mission.on > 0:
                obs_states = self.obstacle_generator.states_at(
                    self.sim_time + future
                )
                for o in obs_states:
                    dwo = (o.radius * o.downwash + r * dw) / (r + o.radius)
                    do = pos - o.position[None]
                    dd = np.sqrt(
                        do[:, 0] ** 2 + do[:, 1] ** 2 + (do[:, 2] / dwo) ** 2
                    )
                    ro = dd / (r + o.radius)
                    mo = ro.min()
                    if mo < self.safety_ratio_obs:
                        self.safety_ratio_obs = mo
                    if mo < 1:
                        self.is_collided = True

            # dynamic limit excess
            for k in range(p.world_dimension):
                vex = (vel[:, k] - s["max_vel"][:, k]) / s["max_vel"][:, k]
                aex = (acc[:, k] - s["max_acc"][:, k]) / s["max_acc"][:, k]
                self.vel_excess_ratio[k] = max(
                    self.vel_excess_ratio[k], vex.max(), 0.0
                )
                self.acc_excess_ratio[k] = max(
                    self.acc_excess_ratio[k], aex.max(), 0.0
                )

            if self.save_result:
                self._append_sim_csv(future, pos, vel, acc)
            future += rec

    # ==================================================================
    def _append_sim_csv(self, future, pos, vel, acc):
        t = self.sim_time + future
        cols = []
        for qi in range(self.A):
            cols.extend(
                [
                    str(qi),
                    f"{t:.6g}",
                    *(f"{x:.6g}" for x in pos[qi]),
                    *(f"{x:.6g}" for x in vel[qi]),
                    *(f"{x:.6g}" for x in acc[qi]),
                    f"{self.planning_time.total_planning_time.current:.6g}",
                ]
            )
        if self.mission.on > 0:
            obs_states = self.obstacle_generator.states_at(t)
            for oi, o in enumerate(obs_states):
                cols.extend(
                    [str(oi), f"{t:.6g}", *(f"{x:.6g}" for x in o.position),
                     f"{o.radius:.6g}"]
                )
        self._sim_csv_rows.append(",".join(cols))

    # ==================================================================
    def total_distance(self) -> float:
        if len(self.traj_history) < 2:
            return 0.0
        hist = np.stack(self.traj_history)  # [T, A, 3]
        return float(
            np.sum(np.linalg.norm(np.diff(hist, axis=0), axis=-1))
        )

    # ==================================================================
    def summarize(self):
        if self.save_result:
            self._write_sim_csv()
            self._write_summary_csv()

    def _write_sim_csv(self):
        path = os.path.join(
            self.log_dir,
            f"simulation_{self.mission_start_time}_{self.file_name_param}.csv",
        )
        header = []
        for qi in range(self.A):
            header.append("id,t,px,py,pz,vx,vy,vz,ax,ay,az,planning_time")
        for oi in range(self.mission.on):
            header.append("obs_id,t,px,py,pz,size")
        with open(path, "w") as f:
            f.write(",".join(header) + "\n")
            f.write("\n".join(self._sim_csv_rows) + "\n")

    def _write_summary_csv(self):
        p = self.param
        path = os.path.join(self.log_dir, f"summary_{self.file_name_param}.csv")
        fresh = not os.path.exists(path) or os.path.getsize(path) == 0
        with open(path, "a") as f:
            if fresh:
                f.write(
                    "start_time,total_flight_time,total_flight_distance,"
                    "safety_ratio_agent,safety_ratio_obs,"
                    "vel_excess_ratio,acc_excess_ratio,"
                    "mapf_time_average,mapf_time_min,mapf_time_max,"
                    "planning_time_average,planning_time_min,planning_time_max,"
                    "initial_traj_planning_time,obstacle_prediction_time,"
                    "goal_planning_time,lsc_generation_time,"
                    "sfc_generation_time,traj_optimization_time,"
                    "mission_file_name,world_file_name,"
                    "planner_mode,goal_mode,mapf_mode,"
                    "communication_range,world_dimension,M,dt\n"
                )
            pt = self.planning_time
            f.write(
                f"{self.mission_start_time},{self.total_flight_time},"
                f"{self.total_distance()},"
                f"{self.safety_ratio_agent},{self.safety_ratio_obs},"
                f"{np.linalg.norm(self.vel_excess_ratio)},"
                f"{np.linalg.norm(self.acc_excess_ratio)},"
                f"{pt.mapf_time.average},{pt.mapf_time.min if pt.mapf_time.N else 0},{pt.mapf_time.max},"
                f"{pt.total_planning_time.average},{pt.total_planning_time.min if pt.total_planning_time.N else 0},{pt.total_planning_time.max},"
                f"{pt.initial_traj_planning_time.average},"
                f"{pt.obstacle_prediction_time.average},"
                f"{pt.goal_planning_time.average},"
                f"{pt.lsc_generation_time.average},"
                f"{pt.sfc_generation_time.average},"
                f"{pt.traj_optimization_time.average},"
                f"{os.path.basename(self.mission.mission_file_name)},"
                f"{os.path.basename(self.mission.world_file_name)},"
                f"{p.planner_mode_str()},{p.goal_mode_str()},{p.mapf_mode_str()},"
                f"{p.communication_range},{p.world_dimension},{p.M},{p.dt}\n"
            )

    # ==================================================================
    def summary(self) -> dict:
        pt = self.planning_time
        return {
            "total_flight_time": self.total_flight_time,
            "total_flight_distance": self.total_distance(),
            "safety_ratio_agent": float(self.safety_ratio_agent),
            "safety_ratio_obs": float(self.safety_ratio_obs),
            "vel_excess_ratio": float(np.linalg.norm(self.vel_excess_ratio)),
            "acc_excess_ratio": float(np.linalg.norm(self.acc_excess_ratio)),
            "planning_time_avg_ms": pt.total_planning_time.average * 1e3,
            "planning_time_max_ms": pt.total_planning_time.max * 1e3,
            "planning_time_p50_ms": pt.total_planning_time.percentile(50) * 1e3,
            "planning_time_p99_ms": pt.total_planning_time.percentile(99) * 1e3,
            "mapf_time_avg_ms": pt.mapf_time.average * 1e3,
            "is_collided": self.is_collided,
            "qp_failed": self.qp_failed,
            "planner_seq": self.planner_seq,
            "mapf_backend": self.mapf_backend,
            "mapf_time_max_ms": self.planning_time.mapf_time.max * 1e3,
        }
