"""Monte-Carlo scenario batching: S scenarios planned in one device call.

The reference runs mission files strictly sequentially
(multi_sync_simulator_node.cpp:44-75) and its only stochastic knob is
the start/goal noise (mission.cpp:410-420). TPU-native design: the
fleet pipeline is vmapped over a leading scenario axis, so S noise-
perturbed replicas of a mission (or S missions over the same world)
plan in ONE fused call per step; the host-side MAPF/waypoint layer
loops over scenarios (native C++ PIBT keeps it cheap).

This is the scaling surface for the pod-scale Monte-Carlo benchmark
config (BASELINE.json: "1024 agents + 256 randomized scenarios").
"""

from __future__ import annotations

import copy
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsc_dr_planner_tpu.config import Param
from lsc_dr_planner_tpu.mission import Mission
from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator
from lsc_dr_planner_tpu.planner.pipeline import StepInputs


class MonteCarloSimulator:
    """Runs S scenario replicas in lockstep with a scenario-vmapped
    planning step. All scenarios share one world/mission shape; goals
    are perturbed per scenario (`max_noise`, seeded)."""

    def __init__(self, param: Param, mission: Mission, n_scenarios: int,
                 max_noise: float = 0.25, log_dir: str = "log", seed: int = 0,
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'scenarios' axis —
        the stacked scenario batch is sharded across its devices, so S
        replicas split over the chips (the pod-scale Monte-Carlo axis,
        BASELINE '1024 agents × 256 scenarios')."""
        self.S = n_scenarios
        self.mesh = mesh
        self.sims: List[MultiSyncSimulator] = []
        for s in range(n_scenarios):
            m = copy.deepcopy(mission)
            if max_noise > 0 and s > 0:
                m.add_noise(max_noise, param.world_dimension, seed=seed + s)
            sim = MultiSyncSimulator(param, m, log_dir=log_dir, seed=seed + s,
                                     save_result=False)
            self.sims.append(sim)
        base = self.sims[0]
        self.planner = base.planner
        self._vstep = jax.jit(
            jax.vmap(self.planner._step_impl, in_axes=(None, 0))
        )
        self.fleet = base.fleet

    # ------------------------------------------------------------------
    def step(self, iteration: int) -> None:
        for sim in self.sims:
            if not sim.is_finished() and iteration > 0:
                sim.do_step()
            sim.decentralized_mapp()

        # build per-scenario StepInputs via each sim's own assembly path,
        # intercepting the device call
        inputs = []
        for sim in self.sims:
            inputs.append(sim._build_step_inputs())
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *inputs
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("scenarios"))

            def place(x):
                if x is None or x.ndim == 0:
                    return x
                return jax.device_put(x, shard)

            stacked = jax.tree_util.tree_map(place, stacked)
        outs = self._vstep(self.fleet, stacked)
        for s, sim in enumerate(self.sims):
            out_s = jax.tree_util.tree_map(lambda x: x[s], outs)
            sim._apply_step_outputs(out_s)
            sim.save_simulation_result()

    # ------------------------------------------------------------------
    def run(self, max_iterations: Optional[int] = None) -> List[dict]:
        max_iter = max_iterations or self.sims[0].param.multisim_max_planner_iteration
        for it in range(max_iter):
            if all(sim.is_finished() for sim in self.sims):
                break
            self.step(it)
        return [sim.summary() for sim in self.sims]
