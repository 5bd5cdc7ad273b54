"""Monte-Carlo scenario-batched simulation tests."""

import numpy as np

from lsc_dr_planner_tpu.config import Param
from lsc_dr_planner_tpu.mission import generate_random_mission
from lsc_dr_planner_tpu.sim.montecarlo import MonteCarloSimulator


def test_montecarlo_lockstep(tmp_path):
    m = generate_random_mission(3, [-3, -3, 0], [3, 3, 2.5], seed=4,
                                min_separation=1.5)
    p = Param(world_use_octomap=False, multisim_max_planner_iteration=80,
              qp_max_iter=120)
    mc = MonteCarloSimulator(p, m, n_scenarios=3, max_noise=0.5,
                             log_dir=str(tmp_path))
    results = mc.run()
    assert len(results) == 3
    for r in results:
        assert not r["is_collided"]
        assert r["safety_ratio_agent"] >= 1.0
    # scenario 0 is noise-free; perturbed scenarios differ
    g0 = mc.sims[0].desired_goal
    g1 = mc.sims[1].desired_goal
    assert np.linalg.norm(g0 - g1) > 1e-6
