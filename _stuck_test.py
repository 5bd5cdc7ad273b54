import os, sys
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
import lsc_dr_planner_tpu as lp
from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

for idx in (2, 6, 8, 12, 14):
    m = lp.Mission.load(f"/root/reference/missions/forest10/forest10_{idx}.json",
                        world_file=f"/root/reference/world/forest/forest{idx}.csv",
                        world_dimension=2, world_z_2d=0.6)
    p = lp.Param(multisim_max_planner_iteration=400)
    sim = MultiSyncSimulator(p, m, log_dir="/tmp/simlog8")
    res = sim.run()
    print(f"forest10_{idx}: t={res['total_flight_time']:.1f} safety={res['safety_ratio_agent']:.3f} "
          f"collided={res['is_collided']} acc_ex={res['acc_excess_ratio']:.3f}", flush=True)
