import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
import lsc_dr_planner_tpu as lp
from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

m = lp.Mission.load("/root/reference/missions/forest10/forest10_1.json",
                    world_file="/root/reference/world/forest/forest1.csv",
                    world_dimension=2, world_z_2d=0.6)
p = lp.Param(multisim_max_planner_iteration=400)
sim = MultiSyncSimulator(p, m, log_dir="/tmp/simlog5")
orig_yield = sim._yield_escape
def traced_yield(ids):
    print(f"  [t={sim.sim_time:.1f}] YIELD among {list(ids)}", flush=True)
    orig_yield(ids)
    if sim._yield_hold == 10:
        i = sim._yield_agent
        print(f"    -> agent {i} escapes to {np.round(sim.next_waypoint[i][:2],2)} from pos {np.round(sim.pos[i][:2],2)}", flush=True)
sim._yield_escape = traced_yield
for it in range(400):
    if sim.is_finished():
        print("FINISHED t=", sim.sim_time); break
    if it > 0: sim.do_step()
    sim.decentralized_mapp()
    sim.plan()
    if it % 50 == 49:
        d = np.linalg.norm(sim.pos - sim.desired_goal, axis=-1)
        stuck = [i for i in range(10) if d[i] > 0.2]
        print(f"it {it}: stuck {stuck}", flush=True)
        for i in stuck[:6]:
            print(f"   a{i}: pos {np.round(sim.pos[i][:2],2)} cg {np.round(sim.current_goal[i][:2],2)} wp {np.round(sim.next_waypoint[i][:2],2)} noprog {sim._no_progress[i]}")
