import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np
import lsc_dr_planner_tpu as lp
from lsc_dr_planner_tpu.sim.simulator import MultiSyncSimulator

m = lp.Mission.load("/root/reference/missions/forest10/forest10_7.json",
                    world_file="/root/reference/world/forest/forest7.csv",
                    world_dimension=2, world_z_2d=0.6)
p = lp.Param(multisim_max_planner_iteration=800)
sim = MultiSyncSimulator(p, m, log_dir="/tmp/simlog4")
yields = 0
for it in range(800):
    if sim.is_finished(): break
    if it > 0: sim.do_step()
    ya = sim._yield_agent
    sim.decentralized_mapp()
    if sim._yield_agent != ya and sim._yield_hold == 10: yields += 1
    sim.plan()
    if it % 100 == 99:
        d = np.linalg.norm(sim.pos - sim.desired_goal, axis=-1)
        stuck = [i for i in range(10) if d[i] > 0.2]
        print(f"it {it}: stuck {stuck} dmax {d.max():.2f} yields {yields}", flush=True)
d = np.linalg.norm(sim.pos - sim.desired_goal, axis=-1)
stuck = [i for i in range(10) if d[i] > 0.2]
print("final stuck:", stuck, "t:", sim.sim_time)
for i in stuck:
    print(f"  a{i}: pos {np.round(sim.pos[i][:2],2)} cg {np.round(sim.current_goal[i][:2],2)} wp {np.round(sim.next_waypoint[i][:2],2)} goal {np.round(sim.desired_goal[i][:2],1)}")
