#!/usr/bin/env python
"""Manual GN loop via planner.step (mirrors diff_gpmp2_2d_step_example.py):
host-side loop, one compiled GN iteration per step, explicit convergence."""
import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
img, sdf, res = box_world()

start = jnp.asarray([[-4.0, -4.0, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[4.0, 4.0, 0.0, 0.0]], jnp.float32)
planner = DiffGPMP2Planner(gp_params, obs_params, planner_params, optim_params,
                           env_params, robot)
th = straight_line_traj(start[:, :2], goal[:, :2],
                        planner_params["total_time_sec"],
                        planner_params["total_time_step"])
th_init = th
sdfb = sdf[None]
for j in range(optim_params["max_iters"]):
    dth, err, err_ext, _ = planner.step(th, start, goal, sdfb)
    th = th + dth
    nd = float(jnp.linalg.norm(dth))
    if j % 10 == 0:
        print(f"iter {j:3d}: err={float(err[0]):.5f} |dtheta|={nd:.6f}")
    if nd < optim_params["tol_delta"]:
        print(f"converged at iter {j}")
        break
plot_plan(img, th_init[0], th[0], f"{OUT_DIR}/diff_gpmp2_2d_step_example.png")
