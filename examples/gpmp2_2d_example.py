#!/usr/bin/env python
"""Classic (non-differentiable) GPMP2 with GN and LM (mirrors
gpmp2_2d_example.py / gpmp2_2d_step_example.py)."""
import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu.planner import GPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
img, sdf, res = box_world()

start = jnp.asarray([-4.0, -4.0, 0.0, 0.0], jnp.float64)
goal = jnp.asarray([4.0, 4.0, 0.0, 0.0], jnp.float64)
planner = GPMP2Planner(gp_params, obs_params, planner_params, env_params, robot)
th_init = straight_line_traj(start[None, :2], goal[None, :2],
                             planner_params["total_time_sec"],
                             planner_params["total_time_step"])[0]
for method in ("gauss_newton", "lm"):
    th, e0, ef, trace, iters, tt = planner.plan(
        start, goal, th_init, sdf,
        {"method": method, "plan_time": 60.0, "max_iters": 40,
         "tol_err": 1e-3, "tol_delta": 1e-4, "reg": 0.1},
    )
    print(f"{method:13s}: err {e0:.4f} -> {ef:.6f} in {iters} iters ({tt:.2f}s)")
plot_plan(img, th_init, th, f"{OUT_DIR}/gpmp2_2d_example.png")
