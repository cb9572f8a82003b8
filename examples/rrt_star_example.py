#!/usr/bin/env python
"""RRT* seeding + GPMP2 smoothing (mirrors rrt_star_example.py): the native
C++ RRT* expert finds a feasible path, GPMP2 smooths it into a dynamically
consistent trajectory."""
import numpy as np
import jax.numpy as jnp

from _common import box_world, load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu import native
from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import path_to_traj_avg_vel

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
img, sdf, res = box_world()

if not native.available():
    print("native toolchain unavailable; skipping")
    raise SystemExit(0)

start_conf, goal_conf = (-4.0, -4.0), (4.0, 4.0)
path = native.rrt_star(np.asarray(sdf), start_conf, goal_conf,
                       env_data["x_lims"], env_data["y_lims"],
                       clearance=0.45, plan_time=3.0, seed=0)
assert path is not None, "RRT* failed"
interp = native.interpolate_path(path, planner_params["total_time_step"] + 1)
th_init = path_to_traj_avg_vel(jnp.asarray(interp, jnp.float32),
                               planner_params["total_time_sec"])[None]

start = jnp.asarray([[*start_conf, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[*goal_conf, 0.0, 0.0]], jnp.float32)
planner = DiffGPMP2Planner(gp_params, obs_params, planner_params, optim_params,
                           env_params, robot)
result = planner.plan(th_init, start, goal, sdf[None])
print(f"RRT* waypoints: {len(path)}; GPMP2 smoothing err "
      f"{float(result.err_init[0]):.3f} -> {float(result.err_final[0]):.5f}")
plot_plan(img, th_init[0], result.th[0], f"{OUT_DIR}/rrt_star_example.png")
