#!/usr/bin/env python
"""Nonholonomic x-y-heading robot (mirrors diff_gpmp2_nonholonomic_example.py):
unicycle constraint factor on the 6-D state."""
import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import PointRobotXYH
from dgpmp2_tpu.utils.trajectory import straight_line_traj
from dgpmp2_tpu.core.factors import nonholonomic_residual

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = \
    load_configs("gpmp2_xyh_params.yaml")
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = PointRobotXYH(sphere_radii=(0.4,))
img, sdf, res = box_world()

start = jnp.asarray([[-4.0, -4.0, 0.785, 0.0, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[4.0, 4.0, 0.785, 0.0, 0.0, 0.0]], jnp.float32)
planner = DiffGPMP2Planner(gp_params, obs_params, planner_params, optim_params,
                           env_params, robot)
th_init = straight_line_traj(start[:, :3], goal[:, :3],
                             planner_params["total_time_sec"],
                             planner_params["total_time_step"])
result = planner.plan(th_init, start, goal, sdf[None])
viol, _ = nonholonomic_residual(result.th)
print(f"err {float(result.err_init[0]):.3f} -> {float(result.err_final[0]):.5f} "
      f"in {int(result.iters[0])} iters")
print(f"max |nonholonomic residual|: {float(jnp.max(jnp.abs(viol))):.5f}")
plot_plan(img, th_init[0], result.th[0], f"{OUT_DIR}/diff_gpmp2_nonholonomic_example.png")
