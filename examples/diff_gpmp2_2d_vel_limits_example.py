#!/usr/bin/env python
"""Velocity-limited planning.  (The reference ships this example as an
empty file — examples/diff_gpmp2_2d_vel_limits_example.py is 0 bytes; this
implements the intended demo: plan with per-axis velocity hinge factors and
report the violation rate before/after.)"""
import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
planner_params["use_vel_limits"] = True
gp_params["v_x"] = 1.2
gp_params["v_y"] = 1.2
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
img, sdf, res = box_world()

start = jnp.asarray([[-4.0, -4.0, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[4.0, 4.0, 0.0, 0.0]], jnp.float32)
planner = DiffGPMP2Planner(gp_params, obs_params, planner_params, optim_params,
                           env_params, robot)
th_init = straight_line_traj(start[:, :2], goal[:, :2],
                             planner_params["total_time_sec"],
                             planner_params["total_time_step"])
result = planner.plan(th_init, start, goal, sdf[None])

def viol(th):
    v = np.abs(np.asarray(th[0, :, 2:]))
    return float(np.mean(v > 1.2 + 1e-3))

print(f"err {float(result.err_init[0]):.3f} -> {float(result.err_final[0]):.5f}")
print(f"velocity-limit violation rate: init={viol(th_init):.2%} final={viol(result.th):.2%}")
print(f"max |v| final: {float(jnp.max(jnp.abs(result.th[..., 2:]))):.3f} (limit 1.2)")
plot_plan(img, th_init[0], result.th[0], f"{OUT_DIR}/diff_gpmp2_2d_vel_limits_example.png")
