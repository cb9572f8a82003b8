#!/usr/bin/env python
"""Batched differentiable planning (mirrors diff_gpmp2_2d_batch_example.py
and .._batch_step_example.py: one compiled plan over a batch of problems
with per-problem convergence freezing)."""
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

B = 8
rng = np.random.default_rng(0)
start = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
    jnp.asarray(rng.uniform(-4.5, -3.0, (B, 2)), jnp.float32))
goal = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
    jnp.asarray(rng.uniform(3.0, 4.5, (B, 2)), jnp.float32))

planner = DiffGPMP2Planner(gp_params, obs_params, planner_params, optim_params,
                           env_params, robot)
th_init = straight_line_traj(start[:, :2], goal[:, :2],
                             planner_params["total_time_sec"],
                             planner_params["total_time_step"])
sdfb = jnp.broadcast_to(sdf, (B, *sdf.shape))
result = planner.plan(th_init, start, goal, sdfb)
print("err_init :", np.round(np.asarray(result.err_init), 3))
print("err_final:", np.round(np.asarray(result.err_final), 5))
print("iters    :", np.asarray(result.iters))
plot_plan(img, th_init[0], result.th[0], f"{OUT_DIR}/diff_gpmp2_2d_batch_example.png")
