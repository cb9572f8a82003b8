#!/usr/bin/env python
"""Differentiable single-problem plan + backprop through the whole plan.

Mirrors the reference's ``examples/diff_gpmp2_2d_example.py``: load the YAML
configs, plan with the differentiable planner, then pull a gradient back
through the entire unrolled optimization (the reference's
``th_final.backward(...)``).
"""
import time

import jax
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

planner = DiffGPMP2Planner(
    gp_params, obs_params, planner_params, optim_params, env_params, robot
)

start = jnp.asarray([[-4.0, -4.0, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[4.0, 4.0, 0.0, 0.0]], jnp.float32)
th_init = straight_line_traj(
    start[:, :2], goal[:, :2],
    planner_params["total_time_sec"], planner_params["total_time_step"],
)
sdfb = sdf[None]

t0 = time.time()
result = planner.plan(th_init, start, goal, sdfb)
result.th.block_until_ready()
print(f"Initial cost = {float(result.err_init[0]):.4f}")
print(f"Final cost   = {float(result.err_final[0]):.6f}")
print(f"Iterations   = {int(result.iters[0])}")
print(f"Plan time    = {time.time() - t0:.2f}s (includes compile)")

# Backprop a random cotangent through the full unrolled plan.
print("Differentiating through the whole plan ...")
cot = jax.random.normal(jax.random.PRNGKey(0), result.th.shape)


def scalar_plan(th_init):
    return jnp.sum(planner.plan(th_init, start, goal, sdfb).th * cot)


t0 = time.time()
g = jax.grad(scalar_plan)(th_init)
g.block_until_ready()
print(f"Backprop time = {time.time() - t0:.2f}s, |grad| = {float(jnp.linalg.norm(g)):.4f}")

plot_plan(img, th_init[0], result.th[0], f"{OUT_DIR}/diff_gpmp2_2d_example.png")
