#!/usr/bin/env python
"""Batched planning via manual `step` calls with per-problem convergence
freezing (mirrors ``examples/diff_gpmp2_2d_batch_step_example.py:80-103``):
converged problems are frozen with ``jnp.where`` while the rest keep
optimizing — the host-loop analog of what ``gn.plan`` compiles into one
``lax.scan``."""
import numpy as np
import jax
import jax.numpy as jnp

from _common import OUT_DIR, box_world, load_configs, plot_plan

from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env, pp, gp, obs, opt, robot_data = load_configs()
pp = dict(pp, total_time_step=40)
robot = make_robot(robot_data)
planner = DiffGPMP2Planner(
    gp, obs, pp, opt, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]},
    robot, dtype=jnp.float32,
)

B = 8
rng = np.random.default_rng(3)
img, sdf, _ = box_world()
sdf_b = jnp.broadcast_to(sdf, (B, *sdf.shape)).astype(jnp.float32)
start = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
    jnp.asarray(rng.uniform(-4.5, -3.5, (B, 2)), jnp.float32))
goal = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
    jnp.asarray(rng.uniform(3.5, 4.5, (B, 2)), jnp.float32))
th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 40)
th0 = th

step = jax.jit(planner.step)
tol_delta = 1e-2
conv = jnp.zeros((B,), bool)
for it in range(60):
    dth, err, err_ext, _ = step(th, start, goal, sdf_b)
    # Freeze converged problems: their update is zeroed, the rest proceed.
    dth = jnp.where(conv[:, None, None], 0.0, dth)
    th = th + dth
    conv = conv | (jnp.linalg.norm(dth.reshape(B, -1), axis=-1) < tol_delta)
    if it % 10 == 0 or bool(conv.all()):
        print(f"iter {it:3d}: err mean {float(err.mean()):.4f}  "
              f"converged {int(conv.sum())}/{B}")
    if bool(conv.all()):
        break

print("final per-problem error:", np.round(np.asarray(err), 4))
plot_plan(img, th0[0], th[0], f"{OUT_DIR}/diff_gpmp2_2d_batch_step_example.png")
