#!/usr/bin/env python
"""Classic GPMP2, one explicit step at a time (mirrors the reference's
``examples/gpmp2_2d_step_example.py``: a user-owned while loop over
``planner.step`` with per-iteration convergence checks and incremental
trajectory rendering)."""
import matplotlib.pyplot as plt
import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, OUT_DIR

from dgpmp2_tpu.planner import GPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = (
    load_configs()
)
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
img, sdf, res = box_world()

start = jnp.asarray([-4.0, -4.0, 0.0, 0.0], jnp.float64)
goal = jnp.asarray([4.0, 4.0, 0.0, 0.0], jnp.float64)
planner = GPMP2Planner(gp_params, obs_params, planner_params, env_params, robot)
th = straight_line_traj(start[None, :2], goal[None, :2],
                        planner_params["total_time_sec"],
                        planner_params["total_time_step"])[0]

fig, ax = plt.subplots(figsize=(6, 6))
ax.imshow(img, cmap="gray", extent=(*env_params["x_lims"],
                                    *env_params["y_lims"]), origin="upper")
th_np = np.asarray(th)
ax.plot(th_np[:, 0], th_np[:, 1], "r--", label="initial")

tol_err = float(optim_params.get("tol_err", 1e-3))
tol_delta = float(optim_params.get("tol_delta", 1e-4))
max_iters = int(optim_params.get("max_iters", 40))
err_old = None
j = 0
while True:
    print(f"Current iteration, {j}")
    dtheta, err_old = planner.step(th, start, goal, sdf,
                                   {"reg": optim_params.get("reg", 0.0)})
    th = th + dtheta
    err_new = planner.error(th, start, goal, sdf)
    err_delta = err_new - err_old
    th_np = np.asarray(th)
    ax.plot(th_np[:, 0], th_np[:, 1], "-", color="gray",
            linewidth=0.3 + 0.1 * j, alpha=min(1.0, 0.15 + 0.1 * j))
    j += 1
    dth_norm = float(jnp.linalg.norm(dtheta))
    if dth_norm < tol_delta or abs(err_delta) < tol_err or j >= max_iters:
        print("Converged" if j < max_iters else "Max iterations")
        break

print(f"final error {err_new:.6f} after {j} steps")
th_np = np.asarray(th)
ax.plot(th_np[:, 0], th_np[:, 1], "b-", linewidth=2, label="final")
ax.legend()
out = f"{OUT_DIR}/gpmp2_2d_step_example.png"
fig.savefig(out, bbox_inches="tight", dpi=110)
print(f"wrote {out}")
