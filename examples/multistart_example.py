#!/usr/bin/env python
"""Batched multi-start planning on forest-like clutter.

On dense clutter the straight-line seed's Gauss-Newton basin frequently
ends in contact, and no covariance tuning fixes it (PERFORMANCE.md forest
deep-dive).  ``GPMP2Planner.plan_multistart`` plans K endpoint-preserving
seed perturbations of every problem as ONE (K·B)-batch and selects per
problem — the initialization search the reference's per-problem loop
(``gpmp2_planner.py:62``) cannot afford.  The plot shows a problem where
restart 0 (the straight seed) stays in contact while a perturbed restart
clears the clutter.
"""
import jax.numpy as jnp
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import OUT_DIR, load_configs

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import GPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = (
    load_configs()
)
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
planner_params = dict(planner_params, total_time_step=30)

# Forest-like scattered clutter.
imsize, rng = 128, np.random.default_rng(5)
img = np.ones((imsize, imsize))
for _ in range(40):
    cy, cx = rng.integers(14, imsize - 20, 2)
    s = rng.integers(5, 10)
    img[cy:cy + s, cx:cx + s] = 0.0
sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64),
                                 res=10.0 / imsize)

B = 8
start = jnp.zeros((B, 4), jnp.float64).at[:, :2].set(
    jnp.asarray(rng.uniform(-4.6, -3.8, (B, 2))))
goal = jnp.zeros((B, 4), jnp.float64).at[:, :2].set(
    jnp.asarray(rng.uniform(3.8, 4.6, (B, 2))))
th0 = straight_line_traj(start[:, :2], goal[:, :2],
                         planner_params["total_time_sec"], 30)
sdfb = jnp.broadcast_to(sdf, (B, *sdf.shape))

planner = GPMP2Planner(gp_params, obs_params, planner_params, env_params,
                       robot)
op = {"method": "gauss_newton", "max_iters": 40, "reg": 0.1}
out1 = planner.plan_multistart(start, goal, th0, sdfb, op, restarts=1)
outk = planner.plan_multistart(start, goal, th0, sdfb, op, restarts=16,
                               amp=1.5)
# Staged pruning: all 16 seeds explored for 8 iterations, only the best 4
# finished — ~2x cheaper with the same coverage (PERFORMANCE.md).
outs = planner.plan_multistart(start, goal, th0, sdfb, op, restarts=16,
                               amp=1.5, prune_iters=8, keep=4)
print("contact-free (restart 0 only):", np.asarray(out1.contact_free))
print("contact-free (16 restarts)   :", np.asarray(outk.contact_free))
print("contact-free (staged, keep 4):", np.asarray(outs.contact_free))
print("winning restart per problem  :", np.asarray(outk.k_best))

# Plot the first problem the single seed fails but multi-start solves.
gain = np.asarray(~out1.contact_free & outk.contact_free)
i = int(np.argmax(gain)) if gain.any() else 0
fig, ax = plt.subplots(figsize=(6, 6))
ax.imshow(img, cmap="gray", extent=(-5, 5, -5, 5), origin="upper")
t0, t1, tk = (np.asarray(x) for x in (th0[i], out1.th[i], outk.th[i]))
ax.plot(t0[:, 0], t0[:, 1], "r--", label="straight seed")
ax.plot(t1[:, 0], t1[:, 1], "m-", label="restart 0 (in contact)")
ax.plot(tk[:, 0], tk[:, 1], "b-",
        label=f"best of 16 (restart {int(outk.k_best[i])})")
ax.legend()
path = f"{OUT_DIR}/multistart_example.png"
fig.savefig(path, bbox_inches="tight", dpi=110)
plt.close(fig)
print(f"wrote {path}")
