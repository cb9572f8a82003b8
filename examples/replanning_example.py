#!/usr/bin/env python
"""Warm-start replanning: reuse the previous solution when the world moves.

A serving pattern the reference cannot express cheaply: its planner loops
problems serially and always starts from scratch.  Here the whole batch
replans as one compiled program, and warm-starting from the previous
solution (instead of the straight-line seed) lets the per-problem
convergence freeze (``gn.plan``/``GPMP2Planner.plan_batch``) stop most
problems within a few iterations — the obstacle only moved a little, so
the old trajectory is already near the new optimum.

Scenario: B problems plan around a box obstacle; the box then shifts by a
few pixels (sensor update); replan (a) cold from the straight line and
(b) warm from the previous solution.  For small world updates the warm
seed converges in ~30% fewer iterations at equal quality (measured:
shift 2 px -> 59 vs 44 iters, 4 px -> 68 vs 48).  For LARGE updates the
old basin can hurt (8 px: warm is slower and worse) — then the right
tool is a cold seed or ``plan_multistart``; warm-start is a
small-update optimization, not a universal win.
"""
import numpy as np

from _common import OUT_DIR, load_configs, plt

import jax.numpy as jnp

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import GPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = (
    load_configs()
)
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
robot = make_robot(robot_data)
T = 40
planner_params = dict(planner_params, total_time_step=T)
planner = GPMP2Planner(gp_params, obs_params, planner_params, env_params,
                       robot)


def box_sdf(shift_px=0, imsize=128):
    img = np.ones((imsize, imsize))
    lo, hi = int(0.40 * imsize), int(0.58 * imsize)
    img[lo:hi, lo + shift_px:hi + shift_px] = 0.0
    return img, sdf_ops.sdf_from_occupancy(
        jnp.asarray(img, jnp.float64), res=10.0 / imsize
    )


B = 16
rng = np.random.default_rng(0)
start = np.zeros((B, 4))
start[:, :2] = rng.uniform(-4.5, -3.5, (B, 2))
goal = np.zeros((B, 4))
goal[:, :2] = rng.uniform(3.5, 4.5, (B, 2))
th0 = straight_line_traj(jnp.asarray(start[:, :2]), jnp.asarray(goal[:, :2]),
                         planner_params["total_time_sec"], T)

op = {"method": "gauss_newton", "max_iters": 100, "reg": 0.1,
      "tol_delta": 1e-4, "tol_err": 1e-3}

img0, sdf0 = box_sdf(0)
sdf0b = jnp.broadcast_to(sdf0, (B, *sdf0.shape))
th_prev, _, err0, _, iters0, _ = planner.plan_batch(start, goal, th0, sdf0b,
                                                    op)
print(f"initial plan: mean iters {float(np.mean(np.asarray(iters0))):.1f}, "
      f"mean err {float(np.mean(np.asarray(err0))):.4f}")

# The obstacle moves ~0.3 m (4 px of 128 over a 10 m world).
img1, sdf1 = box_sdf(4)
sdf1b = jnp.broadcast_to(sdf1, (B, *sdf1.shape))

th_cold, _, err_c, _, iters_c, _ = planner.plan_batch(start, goal, th0,
                                                      sdf1b, op)
th_warm, _, err_w, _, iters_w, _ = planner.plan_batch(start, goal, th_prev,
                                                      sdf1b, op)
ic, iw = (float(np.mean(np.asarray(x))) for x in (iters_c, iters_w))
ec, ew = (float(np.mean(np.asarray(x))) for x in (err_c, err_w))
print(f"replan cold:  mean iters {ic:.1f}, mean err {ec:.4f}")
print(f"replan warm:  mean iters {iw:.1f}, mean err {ew:.4f} "
      f"({ic / max(iw, 1e-9):.1f}x fewer iterations)")
assert iw < ic, "warm start should converge in fewer iterations"
assert ew < 1.5 * ec + 1e-6, "warm quality should match cold"

i = 0
fig, ax = plt.subplots(1, 2, figsize=(11, 5.5), sharey=True)
for a, img, title, tr in ((ax[0], img0, "t=0 (initial plan)", th_prev),
                          (ax[1], img1, "t=1 (obstacle moved)", th_warm)):
    a.imshow(img, cmap="gray", extent=(-5, 5, -5, 5), origin="upper")
    t = np.asarray(tr[i])
    a.plot(t[:, 0], t[:, 1], "b.-", ms=3, label="plan")
    a.plot(*start[i, :2], "go", label="start")
    a.plot(*goal[i, :2], "r*", ms=12, label="goal")
    a.set_title(title)
prev = np.asarray(th_prev[i])
ax[1].plot(prev[:, 0], prev[:, 1], "c--", lw=1,
           label="warm seed (old plan)")
ax[1].legend(loc="lower right", fontsize=8)
path = f"{OUT_DIR}/replanning_example.png"
fig.savefig(path, bbox_inches="tight", dpi=110)
plt.close(fig)
print(f"wrote {path}")
