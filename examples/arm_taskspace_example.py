#!/usr/bin/env python
"""Task-space arm planning with the full constraint stack — four factor
types the reference cannot express, in ONE Gauss-Newton problem:

  * workspace end-effector goal (no IK given, only a target point)
  * obstacle avoidance through the FK sphere model
  * joint position limits
  * body self-collision hinges

The planner resolves all of them jointly in the same block-tridiagonal
solve."""
import numpy as np
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import OUT_DIR

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PlanarArmNLink, self_collision_pairs
from dgpmp2_tpu.utils.trajectory import straight_line_traj

arm = PlanarArmNLink(link_lengths=(1.8, 1.4, 1.2), spheres_per_link=2,
                     sphere_radii=(0.25,))
pairs = self_collision_pairs(arm, eps_self=0.05)
d = arm.state_dim
spec = graph.GraphSpec(
    total_time_step=30, dof=arm.dofs, state_dim=d, nlinks=arm.nlinks,
    use_workspace_goal=True, use_joint_limits=True,
    use_self_collision=True, self_pairs=pairs,
)

img = np.ones((96, 96), np.float32)
# Obstacle on the tip's sweep arc (x ∈ [3.2, 4.4], y ∈ [0.6, 1.8]): the
# naive swing to the target crosses it; avoiding it means tucking the arm.
img[31:42, 79:90] = 0.0
res = 10.0 / 96
sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img)[None], res=res)

start = jnp.zeros((1, d), jnp.float32).at[0, 0].set(-0.4)
goal = start  # joint goal unused (weak prior) — only the tip target below
target = jnp.asarray([[2.6, 2.6]], jnp.float32)  # behind the obstacle
params = graph.default_params(
    spec, arm, start, goal, qc_inv=np.eye(arm.dofs), cost_sigma=0.05,
    epsilon_dist=0.25, k_s=0.001, k_g=100.0,  # joint-space goal ~off
    k_wg=0.01, workspace_goal=target,
    k_jl=0.01, q_min=(-2.4,) * arm.dofs, q_max=(2.4,) * arm.dofs,
    k_self=0.02, eps_self=0.05, dtype=jnp.float32,
)
th0 = straight_line_traj(start[:, :arm.dofs], goal[:, :arm.dofs], 10.0, 30)
r = gn.plan(spec, arm, params, th0, sdf, gn.OptimConfig(reg=0.1, max_iters=80))

centers, _ = arm.fk(r.th)
tip = np.asarray(centers[0, -1, -1])
tip_err = float(np.linalg.norm(tip - np.asarray(target[0])))
d_obs, _ = sdf_ops.lookup(sdf, centers[0].reshape(1, -1, 2), res,
                          (-5, 5), (-5, 5))
pi = np.asarray(pairs)
dist_self = jnp.sqrt(jnp.sum(
    (centers[..., pi[:, 0], :] - centers[..., pi[:, 1], :]) ** 2, -1))
qmax_hit = float(jnp.max(jnp.abs(r.th[0, :, :arm.dofs])))
print(f"tip -> target error {tip_err:.3f} m; min obstacle clearance "
      f"{float(jnp.min(d_obs)) - 0.25:+.3f} m; min self pair gap "
      f"{float(jnp.min(dist_self)) - 0.5:+.3f} m; max |q| {qmax_hit:.2f} "
      f"(limit 2.4)")
assert tip_err < 0.1 and float(jnp.min(d_obs)) > 0.25

fig, ax = plt.subplots(figsize=(6.5, 6.5))
ax.imshow(img, cmap="gray", extent=(-5, 5, -5, 5), origin="upper")
for k in range(0, 31, 3):
    q = np.asarray(r.th[0, k, :arm.dofs])
    ang = np.cumsum(q)
    xs, ys = [0.0], [0.0]
    for a, lk in zip(ang, arm.link_lengths):
        xs.append(xs[-1] + lk * np.cos(a))
        ys.append(ys[-1] + lk * np.sin(a))
    ax.plot(xs, ys, "-o", alpha=0.2 + 0.8 * k / 30, color="tab:blue",
            markersize=3)
ax.plot(*np.asarray(target[0]), "r*", markersize=16, label="workspace target")
tips = np.asarray(centers[0, :, -1])
ax.plot(tips[:, 0], tips[:, 1], "r-", lw=1, label="tip path")
ax.legend()
ax.set_title(f"task-space goal + obstacles + joint limits + self-collision\n"
             f"tip error {tip_err:.3f} m, no IK supplied")
fig.savefig(f"{OUT_DIR}/arm_taskspace_example.png", bbox_inches="tight",
            dpi=110)
print(f"wrote {OUT_DIR}/arm_taskspace_example.png")
