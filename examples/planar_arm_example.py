#!/usr/bin/env python
"""2-link planar arm planning (beyond the reference's point robots): joint
-space GP prior, workspace collision spheres along both links, analytic FK
Jacobians chained through the obstacle factor."""
import numpy as np
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import OUT_DIR

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PlanarArm2Link
from dgpmp2_tpu.utils.trajectory import straight_line_traj

arm = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                     sphere_radii=(0.25,) * 6)
spec = graph.GraphSpec(total_time_step=40, nlinks=arm.nlinks)

img = np.ones((96, 96))
img[20:38, 58:76] = 0.0  # obstacle in the upper-right workspace
res = 10.0 / 96
sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float32), res=res)

start = jnp.asarray([[-0.6, 0.5, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[1.7, 0.5, 0.0, 0.0]], jnp.float32)
params = graph.default_params(spec, arm, start, goal, qc_inv=np.eye(2),
                              cost_sigma=0.05, epsilon_dist=0.2,
                              k_s=0.01, k_g=0.01, dtype=jnp.float32)
th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 40)
r = gn.plan(spec, arm, params, th0, sdf[None], gn.OptimConfig(reg=0.1, max_iters=60))
print(f"arm plan: err {float(r.err_init[0]):.3f} -> {float(r.err_final[0]):.5f} "
      f"in {int(r.iters[0])} iters")

fig, ax = plt.subplots(figsize=(6, 6))
ax.imshow(img, cmap="gray", extent=(-5, 5, -5, 5), origin="upper")
l1, l2 = arm.link_lengths
for k in range(0, 41, 5):
    q1, q2 = np.asarray(r.th[0, k, :2])
    ex, ey = l1 * np.cos(q1), l1 * np.sin(q1)
    tx, ty = ex + l2 * np.cos(q1 + q2), ey + l2 * np.sin(q1 + q2)
    ax.plot([0, ex, tx], [0, ey, ty], "-o", alpha=0.3 + 0.7 * k / 40,
            color="tab:blue", markersize=3)
centers, _ = arm.fk(r.th)
tips = np.asarray(centers[0, :, -1])
ax.plot(tips[:, 0], tips[:, 1], "r-", lw=1, label="tip path")
ax.legend()
fig.savefig(f"{OUT_DIR}/planar_arm_example.png", bbox_inches="tight", dpi=110)
print(f"wrote {OUT_DIR}/planar_arm_example.png")
