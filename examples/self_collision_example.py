#!/usr/bin/env python
"""Self-collision factor on a 3-link arm (beyond the reference, which
ships only point robots): a commanded goal that folds the arm through its
own body.  Without the factor the planner drives into the fold; with it
the arm stops at the safety margin instead."""
import numpy as np
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import OUT_DIR

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.robots import PlanarArmNLink, self_collision_pairs
from dgpmp2_tpu.utils.trajectory import straight_line_traj

arm = PlanarArmNLink(link_lengths=(1.8, 1.4, 1.2), spheres_per_link=2,
                     sphere_radii=(0.25,))
pairs = self_collision_pairs(arm, eps_self=0.1)
d = arm.state_dim
base = dict(total_time_step=20, dof=arm.dofs, state_dim=d,
            nlinks=arm.nlinks)
spec_on = graph.GraphSpec(use_self_collision=True, self_pairs=pairs, **base)
spec_off = graph.GraphSpec(**base)

sdf = jnp.full((1, 64, 64), 10.0, jnp.float32)  # obstacle-free world
start = jnp.zeros((1, d), jnp.float32)
goal = jnp.zeros((1, d), jnp.float32).at[0, 1].set(2.7)  # fold link2 back
kw = dict(qc_inv=np.eye(arm.dofs), cost_sigma=0.5, epsilon_dist=0.2,
          k_s=0.001, k_g=0.05, dtype=jnp.float32)
p_on = graph.default_params(spec_on, arm, start, goal, k_self=0.01,
                            eps_self=0.05, **kw)
p_off = graph.default_params(spec_off, arm, start, goal, **kw)
th0 = straight_line_traj(start[:, :arm.dofs], goal[:, :arm.dofs], 10.0, 20)
cfg = gn.OptimConfig(reg=0.1, max_iters=60)
r_on = gn.plan(spec_on, arm, p_on, th0, sdf, cfg)
r_off = gn.plan(spec_off, arm, p_off, th0, sdf, cfg)

pi = np.asarray(pairs)


def worst_pen(th):
    c, _ = arm.fk(th)
    dist = jnp.sqrt(jnp.sum((c[..., pi[:, 0], :] - c[..., pi[:, 1], :]) ** 2,
                            -1))
    return float(jnp.max(0.5 - dist))


print(f"commanded goal fold: factor OFF worst pair penetration "
      f"{worst_pen(r_off.th):+.3f} m (tangled), factor ON "
      f"{worst_pen(r_on.th):+.3f} m (clear, stops short of the command)")

fig, axes = plt.subplots(1, 2, figsize=(11, 5.5), sharex=True, sharey=True)
for ax, r, title in ((axes[0], r_off, "no self-collision factor"),
                     (axes[1], r_on, "with self-collision factor")):
    c, _ = arm.fk(r.th)
    for k in range(0, 21, 4):
        q = np.asarray(r.th[0, k, :arm.dofs])
        ang = np.cumsum(q)
        xs, ys = [0.0], [0.0]
        for a, lk in zip(ang, arm.link_lengths):
            xs.append(xs[-1] + lk * np.cos(a))
            ys.append(ys[-1] + lk * np.sin(a))
        ax.plot(xs, ys, "-o", alpha=0.25 + 0.75 * k / 20, color="tab:blue",
                markersize=3)
    final = np.asarray(c[0, -1])
    for (x, y), rad in zip(final, arm.sphere_radii):
        ax.add_patch(plt.Circle((x, y), rad, fill=False, color="tab:red",
                                lw=0.8))
    ax.set_title(f"{title}\nworst pair penetration {worst_pen(r.th):+.3f} m")
    ax.set_aspect("equal")
    ax.set_xlim(-1, 4)
    ax.set_ylim(-1.5, 2.5)
fig.savefig(f"{OUT_DIR}/self_collision_example.png", bbox_inches="tight",
            dpi=110)
print(f"wrote {OUT_DIR}/self_collision_example.png")
