#!/usr/bin/env python
"""3-D point-robot planning in a voxel world (beyond the 2-D-only
reference): build a voxel SDF with the separable on-device EDT, plan
over/around obstacles with the same GN engine as 2-D, and render z-slices
of the plan through Env3D.

Two worlds:
  1. A central box — the plan detours around it in full 3-D.
  2. A near-ceiling-high wall — the ONLY way through is over the top, a
     motion no planar planner can produce.
"""
import numpy as np
import jax
import jax.numpy as jnp

from _common import OUT_DIR, plt

from dgpmp2_tpu.core import gn, graph, multistart
from dgpmp2_tpu.envs import Env3D
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot3D

LIMS = dict(x_lims=(-5.0, 5.0), y_lims=(-5.0, 5.0), z_lims=(-5.0, 5.0))
N = 48


def plan_world(vox, start_p, goal_p, seed_bump_z=0.0, t=30, max_iters=40):
    env = Env3D(LIMS)
    env.initialize_from_voxels(vox)
    robot = PointRobot3D(sphere_radii=(0.3,))
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=t, **LIMS)
    start = jnp.asarray([start_p + [0.0, 0.0, 0.0]], jnp.float32)
    goal = jnp.asarray([goal_p + [0.0, 0.0, 0.0]], jnp.float32)
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(3), cost_sigma=0.05,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    s = jnp.linspace(0.0, 1.0, t + 1, dtype=jnp.float32)[None, :, None]
    pos = (1 - s) * start[:, None, :3] + s * goal[:, None, :3]
    pos = pos.at[..., 2].add(seed_bump_z * jnp.sin(jnp.pi * s[..., 0]))
    th0 = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1)
    cfg = gn.OptimConfig(reg=0.1, max_iters=max_iters)
    out = multistart.plan_multistart(
        spec, robot, params, th0, env.sedt[None], cfg,
        jax.random.PRNGKey(0), restarts=8, amp=1.5,
    )
    d, _ = env.get_signed_obstacle_distance(out.th[0, :, :3])
    print(f"  contact_free={bool(out.contact_free[0])}  "
          f"min clearance={float(jnp.min(d)):.3f} m  "
          f"iters={int(out.iters[0])}")
    return env, np.asarray(out.th[0]), np.asarray(th0[0])


def render(env, th, th0, zs, path):
    fig, axes = plt.subplots(1, len(zs), figsize=(5 * len(zs), 5))
    for ax, z in zip(axes, zs):
        sl = env.slice_env2d(z)
        ax.imshow(sl.image, cmap="gray",
                  extent=(*env.x_lims, *env.y_lims), origin="upper")
        ax.plot(th0[:, 0], th0[:, 1], "r--", lw=1, label="seed (xy)")
        ax.plot(th[:, 0], th[:, 1], "b-", lw=2, label="plan (xy)")
        near = np.abs(th[:, 2] - z) < 0.75
        ax.plot(th[near, 0], th[near, 1], "co", ms=5,
                label=f"states near z={z:g}")
        ax.set_title(f"z = {z:g} m slice")
        ax.legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print(f"  wrote {path}")


print("[1] central box, straight seed threads it:")
vox = np.ones((N, N, N), np.float32)
vox[18:30, 18:30, 18:30] = 0.0
env, th, th0 = plan_world(vox, [-4.0, -4.0, -4.0], [4.0, 4.0, 4.0])
render(env, th, th0, zs=(-2.0, 0.0), path=f"{OUT_DIR}/plan3d_box.png")

print("[2] full-width wall open only above z=+2.3 — must climb over:")
vox = np.ones((N, N, N), np.float32)
vox[0:35, 18:29, :] = 0.0  # z voxels 0..34 blocked; open above ~+2.3
env, th, th0 = plan_world(vox, [0.0, -4.0, 0.0], [0.0, 4.0, 0.0],
                          seed_bump_z=1.5)
print(f"  peak altitude {float(th[:, 2].max()):.2f} m "
      f"(wall top ≈ +2.3 m)")
render(env, th, th0, zs=(0.0, 3.0), path=f"{OUT_DIR}/plan3d_wall.png")
