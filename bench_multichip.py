#!/usr/bin/env python
"""Multi-chip correctness artifact: sharded vs unsharded plan at scale.

Runs the production-size batch (B=1024, T=100, 128² SDFs) through the plan
loop twice on a virtual 8-device mesh host platform — once replicated on
device 0, once with the batch sharded over the ``data`` mesh axis (GSPMD
inserts the collectives) — and reports the max-abs trajectory difference.
This is ``tests/test_parallel.py``'s sharded-equality check at production
scale, emitted as a JSON artifact the driver can record alongside BENCH.

Prints ONE JSON line:
  {"metric": "multichip_sharded_max_abs_diff", "value": <diff>,
   "unit": "abs", "n_devices": 8, "b": 1024, "iters": <n>, "ok": <bool>}

Runs on the virtual CPU mesh (no TPU pod needed); the sharding annotations
and collectives are identical to what a real v5e-8 executes.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

N_DEVICES = 8
B = 1024
T = 100
IMSIZE = 128
ITERS = 8
TOL = 1e-4  # f32; GSPMD may reassociate reductions across shards


def main():
    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.ops import sdf as sdf_ops
    from dgpmp2_tpu.parallel import sharding
    from dgpmp2_tpu.robots import PointRobot2D
    from dgpmp2_tpu.utils.trajectory import straight_line_traj

    assert len(jax.devices()) >= N_DEVICES, (
        f"need {N_DEVICES} virtual devices, got {len(jax.devices())}"
    )

    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=T)
    robot = PointRobot2D()
    imgs = np.ones((B, IMSIZE, IMSIZE), np.float32)
    for i in range(B):
        r, c = rng.integers(20, 90, 2)
        imgs[i, r : r + 20, c : c + 20] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(
        jnp.asarray(imgs), res=10.0 / IMSIZE
    ).astype(jnp.float32)
    start = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (B, 2)), jnp.float32)
    )
    goal = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (B, 2)), jnp.float32)
    )
    params = graph.default_params(
        spec, robot, start, goal,
        qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.4,
        k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(
        start[:, :2], goal[:, :2], spec.total_time_sec, T
    ).astype(jnp.float32)

    cfg = gn.OptimConfig(reg=0.1, max_iters=ITERS, tol_delta=0.0)

    @jax.jit
    def run(p, th, s):
        return gn.plan(spec, robot, p, th, s, cfg).th

    th_ref = np.asarray(run(params, th0, sdf))

    mesh = sharding.make_mesh(jax.devices()[:N_DEVICES])
    bs = sharding.batch_sharding(mesh)
    params_sh = jax.tree.map(lambda x: jax.device_put(x, bs), params)
    th_sh = run(params_sh, jax.device_put(th0, bs), jax.device_put(sdf, bs))
    # The output really is distributed over the data axis.
    assert len(th_sh.sharding.device_set) == N_DEVICES, th_sh.sharding
    diff = float(np.max(np.abs(np.asarray(th_sh) - th_ref)))
    ok = bool(np.isfinite(diff) and diff < TOL and np.isfinite(th_ref).all())

    print(json.dumps({
        "metric": "multichip_sharded_max_abs_diff",
        "value": diff,
        "unit": "abs",
        "n_devices": N_DEVICES,
        "b": B,
        "iters": ITERS,
        "ok": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
