"""Child process for the 2-process multihost mesh test (test_multihost.py).

Each process owns 4 virtual CPU devices; together they form the 3-axis
``(dcn=2, data=2, model=2)`` mesh of ``sharding.make_multihost_mesh``.
The child plans a globally-sharded batch through ``gn.plan`` under GSPMD
and asserts parity with the same batch planned unsharded on one local
device — certifying that the multihost surface computes the same
trajectories, with the batch split over DCN x data and cross-process
collectives (Gloo on CPU) carrying the replicated-output gather.

Usage: python _multihost_child.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.parallel import sharding
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = sharding.make_multihost_mesh(model_parallel=2)
assert dict(mesh.shape) == {"dcn": nproc, "data": 2, "model": 2}, mesh.shape

# -- global problem set (identical on every process: same seed) ----------
B, T, N = 8, 12, 32
rng = np.random.default_rng(0)
img = np.ones((N, N), np.float32)
img[12:20, 12:20] = 0.0
sdf_one = np.asarray(sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10.0 / N),
                     np.float32)
sdf = np.broadcast_to(sdf_one, (B, N, N)).copy()
start = np.zeros((B, 4), np.float32)
goal = np.zeros((B, 4), np.float32)
start[:, :2] = rng.uniform(-4.5, -3.5, (B, 2))
goal[:, :2] = rng.uniform(3.5, 4.5, (B, 2))

spec = graph.GraphSpec(total_time_step=T)
robot = PointRobot2D()
cfg = gn.OptimConfig(reg=0.1, max_iters=8)
params = graph.default_params(
    spec, robot, jnp.asarray(start), jnp.asarray(goal), qc_inv=np.eye(2),
    cost_sigma=0.05, epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
)
th0 = straight_line_traj(
    jnp.asarray(start[:, :2]), jnp.asarray(goal[:, :2]),
    spec.total_time_sec, T,
).astype(jnp.float32)

# -- reference: unsharded plan on this process's device 0 ----------------
ref = gn.plan(spec, robot, params, th0, jnp.asarray(sdf), cfg).th
ref = np.asarray(ref)

# -- multihost: shard the batch over (dcn, data), replicate the output ---
bsh = sharding.batch_sharding(mesh)
rows = B // nproc  # rows this process contributes


def put(x):
    x = np.asarray(x)
    if x.ndim == 0 or x.shape[0] != B:
        return jax.device_put(x, sharding.replicated(mesh))
    return jax.make_array_from_process_local_data(
        bsh, x[pid * rows : (pid + 1) * rows]
    )


params_g = jax.tree.map(put, params)
run = jax.jit(
    lambda p, th, s: gn.plan(spec, robot, p, th, s, cfg).th,
    out_shardings=sharding.replicated(mesh),
)
th_g = run(params_g, put(th0), put(sdf))
# f32: GSPMD partitioning reassociates reductions, so sharded-vs-unsharded
# agree to rounding accumulated over 8 GN iterations (~3e-5 observed).
np.testing.assert_allclose(np.asarray(th_g), ref, rtol=1e-4, atol=1e-4)
assert np.all(np.isfinite(np.asarray(th_g)))
print(f"[{pid}] MULTIHOST_OK", flush=True)
