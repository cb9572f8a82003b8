#!/usr/bin/env python
"""Multi-dataset planning + gradient through the unrolled plan (mirrors
``examples/diff_gpmp2_multi_dataset_example.py``): concatenate two dataset
roots with ``PlanningDatasetMulti``, batch across them, re-plan, and
backprop a task loss through the whole optimization to the GP covariance."""
import numpy as np
import jax
import jax.numpy as jnp

from _common import OUT_DIR, plot_plan

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds, generate
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

spec = graph.GraphSpec(total_time_step=24)
robot = PointRobot2D()
cfg = gn.OptimConfig(reg=0.1, max_iters=20, tol_delta=0.0)
cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.4, k_s=0.01, k_g=0.01)

roots = []
for i, family in enumerate(("multi_obs", "forest")):
    root = f"/tmp/dgpmp2_multi_dataset_example/{family}"
    generate.generate_split(f"{root}/train", num_envs=2, probs_per_env=2,
                            family=family, im_size=64,
                            rng=np.random.default_rng(i), spec=spec,
                            robot=robot, cfg=cfg, cov_scalars=cov)
    roots.append(root)

dset = ds.PlanningDatasetMulti(roots, mode="train")
print(f"multi-dataset: {len(dset)} problems from {len(roots)} roots")
batch = next(ds.as_batches(dset, np.arange(len(dset)), batch_size=len(dset)))

start = jnp.asarray(batch["start"], jnp.float32)
goal = jnp.asarray(batch["goal"], jnp.float32)
sdf = jnp.asarray(batch["sdf"], jnp.float32)
th_opt = jnp.asarray(batch["th_opt"], jnp.float32)
th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 24)


def task_loss(qc_inv):
    params = graph.default_params(
        spec, robot, start, goal, **{**cov, "qc_inv": qc_inv},
        dtype=jnp.float32,
    )
    r = gn.plan(spec, robot, params, th0, sdf, cfg)
    return jnp.mean((r.th[..., :2] - th_opt[..., :2]) ** 2), r


(loss, r), grad = jax.value_and_grad(task_loss, has_aux=True)(
    jnp.eye(2, dtype=jnp.float32)
)
print(f"task loss vs experts: {loss:.4f}")
print("d(loss)/d(Qc_inv) through the unrolled plan:\n", np.asarray(grad))
plot_plan(batch["im"][0], th0[0], r.th[0],
          f"{OUT_DIR}/diff_gpmp2_multi_dataset_example.png")
