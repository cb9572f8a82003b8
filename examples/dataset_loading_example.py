#!/usr/bin/env python
"""Dataset loading (mirrors dataset_loading_example.py): generate a tiny
dataset, load it through the reference-compatible loader, batch it, and
re-plan one problem."""
import numpy as np
import jax.numpy as jnp

from _common import OUT_DIR, plot_plan

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds, generate
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

spec = graph.GraphSpec(total_time_step=24)
robot = PointRobot2D()
cfg = gn.OptimConfig(reg=0.1, max_iters=30)
cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.4, k_s=0.01, k_g=0.01)

root = "/tmp/dgpmp2_dataset_example"
generate.generate_split(f"{root}/train", num_envs=3, probs_per_env=2,
                        family="multi_obs", im_size=64,
                        rng=np.random.default_rng(0), spec=spec, robot=robot,
                        cfg=cfg, cov_scalars=cov)
dset = ds.PlanningDataset(root, mode="train")
print(f"loaded dataset: {len(dset)} problems")
batch = next(ds.as_batches(dset, np.arange(len(dset)), batch_size=4))
print("batch shapes:", {k: v.shape for k, v in batch.items()})

params = graph.default_params(spec, robot, jnp.asarray(batch["start"]),
                              jnp.asarray(batch["goal"]), **cov,
                              dtype=jnp.float32)
th0 = straight_line_traj(jnp.asarray(batch["start"][:, :2]),
                         jnp.asarray(batch["goal"][:, :2]), 10.0, 24)
r = gn.plan(spec, robot, params, th0, jnp.asarray(batch["sdf"]), cfg)
mse = float(jnp.mean((r.th[..., :2] - batch["th_opt"][..., :2]) ** 2))
print(f"replanned batch: err {np.round(np.asarray(r.err_init),2)} -> "
      f"{np.round(np.asarray(r.err_final),4)}; MSE vs stored expert: {mse:.2e}")
plot_plan(batch["im"][0], th0[0], r.th[0], f"{OUT_DIR}/dataset_loading_example.png")
