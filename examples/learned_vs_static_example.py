#!/usr/bin/env python
"""Learned covariances vs the static baseline, end to end in one script.

Miniature version of the full campaign (`tools/learned_campaign.py`):
generate a handful of cluttered envs with the batched expert, train an
eps-bounded learned planner (`LearnedPlannerConfig(learn_eps=True,
eps_max=...)`, static-init so epoch 0 IS the static planner) for a few
epochs, then plan one held-out problem with both and plot the
trajectories.  Everything runs on CPU in a couple of minutes; the full
campaign results (learned solve 0.50 vs static 0.39 at 500 envs) are in
PERFORMANCE.md.
"""
import numpy as np

from _common import OUT_DIR, plt

import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.data import generate
from dgpmp2_tpu.learn.learned_planner import (
    LearnedDiffGPMP2Planner, LearnedPlannerConfig,
)
from dgpmp2_tpu.learn.losses import LossWeights
from dgpmp2_tpu.learn.train import (
    TrainConfig, init_train_state, make_optimizer, make_train_step,
)
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

T = 24
COV = dict(qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.4,
           k_s=0.01, k_g=0.01)

spec = graph.GraphSpec(total_time_step=T)
robot = PointRobot2D()

import tempfile, os
root = os.path.join(tempfile.gettempdir(), "learned_example_data")
if not os.path.exists(os.path.join(root, "train", "meta.yaml")):
    generate.generate_split(
        os.path.join(root, "train"), 8, 2, "multi_obs", 64,
        np.random.default_rng(0), spec, robot,
        gn.OptimConfig(reg=0.1, max_iters=30, method="lm"), COV,
    )

dataset = ds.PlanningDataset(root, mode="train",
                             label_subdir="opt_trajs_gpmp2")
idxs = np.arange(len(dataset))
batch = next(ds.as_batches(dataset, idxs[:-1], len(idxs) - 1))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
batch["cov_scalars"] = COV

planner = LearnedDiffGPMP2Planner(
    spec, robot, gn.OptimConfig(reg=0.1, max_iters=20),
    LearnedPlannerConfig(
        dynamics_mode="diag_identity", learn_eps=True,
        eps_max=2 * COV["epsilon_dist"], dropout_prob=0.1,
        static_init=(1.0, COV["cost_sigma"], COV["epsilon_dist"]),
    ),
)
tx = make_optimizer("adam", {"alpha": 3e-4})
weights = LossWeights(pos_loss_weight=0.0, ext_loss_weight=1.0,
                      ext_obs_lambda=5.0)
train_step = make_train_step(planner, tx, weights,
                             TrainConfig(T=5, tk=5, use_inter_loss=True))
rng = jax.random.PRNGKey(0)
state = init_train_state(
    planner, tx, rng,
    planner.stack_inputs(batch["im"], batch["sdf"]), batch["th_opt"],
)
for epoch in range(8):
    state, m = train_step(state, batch, jax.random.fold_in(rng, epoch))
    print(f"epoch {epoch}: loss={float(m['loss']):.4f}")

# Held-out problem: the last dataset entry.
item = dataset[len(dataset) - 1]
start = jnp.asarray(item["start"])[None]
goal = jnp.asarray(item["goal"])[None]
sdf = jnp.asarray(item["sdf"])[None]
im = jnp.asarray(item["im"])[None]
th0 = straight_line_traj(start[:, :2], goal[:, :2], spec.total_time_sec, T)
params = graph.default_params(spec, robot, start, goal, **COV,
                              dtype=jnp.float32)

th_static = gn.plan(spec, robot, params, th0, sdf,
                    gn.OptimConfig(reg=0.1, max_iters=20),
                    track_best=True).best_th
th_learned, _, _, _ = planner.plan(state.variables, params, th0, sdf, im,
                                   max_iters=20, track_best=True)

fig, ax = plt.subplots(figsize=(6, 6))
ax.imshow(np.asarray(item["im"]), cmap="gray", extent=(-5, 5, -5, 5),
          origin="upper")
for th, style, label in ((np.asarray(th0[0]), "r--", "initial"),
                         (np.asarray(th_static[0]), "c-", "static"),
                         (np.asarray(th_learned[0]), "b-", "learned (eps)")):
    ax.plot(th[:, 0], th[:, 1], style, label=label)
ax.legend()
out = f"{OUT_DIR}/learned_vs_static_example.png"
fig.savefig(out, bbox_inches="tight", dpi=110)
print(f"wrote {out}")
