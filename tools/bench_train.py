#!/usr/bin/env python
"""Framework learned-training step throughput on the v5e (the training
honesty row's TPU side; reference side: tools/bench_reference_train.py).

Times the jitted ``make_train_step`` — conv encoder + covariance head +
``tk`` gradient-carrying GN steps + one backward + Adam, all one XLA
program — on the same problem family as the reference measurement (T=100
states, 128² canned env, feed-forward diag_identity head, tk=5 window)
and reports **ms per gradient-carrying GN step per problem** =
wall / (T_unroll · B), the unit both sides share.

Matches the reference TBPTT loop this replaces:
``/root/reference/diff_gpmp2/learning/train_planner.py:297-402``.

Run from the repo root (TPU):  python tools/bench_train.py [--batches ...]
Prints one JSON line per batch size.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.learn.learned_planner import (LearnedDiffGPMP2Planner,
                                              LearnedPlannerConfig)
from dgpmp2_tpu.learn.train import (LossWeights, TrainConfig,
                                    init_train_state, make_optimizer,
                                    make_train_step)
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

TK = 5


def build_batch(b, t=100, n=128):
    rng = np.random.default_rng(0)
    im = np.ones((b, n, n), np.float32)
    r = rng.integers(30, n - 50, (b, 2))
    for i in range(b):
        im[i, r[i, 0]: r[i, 0] + 20, r[i, 1]: r[i, 1] + 20] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(im), res=10.0 / n).astype(
        jnp.float32)
    start = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (b, 2)), jnp.float32))
    goal = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (b, 2)), jnp.float32))
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, t)
    th_opt = th0 + 0.1 * jnp.asarray(
        rng.standard_normal(th0.shape), jnp.float32)  # timing-only label
    return {
        "im": jnp.asarray(im), "sdf": sdf, "start": start, "goal": goal,
        "th_opt": th_opt.astype(jnp.float32),
        "cov_scalars": dict(qc_inv=np.eye(2), cost_sigma=0.05,
                            epsilon_dist=0.4, k_s=0.01, k_g=0.01),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[16, 128, 512])
    ap.add_argument("--t", type=int, default=100)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    spec = graph.GraphSpec(total_time_step=args.t)
    lcfg = LearnedPlannerConfig(dynamics_mode="diag_identity",
                                dropout_prob=0.5,
                                static_init=(1.0, 0.05, 0.4))
    planner = LearnedDiffGPMP2Planner(
        spec, PointRobot2D(), gn.OptimConfig(reg=0.1, max_iters=50), lcfg)
    tx = make_optimizer("adam", {"alpha": 1e-4})
    weights = LossWeights(pos_loss_weight=1.0, ext_loss_weight=0.1,
                          ext_obs_lambda=1.0)
    tcfg = TrainConfig(T=TK, tk=TK)  # one tk window per step, as the
    # reference loop executes between optimizer steps
    train_step = make_train_step(planner, tx, weights, tcfg)

    for b in args.batches:
        batch = build_batch(b, args.t)
        state = init_train_state(
            planner, tx, jax.random.PRNGKey(0),
            planner.stack_inputs(batch["im"], batch["sdf"]),
            batch["th_opt"])
        rng = jax.random.PRNGKey(1)
        state, m = train_step(state, batch, rng)  # compile + warmup
        jax.block_until_ready(state.variables)
        assert np.isfinite(float(m["loss"]))
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, m = train_step(
                    state, batch, jax.random.fold_in(rng, rep * 100 + i))
            jax.block_until_ready(state.variables)
            best = min(best, (time.perf_counter() - t0) / args.steps)
        print(json.dumps({
            "impl": f"dgpmp2_tpu_{jax.default_backend()}_f32_train",
            "batch": b,
            "tk": TK,
            "ms_per_train_window": round(best * 1e3, 3),
            "ms_per_grad_gn_step_per_problem": round(
                best * 1e3 / TK / b, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
