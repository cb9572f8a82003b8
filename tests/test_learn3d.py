"""Learned covariances over 3-D voxel worlds: ConvEncoder3D wiring.

The learned planner is dimension-blind past its inputs: with
``GraphSpec.z_lims`` set it encodes (im, sdf) VOXEL stacks through the
rank-3 twin of the reference CNN and feeds xyz head positions.  Pins:
static_init parity (untrained forward == fixed-covariance planner),
gradient flow into the 3-D conv weights, and finite plans.
"""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.learn.learned_planner import (LearnedDiffGPMP2Planner,
                                              LearnedPlannerConfig)
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot3D

L = (-5.0, 5.0)
N = 32


def _setup():
    vox = np.ones((N, N, N), np.float32)
    vox[12:20, 12:20, 12:20] = 0.0
    res = (L[1] - L[0]) / N
    sdf = sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res)
    robot = PointRobot3D()
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=12,
                           x_lims=L, y_lims=L, z_lims=L)
    b = 2
    rng = np.random.default_rng(0)
    start = np.zeros((b, 6), np.float32)
    goal = np.zeros((b, 6), np.float32)
    start[:, :3] = rng.uniform(-4.2, -3.8, (b, 3))
    goal[:, :3] = rng.uniform(3.8, 4.2, (b, 3))
    params = graph.default_params(
        spec, robot, jnp.asarray(start), jnp.asarray(goal), qc_inv=np.eye(3),
        cost_sigma=0.05, epsilon_dist=0.4, k_s=0.01, k_g=0.01,
        dtype=jnp.float32,
    )
    s = jnp.linspace(0.0, 1.0, 13, dtype=jnp.float32)[None, :, None]
    pos = (1 - s) * start[:, None, :3] + s * goal[:, None, :3]
    th0 = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1)
    sdfb = jnp.broadcast_to(sdf, (b, N, N, N)).astype(jnp.float32)
    im = jnp.broadcast_to(jnp.asarray(vox), (b, N, N, N))
    return spec, robot, params, th0, sdfb, im


@pytest.mark.slow
def test_learned3d_static_init_matches_fixed_planner():
    spec, robot, params, th0, sdfb, im = _setup()
    cfg = gn.OptimConfig(reg=0.1, max_iters=8)
    lp = LearnedDiffGPMP2Planner(
        spec, robot, cfg,
        LearnedPlannerConfig(dynamics_mode="diag_identity",
                             static_init=(1.0, 0.05)),
    )
    assert type(lp.conv).__name__ == "ConvEncoder3D"
    im_stack = lp.stack_inputs(im, sdfb)
    assert im_stack.shape == (2, N, N, N, 2)
    variables = lp.init_variables(jax.random.PRNGKey(0), im_stack, th0)
    th, errs, _, _ = lp.plan(variables, params, th0, sdfb, im)
    ref = gn.plan(spec, robot, params, th0, sdfb, cfg)
    assert bool(jnp.all(jnp.isfinite(th)))
    # static_init biases + zero-init output kernels => the untrained
    # forward pass decodes exactly the static covariances.
    np.testing.assert_allclose(np.asarray(th), np.asarray(ref.th),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_train_step_runs_in_3d():
    """The TBPTT training step is dimension-blind: batches carrying voxel
    im/sdf stacks train the ConvEncoder3D planner (finite metrics, weights
    actually move)."""
    import optax

    from dgpmp2_tpu.learn.train import (LossWeights, TrainConfig,
                                        init_train_state, make_train_step)

    n = 16  # 16³ voxels: 4 pool stages -> 1³·32 features
    vox = np.ones((4, n, n, n), np.float32)
    vox[:, 6:10, 6:10, 6:10] = 0.0
    res = 10.0 / n
    # f32 like production: under the suite's x64 mode the EDT defaults to
    # f64, which would promote the whole learned step out of f32.
    sdf = np.asarray(sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res),
                     np.float32)
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=8,
                           x_lims=L, y_lims=L, z_lims=L)
    robot = PointRobot3D()
    lp = LearnedDiffGPMP2Planner(
        spec, robot, gn.OptimConfig(reg=0.1, max_iters=4),
        LearnedPlannerConfig(dynamics_mode="diag_identity", learn_eps=False),
    )
    rng = np.random.default_rng(0)
    start = np.zeros((4, 6), np.float32)
    goal = np.zeros((4, 6), np.float32)
    start[:, :3] = rng.uniform(-4.2, -3.8, (4, 3))
    goal[:, :3] = rng.uniform(3.8, 4.2, (4, 3))
    s = np.linspace(0, 1, 9, dtype=np.float32)[None, :, None]
    pos = (1 - s) * start[None, :, None, :3][0] + s * goal[:, None, :3]
    th_opt = np.concatenate([pos, np.zeros_like(pos)], axis=-1)
    batch = {
        "im": jnp.asarray(vox), "sdf": jnp.asarray(sdf),
        "start": jnp.asarray(start), "goal": jnp.asarray(goal),
        "th_opt": jnp.asarray(th_opt),
        "cov_scalars": {"qc_inv": jnp.eye(3), "cost_sigma": 0.05,
                        "epsilon_dist": 0.4, "k_s": 0.01, "k_g": 0.01},
    }
    tx = optax.adam(1e-3)
    train_step = make_train_step(lp, tx, LossWeights(),
                                 TrainConfig(T=4, tk=2, remat=False))
    th0 = jnp.asarray(th_opt)
    state = init_train_state(
        lp, tx, jax.random.PRNGKey(0),
        lp.stack_inputs(batch["im"], batch["sdf"]), th0,
    )
    v0 = jax.tree.map(lambda x: x.copy(), state.variables)
    metrics = None
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in
               jax.tree.leaves(metrics))
    moved = sum(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(state.variables))
    )
    assert moved > 0.0, "training must update the 3-D conv/head weights"


@pytest.mark.slow
def test_learned3d_gradients_reach_conv3d_weights():
    spec, robot, params, th0, sdfb, im = _setup()
    cfg = gn.OptimConfig(reg=0.1, max_iters=3)
    # No static_init: its zero-initialized output kernel makes conv
    # gradients exactly zero at init (2-D behaves identically) — use the
    # xavier output kernel so the chain to the encoder is live.
    lp = LearnedDiffGPMP2Planner(
        spec, robot, cfg,
        LearnedPlannerConfig(dynamics_mode="diag_identity"),
    )
    im_stack = lp.stack_inputs(im, sdfb)
    variables = lp.init_variables(jax.random.PRNGKey(0), im_stack, th0)

    def loss(v):
        th, _, _, _ = lp.plan(v, params, th0, sdfb, im)
        return jnp.mean(th[..., :3] ** 2)

    g = jax.grad(loss)(variables)
    leaves = [x for x in jax.tree.leaves(g["conv"])]
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0, "gradients must reach the 3-D conv weights"
