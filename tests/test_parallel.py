"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.parallel import sharding
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj
from dgpmp2_tpu.ops import sdf as sdf_ops

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _problem(b, t=12, imsize=32):
    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=t)
    robot = PointRobot2D()
    img = np.ones((b, imsize, imsize), np.float32)
    img[:, 12:20, 12:20] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10.0 / imsize).astype(
        jnp.float32
    )
    start = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(-4.0)
    goal = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(4.0)
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.1,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, t)
    return spec, robot, params, th0, sdf


@pytest.mark.slow
def test_data_parallel_plan_matches_single_device():
    spec, robot, params, th0, sdf = _problem(b=16)
    cfg = gn.OptimConfig(reg=0.1, max_iters=5)

    @jax.jit
    def run(p, th, s):
        return gn.plan(spec, robot, p, th, s, cfg).th

    th_single = run(params, th0, sdf)

    mesh = sharding.make_mesh(jax.devices()[:8])
    p_sh = sharding.shard_batch(params, mesh)
    th_sh = run(p_sh, sharding.shard_batch(th0, mesh), sharding.shard_batch(sdf, mesh))
    np.testing.assert_allclose(
        np.asarray(th_single), np.asarray(th_sh), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_data_parallel_plan_stream_engine():
    """The stream engine's batch-in-lanes relayout composes with a sharded
    batch: GSPMD may insert collectives around the Pallas solve, but the
    result must match the unsharded run."""
    import dataclasses

    spec, robot, params, th0, sdf = _problem(b=16)
    cfg = gn.OptimConfig(reg=0.1, max_iters=3, engine="stream")

    @jax.jit
    def run(p, th, s):
        return gn.plan(spec, robot, p, th, s, cfg).th

    th_single = run(params, th0, sdf)
    mesh = sharding.make_mesh(jax.devices()[:8])
    th_sh = run(
        sharding.shard_batch(params, mesh),
        sharding.shard_batch(th0, mesh),
        sharding.shard_batch(sdf, mesh),
    )
    np.testing.assert_allclose(
        np.asarray(th_single), np.asarray(th_sh), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_tp_mesh_learned_train_step():
    from dgpmp2_tpu.learn.learned_planner import (
        LearnedDiffGPMP2Planner, LearnedPlannerConfig,
    )
    from dgpmp2_tpu.learn.losses import LossWeights
    from dgpmp2_tpu.learn.train import TrainConfig, init_train_state, make_optimizer, make_train_step

    spec, robot, params, th0, sdf = _problem(b=8)
    planner = LearnedDiffGPMP2Planner(
        spec, robot, gn.OptimConfig(reg=0.1, max_iters=4),
        LearnedPlannerConfig(dynamics_mode="diag_identity"),
    )
    tx = make_optimizer("adam", {"alpha": 1e-3})
    tcfg = TrainConfig(T=2, tk=2)
    train_step = make_train_step(planner, tx, LossWeights(), tcfg)

    batch = {
        "im": jnp.ones((8, 32, 32), jnp.float32),
        "sdf": sdf,
        "start": params.start,
        "goal": params.goal,
        "th_opt": th0,
        "cov_scalars": dict(qc_inv=np.eye(2), cost_sigma=0.1,
                            epsilon_dist=0.4, k_s=0.01, k_g=0.01),
    }
    rng = jax.random.PRNGKey(0)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, th0)

    mesh = sharding.make_mesh(jax.devices()[:8], model_parallel=2)
    state = sharding.shard_state(state, mesh)
    sh_batch = dict(batch)
    for k in ("im", "sdf", "start", "goal", "th_opt"):
        sh_batch[k] = jax.device_put(sh_batch[k], sharding.batch_sharding(mesh))

    state2, metrics = train_step(state, sh_batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # TP rule actually sharded the wide kernel over the model axis.
    flat = jax.tree_util.tree_flatten_with_path(state2.variables)[0]
    wide = [
        (p, l) for p, l in flat
        if "Dense_0" in "/".join(str(x) for x in p) and "kernel" in str(p[-1])
    ]
    assert wide, "head Dense_0 kernel not found"
    _, kern = wide[0]
    assert not kern.sharding.is_fully_replicated


def _problem3d(b, t=10, size=16):
    """Voxel-workspace twin of :func:`_problem` (z_lims set, trilinear
    lookups on the obstacle path)."""
    from dgpmp2_tpu.robots import PointRobot3D

    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=t,
                           z_lims=(-5.0, 5.0))
    robot = PointRobot3D()
    vox = np.ones((size, size, size), np.float32)
    vox[size // 3 : size // 2, size // 3 : size // 2,
        size // 3 : size // 2] = 0.0
    sdf = sdf_ops.sdf_from_occupancy_3d(
        jnp.asarray(vox), res=10.0 / size
    ).astype(jnp.float32)
    sdfb = jnp.broadcast_to(sdf, (b, size, size, size))
    start = jnp.zeros((b, 6), jnp.float32).at[:, :3].set(
        jnp.asarray(rng.uniform(-4.2, -3.6, (b, 3)), jnp.float32))
    goal = jnp.zeros((b, 6), jnp.float32).at[:, :3].set(
        jnp.asarray(rng.uniform(3.6, 4.2, (b, 3)), jnp.float32))
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(3), cost_sigma=0.1,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :3], goal[:, :3], 10.0, t)
    return spec, robot, params, th0, sdfb


@pytest.mark.slow
def test_data_parallel_plan3d_matches_single_device():
    """The 3-D stack (trilinear lookups, voxel SDFs) under GSPMD: a batch
    sharded over the data axis must reproduce the unsharded plan —
    extends the certification the 2-D test above gives (VERDICT r3 §4)."""
    spec, robot, params, th0, sdfb = _problem3d(b=16)
    cfg = gn.OptimConfig(reg=0.1, max_iters=5)

    @jax.jit
    def run(p, th, s):
        return gn.plan(spec, robot, p, th, s, cfg).th

    th_single = run(params, th0, sdfb)
    mesh = sharding.make_mesh(jax.devices()[:8])
    th_sh = run(
        sharding.shard_batch(params, mesh),
        sharding.shard_batch(th0, mesh),
        sharding.shard_batch(sdfb, mesh),
    )
    np.testing.assert_allclose(
        np.asarray(th_single), np.asarray(th_sh), rtol=1e-5, atol=1e-6
    )


def test_multihost_mesh_single_process():
    mesh = sharding.make_multihost_mesh(model_parallel=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (1, len(jax.devices()) // 2, 2)
    s = sharding.batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((8, 4)), s)
    assert not x.sharding.is_fully_replicated
