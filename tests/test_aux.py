"""Auxiliary subsystems: checkpoints, Env2D, eval harness, profiling."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.envs import Env2D
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
    import optax

    from dgpmp2_tpu.learn import checkpoints
    from dgpmp2_tpu.learn.learned_planner import (
        LearnedDiffGPMP2Planner, LearnedPlannerConfig,
    )
    from dgpmp2_tpu.learn.train import init_train_state

    spec = graph.GraphSpec(total_time_step=6)
    planner = LearnedDiffGPMP2Planner(
        spec, PointRobot2D(), gn.OptimConfig(max_iters=2),
        LearnedPlannerConfig(),
    )
    tx = optax.adam(1e-3)
    im_stack = jnp.ones((2, 32, 32, 2), jnp.float32)
    th = jnp.zeros((2, 7, 4), jnp.float32)
    state = init_train_state(planner, tx, jax.random.PRNGKey(0), im_stack, th)
    # Perturb so restore has something nontrivial to reproduce.
    state = state.replace(
        variables=jax.tree.map(lambda x: x + 1.5, state.variables),
        step=jnp.asarray(7, jnp.int32),
    )
    ckpt = str(tmp_path / "ckpts")
    checkpoints.save(ckpt, 7, state,
                     split={"train": np.arange(5), "valid": np.arange(2)})

    template = init_train_state(planner, tx, jax.random.PRNGKey(1), im_stack, th)
    step, payload = checkpoints.restore(
        ckpt, {"state": template,
               "split": {"train": np.arange(5), "valid": np.arange(2)}}
    )
    assert step == 7
    restored = payload["state"]
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.variables)
    b = jax.tree.leaves(restored.variables)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_flat_variables_roundtrip(tmp_path):
    from dgpmp2_tpu.learn import checkpoints

    variables = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                            "b": jnp.ones((3,))}}
    path = str(tmp_path / "vars.npz")
    checkpoints.save_flat_variables(path, variables)
    template = jax.tree.map(jnp.zeros_like, variables)
    restored = checkpoints.load_flat_variables(path, template)
    for x, y in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # architecture mismatch is an error, not silent corruption
    bad = {"params": {"w": jnp.zeros((2, 3))}}
    with pytest.raises(ValueError):
        checkpoints.load_flat_variables(path, bad)


def test_env2d_api(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.ones((64, 64))
    img[20:30, 40:50] = 0.0
    env = Env2D({"x_lims": (-5.0, 5.0), "y_lims": (-5.0, 5.0)})
    env.initialize_from_image(img)
    # World<->pixel round trip.
    pts = np.asarray([[1.2, -3.4], [-4.9, 4.9]])
    np.testing.assert_allclose(env.to_world(env.to_pixel(pts)), pts, atol=1e-9)
    # Feasibility: deep inside the obstacle is infeasible, far corner is fine.
    d_obs, _ = env.get_signed_obstacle_distance(jnp.asarray([[2.05, 1.1]]))
    assert float(d_obs[0]) < 0.2
    assert env.is_feasible((-4.0, -4.0), eps=0.3)
    assert not env.is_feasible((2.05, 1.1), eps=0.3)
    assert env.in_limits((0.0, 0.0)) and not env.in_limits((7.0, 0.0))
    # Rendering paths execute headless.
    env.initialize_plot(start=(-4, -4), goal=(4, 4))
    env.plot_edge([(-4, -4), (0, 0), (4, 4)])
    env.save_plot(str(tmp_path / "env.png"))
    env.close_plot()
    env.plot_signed_distance_transform()
    env.plot_costmap(0.4)
    plt.close("all")
    assert (tmp_path / "env.png").exists()


@pytest.mark.slow
def test_run_validation_harness():
    from dgpmp2_tpu.learn.eval import run_validation

    spec = graph.GraphSpec(total_time_step=12)
    robot = PointRobot2D()
    img = np.ones((48, 48))
    img[20:28, 20:28] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64), res=10 / 48)
    b = 3
    start = jnp.zeros((b, 4)).at[:, :2].set(-4.0)
    goal = jnp.zeros((b, 4)).at[:, :2].set(4.0)

    def make_params(s, g):
        return graph.default_params(
            spec, robot, s, g, qc_inv=np.eye(2), cost_sigma=0.05,
            epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float64,
        )

    batches = [{"start": start, "goal": goal,
                "sdf": jnp.broadcast_to(sdf, (b, 48, 48))}]
    summary = run_validation(spec, robot, gn.OptimConfig(reg=0.1, max_iters=40),
                             make_params, batches)
    assert 0.0 <= summary["solve_rate"] <= 1.0
    assert summary["avg_gp_error"] >= 0.0
    assert "avg_avg_vel" in summary


def test_time_compiled_harness():
    from dgpmp2_tpu.utils.profiling import time_compiled

    ms = time_compiled(lambda c, a: c * 0.999 + a, jnp.ones((64,)),
                       jnp.ones((64,)) * 1e-3, iters=10, repeats=1)
    assert ms > 0.0
