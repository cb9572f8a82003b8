"""Coverage for the initializer network, its trainer, and the static
sensitivity sweep — SURVEY §2.6 (InitNet / train_initializer) and §2.7
(test_dataset_sensitivity), previously exercised only via CLIs."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.data import generate
from dgpmp2_tpu.data import sensitivity
from dgpmp2_tpu.learn.train_initializer import make_train_fns
from dgpmp2_tpu.models.init_net import InitNet
from dgpmp2_tpu.robots import PointRobot2D


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("init_data")
    spec = graph.GraphSpec(total_time_step=10)
    cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.3,
               k_s=0.01, k_g=0.01)
    generate.generate_split(
        str(root / "train"), 3, 2, "multi_obs", 32,
        np.random.default_rng(3), spec, PointRobot2D(),
        gn.OptimConfig(reg=0.1, max_iters=12), cov,
    )
    return str(root), spec


def test_init_net_shapes_and_pinned_endpoints():
    b, t1, d = 2, 11, 4
    net = InitNet(num_states=t1, state_dim=d, hidden=32)
    x = jnp.ones((b, 32, 32, 2))
    th = jnp.zeros((b, t1, d)).at[:, -1, :2].set(4.0)
    params = net.init(jax.random.PRNGKey(0), x, th)
    delta = net.apply(params, x, th, train=False)
    assert delta.shape == (b, t1, d)
    # Endpoint rows pinned to zero (initialization_network.py:68-81).
    np.testing.assert_array_equal(np.asarray(delta[:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(delta[:, -1]), 0.0)
    assert bool(jnp.all(jnp.isfinite(delta)))


@pytest.mark.slow
def test_train_initializer_loss_decreases(tiny_dataset):
    root, spec = tiny_dataset
    dataset = ds.PlanningDataset(root, mode="train",
                                 label_subdir="opt_trajs_gpmp2")
    batch = next(ds.as_batches(dataset, np.arange(len(dataset)),
                               len(dataset)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    net = InitNet(num_states=spec.num_traj_states, state_dim=spec.state_dim,
                  hidden=32, dropout_prob=0.0)
    tx = optax.adam(3e-3)
    train_step, predict, seed_traj = make_train_fns(
        net, tx, spec.total_time_sec, spec.total_time_step, spec.dof
    )
    rng = jax.random.PRNGKey(0)
    th0 = seed_traj(batch["start"], batch["goal"])
    x = jnp.stack([batch["im"], batch["sdf"]], axis=-1)
    params = net.init(rng, x, th0)
    opt_state = tx.init(params)
    losses = []
    for i in range(30):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses[::10]
    th = predict(params, batch)
    assert th.shape == batch["th_opt"].shape
    assert bool(jnp.all(jnp.isfinite(th)))


def test_sensitivity_sweep_keys_and_best(tiny_dataset):
    root, spec = tiny_dataset
    dataset = ds.PlanningDataset(root, mode="train",
                                 label_subdir="opt_trajs_gpmp2")
    out = sensitivity.run_sweep(
        dataset, np.arange(len(dataset)), spec, PointRobot2D(),
        gn.OptimConfig(reg=0.1, max_iters=10), sigmas=(0.05, 1.0),
        batch_size=len(dataset), epsilon_dist=0.3,
    )
    assert set(out) == {"per_sigma", "best_sigma", "best"}
    assert set(out["per_sigma"]) == {0.05, 1.0}
    for m in out["per_sigma"].values():
        assert "solve_rate" in m and "avg_gp_error" in m
    assert out["best_sigma"] in (0.05, 1.0)
