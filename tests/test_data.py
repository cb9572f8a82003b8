"""Data layer: generators, round-trip through the reference disk format."""
import numpy as np
import pytest

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.data import generate, obstacles
from dgpmp2_tpu.robots import PointRobot2D


@pytest.mark.parametrize("family", obstacles.FAMILIES)
def test_obstacle_families(family):
    rng = np.random.default_rng(0)
    im = obstacles.make_map(family, rng, 64, pts=[(5, 5), (60, 60)],
                            patch_pts=4, patch_obs=2)
    assert im.shape == (64, 64)
    assert set(np.unique(im)).issubset({0.0, 1.0})
    assert np.any(im == 0.0)  # has obstacles
    assert np.mean(im) > 0.3  # mostly free space


@pytest.mark.slow
def test_generate_and_load_roundtrip(tmp_path):
    spec = graph.GraphSpec(total_time_step=20)
    robot = PointRobot2D()
    cfg = gn.OptimConfig(reg=0.1, max_iters=25)
    cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.4,
               k_s=0.01, k_g=0.01)
    rng = np.random.default_rng(3)
    out = str(tmp_path / "train")
    generate.generate_split(out, num_envs=2, probs_per_env=2, family="forest",
                            im_size=64, rng=rng, spec=spec, robot=robot,
                            cfg=cfg, cov_scalars=cov)

    dset = ds.PlanningDataset(str(tmp_path), mode="train")
    assert len(dset) == 4
    s = dset[1]
    assert s["im"].shape == (64, 64)
    assert s["sdf"].shape == (64, 64)
    assert s["th_opt"].shape == (21, 4)
    # Expert trajectories anchored to their endpoints.
    np.testing.assert_allclose(s["th_opt"][0, :2], s["start"][:2], atol=0.05)
    np.testing.assert_allclose(s["th_opt"][-1, :2], s["goal"][:2], atol=0.05)

    # Multi-root concat + batching.
    multi = ds.PlanningDatasetMulti([str(tmp_path)], mode="train")
    tr, va = ds.train_valid_split(len(multi), 0.25, np.random.default_rng(0))
    assert len(tr) == 3 and len(va) == 1
    batches = list(ds.as_batches(multi, tr, batch_size=3))
    assert len(batches) == 1
    assert batches[0]["im"].shape == (3, 64, 64)
    assert batches[0]["th_opt"].shape == (3, 21, 4)


def test_image_png_roundtrip_thresholding(tmp_path):
    # The loader must reproduce the exact binary map through PNG encoding
    # (reference thresholds at 0.75, planning_dataset.py:58).
    rng = np.random.default_rng(1)
    im = obstacles.make_map("multi_obs", rng, 32)
    ds.save_env(str(tmp_path), 0, im, np.zeros((32, 32), np.float32))
    ds.save_meta(str(tmp_path), 1, 1, 32)
    import matplotlib.pyplot as plt

    loaded = plt.imread(str(tmp_path / "im_sdf" / "0_im.png"))
    if loaded.ndim > 2:
        loaded = loaded[..., :3] @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_array_equal(np.asarray(loaded > 0.75, float), im)


def test_angles():
    import jax.numpy as jnp

    from dgpmp2_tpu.utils import angles

    a = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -0.1])
    n = np.asarray(angles.normalize_angle(a))
    assert np.all(n <= np.pi + 1e-12) and np.all(n > -np.pi - 1e-12)
    np.testing.assert_allclose(
        float(angles.angular_distance(0.1, -0.1)), -0.2, atol=1e-7
    )
    np.testing.assert_allclose(
        float(angles.angular_distance(3.0, -3.0)), 2 * np.pi - 6.0, atol=1e-6
    )


def test_generate_im_dataset(tmp_path):
    from dgpmp2_tpu.data import generate_im

    generate_im.generate(str(tmp_path), "multi_obstacle", 32, 3, 1, seed=0)
    import yaml

    with open(tmp_path / "train" / "meta.yaml") as fp:
        meta = yaml.safe_load(fp)
    assert meta["num_envs"] == 3
    sdf = np.load(tmp_path / "train" / "im_sdf" / "0_sdf.npy")
    assert sdf.shape == (32, 32)
    assert sdf.min() < 0 < sdf.max()  # signed field with obstacles


@pytest.mark.slow
def test_generate_paths_on_im_dataset(tmp_path):
    import jax.numpy as jnp

    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.data import generate_im, generate_paths
    from dgpmp2_tpu.robots import PointRobot2D

    generate_im.generate(str(tmp_path), "multi_obstacle", 48, 2, 0, seed=1)
    spec = graph.GraphSpec(total_time_step=16)
    cfg = gn.OptimConfig(reg=0.1, max_iters=25)
    cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.3,
               k_s=0.01, k_g=0.01)
    n = generate_paths.add_expert_paths(
        str(tmp_path / "train"), 2, "diagonal", spec, PointRobot2D(sphere_radii=(0.3,)),
        cfg, cov, np.random.default_rng(0),
    )
    assert n == 2
    dset = ds.PlanningDataset(str(tmp_path), mode="train")
    assert len(dset) == 4
    s = dset[0]
    assert s["th_opt"].shape == (17, 4)


def test_loss_factory():
    import jax.numpy as jnp

    from dgpmp2_tpu.learn.losses import make_loss

    p = jnp.asarray([[0.0, 3.0]])
    t = jnp.asarray([[0.0, 0.0]])
    assert float(make_loss("mse")(p, t)) == 4.5
    assert float(make_loss("mse_traj")(p, t)) == 9.0
    # huber: |3| with delta 1 -> 0.5 + 1*(3-1) = 2.5, averaged over 2 -> 1.25
    np.testing.assert_allclose(float(make_loss("huber")(p, t)), 1.25)


def test_sample_start_goal_multi_pair_terminates():
    # Regression: all-or-nothing rejection of n pairs has acceptance ~p^n
    # and effectively never terminates for n=4; per-pair rejection must
    # return promptly with every pair far enough apart.
    from dgpmp2_tpu.data.generate import DIST_FACTOR, sample_start_goal

    rng = np.random.default_rng(0)
    start, goal = sample_start_goal(rng, 8, (-5.0, 5.0), (-5.0, 5.0))
    d = np.linalg.norm(goal - start, axis=-1)
    assert np.all(d >= DIST_FACTOR * np.hypot(10, 10) - 1e-9)
    assert start.shape == (8, 2)


def test_dataset_caps_apply_independently(tmp_path):
    """Each cap (num_envs, num_env_probs) applies on its own — the
    reference YAMLs often set only one — and over-requesting raises
    instead of silently using the full dataset."""
    (tmp_path / "train").mkdir()
    ds.save_meta(str(tmp_path / "train"), 3, 2, 32)

    d = ds.PlanningDataset(str(tmp_path), mode="train", num_envs=2)
    assert (d.meta["num_envs"], d.meta["probs_per_env"]) == (2, 2)
    d = ds.PlanningDataset(str(tmp_path), mode="train", num_env_probs=1)
    assert (d.meta["num_envs"], d.meta["probs_per_env"]) == (3, 1)
    d = ds.PlanningDataset(str(tmp_path), mode="train", num_envs=3,
                           num_env_probs=2)
    assert len(d) == 6
    with pytest.raises(ValueError, match="num_envs=5"):
        ds.PlanningDataset(str(tmp_path), mode="train", num_envs=5)
    with pytest.raises(ValueError, match="probs_per_env=9"):
        ds.PlanningDataset(str(tmp_path), mode="train", num_env_probs=9)


@pytest.mark.slow
def test_add_expert_paths_raises_on_unsolvable_env(tmp_path):
    """A uniform on-disk dataset needs probs_per_env labels for EVERY env;
    when no collision-free expert path exists the generator must fail
    loudly, not write a ragged dataset."""
    import jax.numpy as jnp  # noqa: F401

    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.data import generate_im, generate_paths
    from dgpmp2_tpu.robots import PointRobot2D

    generate_im.generate(str(tmp_path), "multi_obstacle", 32, 1, 0, seed=0)
    spec = graph.GraphSpec(total_time_step=8)
    cfg = gn.OptimConfig(reg=0.1, max_iters=5)
    cov = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.3,
               k_s=0.01, k_g=0.01)
    # a robot too fat to ever clear the obstacles -> every retry fails
    with pytest.raises(RuntimeError, match="no collision-free"):
        generate_paths.add_expert_paths(
            str(tmp_path / "train"), 1, "diagonal", spec,
            PointRobot2D(sphere_radii=(100.0,)), cfg, cov,
            np.random.default_rng(0), max_retries=2,
        )
