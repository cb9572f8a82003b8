"""High-level planner API: reference-config loading, step/plan semantics."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import DiffGPMP2Planner, GPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.config import load_params, spec_from_params
from dgpmp2_tpu.utils.trajectory import straight_line_traj

CFG = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu", "configs")


def _load():
    return load_params(
        os.path.join(CFG, "gpmp2_2d_params.yaml"),
        os.path.join(CFG, "robot_2d.yaml"),
        os.path.join(CFG, "env_2d_params.yaml"),
    )


def _world(imsize=48):
    img = np.ones((imsize, imsize))
    img[18:30, 18:30] = 0.0
    return sdf_ops.sdf_from_occupancy(
        jnp.asarray(img, jnp.float64), res=10.0 / imsize
    )


def test_reference_yaml_roundtrip():
    env, pp, gp, obs, opt, robot_data = _load()
    assert pp["total_time_step"] == 100
    assert float(obs["cost_sigma"]) > 0
    robot = make_robot(robot_data)
    assert robot.sphere_radii == (0.4,)
    spec = spec_from_params(pp, env, robot)
    assert spec.M == 509 and spec.N == 404


@pytest.mark.slow
def test_diff_planner_step_matches_manual_gn():
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=15)
    robot = make_robot(robot_data)
    planner = DiffGPMP2Planner(
        gp, obs, pp, opt, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]},
        robot, dtype=jnp.float64,
    )
    sdf = _world()[None]
    start = jnp.asarray([[-4.0, -4.0, 0.0, 0.0]], jnp.float64)
    goal = jnp.asarray([[4.0, 4.0, 0.0, 0.0]], jnp.float64)
    th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 15)

    dth, err, err_ext, params = planner.step(th, start, goal, sdf)
    assert dth.shape == th.shape
    # err == err_ext when covariances aren't overridden (same weights).
    np.testing.assert_allclose(np.asarray(err), np.asarray(err_ext), rtol=1e-12)

    # step with learned-style overrides changes err but not err_ext weights.
    qc = jnp.broadcast_to(2.0 * jnp.eye(2), (1, 15, 2, 2))
    dth2, err2, err_ext2, _ = planner.step(th, start, goal, sdf, qc_inv_traj=qc)
    assert not np.allclose(np.asarray(dth), np.asarray(dth2))
    np.testing.assert_allclose(np.asarray(err_ext2), np.asarray(err_ext), rtol=1e-12)


def test_plan_vs_manual_step_loop_parity():
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=12)
    opt = dict(opt, max_iters=6, tol_delta=0.0)  # fixed trip count
    robot = make_robot(robot_data)
    planner = DiffGPMP2Planner(
        gp, obs, pp, opt, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]},
        robot, dtype=jnp.float64,
    )
    sdf = _world()[None]
    start = jnp.asarray([[-4.0, -4.0, 0.0, 0.0]], jnp.float64)
    goal = jnp.asarray([[4.0, 4.0, 0.0, 0.0]], jnp.float64)
    th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 12)

    result = planner.plan(th, start, goal, sdf)
    th_manual = th
    for _ in range(6):
        dth, _, _, _ = planner.step(th_manual, start, goal, sdf)
        th_manual = th_manual + dth
    np.testing.assert_allclose(
        np.asarray(result.th), np.asarray(th_manual), rtol=1e-9, atol=1e-10
    )


@pytest.mark.slow
def test_classic_planner_step_and_error():
    """Public single-step API (reference gpmp2_planner.step semantics):
    a user-owned loop over (dtheta, err_old) converges, and planner.error
    agrees with the err_old the next step reports."""
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=12)
    robot = make_robot(robot_data)
    planner = GPMP2Planner(
        gp, obs, pp, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]}, robot
    )
    sdf = _world()
    start = jnp.asarray([-4.0, -4.0, 0.0, 0.0], jnp.float64)
    goal = jnp.asarray([4.0, 4.0, 0.0, 0.0], jnp.float64)
    th = straight_line_traj(start[None, :2], goal[None, :2], 10.0, 12)[0]
    errs = []
    for _ in range(8):
        dth, err_old = planner.step(th, start, goal, sdf, {"reg": 0.1})
        th = th + dth
        errs.append(err_old)
    # error() at the final iterate matches what the next step would report.
    err_now = planner.error(th, start, goal, sdf)
    _, err_old_next = planner.step(th, start, goal, sdf, {"reg": 0.1})
    np.testing.assert_allclose(err_now, err_old_next, rtol=1e-12)
    assert err_now < 0.05 * errs[0]
    assert np.all(np.isfinite(np.asarray(th)))


def test_classic_planner_wall_clock_budget():
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=12)
    robot = make_robot(robot_data)
    planner = GPMP2Planner(
        gp, obs, pp, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]}, robot
    )
    sdf = _world()
    start = jnp.asarray([-4.0, -4.0, 0.0, 0.0], jnp.float64)
    goal = jnp.asarray([4.0, 4.0, 0.0, 0.0], jnp.float64)
    th0 = straight_line_traj(start[None, :2], goal[None, :2], 10.0, 12)[0]
    import time

    # Warm-up: compile the step outside the timed region (compile time on a
    # loaded CI box can exceed any reasonable budget bound).
    planner.plan(
        start, goal, th0, sdf,
        {"method": "gauss_newton", "plan_time": np.inf, "max_iters": 2,
         "tol_err": 0.0, "tol_delta": 0.0, "reg": 0.1},
    )
    t0 = time.time()
    th, e0, ef, trace, iters, tt = planner.plan(
        start, goal, th0, sdf,
        {"method": "gauss_newton", "plan_time": 0.5, "max_iters": 10_000,
         "tol_err": 0.0, "tol_delta": 0.0, "reg": 0.1},
    )
    # 0.5 s budget: generous slack for dispatch overhead, but far below the
    # unbudgeted cost of 10k iterations.
    assert time.time() - t0 < 15
    assert iters < 10_000
    assert ef < e0


@pytest.mark.slow
def test_train_planner_cli_smoke(tmp_path):
    """End-to-end CLI smoke: generate -> train 1 epoch -> eval, in-process."""
    import yaml

    from dgpmp2_tpu.core import gn, graph as graph_lib
    from dgpmp2_tpu.data import generate
    from dgpmp2_tpu.learn import test_planner as tp_cli
    from dgpmp2_tpu.learn import train_planner as train_cli
    from dgpmp2_tpu.robots import PointRobot2D

    spec = graph_lib.GraphSpec(total_time_step=12)
    cov = dict(qc_inv=np.asarray(np.eye(2)), cost_sigma=0.1,
               epsilon_dist=0.3, k_s=0.01, k_g=0.01)
    generate.generate_split(
        str(tmp_path / "data" / "train"), num_envs=4, probs_per_env=2,
        family="multi_obs", im_size=32, rng=np.random.default_rng(0),
        spec=spec, robot=PointRobot2D(),
        cfg=gn.OptimConfig(reg=0.1, max_iters=15), cov_scalars=cov,
    )
    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    base = os.path.join(CFG, "gpmp2_2d_params.yaml")
    plan = yaml.safe_load(open(base))
    plan["gpmp2"]["planner_params"]["total_time_step"] = 12
    plan["gpmp2"]["optim_params"]["max_iters"] = 6
    yaml.safe_dump(plan, open(cfgdir / "plan.yaml", "w"))
    learn = yaml.safe_load(open(os.path.join(CFG, "learn_params.yaml")))
    # Non-adam optimizer: its opt-state pytree differs from adam's, so the
    # eval CLI must rebuild its restore template from this YAML (regression:
    # test_planner hard-coded an adam template and orbax restore broke).
    learn["optim"].update(batch_size=4, epochs=1, save_epoch=1, eval_epoch=5,
                          optimizer="sgd", momentum=0.9)
    learn["data"].update(im_size=32, valid_size=0.0)
    learn["dgpmp2"].update(T=2, tk=2, static_init=True)
    yaml.safe_dump(learn, open(cfgdir / "learn.yaml", "w"))

    args = [
        "--dataset_folders", str(tmp_path / "data"),
        "--out_folder", str(tmp_path / "run"),
        "--plan_param_file", str(cfgdir / "plan.yaml"),
        "--robot_param_file", os.path.join(CFG, "robot_2d.yaml"),
        "--env_param_file", os.path.join(CFG, "env_2d_params.yaml"),
        "--learn_param_file", str(cfgdir / "learn.yaml"),
    ]
    state, history = train_cli.main(args)
    assert len(history) == 1 and np.isfinite(history[0]["loss"])
    assert (tmp_path / "run" / "checkpoints").exists()

    summary = tp_cli.main([
        "--dataset_folders", str(tmp_path / "data"),
        "--model_folder", str(tmp_path / "run"),
        "--out_file", str(tmp_path / "run" / "results.yaml"),
        "--split", "all",
        "--plan_param_file", str(cfgdir / "plan.yaml"),
        "--robot_param_file", os.path.join(CFG, "robot_2d.yaml"),
        "--env_param_file", os.path.join(CFG, "env_2d_params.yaml"),
        "--learn_param_file", str(cfgdir / "learn.yaml"),
        "--batch_size", "4",
    ])
    assert 0.0 <= summary["solve_rate"] <= 1.0
    assert (tmp_path / "run" / "results.yaml").exists()


@pytest.mark.slow
def test_classic_planner_batched_matches_single():
    """plan_batch reproduces per-problem plan() results (GN and LM), with
    per-problem convergence freezing — the TPU-first upgrade of the
    reference's single-problem GPMP2Planner (gpmp2_planner.py:62)."""
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=12)
    robot = make_robot(robot_data)
    planner = GPMP2Planner(
        gp, obs, pp, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]}, robot
    )
    sdf = _world()
    starts = jnp.asarray([[-4.0, -4.0, 0, 0], [-3.5, -4.0, 0, 0]], jnp.float64)
    goals = jnp.asarray([[4.0, 4.0, 0, 0], [3.5, 4.0, 0, 0]], jnp.float64)
    th0b = straight_line_traj(starts[:, :2], goals[:, :2], 10.0, 12)
    for method in ("gauss_newton", "lm"):
        op = {"method": method, "plan_time": np.inf, "max_iters": 20,
              "tol_err": 0.0, "tol_delta": 1e-3, "reg": 0.1}
        thb, e0b, efb, _, itersb, _ = planner.plan_batch(
            starts, goals, th0b, jnp.broadcast_to(sdf, (2, *sdf.shape)), op
        )
        for i in range(2):
            th1, e01, ef1, _, it1, _ = planner.plan(
                starts[i], goals[i], th0b[i], sdf, op
            )
            np.testing.assert_allclose(np.asarray(thb[i]), np.asarray(th1),
                                       atol=1e-9)
            assert int(itersb[i]) == it1
            np.testing.assert_allclose(efb[i], ef1, rtol=1e-9)


@pytest.mark.slow
def test_classic_planner_multistart_api():
    """GPMP2Planner.plan_multistart: selection is never worse than the
    single-seed plan (restart 0 is in the pool) and returns per-problem
    winners with finite trajectories."""
    env, pp, gp, obs, opt, robot_data = _load()
    pp = dict(pp, total_time_step=12)
    robot = make_robot(robot_data)
    planner = GPMP2Planner(
        gp, obs, pp, {"x_lims": env["x_lims"], "y_lims": env["y_lims"]}, robot
    )
    sdf = _world()
    starts = jnp.asarray([[-4.0, -4.0, 0, 0], [-3.5, -4.0, 0, 0]], jnp.float64)
    goals = jnp.asarray([[4.0, 4.0, 0, 0], [3.5, 4.0, 0, 0]], jnp.float64)
    th0b = straight_line_traj(starts[:, :2], goals[:, :2], 10.0, 12)
    sdfb = jnp.broadcast_to(sdf, (2, *sdf.shape))
    op = {"method": "gauss_newton", "max_iters": 15, "reg": 0.1}
    out1 = planner.plan_multistart(starts, goals, th0b, sdfb, op, restarts=1)
    outk = planner.plan_multistart(starts, goals, th0b, sdfb, op, restarts=6,
                                   amp=2.0)
    assert outk.th.shape == th0b.shape
    assert np.all(np.isfinite(np.asarray(outk.th)))
    assert np.all(np.asarray(outk.score) <= np.asarray(out1.score) + 1e-9)
    assert np.all(np.asarray(out1.k_best) == 0)
