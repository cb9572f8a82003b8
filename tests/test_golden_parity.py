"""Golden numerical parity vs the actual PyTorch reference.

``tests/goldens/golden_ref_step.npz`` holds per-iteration
``(th, dtheta, err, err_ext)`` recorded from the reference's batched GN step
(``DiffGPMP2Planner.step`` → ``PlanLayer.forward``,
/root/reference/diff_gpmp2/gpmp2/plan_layer.py:87-234) running in float64 on
three canned ``simple_2d`` envs with the shipped ``gpmp2_2d_params.yaml``
config (extraction harness: tools/make_golden.py).

These tests run the JAX planner open-loop from the same inputs on the CPU
float64 path and assert ≤1e-5 agreement per iteration for 12 GN iterations —
the BASELINE.json north-star parity claim.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import PointRobot2D


@pytest.fixture(scope="module", autouse=True)
def _reference_oob_mode():
    """Bit-faithful parity needs the reference's de-facto out-of-bounds
    lookup semantics (clamped-index weights, no MAX_D mask — see
    ops/sdf.py:set_oob_mode); envs 1 and 12 overshoot the world limits
    during early GN iterations.  The planner fixture below is constructed
    (and therefore traced) entirely inside this mode."""
    sdf_ops.set_oob_mode("reference")
    yield
    sdf_ops.set_oob_mode("intended")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_ref_step.npz")
TOL = 1e-5


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN, allow_pickle=False)


@pytest.fixture(scope="module")
def planner(golden):
    gp_params = {
        "Q_c_inv": golden["qc_inv"],
        "K_s": golden["k_s"],
        "K_g": golden["k_g"],
    }
    obs_params = {
        "cost_sigma": float(golden["cost_sigma"]),
        "epsilon_dist": float(golden["epsilon_dist"]),
    }
    planner_params = {
        "dof": 2,
        "state_dim": 4,
        "total_time_sec": float(golden["total_time_sec"]),
        "total_time_step": int(golden["total_time_step"]),
    }
    optim_params = {
        "method": "gauss_newton",
        "reg": float(golden["reg"]),
        "max_iters": 100,
        "tol_err": 1e-3,
        "tol_delta": 1e-4,
    }
    env_params = {
        "x_lims": golden["x_lims"].tolist(),
        "y_lims": golden["y_lims"].tolist(),
    }
    return DiffGPMP2Planner(
        gp_params,
        obs_params,
        planner_params,
        optim_params,
        env_params,
        PointRobot2D(sphere_radii=(float(golden["sphere_radius"]),)),
        dtype=jnp.float64,
    )


@pytest.mark.parametrize("env", ["1", "5", "12"])
def test_gradient_matches_torch_reference(golden, planner, env):
    """d(Σ th_K²)/d(th_0) through K unrolled GN steps matches the torch
    reference's autograd to ≤1e-5 relative — the differentiable-planner
    property itself, not just the forward values."""
    import jax

    sdf = jnp.asarray(golden[f"sdf_{env}"])[None]
    start = jnp.asarray(golden[f"start_{env}"])
    goal = jnp.asarray(golden[f"goal_{env}"])
    th0 = jnp.asarray(golden[f"th_{env}"][0])
    k = int(golden["grad_iters"])
    grad_ref = golden[f"grad_th0_{env}"]

    def loss(th, s):
        for _ in range(k):
            dth, _, _, _ = planner.step(th, start, goal, s)
            th = th + dth
        return jnp.sum(th**2)

    g_th, g_sdf = jax.grad(loss, argnums=(0, 1))(th0, sdf)
    scale = np.abs(grad_ref).max()
    np.testing.assert_allclose(np.asarray(g_th), grad_ref,
                               atol=1e-5 * scale, rtol=0,
                               err_msg=f"env {env}: d loss/d th0")
    # d loss/d SDF: exercises the bilinear-lookup adjoint (custom VJP).
    grad_sdf_ref = golden[f"grad_sdf_{env}"]
    scale_s = np.abs(grad_sdf_ref).max()
    np.testing.assert_allclose(np.asarray(g_sdf)[0], grad_sdf_ref[0],
                               atol=1e-5 * scale_s, rtol=0,
                               err_msg=f"env {env}: d loss/d sdf")


@pytest.mark.parametrize("env", ["1", "5", "12"])
def test_step_matches_torch_reference(golden, planner, env):
    """Open-loop GN iterations track the reference to ≤1e-5 (th, dtheta,
    err, err_ext) — not a self-consistency check: the right-hand side is the
    real torch reference's output."""
    sdf = jnp.asarray(golden[f"sdf_{env}"])[None]
    start = jnp.asarray(golden[f"start_{env}"])
    goal = jnp.asarray(golden[f"goal_{env}"])
    th_ref = golden[f"th_{env}"]  # (K+1, 1, T+1, 4)
    dtheta_ref = golden[f"dtheta_{env}"]  # (K, 1, T+1, 4)
    err_ref = golden[f"err_{env}"]  # (K, 1)
    err_ext_ref = golden[f"err_ext_{env}"]

    th = jnp.asarray(th_ref[0])
    n_iters = dtheta_ref.shape[0]
    assert n_iters >= 10
    for i in range(n_iters):
        dth, err, err_ext, _ = planner.step(th, start, goal, sdf)
        np.testing.assert_allclose(
            np.asarray(dth), dtheta_ref[i], atol=TOL, rtol=0,
            err_msg=f"env {env} iter {i}: dtheta",
        )
        np.testing.assert_allclose(
            np.asarray(err).reshape(-1), err_ref[i], atol=TOL, rtol=0,
            err_msg=f"env {env} iter {i}: err",
        )
        np.testing.assert_allclose(
            np.asarray(err_ext).reshape(-1), err_ext_ref[i], atol=TOL, rtol=0,
            err_msg=f"env {env} iter {i}: err_ext",
        )
        th = th + dth
        np.testing.assert_allclose(
            np.asarray(th), th_ref[i + 1], atol=TOL, rtol=0,
            err_msg=f"env {env} iter {i}: th",
        )
