"""Joint position-limit factor: Jacobian, dense-oracle parity, stream
parity, end-to-end clamp.  Companion of the velocity-limit factor; the
original GPMP2 C++ has the analogous JointLimitFactor, the reference
ships none."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import dense, factors, gn, graph
from dgpmp2_tpu.ops import tridiag
from dgpmp2_tpu.robots import PlanarArm2Link
from dgpmp2_tpu.utils.trajectory import straight_line_traj

ARM = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                     sphere_radii=(0.25,) * 6)
QMIN = (-2.0, -2.2)
QMAX = (2.0, 2.2)


def _free_sdf(n=32):
    return jnp.full((n, n), 10.0, jnp.float64)


def test_joint_limit_jacobian_matches_finite_differences():
    rng = np.random.default_rng(0)
    d = ARM.state_dim
    qmin = jnp.broadcast_to(jnp.asarray(QMIN), (3, 5, 2))
    qmax = jnp.broadcast_to(jnp.asarray(QMAX), (3, 5, 2))
    th = jnp.asarray(rng.uniform(-3.0, 3.0, (3, 5, d)))  # many violations

    def r_of(x):
        return factors.joint_limit_residual(x, qmin, qmax, ARM.dofs)[0]

    _, h = factors.joint_limit_residual(th, qmin, qmax, ARM.dofs)
    step = 1e-6
    for k in range(d):
        dv = jnp.zeros(d).at[k].set(step)
        fd = (r_of(th + dv) - r_of(th - dv)) / (2 * step)
        np.testing.assert_allclose(np.asarray(h[..., k]), -np.asarray(fd),
                                   atol=1e-5)


@pytest.mark.slow
def test_assembly_matches_dense_oracle():
    rng = np.random.default_rng(1)
    d = ARM.state_dim
    spec = graph.GraphSpec(total_time_step=6, nlinks=ARM.nlinks,
                           use_joint_limits=True)
    sdfb = jnp.broadcast_to(_free_sdf(), (2, 32, 32))
    start = jnp.asarray(rng.uniform(-3, 3, (2, d)))
    goal = jnp.asarray(rng.uniform(-3, 3, (2, d)))
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_jl=0.1, q_min=QMIN,
        q_max=QMAX, dtype=jnp.float64,
    )
    th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 6)
    res = graph.eval_residuals(spec, ARM, params, th, sdfb)
    assert float(jnp.max(res.r_jl)) > 0, "setup should violate a limit"
    diag, off, rhs = graph.assemble(spec, ARM, params, th, sdfb)
    for i in range(2):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, ARM, p_i, th[i], sdfb[i])
        atk = A.T @ K
        np.testing.assert_allclose(
            np.asarray(tridiag.btd_to_dense(diag[i], off[i])),
            np.asarray(atk @ A), rtol=1e-8, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(rhs[i]).ravel(), np.asarray(atk @ b), rtol=1e-8,
            atol=1e-8,
        )
    assert graph.linear_error(spec, ARM, params, th, sdfb).shape[-1] == spec.M


@pytest.mark.slow
def test_stream_engine_matches_standard():
    rng = np.random.default_rng(2)
    d = ARM.state_dim
    spec = graph.GraphSpec(total_time_step=8, nlinks=ARM.nlinks,
                           use_joint_limits=True)
    b = 3
    sdfb = jnp.broadcast_to(_free_sdf().astype(jnp.float32), (b, 32, 32))
    start = jnp.asarray(rng.uniform(-3, 3, (b, d)), jnp.float32)
    goal = jnp.asarray(rng.uniform(-3, 3, (b, d)), jnp.float32)
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_jl=0.1, q_min=QMIN,
        q_max=QMAX, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 8).astype(
        jnp.float32)
    r_std = gn.plan(spec, ARM, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=6, engine="standard"))
    r_str = gn.plan(spec, ARM, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=6, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_std.th), np.asarray(r_str.th),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_plan_respects_joint_limits():
    """A commanded goal beyond q_max is clamped to (near) the limit; the
    factor-off plan reaches the out-of-range command."""
    d = ARM.state_dim
    spec_on = graph.GraphSpec(total_time_step=16, nlinks=ARM.nlinks,
                              use_joint_limits=True)
    spec_off = graph.GraphSpec(total_time_step=16, nlinks=ARM.nlinks)
    sdfb = _free_sdf(64)[None]
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 0].set(2.6)  # > q_max 2.0
    kw = dict(qc_inv=np.eye(2), cost_sigma=0.5, epsilon_dist=0.2,
              k_s=0.001, k_g=0.05, dtype=jnp.float64)
    p_on = graph.default_params(spec_on, ARM, start, goal, k_jl=0.01,
                                q_min=QMIN, q_max=QMAX, **kw)
    p_off = graph.default_params(spec_off, ARM, start, goal, **kw)
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 16)
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    r_on = gn.plan(spec_on, ARM, p_on, th0, sdfb, cfg)
    r_off = gn.plan(spec_off, ARM, p_off, th0, sdfb, cfg)
    q1_on = float(jnp.max(r_on.th[0, :, 0]))
    q1_off = float(jnp.max(r_off.th[0, :, 0]))
    assert q1_off > 2.5, "factor-off reaches the out-of-range command"
    assert q1_on < 2.1, f"factor-on clamps at the limit (max q1={q1_on})"


def test_yaml_planner_api_plumbs_joint_limits():
    from dgpmp2_tpu.planner import DiffGPMP2Planner

    gp = {"Q_c_inv": np.eye(2), "K_s": 0.001, "K_g": 0.05, "K_jl": 0.01,
          "q_min": QMIN, "q_max": QMAX}
    obs = {"cost_sigma": 0.5, "epsilon_dist": 0.2}
    pp = {"dof": 2, "state_dim": 4, "total_time_sec": 10.0,
          "total_time_step": 16, "use_joint_limits": True}
    opt = {"method": "gauss_newton", "reg": 0.1, "max_iters": 50}
    env = {"x_lims": [-5.0, 5.0], "y_lims": [-5.0, 5.0]}
    planner = DiffGPMP2Planner(gp, obs, pp, opt, env, ARM, dtype=jnp.float64)
    assert planner.spec.use_joint_limits
    d = ARM.state_dim
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 0].set(2.6)
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 16)
    r = planner.plan(th0, start, goal, _free_sdf(64)[None])
    th = r.th if hasattr(r, "th") else r[0]
    assert float(jnp.max(th[0, :, 0])) < 2.1
