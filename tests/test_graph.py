"""Factor evaluation + block assembly vs the dense reference system."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import dense, factors, gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops, tridiag
from dgpmp2_tpu.robots import PointRobot2D, PointRobotXYH
from dgpmp2_tpu.utils.trajectory import straight_line_traj


def _toy_problem(rng, spec, robot, b=2, imsize=32):
    img = np.ones((imsize, imsize))
    img[10:18, 12:20] = 0.0  # one box obstacle
    res = (spec.x_lims[1] - spec.x_lims[0]) / imsize
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=res)
    sdfb = jnp.broadcast_to(sdf, (b, imsize, imsize))

    d = spec.state_dim
    start = jnp.zeros((b, d)).at[:, : spec.dof].set(
        jnp.asarray(rng.uniform(-4, -3, (b, spec.dof)))
    )
    goal = jnp.zeros((b, d)).at[:, : spec.dof].set(
        jnp.asarray(rng.uniform(3, 4, (b, spec.dof)))
    )
    params = graph.default_params(
        spec,
        robot,
        start,
        goal,
        qc_inv=np.eye(spec.dof),
        cost_sigma=0.1,
        epsilon_dist=0.4,
        k_s=0.01,
        k_g=0.01,
        k_d=0.01,
        k_v=0.01,
        v_x=1.0,
        v_y=1.0,
        dtype=jnp.float64,
    )
    th = straight_line_traj(
        start[:, : spec.dof], goal[:, : spec.dof], spec.total_time_sec, spec.total_time_step
    )
    if d > 2 * spec.dof or d != 2 * spec.dof:
        # XYH state: [x, y, th, vx, vy, om]; straight_line gives 2*dof dims.
        pass
    # Perturb so obstacle/hinge terms activate irregularly.
    th = th + 0.1 * jnp.asarray(rng.standard_normal(th.shape))
    return params, th, sdfb


def test_gp_closed_forms():
    phi = factors.gp_phi(2, 0.1, jnp.float64)
    expected = np.eye(4)
    expected[0, 2] = expected[1, 3] = 0.1
    np.testing.assert_allclose(np.asarray(phi), expected)

    qc_inv = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    qi = factors.gp_q_inv(qc_inv, 0.1)
    dt = 0.1
    np.testing.assert_allclose(np.asarray(qi[:2, :2]), 12.0 * dt**-3 * np.asarray(qc_inv))
    np.testing.assert_allclose(np.asarray(qi[:2, 2:]), -6.0 * dt**-2 * np.asarray(qc_inv))
    np.testing.assert_allclose(np.asarray(qi[2:, 2:]), 4.0 * dt**-1 * np.asarray(qc_inv))
    # Q_inv must be the exact inverse of the analytic Q (gp_factor.py:39-45).
    qc = jnp.linalg.inv(qc_inv)
    q = np.block(
        [
            [np.asarray(qc) * dt**3 / 3, np.asarray(qc) * dt**2 / 2],
            [np.asarray(qc) * dt**2 / 2, np.asarray(qc) * dt],
        ]
    )
    np.testing.assert_allclose(np.asarray(qi) @ q, np.eye(4), atol=1e-10)


def test_gp_residual_semantics():
    # "If we start at (x0, y0) with velocity v we end up near x0 + v*dt"
    # (test/test_gp_factor.py:9).
    phi = factors.gp_phi(2, 0.5, jnp.float64)
    th = jnp.asarray([[[0.0, 0.0, 1.0, 2.0], [0.5, 1.0, 1.0, 2.0]]])
    r = factors.gp_residual(th, phi)
    np.testing.assert_allclose(np.asarray(r[0, 0]), 0.0, atol=1e-12)


@pytest.mark.parametrize(
    "spec_kwargs,robot",
    [
        (dict(), PointRobot2D()),
        (dict(use_vel_limits=True), PointRobot2D()),
        (
            dict(dof=3, state_dim=6, non_holonomic=True),
            PointRobotXYH(),
        ),
    ],
)
@pytest.mark.slow
def test_block_assembly_matches_dense(spec_kwargs, robot):
    rng = np.random.default_rng(7)
    spec = graph.GraphSpec(total_time_step=12, **spec_kwargs)
    params, th, sdfb = _toy_problem(rng, spec, robot)

    diag, off, rhs = graph.assemble(spec, robot, params, th, sdfb)

    for i in range(th.shape[0]):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, robot, p_i, th[i], sdfb[i])
        atk = A.T @ K
        lam_ref = atk @ A
        rhs_ref = atk @ b
        lam_blk = tridiag.btd_to_dense(diag[i], off[i])
        np.testing.assert_allclose(
            np.asarray(lam_blk), np.asarray(lam_ref), rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(rhs[i]).ravel(), np.asarray(rhs_ref), rtol=1e-9, atol=1e-9
        )


@pytest.mark.slow
def test_gn_step_matches_dense_solve():
    rng = np.random.default_rng(8)
    spec = graph.GraphSpec(total_time_step=10)
    robot = PointRobot2D()
    params, th, sdfb = _toy_problem(rng, spec, robot)

    dth = gn.gn_step(spec, robot, params, th, sdfb, delta=0.1)
    for i in range(th.shape[0]):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, robot, p_i, th[i], sdfb[i])
        dth_ref = dense.solve_dense(A, b, K, 0.1)
        np.testing.assert_allclose(
            np.asarray(dth[i]).ravel(), np.asarray(dth_ref), rtol=1e-7, atol=1e-9
        )


def test_graph_error_matches_dense_quadratic():
    # At the linearization point the weighted nonlinear error equals the
    # dense ½ bᵀKb / M since residuals are evaluated exactly.
    rng = np.random.default_rng(9)
    spec = graph.GraphSpec(total_time_step=9)
    robot = PointRobot2D()
    params, th, sdfb = _toy_problem(rng, spec, robot)
    err = graph.graph_error(spec, robot, params, th, sdfb)
    for i in range(th.shape[0]):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, robot, p_i, th[i], sdfb[i])
        ref = 0.5 * float(b @ K @ b) / spec.M
        np.testing.assert_allclose(float(err[i]), ref, rtol=1e-9)


def test_m_dimension_bookkeeping():
    # Default config: T=100, D=4, L=1 -> M=509, N=404 (plan_layer.py:43-46).
    spec = graph.GraphSpec()
    assert spec.M == 509
    assert spec.N == 404
    spec_nh = graph.GraphSpec(dof=3, state_dim=6, non_holonomic=True)
    assert spec_nh.M == 6 * 102 + 101 + 101


def test_gp_interpolation_exact_on_cv_trajectory():
    # On a trajectory exactly consistent with the CV prior (x_{i+1} = Φ x_i),
    # the GP posterior mean interpolation reduces to the deterministic
    # rollout x(τ) = Φ(τ) x_i.
    dof, dt, nip = 2, 0.5, 4
    lam, psi = factors.gp_interp_coeffs(dof, dt, nip, jnp.float64)
    x0 = jnp.asarray([1.0, -2.0, 0.5, 0.25])
    phi = factors.gp_phi(dof, dt, jnp.float64)
    x1 = phi @ x0
    th = jnp.stack([x0, x1])[None]
    th_tau = factors.gp_interpolate(th, lam, psi)  # (1, 1, nip, 4)
    for k in range(nip):
        tau = dt * (k + 1) / (nip + 1)
        expected = factors.gp_phi(dof, tau, jnp.float64) @ x0
        np.testing.assert_allclose(
            np.asarray(th_tau[0, 0, k]), np.asarray(expected), atol=1e-10
        )


@pytest.mark.slow
def test_gp_interp_assembly_matches_dense():
    rng = np.random.default_rng(11)
    spec = graph.GraphSpec(total_time_step=8, use_gp_inter=True, num_inter=3)
    robot = PointRobot2D()
    params, th, sdfb = _toy_problem(rng, spec, robot)
    assert spec.M == 4 * 10 + 9 + 8 * 3

    diag, off, rhs = graph.assemble(spec, robot, params, th, sdfb)
    for i in range(th.shape[0]):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, robot, p_i, th[i], sdfb[i])
        atk = A.T @ K
        np.testing.assert_allclose(
            np.asarray(tridiag.btd_to_dense(diag[i], off[i])),
            np.asarray(atk @ A), rtol=1e-8, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(rhs[i]).ravel(), np.asarray(atk @ b), rtol=1e-8,
            atol=1e-8,
        )


@pytest.mark.slow
def test_gp_interp_plan_avoids_thin_obstacle():
    # A wall thinner than the state spacing: without interpolation the
    # support states can straddle it; interp checks push the path around.
    import dgpmp2_tpu.core.gn as gn_mod
    from dgpmp2_tpu.ops import sdf as sdf_ops
    from dgpmp2_tpu.utils.trajectory import straight_line_traj

    imsize = 96
    img = np.ones((imsize, imsize))
    img[:, 46:50] = 0.0          # thin full-height wall...
    img[44:52, 46:50] = 1.0      # ...with a small gap at the center
    res = 10.0 / imsize
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64), res=res)

    def run(use_inter):
        spec = graph.GraphSpec(total_time_step=12, use_gp_inter=use_inter,
                               num_inter=4)
        robot = PointRobot2D(sphere_radii=(0.2,))
        start = jnp.asarray([[-4.0, 0.3, 0.0, 0.0]], jnp.float64)
        goal = jnp.asarray([[4.0, 0.3, 0.0, 0.0]], jnp.float64)
        params = graph.default_params(
            spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.02,
            epsilon_dist=0.3, k_s=0.01, k_g=0.01, dtype=jnp.float64,
        )
        th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 12)
        result = gn_mod.plan(spec, robot, params, th0, sdf[None],
                             gn_mod.OptimConfig(reg=0.1, max_iters=50))
        # Dense collision check of the final path at fine resolution.
        t_fine = jnp.linspace(0, 1, 200)
        seg = jnp.floor(t_fine * 12).astype(int).clip(0, 11)
        frac = (t_fine * 12 - seg)[:, None]
        pts = (result.th[0, seg, :2] * (1 - frac) + result.th[0, seg + 1, :2] * frac)
        d, _ = sdf_ops.bilinear_lookup(sdf[None], pts[None], res,
                                       (-5.0, 5.0), (-5.0, 5.0))
        return float(jnp.min(d))

    clearance_with = run(True)
    assert clearance_with > 0.15  # path clears the robot radius everywhere


@pytest.mark.slow
def test_linear_error_matches_dense_b():
    rng = np.random.default_rng(13)
    spec = graph.GraphSpec(total_time_step=7, use_vel_limits=True)
    robot = PointRobot2D()
    params, th, sdfb = _toy_problem(rng, spec, robot)
    b_blk = graph.linear_error(spec, robot, params, th, sdfb)
    assert b_blk.shape == (2, spec.M)
    for i in range(2):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, robot, p_i, th[i], sdfb[i])
        np.testing.assert_allclose(np.asarray(b_blk[i]), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_vel_limits_generalize_beyond_dof2():
    """default_params accepts a length-dof sequence for velocity limits
    (reference YAMLs only name v_x/v_y) and rejects mismatched lengths."""
    spec = graph.GraphSpec(total_time_step=4, dof=3, state_dim=6,
                           use_vel_limits=True)
    start = jnp.zeros((1, 6))
    goal = jnp.ones((1, 6))
    p = graph.default_params(
        spec, PointRobot2D(), start, goal, qc_inv=np.eye(3), cost_sigma=0.1,
        epsilon_dist=0.3, k_s=0.01, k_g=0.01, k_v=0.1,
        v_x=[1.0, 2.0, 3.0],
    )
    assert p.v_lim.shape == (1, spec.num_traj_states, 3)
    np.testing.assert_allclose(np.asarray(p.v_lim[0, 0]), [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="length-dof"):
        graph.default_params(
            spec, PointRobot2D(), start, goal, qc_inv=np.eye(3),
            cost_sigma=0.1, epsilon_dist=0.3, k_s=0.01, k_g=0.01, k_v=0.1,
            v_x=1.0, v_y=1.0,
        )
