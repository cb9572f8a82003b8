"""PlanarArm2Link: FK Jacobian correctness + planning through the full stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import dense, gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops, tridiag
from dgpmp2_tpu.robots import PlanarArm2Link
from dgpmp2_tpu.utils.trajectory import straight_line_traj

ARM = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                     sphere_radii=(0.25,) * 6)


def test_fk_jacobian_matches_finite_differences():
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.uniform(-np.pi, np.pi, (3, 5, 4)))
    centers, jac = ARM.fk(th)
    assert centers.shape == (3, 5, 6, 2)
    assert jac.shape == (3, 5, 6, 2, 4)
    h = 1e-6
    for k in range(4):
        dv = jnp.zeros(4).at[k].set(h)
        cp, _ = ARM.fk(th + dv)
        cm, _ = ARM.fk(th - dv)
        fd = (cp - cm) / (2 * h)
        np.testing.assert_allclose(
            np.asarray(jac[..., k]), np.asarray(fd), atol=1e-6
        )


def test_fk_geometry():
    # Arm at q = (0, pi/2): link1 along +x, link2 along +y from the elbow.
    th = jnp.asarray([[0.0, np.pi / 2, 0.0, 0.0]])
    centers, _ = ARM.fk(th)
    c = np.asarray(centers[0])
    # Last sphere of link 1 = elbow at (2.5, 0).
    np.testing.assert_allclose(c[2], [2.5, 0.0], atol=1e-6)
    # Tip at elbow + (0, 2.0).
    np.testing.assert_allclose(c[5], [2.5, 2.0], atol=1e-6)


@pytest.mark.slow
def test_arm_assembly_matches_dense():
    rng = np.random.default_rng(1)
    spec = graph.GraphSpec(total_time_step=8, nlinks=ARM.nlinks)
    img = np.ones((32, 32))
    img[6:12, 20:26] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10 / 32)
    sdfb = jnp.broadcast_to(sdf, (2, 32, 32))
    start = jnp.asarray(rng.uniform(-1, 1, (2, 4)))
    goal = jnp.asarray(rng.uniform(-1, 1, (2, 4)))
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, dtype=jnp.float64,
    )
    th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 8)
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


@pytest.mark.slow
def test_arm_plans_around_obstacle():
    spec = graph.GraphSpec(total_time_step=24, nlinks=ARM.nlinks)
    # Obstacle in the upper-right workspace quadrant.
    img = np.ones((64, 64))
    img[14:26, 40:52] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10 / 64)
    # Sweep from arm-right to arm-up, joint space.
    start = jnp.asarray([[-0.5, 0.4, 0.0, 0.0]])
    goal = jnp.asarray([[1.6, 0.4, 0.0, 0.0]])
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.05,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, dtype=jnp.float64,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 24)
    result = gn.plan(spec, ARM, params, th0, sdf[None],
                     gn.OptimConfig(reg=0.1, max_iters=50))
    assert float(result.err_final[0]) < 0.1 * float(result.err_init[0])
    # No sphere of any interior state penetrates the safety margin much.
    r_obs = graph.obstacle_residuals(spec, ARM, params, result.th, sdf[None])
    assert float(jnp.max(r_obs[:, 1:-1])) < 0.1
    # Endpoints anchored in joint space.
    np.testing.assert_allclose(np.asarray(result.th[0, 0, :2]),
                               np.asarray(start[0, :2]), atol=1e-2)


@pytest.mark.slow
def test_arm_multistart():
    """Multi-start composes with articulated robots: seeds perturb JOINT
    trajectories (endpoint-exact), scoring runs through the arm's FK and
    per-sphere radii, and selection never does worse than restart 0."""
    from dgpmp2_tpu.core.multistart import plan_multistart

    spec = graph.GraphSpec(total_time_step=24, nlinks=ARM.nlinks)
    img = np.ones((64, 64))
    img[14:26, 40:52] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10 / 64)
    start = jnp.asarray([[-0.5, 0.4, 0.0, 0.0]])
    goal = jnp.asarray([[1.6, 0.4, 0.0, 0.0]])
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.05,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, dtype=jnp.float64,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 24)
    cfg = gn.OptimConfig(reg=0.1, max_iters=30)
    out1 = plan_multistart(spec, ARM, params, th0, sdf[None], cfg,
                           jax.random.PRNGKey(0), restarts=1)
    outk = plan_multistart(spec, ARM, params, th0, sdf[None], cfg,
                           jax.random.PRNGKey(0), restarts=6, amp=0.8)
    assert outk.th.shape == th0.shape
    assert np.all(np.isfinite(np.asarray(outk.th)))
    # restart 0 is in the full pool: selection never worse than K=1
    assert np.all(np.asarray(outk.score) <= np.asarray(out1.score) + 1e-9)
    np.testing.assert_allclose(np.asarray(outk.th[0, 0, :2]),
                               np.asarray(start[0, :2]), atol=1e-2)
    # staged pruning runs through the arm stack too
    outs = plan_multistart(spec, ARM, params, th0, sdf[None], cfg,
                           jax.random.PRNGKey(0), restarts=6, amp=0.8,
                           prune_iters=10, keep=3)
    assert np.all(np.isfinite(np.asarray(outs.th)))


# --- PlanarArmNLink ---------------------------------------------------------

from dgpmp2_tpu.robots import PlanarArmNLink, make_robot  # noqa: E402

ARM3 = PlanarArmNLink(link_lengths=(1.8, 1.4, 1.0), spheres_per_link=2,
                      sphere_radii=(0.25,))


def test_nlink_fk_jacobian_matches_autodiff():
    rng = np.random.default_rng(2)
    d = ARM3.state_dim
    th = jnp.asarray(rng.uniform(-np.pi, np.pi, (4, d)))
    centers, jac = ARM3.fk(th)
    assert centers.shape == (4, ARM3.nlinks, 2)
    assert jac.shape == (4, ARM3.nlinks, 2, d)
    jac_ad = jax.vmap(jax.jacfwd(lambda x: ARM3.fk(x)[0]))(th)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                               rtol=1e-9, atol=1e-9)


def test_nlink_matches_2link_at_n2():
    """PlanarArmNLink with two links reproduces PlanarArm2Link exactly."""
    arm2 = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                          sphere_radii=(0.25,) * 6)
    armn = PlanarArmNLink(link_lengths=(2.5, 2.0), spheres_per_link=3,
                          sphere_radii=(0.25,))
    rng = np.random.default_rng(3)
    th = jnp.asarray(rng.uniform(-np.pi, np.pi, (5, 4)))
    c2, j2 = arm2.fk(th)
    cn, jn = armn.fk(th)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(c2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jn), np.asarray(j2), atol=1e-12)


@pytest.mark.slow
def test_nlink_assembly_matches_dense():
    """Full-stack check: the D=6 (3-link) block system equals the dense
    oracle — the factor graph and solver are dimension-generic."""
    rng = np.random.default_rng(4)
    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=6, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks)
    img = np.ones((32, 32))
    img[6:12, 20:26] = 0.0
    sdfb = jnp.broadcast_to(
        sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10 / 32), (2, 32, 32)
    )
    start = jnp.asarray(rng.uniform(-1, 1, (2, d)))
    goal = jnp.asarray(rng.uniform(-1, 1, (2, d)))
    params = graph.default_params(
        spec, ARM3, start, goal, qc_inv=np.eye(ARM3.dofs), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, dtype=jnp.float64,
    )
    th = straight_line_traj(start[:, :ARM3.dofs], goal[:, :ARM3.dofs],
                            10.0, 6)
    diag, off, rhs = graph.assemble(spec, ARM3, params, th, sdfb)
    for i in range(2):
        p_i = jax.tree.map(lambda x: x[i], params)
        A, b, K = dense.assemble_dense(spec, ARM3, p_i, th[i], sdfb[i])
        atk = A.T @ K
        np.testing.assert_allclose(
            np.asarray(tridiag.btd_to_dense(diag[i], off[i])),
            np.asarray(atk @ A), rtol=1e-8, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(rhs[i]).ravel(), np.asarray(atk @ b), rtol=1e-8,
            atol=1e-8,
        )


def test_nlink_make_robot_yaml():
    r = make_robot({"type": "planar_arm", "link_lengths": [1.0, 1.0, 0.8, 0.6],
                    "spheres_per_link": 2, "sphere_radius": [0.2]})
    assert isinstance(r, PlanarArmNLink)
    assert r.dofs == 4 and r.state_dim == 8 and r.nlinks == 8
    assert r.sphere_radii == (0.2,) * 8


@pytest.mark.slow
def test_learned_planner_composes_with_arm():
    """LearnedDiffGPMP2Planner is robot-generic: the covariance head's
    out_dim follows spec.nlinks (6 body spheres here) and the eps-bounded
    learned plan runs end-to-end on the articulated arm."""
    from dgpmp2_tpu.learn.learned_planner import (
        LearnedDiffGPMP2Planner, LearnedPlannerConfig,
    )

    robot = PlanarArm2Link()
    spec = graph.GraphSpec(total_time_step=10, dof=2, state_dim=4,
                           nlinks=robot.nlinks)
    planner = LearnedDiffGPMP2Planner(
        spec, robot, gn.OptimConfig(reg=0.1, max_iters=4),
        LearnedPlannerConfig(dynamics_mode="diag_identity", learn_eps=True,
                             eps_max=0.8, static_init=(1.0, 0.1, 0.3)),
    )
    b = 2
    img = np.ones((b, 64, 64), np.float32)
    img[:, 10:20, 40:55] = 0.0
    # f32 pipeline end-to-end (under the suite's x64 mode the EDT would
    # otherwise emit f64 and poison the scan carry).
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10 / 64).astype(
        jnp.float32
    )
    start = jnp.zeros((b, 4), jnp.float32).at[:, 0].set(0.3)
    goal = jnp.zeros((b, 4), jnp.float32).at[:, 0].set(2.2).at[:, 1].set(0.8)
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.1,
        epsilon_dist=0.3, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], spec.total_time_sec,
                             spec.total_time_step).astype(jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = planner.init_variables(
        rng, planner.stack_inputs(img, sdf), th0
    )
    th, errs, _, _ = planner.plan(variables, params, th0, sdf,
                                  jnp.asarray(img), track_best=True)
    assert th.shape == th0.shape
    assert bool(jnp.all(jnp.isfinite(th)))
    assert float(errs[-1].mean()) < 0.5 * float(errs[0].mean())
