"""Workspace end-effector goal factor: task-space arm targets without
explicit IK.  Jacobian, dense-oracle parity, stream parity, end-to-end
reach."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import dense, factors, gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops, tridiag
from dgpmp2_tpu.robots import PlanarArm2Link
from dgpmp2_tpu.utils.trajectory import straight_line_traj

ARM = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                     sphere_radii=(0.25,) * 6)


def _free_sdf(n=32):
    return jnp.full((n, n), 10.0, jnp.float64)


def test_workspace_goal_jacobian_is_tip_fk_jacobian():
    rng = np.random.default_rng(0)
    th_end = jnp.asarray(rng.uniform(-2, 2, (3, ARM.state_dim)))
    centers, jac = ARM.fk(th_end)
    p_goal = jnp.asarray(rng.uniform(-3, 3, (3, 2)))
    r, h = factors.workspace_goal_residual(centers, jac, p_goal)

    def r_of(x):
        c, _ = ARM.fk(x)
        return p_goal - c[..., -1, :]

    step = 1e-6
    for k in range(ARM.state_dim):
        dv = jnp.zeros(ARM.state_dim).at[k].set(step)
        fd = (r_of(th_end + dv) - r_of(th_end - dv)) / (2 * step)
        np.testing.assert_allclose(np.asarray(h[..., k]), -np.asarray(fd),
                                   atol=1e-5)


@pytest.mark.slow
def test_assembly_matches_dense_oracle():
    rng = np.random.default_rng(1)
    d = ARM.state_dim
    spec = graph.GraphSpec(total_time_step=6, nlinks=ARM.nlinks,
                           use_workspace_goal=True)
    sdfb = jnp.broadcast_to(_free_sdf(), (2, 32, 32))
    start = jnp.asarray(rng.uniform(-1.5, 1.5, (2, d)))
    goal = jnp.asarray(rng.uniform(-1.5, 1.5, (2, d)))
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_wg=0.05,
        workspace_goal=np.array([2.0, 1.5]), dtype=jnp.float64,
    )
    th = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 6)
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
                           use_workspace_goal=True)
    b = 3
    sdfb = jnp.broadcast_to(_free_sdf().astype(jnp.float32), (b, 32, 32))
    start = jnp.asarray(rng.uniform(-1.5, 1.5, (b, d)), jnp.float32)
    goal = jnp.asarray(rng.uniform(-1.5, 1.5, (b, d)), jnp.float32)
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.5, k_wg=0.05,
        workspace_goal=np.array([2.0, 1.5], np.float32), dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 8).astype(
        jnp.float32)
    # Single-step parity isolates the assembly (multi-iteration f32 GN on
    # this weakly anchored nonconvex problem amplifies ulp differences
    # chaotically — the same caveat PERFORMANCE.md documents).
    r_std = gn.plan(spec, ARM, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=1, engine="standard"))
    r_str = gn.plan(spec, ARM, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=1, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_std.th), np.asarray(r_str.th),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_arm_reaches_workspace_target_without_ik():
    """Plan to a workspace point: joint goal prior weak (no IK supplied),
    the tip lands on the target; per-problem targets batch."""
    d = ARM.state_dim
    spec = graph.GraphSpec(total_time_step=16, nlinks=ARM.nlinks,
                           use_workspace_goal=True)
    b = 2
    sdfb = jnp.broadcast_to(_free_sdf(64), (b, 64, 64))
    start = jnp.zeros((b, d), jnp.float64).at[:, 0].set(0.2)
    goal = start  # joint-space goal unused: weak prior below
    targets = jnp.asarray([[2.0, 2.5], [-1.0, 3.0]], jnp.float64)
    params = graph.default_params(
        spec, ARM, start, goal, qc_inv=np.eye(2), cost_sigma=0.5,
        epsilon_dist=0.2, k_s=0.001, k_g=100.0,  # goal prior ~off
        k_wg=0.01, workspace_goal=targets, dtype=jnp.float64,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], 10.0, 16)
    r = gn.plan(spec, ARM, params, th0, sdfb,
                gn.OptimConfig(reg=0.1, max_iters=60))
    centers, _ = ARM.fk(r.th)
    tips = centers[:, -1, -1, :]  # terminal-state tip per problem
    err = np.linalg.norm(np.asarray(tips - targets), axis=-1)
    assert (err < 0.05).all(), f"tip misses workspace targets: {err}"
    # start still anchored in joint space
    np.testing.assert_allclose(np.asarray(r.th[:, 0, :2]),
                               np.asarray(start[:, :2]), atol=1e-2)


@pytest.mark.slow
def test_multistart_selection_is_goal_aware():
    """Under a workspace-goal spec, multistart scores tip-target
    attainment: a smooth unmoved candidate loses to one that reaches."""
    from dgpmp2_tpu.core.multistart import plan_multistart, score_candidates

    d = ARM.state_dim
    spec = graph.GraphSpec(total_time_step=12, nlinks=ARM.nlinks,
                           use_workspace_goal=True)
    sdfb = jnp.broadcast_to(_free_sdf(), (1, 32, 32))
    start = jnp.zeros((1, d), jnp.float64).at[0, 0].set(0.2)
    target = jnp.asarray([[2.0, 2.5]], jnp.float64)
    params = graph.default_params(
        spec, ARM, start, start, qc_inv=np.eye(2), cost_sigma=0.5,
        epsilon_dist=0.2, k_s=0.001, k_g=100.0, k_wg=0.01,
        workspace_goal=target, dtype=jnp.float64,
    )
    # Direct scoring check: unmoved (smooth) vs reaching candidate.
    th_stay = jnp.broadcast_to(
        jnp.concatenate([start[0, :2], jnp.zeros(2)])[None, :], (13, d)
    )[None]
    # A config whose tip is near the target (solved separately offline):
    # use GN itself to produce it.
    r0 = gn.plan(spec, ARM, params,
                 straight_line_traj(start[:, :2], start[:, :2], 10.0, 12),
                 sdfb, gn.OptimConfig(reg=0.1, max_iters=40))
    both = jnp.concatenate([th_stay, r0.th], axis=0)
    score, _ = score_candidates(spec, ARM, both,
                                jnp.tile(sdfb, (2, 1, 1)),
                                params=graph.GraphParams(
                                    **{**params.__dict__,
                                       "p_goal": jnp.tile(params.p_goal,
                                                          (2, 1)),
                                       "wg_inv": jnp.tile(params.wg_inv,
                                                          (2, 1, 1))}))
    assert float(score[1]) < float(score[0])

    # End-to-end: plan_multistart returns a reaching trajectory.
    res = plan_multistart(spec, ARM, params,
                          straight_line_traj(start[:, :2], start[:, :2],
                                             10.0, 12),
                          sdfb, gn.OptimConfig(reg=0.1, max_iters=40),
                          jax.random.PRNGKey(0), restarts=4, amp=0.6)
    centers, _ = ARM.fk(res.th)
    tip = np.asarray(centers[0, -1, -1])
    assert np.linalg.norm(tip - np.asarray(target[0])) < 0.1

    # Selection without params under a wg spec is refused loudly.
    import pytest
    with pytest.raises(ValueError):
        score_candidates(spec, ARM, both, jnp.tile(sdfb, (2, 1, 1)))
