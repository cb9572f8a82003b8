"""Self-collision factor: Jacobian, dense-oracle parity, stream parity,
and an end-to-end plan that untangles a self-colliding seed.

The factor is beyond the reference (point robots only — SURVEY.md §2.4);
the original GPMP2 C++ library carries the analogous sphere-pair factor.
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import dense, factors, gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops, tridiag
from dgpmp2_tpu.robots import PlanarArmNLink, self_collision_pairs
from dgpmp2_tpu.utils.trajectory import straight_line_traj

ARM3 = PlanarArmNLink(link_lengths=(1.8, 1.4, 1.2), spheres_per_link=2,
                      sphere_radii=(0.25,))
PAIRS = self_collision_pairs(ARM3, eps_self=0.1)


def _free_sdf(n=32, lims=10.0):
    # obstacle-free world: large positive SDF everywhere
    return jnp.full((n, n), lims, jnp.float64)


def test_pair_construction_excludes_permanent_contacts():
    # Chain-adjacent spheres (arc separation within contact reach) must be
    # excluded; distal cross-link pairs must be present.
    assert PAIRS, "no pairs for a 3-link arm?"
    arcs = []
    acc = 0.0
    for lk in ARM3.link_lengths:
        for i in range(ARM3.spheres_per_link):
            arcs.append(acc + (i + 1) / ARM3.spheres_per_link * lk)
        acc += lk
    link_of = [k for k in range(len(ARM3.link_lengths))
               for _ in range(ARM3.spheres_per_link)]
    for i, j in PAIRS:
        assert arcs[j] - arcs[i] > 0.25 + 0.25 + 0.1
        assert link_of[i] != link_of[j], "same-link pairs are rigid"
    # first sphere vs last sphere can always fold into contact
    assert (0, ARM3.nlinks - 1) in PAIRS


def test_self_collision_jacobian_matches_finite_differences():
    rng = np.random.default_rng(0)
    d = ARM3.state_dim
    pairs = jnp.asarray(PAIRS, jnp.int32)
    eps = jnp.full((3, len(PAIRS)), 0.6)  # wide margin: most pairs active

    def r_of(th):
        centers, jac = ARM3.fk(th)
        r, _ = factors.self_collision_residual(
            centers, jac, ARM3.radii_array(th.dtype), pairs[:, 0],
            pairs[:, 1], eps)
        return r

    th = jnp.asarray(rng.uniform(-2.0, 2.0, (3, d)))
    centers, jac = ARM3.fk(th)
    _, h = factors.self_collision_residual(
        centers, jac, ARM3.radii_array(th.dtype), pairs[:, 0], pairs[:, 1],
        eps)
    hstep = 1e-6
    for k in range(d):
        dv = jnp.zeros(d).at[k].set(hstep)
        fd = (r_of(th + dv) - r_of(th - dv)) / (2 * hstep)
        # A-row convention: h = -dr/dx (residual falls as spheres separate)
        np.testing.assert_allclose(np.asarray(h[..., k]), -np.asarray(fd),
                                   atol=1e-5)


@pytest.mark.slow
def test_assembly_matches_dense_oracle():
    rng = np.random.default_rng(1)
    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=6, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks, use_self_collision=True,
                           self_pairs=PAIRS)
    sdfb = jnp.broadcast_to(_free_sdf(), (2, 32, 32))
    start = jnp.asarray(rng.uniform(-1.5, 1.5, (2, d)))
    goal = jnp.asarray(rng.uniform(-1.5, 1.5, (2, d)))
    params = graph.default_params(
        spec, ARM3, start, goal, qc_inv=np.eye(ARM3.dofs), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_self=0.1, eps_self=0.6,
        dtype=jnp.float64,
    )
    th = straight_line_traj(start[:, :ARM3.dofs], goal[:, :ARM3.dofs],
                            10.0, 6)
    res = graph.eval_residuals(spec, ARM3, params, th, sdfb)
    assert res.r_self is not None and float(jnp.max(res.r_self)) > 0, \
        "test setup should activate at least one pair hinge"
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
    # M bookkeeping: linear_error row count matches spec.M
    assert graph.linear_error(spec, ARM3, params, th, sdfb).shape[-1] == spec.M


@pytest.mark.slow
def test_stream_engine_matches_standard():
    """engine='stream' assembles the self-collision Gauss terms natively;
    dtheta parity with the standard engine."""
    rng = np.random.default_rng(2)
    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=8, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks, use_self_collision=True,
                           self_pairs=PAIRS)
    b = 3
    sdfb = jnp.broadcast_to(_free_sdf().astype(jnp.float32), (b, 32, 32))
    start = jnp.asarray(rng.uniform(-1.5, 1.5, (b, d)), jnp.float32)
    goal = jnp.asarray(rng.uniform(-1.5, 1.5, (b, d)), jnp.float32)
    params = graph.default_params(
        spec, ARM3, start, goal, qc_inv=np.eye(ARM3.dofs), cost_sigma=0.2,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_self=0.1, eps_self=0.6,
        dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :ARM3.dofs], goal[:, :ARM3.dofs],
                             10.0, 8).astype(jnp.float32)
    r_std = gn.plan(spec, ARM3, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=6, engine="standard"))
    r_str = gn.plan(spec, ARM3, params, th0, sdfb,
                    gn.OptimConfig(reg=0.1, max_iters=6, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_std.th), np.asarray(r_str.th),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_self_collision_factor_overrides_infeasible_command():
    """Safety-override semantics: commanded goal config is itself tangled
    (a joint-linear path between self-clear configs of an open planar
    chain essentially never self-collides — verified by random search —
    so the interesting case is an infeasible command).  Without the
    factor the plan drives straight into the tangle; with it the arm
    stops short of the commanded fold and every pair keeps clearance."""
    d = ARM3.state_dim
    base = dict(total_time_step=20, dof=ARM3.dofs, state_dim=d,
                nlinks=ARM3.nlinks)
    spec_on = graph.GraphSpec(use_self_collision=True, self_pairs=PAIRS,
                              **base)
    spec_off = graph.GraphSpec(**base)
    sdfb = _free_sdf(64)[None]
    # Start extended; goal folds link2 back over link1's first sphere —
    # a SINGLE shallow fold whose penalty landscape descends monotonically
    # to a clear config (unfold q2).  A doubly-folded command
    # (q2=q3=2.9) instead creates a local-minimum trap — unfolding must
    # sweep the tip through deeper collision — which a local hinge
    # planner cannot escape (same basin behavior as workspace obstacles;
    # multi-start is the remedy there too).
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 1].set(2.7)
    kw = dict(qc_inv=np.eye(ARM3.dofs), cost_sigma=0.5, epsilon_dist=0.2,
              k_s=0.001, k_g=0.05, dtype=jnp.float64)
    params_on = graph.default_params(spec_on, ARM3, start, goal,
                                     k_self=0.01, eps_self=0.05, **kw)
    params_off = graph.default_params(spec_off, ARM3, start, goal, **kw)
    th0 = straight_line_traj(start[:, :ARM3.dofs], goal[:, :ARM3.dofs],
                             10.0, 20)
    cfg = gn.OptimConfig(reg=0.1, max_iters=60)
    r_on = gn.plan(spec_on, ARM3, params_on, th0, sdfb, cfg)
    r_off = gn.plan(spec_off, ARM3, params_off, th0, sdfb, cfg)

    pairs = jnp.asarray(PAIRS, jnp.int32)

    def worst_penetration(th):
        centers, _ = ARM3.fk(th)
        ci = centers[..., pairs[:, 0], :]
        cj = centers[..., pairs[:, 1], :]
        dist = jnp.sqrt(jnp.sum((ci - cj) ** 2, -1))
        return float(jnp.max(0.5 - dist))  # r_i + r_j = 0.5

    pen_off = worst_penetration(r_off.th)
    pen_on = worst_penetration(r_on.th)
    assert pen_off > 0.05, \
        f"without the factor the plan reaches the tangle ({pen_off})"
    # factor-off reaches the commanded goal
    np.testing.assert_allclose(np.asarray(r_off.th[0, -1, :ARM3.dofs]),
                               np.asarray(goal[0, :ARM3.dofs]), atol=0.05)
    assert pen_on < 0.0, f"with the factor every pair clears ({pen_on})"
    # and the arm stops short of the infeasible command instead
    gap = float(jnp.linalg.norm(r_on.th[0, -1, :ARM3.dofs]
                                - goal[0, :ARM3.dofs]))
    assert gap > 0.1


def test_yaml_planner_api_plumbs_self_collision():
    """The reference-schema planner API accepts the extension keys:
    planner_params.use_self_collision / gp_params.K_self."""
    from dgpmp2_tpu.planner import DiffGPMP2Planner

    gp = {"Q_c_inv": np.eye(ARM3.dofs), "K_s": 0.001, "K_g": 0.05,
          "K_self": 0.01}
    obs = {"cost_sigma": 0.5, "epsilon_dist": 0.2,
           "self_collision_eps": 0.05}
    pp = {"dof": ARM3.dofs, "state_dim": ARM3.state_dim,
          "total_time_sec": 10.0, "total_time_step": 20,
          "use_self_collision": True, "self_collision_eps": 0.1}
    opt = {"method": "gauss_newton", "reg": 0.1, "max_iters": 40}
    env = {"x_lims": [-5.0, 5.0], "y_lims": [-5.0, 5.0]}
    planner = DiffGPMP2Planner(gp, obs, pp, opt, env, ARM3,
                               dtype=jnp.float64)
    assert planner.spec.use_self_collision
    assert planner.spec.self_pairs == PAIRS
    d = ARM3.state_dim
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 1].set(2.7)
    th0 = straight_line_traj(start[:, :ARM3.dofs], goal[:, :ARM3.dofs],
                             10.0, 20)
    r = planner.plan(th0, start, goal, _free_sdf(64)[None])
    th = r.th if hasattr(r, "th") else r[0]
    pairs = jnp.asarray(PAIRS, jnp.int32)
    centers, _ = ARM3.fk(th)
    dist = jnp.sqrt(jnp.sum(
        (centers[..., pairs[:, 0], :] - centers[..., pairs[:, 1], :]) ** 2,
        -1))
    assert float(jnp.min(dist)) > 0.5  # every pair clears body contact


def test_multistart_selection_penalizes_self_collision():
    """score_candidates covers body-pair penetration when the factor is
    configured: a smooth-but-tangled candidate loses to a clear one."""
    from dgpmp2_tpu.core.multistart import score_candidates

    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=10, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks, use_self_collision=True,
                           self_pairs=PAIRS)
    spec_plain = graph.GraphSpec(total_time_step=10, dof=ARM3.dofs,
                                 state_dim=d, nlinks=ARM3.nlinks)
    sdfb = jnp.broadcast_to(_free_sdf(), (2, 32, 32))
    # Candidate 0: extended the whole time (self-clear, zero velocity).
    th_clear = jnp.zeros((11, d), jnp.float64)
    # Candidate 1: held at the tangled fold the whole time (also zero
    # velocity — smoothness identical).
    th_fold = jnp.zeros((11, d), jnp.float64).at[:, 1].set(2.7)
    th = jnp.stack([th_clear, th_fold])
    score, contact = score_candidates(spec, ARM3, th, sdfb)
    assert float(contact[0]) == 0.0
    assert float(contact[1]) > 0.0, "tangled candidate must register contact"
    assert float(score[0]) < float(score[1])
    # Without the factor configured the tangle is invisible to selection.
    _, contact_plain = score_candidates(spec_plain, ARM3, th, sdfb)
    assert float(contact_plain[1]) == 0.0


def test_eval_metrics_cover_self_collision():
    """evaluate_batch reports body-pair contact when the factor spec is
    configured; the learned-planner stack plans under the same spec."""
    from dgpmp2_tpu.learn.eval import evaluate_batch, summarize

    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=10, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks, use_self_collision=True,
                           self_pairs=PAIRS)
    sdfb = jnp.broadcast_to(_free_sdf(), (2, 32, 32))
    start = jnp.zeros((2, d), jnp.float64)
    goal = jnp.zeros((2, d), jnp.float64)
    params = graph.default_params(
        spec, ARM3, start, goal, qc_inv=np.eye(ARM3.dofs), cost_sigma=0.5,
        epsilon_dist=0.2, k_s=0.01, k_g=0.01, k_self=0.05, eps_self=0.05,
        dtype=jnp.float64)
    # problem 0: extended (clear); problem 1: held at the tangled fold
    th = jnp.zeros((2, 11, d), jnp.float64).at[1, :, 1].set(2.7)
    m = evaluate_batch(spec, ARM3, params, th, None, sdfb)
    assert not bool(m["in_self_contact"][0])
    assert bool(m["in_self_contact"][1])
    assert float(m["max_self_penetration"][1]) > 0.05
    s = summarize(m)
    assert s["self_contact_free_rate"] == 0.5


def test_shipped_arm_config_builds_full_factor_stack():
    """configs/gpmp2_arm_params.yaml + robot_arm.yaml wire self-collision
    and joint limits through the YAML planner end to end."""
    import os

    from dgpmp2_tpu.planner import DiffGPMP2Planner
    from dgpmp2_tpu.utils.config import load_params

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu",
                           "configs")
    env, pp, gp, obs, opt, robot_data = load_params(
        os.path.join(cfg_dir, "gpmp2_arm_params.yaml"),
        os.path.join(cfg_dir, "robot_arm.yaml"),
        os.path.join(cfg_dir, "env_2d_params.yaml"),
    )
    from dgpmp2_tpu.robots import make_robot

    robot = make_robot(robot_data)
    pp = dict(pp, total_time_step=12)
    opt = dict(opt, max_iters=20)
    planner = DiffGPMP2Planner(
        gp, obs, pp, opt,
        {"x_lims": env["x_lims"], "y_lims": env["y_lims"]}, robot,
        dtype=jnp.float64)
    assert planner.spec.use_self_collision and planner.spec.self_pairs
    assert planner.spec.use_joint_limits
    d = robot.state_dim
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 0].set(1.2)
    th0 = straight_line_traj(start[:, :2], goal[:, :2],
                             pp["total_time_sec"], 12)
    r = planner.plan(th0, start, goal, _free_sdf(64)[None])
    th = r.th if hasattr(r, "th") else r[0]
    assert bool(jnp.all(jnp.isfinite(th)))


@pytest.mark.slow
def test_track_best_excludes_self_colliding_iterates():
    """gn.plan(track_best=True)'s best-iterate criterion must treat
    self-penetration as a collision (consistent with multistart's
    score_candidates): seed the plan with a tangled trajectory so early
    iterates self-collide, then assert the tracked best is self-clear."""
    d = ARM3.state_dim
    spec = graph.GraphSpec(total_time_step=10, dof=ARM3.dofs, state_dim=d,
                           nlinks=ARM3.nlinks, use_self_collision=True,
                           self_pairs=PAIRS)
    sdfb = jnp.broadcast_to(_free_sdf(), (1, 32, 32))
    start = jnp.zeros((1, d), jnp.float64)
    goal = jnp.zeros((1, d), jnp.float64).at[0, 0].set(1.0)
    params = graph.default_params(
        spec, ARM3, start, goal, qc_inv=np.eye(ARM3.dofs), cost_sigma=0.5,
        epsilon_dist=0.2, k_s=0.001, k_g=0.001, k_self=0.02, eps_self=0.05,
        dtype=jnp.float64)
    # Tangled seed: elbow folded to 2.7 rad on interior states.
    th0 = jnp.zeros((1, 11, d), jnp.float64).at[0, 1:-1, 1].set(2.7)
    cfg = gn.OptimConfig(reg=0.5, max_iters=12, tol_delta=0.0)
    res = gn.plan(spec, ARM3, params, th0, sdfb, cfg, track_best=True)

    def self_pen(th):
        pairs = jnp.asarray(PAIRS, jnp.int32)
        centers, _ = ARM3.fk(th)
        radii = ARM3.radii_array(th.dtype)
        dist = jnp.sqrt(jnp.sum(
            (centers[..., pairs[:, 0], :] - centers[..., pairs[:, 1], :]) ** 2,
            axis=-1))
        return jnp.max(jnp.maximum(
            radii[pairs[:, 0]] + radii[pairs[:, 1]] - dist, 0.0)[:, 1:-1])

    assert float(self_pen(th0)) > 0.0, "seed must start tangled"
    assert bool(res.best_valid[0])
    assert float(self_pen(res.best_th)) == 0.0
