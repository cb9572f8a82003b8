"""Batched multi-start planning (core/multistart.py)."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.core.multistart import (
    MultistartResult, perturbed_inits, plan_multistart, score_candidates,
    select_best,
)
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

SPEC = graph.GraphSpec(total_time_step=16)
ROBOT = PointRobot2D()
COV = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.3,
           k_s=0.01, k_g=0.01)


def _blocked_world(imsize=64, n=26, seed=5):
    """Forest-like scattered clutter: enough small boxes that the straight
    diagonal seed's Gauss-Newton basin stays in contact for some problems
    (the regime where restarts matter; single walls are evaded between
    support states)."""
    r = np.random.default_rng(seed)
    img = np.ones((imsize, imsize))
    for _ in range(n):
        cy, cx = r.integers(8, 56, 2)
        s = r.integers(3, 6)
        img[cy:cy + s, cx:cx + s] = 0.0
    return sdf_ops.sdf_from_occupancy(
        jnp.asarray(img, jnp.float64), res=10.0 / imsize
    )


def _problem(b=3):
    rng = np.random.default_rng(0)
    start = jnp.zeros((b, 4), jnp.float64).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.4, -3.8, (b, 2))))
    goal = jnp.zeros((b, 4), jnp.float64).at[:, :2].set(
        jnp.asarray(rng.uniform(3.8, 4.4, (b, 2))))
    params = graph.default_params(SPEC, ROBOT, start, goal, **COV,
                                  dtype=jnp.float64)
    th0 = straight_line_traj(start[:, :2], goal[:, :2],
                             SPEC.total_time_sec, SPEC.total_time_step)
    sdf = jnp.broadcast_to(_blocked_world(), (b, 64, 64))
    return params, th0, sdf


@pytest.mark.slow
def test_perturbed_inits_base_and_endpoints():
    """Restart 0 is the unperturbed base; every restart keeps both endpoint
    states (position AND velocity) exactly."""
    _, th0, _ = _problem()
    seeds = perturbed_inits(th0, jax.random.PRNGKey(1), 6, 2.0,
                            SPEC.total_time_sec)
    assert seeds.shape == (6, *th0.shape)
    np.testing.assert_allclose(np.asarray(seeds[0]), np.asarray(th0))
    # FULL endpoint states: positions and velocities both exact.
    np.testing.assert_allclose(np.asarray(seeds[:, :, 0, :]),
                               np.asarray(jnp.broadcast_to(th0[:, 0, :],
                                                           (6, *th0[:, 0, :].shape))))
    np.testing.assert_allclose(np.asarray(seeds[:, :, -1, :]),
                               np.asarray(jnp.broadcast_to(th0[:, -1, :],
                                                           (6, *th0[:, -1, :].shape))))
    # restarts differ from the base in the interior
    assert float(jnp.max(jnp.abs(seeds[1] - th0))) > 0.1


@pytest.mark.slow
def test_plan_multistart_k1_matches_plan():
    """restarts=1 is exactly gn.plan(track_best=True).best_th."""
    params, th0, sdf = _problem()
    cfg = gn.OptimConfig(reg=0.1, max_iters=10)
    out = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                          jax.random.PRNGKey(0), restarts=1)
    ref = gn.plan(SPEC, ROBOT, params, th0, sdf, cfg, track_best=True).best_th
    np.testing.assert_allclose(np.asarray(out.th), np.asarray(ref),
                               atol=1e-12)
    assert np.all(np.asarray(out.k_best) == 0)


@pytest.mark.slow
def test_select_best_picks_argmin_per_problem():
    """select_best on a hand-tiled (K·B) pool: the winner per problem is
    the candidate score_candidates ranks lowest, and contact_free mirrors
    its contact depth.  This is the composition contract external planners
    (learned covariances, InitNet seeds) rely on."""
    params, th0, sdf = _problem(b=2)
    k, b = 4, 2
    seeds = perturbed_inits(th0, jax.random.PRNGKey(7), k, 2.5,
                            SPEC.total_time_sec)
    th = seeds.reshape(k * b, *seeds.shape[2:])
    sdf_t = jnp.tile(sdf, (k, 1, 1))
    out = select_best(SPEC, ROBOT, th, sdf_t, k, b)
    score, contact = score_candidates(SPEC, ROBOT, th, sdf_t)
    score_kb = np.asarray(score).reshape(k, b)
    expect_k = np.argmin(score_kb, axis=0)
    np.testing.assert_array_equal(np.asarray(out.k_best), expect_k)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(out.th[i]), np.asarray(seeds[expect_k[i], i]))
        assert bool(out.contact_free[i]) == (
            float(np.asarray(contact).reshape(k, b)[expect_k[i], i]) <= 0.0)


def test_score_candidates_nan_candidate_never_wins():
    """A diverged (NaN) candidate scores +inf and select_best picks the
    valid one — NaNs must not propagate through argmin/top_k."""
    params, th0, sdf = _problem(b=2)
    seeds = perturbed_inits(th0, jax.random.PRNGKey(2), 2, 1.0,
                            SPEC.total_time_sec)
    seeds = seeds.at[1].set(jnp.nan)  # restart 1 "diverged"
    th = seeds.reshape(4, *seeds.shape[2:])
    sdf_t = jnp.tile(sdf, (2, 1, 1))
    score, _ = score_candidates(SPEC, ROBOT, th, sdf_t)
    assert np.all(np.isfinite(np.asarray(score)[:2]))
    assert np.all(np.isposinf(np.asarray(score)[2:]))
    out = select_best(SPEC, ROBOT, th, sdf_t, 2, 2)
    assert np.all(np.asarray(out.k_best) == 0)
    assert np.all(np.isfinite(np.asarray(out.th)))


@pytest.mark.slow
def test_score_candidates_gp_inter_catches_threading():
    """With spec.use_gp_inter, scoring checks the GP-interpolated states:
    a trajectory whose support states straddle a thin wall scores clean
    under the support-only spec but contacting under the dense spec."""
    spec_plain = graph.GraphSpec(total_time_step=7)
    spec_dense = graph.GraphSpec(total_time_step=7, use_gp_inter=True,
                                 num_inter=3)
    # Thin vertical wall (one pixel, ~0.16 m) at x ~ -0.08, full height.
    imsize = 64
    img = np.ones((imsize, imsize))
    img[:, 31:32] = 0.0
    sdf1 = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64),
                                      res=10.0 / imsize)
    # 8 support states at wall_center ± 0.5, ±1.5, ... (0.42 m clearance >
    # the 0.4 robot radius, and no state on the wall); the
    # GP-interpolated states between the inner pair land on it.
    xs = -0.078 + jnp.linspace(-3.5, 3.5, 8)
    th = jnp.zeros((1, 8, 4), jnp.float64)
    th = th.at[0, :, 0].set(xs).at[0, :, 2].set(1.0)
    sdf_b = sdf1[None]
    _, contact_plain = score_candidates(spec_plain, ROBOT, th, sdf_b)
    _, contact_dense = score_candidates(spec_dense, ROBOT, th, sdf_b)
    assert float(contact_plain[0]) == 0.0
    assert float(contact_dense[0]) > 0.0


@pytest.mark.slow
def test_plan_multistart_staged_pruning():
    """Staged pruning (plan all K for a few iters, finish only the top
    `keep`): on the blocked world it preserves the multi-start win at a
    fraction of the full-pool cost, and validates its arguments."""
    import pytest

    params, th0, sdf = _problem()
    cfg = gn.OptimConfig(reg=0.1, max_iters=25)
    run = jax.jit(
        lambda p, th, s, rng, k, pi, kp: plan_multistart(
            SPEC, ROBOT, p, th, s, cfg, rng, restarts=k, amp=2.0,
            prune_iters=pi, keep=kp,
        ),
        static_argnames=("k", "pi", "kp"),
    )
    full = run(params, th0, sdf, jax.random.PRNGKey(3), 12, 0, 0)
    staged = run(params, th0, sdf, jax.random.PRNGKey(3), 12, 6, 3)
    base = run(params, th0, sdf, jax.random.PRNGKey(3), 1, 0, 0)
    assert np.all(np.isfinite(np.asarray(staged.th)))
    # same seeds: staged keeps the full pool's contact-free coverage here
    assert int(np.sum(np.asarray(staged.contact_free))) >= int(
        np.sum(np.asarray(base.contact_free)))
    assert int(np.sum(np.asarray(staged.contact_free))) == int(
        np.sum(np.asarray(full.contact_free)))
    # keep == restarts (no pruning pressure): pool is a superset of every
    # candidate's best iterate, so the score can only match or improve
    all_kept = run(params, th0, sdf, jax.random.PRNGKey(3), 12, 6, 12)
    assert np.all(np.asarray(all_kept.score)
                  <= np.asarray(full.score) + 1e-9)
    with pytest.raises(ValueError):
        plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                        jax.random.PRNGKey(0), restarts=4, prune_iters=30,
                        keep=2)
    with pytest.raises(ValueError):
        plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                        jax.random.PRNGKey(0), restarts=4, prune_iters=5,
                        keep=9)


def test_plan_multistart_improves_on_clutter():
    """On the blocked world, multi-start finds contact-free trajectories
    where the straight seed's basin does not, and never selects a worse
    candidate than restart 0 (the K=1 answer is always in the pool)."""
    params, th0, sdf = _problem()
    cfg = gn.OptimConfig(reg=0.1, max_iters=25)
    run = jax.jit(
        lambda p, th, s, rng, k: plan_multistart(
            SPEC, ROBOT, p, th, s, cfg, rng, restarts=k, amp=2.0
        ),
        static_argnames="k",
    )
    out1 = run(params, th0, sdf, jax.random.PRNGKey(3), 1)
    outk = run(params, th0, sdf, jax.random.PRNGKey(3), 12)
    assert isinstance(outk, MultistartResult)
    assert np.all(np.asarray(outk.score) <= np.asarray(out1.score) + 1e-9)
    assert int(np.sum(np.asarray(outk.contact_free))) > int(
        np.sum(np.asarray(out1.contact_free)))
    assert np.all(np.isfinite(np.asarray(outk.th)))
    # endpoints stay near the start prior (soft k_s prior: the OPTIMIZER may
    # move them slightly; the seeds themselves are exact, tested above)
    np.testing.assert_allclose(np.asarray(outk.th[:, 0, :2]),
                               np.asarray(th0[:, 0, :2]), atol=0.5)


def test_select_margin_prefers_margin_clear_candidate():
    """With select_margin set, a margin-clear candidate beats a
    smoother-but-tighter contact-free one; with margin 0 the smoother
    path wins (the columns-family +ms regression of
    runs/plan3d/table.md).  contact_free stays radius-defined."""
    from dgpmp2_tpu.core.multistart import select_best
    from dgpmp2_tpu.ops import sdf as sdf_ops

    n = 64
    img = np.ones((n, n))
    img[:, 30:34] = 0.0  # vertical wall around x in [-0.31, 0.31]
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64),
                                     res=10.0 / n)
    spec = graph.GraphSpec(total_time_step=10)
    robot = ROBOT
    t1 = 11
    s = np.linspace(0.0, 1.0, t1)

    def traj(x_run, wiggle=0.0):
        # Constant-x run down the wall face, optional x-wiggle.
        x = x_run + wiggle * np.sin(2 * np.pi * s)
        y = -4.0 + 8.0 * s
        pos = np.stack([x, y], -1)
        vel = np.gradient(pos, axis=0)
        return np.concatenate([pos, vel], -1)

    # Wall face sits at x ≈ -0.31.  Candidate A runs at d ≈ 0.5 — clears
    # the 0.4 radius but sits inside a 0.2 margin — and is perfectly
    # smooth; candidate B runs margin-clear at d ≈ 0.9 with a slight
    # wiggle (strictly less smooth).
    th = jnp.asarray(np.stack([traj(-0.81), traj(-1.21, wiggle=0.05)]),
                     jnp.float64)
    sdf_t = jnp.broadcast_to(sdf, (2, n, n))
    plain = select_best(spec, robot, th, sdf_t, restarts=2, b=1)
    margin = select_best(spec, robot, th, sdf_t, restarts=2, b=1,
                         select_margin=0.2)
    assert int(plain.k_best[0]) == 0, "margin-0 must pick the tighter path"
    assert int(margin.k_best[0]) == 1, "margin must pick the clear path"
    assert bool(plain.contact_free[0]) and bool(margin.contact_free[0])


@pytest.mark.slow
def test_plan_multistart_reports_winner_iters():
    """MultistartResult.iters is the winning candidate's actual GN
    iteration count: bounded by max_iters (plus phase sum when staged),
    equal to gn.plan's per-problem iters at restarts=1, and plumbed
    through the serving adapter instead of a constant max_iters fill."""
    params, th0, sdf = _problem()
    # Loose tolerance so per-problem convergence freezes early.
    cfg = gn.OptimConfig(reg=0.1, max_iters=30, tol_delta=5e-2)
    ref = gn.plan(SPEC, ROBOT, params, th0, sdf, cfg, track_best=True)
    out1 = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                           jax.random.PRNGKey(0), restarts=1)
    np.testing.assert_array_equal(np.asarray(out1.iters),
                                  np.asarray(ref.iters))
    assert int(np.min(np.asarray(out1.iters))) < 30, \
        "tol_delta must freeze at least one problem early for this test"
    out = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                          jax.random.PRNGKey(0), restarts=6)
    assert np.all(np.asarray(out.iters) >= 1)
    assert np.all(np.asarray(out.iters) <= 30)
    staged = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                             jax.random.PRNGKey(0), restarts=6,
                             prune_iters=5, keep=2)
    assert np.all(np.asarray(staged.iters) >= 1)
    assert np.all(np.asarray(staged.iters) <= 30)


@pytest.mark.slow
def test_extra_seeds_join_pool_and_can_win():
    """extra_seeds candidates are planned and selected like perturbed
    ones: an informed seed already sitting in a collision-free basin must
    win (k_best == restarts) when the straight-line base stays in
    contact."""
    params, th0, sdf = _problem(b=2)
    cfg = gn.OptimConfig(reg=0.1, max_iters=8)
    base = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                           jax.random.PRNGKey(0), restarts=1, amp=0.0)
    # Informed seed: a wide detour along the top edge (y ~ +4.5), far
    # from the clutter block in the middle of the world.
    t1 = SPEC.num_traj_states
    s = np.linspace(0.0, 1.0, t1)[None, :, None]
    start = np.asarray(th0[:, 0, :2])[:, None, :]
    goal = np.asarray(th0[:, -1, :2])[:, None, :]
    detour = start + s * (goal - start)
    detour[..., 1] = detour[..., 1] + 3.0 * np.sin(np.pi * s[..., 0])
    vel = np.gradient(detour, SPEC.total_time_sec / (t1 - 1), axis=1)
    seed = jnp.asarray(np.concatenate([detour, vel], -1), th0.dtype)
    out = plan_multistart(SPEC, ROBOT, params, th0, sdf, cfg,
                          jax.random.PRNGKey(0), restarts=1, amp=0.0,
                          extra_seeds=seed[None])
    # Pool grew: k_best may now be 1 (the informed seed).
    assert out.th.shape == base.th.shape
    assert np.all(np.asarray(out.score) <= np.asarray(base.score) + 1e-9), \
        "adding a candidate can never make selection worse"
    for i in range(2):
        if not bool(base.contact_free[i]) and bool(out.contact_free[i]):
            assert int(out.k_best[i]) == 1  # the informed seed won


def test_rrt_seed_batch_contract():
    """Host-side RRT* seed batch: shapes, endpoint pinning, the
    reference's avg-velocity recipe, and straight-line degradation on
    failure (contract holds with or without the native library)."""
    from dgpmp2_tpu.core import seeds as seeds_lib

    _, th0, sdf = _problem(b=2)
    b = 2
    starts = np.asarray(th0[:, 0, :2])
    goals = np.asarray(th0[:, -1, :2])
    t1 = SPEC.num_traj_states
    out, found = seeds_lib.rrt_seed_batch(
        np.asarray(sdf), starts, goals, SPEC.x_lims, SPEC.y_lims,
        SPEC.total_time_sec, t1, clearance=0.4, plan_time=0.3,
        seed=0,
    )
    assert out.shape == (b, t1, 4) and out.dtype == np.float32
    np.testing.assert_allclose(out[:, 0, :2], starts, atol=1e-5)
    np.testing.assert_allclose(out[:, -1, :2], goals, atol=1e-5)
    # Reference path_to_traj_avg_vel: constant average velocity rows.
    avg = (goals - starts) / SPEC.total_time_sec
    np.testing.assert_allclose(out[:, 0, 2:], avg, atol=1e-5)
    np.testing.assert_allclose(out[:, -1, 2:], avg, atol=1e-5)
    assert found.shape == (b,)


@pytest.mark.skipif(
    not __import__("dgpmp2_tpu.native", fromlist=["available"]).available(),
    reason="native RRT* unavailable")
def test_rrt_seed_clears_clutter_where_straight_line_collides():
    """On the blocked world the straight-line seed passes through
    clutter; the RRT* seed must be collision-clear along its whole
    length (that is the basin-membership property multistart buys)."""
    from dgpmp2_tpu.core import seeds as seeds_lib

    _, th0, sdf = _problem(b=1)
    starts = np.asarray(th0[:, 0, :2])
    goals = np.asarray(th0[:, -1, :2])
    t1 = SPEC.num_traj_states
    clearance = 0.11
    seeds, found = seeds_lib.rrt_seed_batch(
        np.asarray(sdf), starts, goals, SPEC.x_lims, SPEC.y_lims,
        SPEC.total_time_sec, t1, clearance=clearance, plan_time=2.0,
        seed=3,
    )
    assert bool(found[0]), "RRT* should solve this world in 2s"
    d, _ = sdf_ops.lookup_nd(sdf, jnp.asarray(seeds[:, :, :2]),
                             SPEC.res(sdf.shape[-1]),
                             SPEC.x_lims, SPEC.y_lims, None)
    # Waypoints were validity-checked at `clearance`; the arc-length
    # resample can cut corners only between adjacent waypoints.
    assert float(jnp.min(d)) > 0.0
