"""Learned-planner stack: covariance decoding, models, training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.learn import covariances as cov_lib
from dgpmp2_tpu.learn.learned_planner import LearnedDiffGPMP2Planner, LearnedPlannerConfig
from dgpmp2_tpu.learn.losses import LossWeights
from dgpmp2_tpu.learn.train import TrainConfig, init_train_state, make_optimizer, make_train_step
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

SPEC = graph.GraphSpec(total_time_step=10)
ROBOT = PointRobot2D()


@pytest.mark.parametrize("mode", cov_lib.MODES)
@pytest.mark.parametrize("learn_eps", [False, True])
def test_decode_shapes_and_psd(mode, learn_eps):
    d = cov_lib.out_dim(SPEC, mode, learn_eps)
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.standard_normal((3, d)))
    covs = cov_lib.decode(out, SPEC, mode, learn_eps)
    assert covs.obs_inv.shape == (3, SPEC.num_traj_states, 1, 1)
    assert np.all(np.asarray(covs.obs_inv) >= 0)
    if mode == "q_full":
        assert covs.q_inv.shape == (3, SPEC.num_gp_factors, 4, 4)
        eig = np.linalg.eigvalsh(np.asarray(covs.q_inv))
        assert np.all(eig >= -1e-10)
    elif mode != "fix_dynamics":
        assert covs.qc_inv.shape == (3, SPEC.num_gp_factors, 2, 2)
        eig = np.linalg.eigvalsh(np.asarray(covs.qc_inv))
        assert np.all(eig >= -1e-10)
    if learn_eps:
        assert covs.eps.shape == (3, SPEC.num_traj_states, 1)
        assert np.all(np.asarray(covs.eps) >= 0)


def test_out_dim_matches_reference_bookkeeping():
    # diff_gpmp2_planner.py:63-83 with T=10 -> num_gp=10, num_obs=11, L=1.
    assert cov_lib.out_dim(SPEC, "fix_dynamics") == 11
    assert cov_lib.out_dim(SPEC, "diag_identity") == 10 + 11
    assert cov_lib.out_dim(SPEC, "qc_full") == 20 + 11
    assert cov_lib.out_dim(SPEC, "q_full") == 40 + 11
    assert cov_lib.out_dim(SPEC, "diag_identity", learn_eps=True) == 10 + 22


def _toy_batch(b=2, imsize=32):
    rng = np.random.default_rng(1)
    img = np.ones((b, imsize, imsize), np.float32)
    img[:, 12:20, 12:20] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(
        jnp.asarray(img), res=10.0 / imsize
    ).astype(jnp.float32)
    start = jnp.zeros((b, 4)).at[:, :2].set(jnp.asarray([[-4.0, -4.0]] * b))
    goal = jnp.zeros((b, 4)).at[:, :2].set(jnp.asarray([[4.0, 4.0]] * b))
    th_opt = straight_line_traj(start[:, :2], goal[:, :2], 10.0, SPEC.total_time_step)
    cov_scalars = dict(qc_inv=np.eye(2), cost_sigma=0.1, epsilon_dist=0.4,
                       k_s=0.01, k_g=0.01)
    batch = {
        "im": jnp.asarray(img), "sdf": sdf,
        "start": start.astype(jnp.float32), "goal": goal.astype(jnp.float32),
        "th_opt": th_opt.astype(jnp.float32), "cov_scalars": cov_scalars,
    }
    return batch


def _make_planner(model_type="feed_forward", mode="diag_identity"):
    cfg = gn.OptimConfig(reg=0.1, max_iters=10)
    lcfg = LearnedPlannerConfig(dynamics_mode=mode, model_type=model_type,
                                hidden_dim=16)
    return LearnedDiffGPMP2Planner(SPEC, ROBOT, cfg, lcfg)


@pytest.mark.parametrize("model_type", ["feed_forward", "rnn_lstm"])
@pytest.mark.slow
def test_learned_step_runs_and_grads_flow(model_type):
    planner = _make_planner(model_type)
    batch = _toy_batch()
    rng = jax.random.PRNGKey(0)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )

    feats = planner.conv_features(variables, im_stack)
    hidden = None
    if planner.recurrent:
        hidden = planner.init_hidden(rng, 2, feats.shape[-1] + th0.shape[1] * 2)

    def loss(variables):
        dth, err, err_ext, _, _ = planner.step(
            variables, params_fix, th0, batch["sdf"], feats, hidden
        )
        return jnp.sum(dth**2) + jnp.sum(err_ext)

    val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0  # gradients reach network weights through the solve


def test_learned_plan_unrolls():
    planner = _make_planner()
    batch = _toy_batch()
    rng = jax.random.PRNGKey(1)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th, errs, errs_ext, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5
    )
    assert th.shape == th0.shape
    assert errs.shape == (5, 2)
    assert np.all(np.isfinite(np.asarray(th)))


@pytest.mark.slow
def test_learned_plan_multistart_composes():
    """LearnedDiffGPMP2Planner.plan_multistart: result shapes are per
    problem, the selected candidate never scores worse than the K=1
    (unperturbed, restart-0) plan, and trajectories stay finite."""
    from dgpmp2_tpu.core.multistart import MultistartResult, score_candidates

    planner = _make_planner()
    batch = _toy_batch()
    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    out1 = planner.plan_multistart(
        variables, params_fix, th0, batch["sdf"], batch["im"],
        jax.random.PRNGKey(3), restarts=1, max_iters=5,
    )
    outk = planner.plan_multistart(
        variables, params_fix, th0, batch["sdf"], batch["im"],
        jax.random.PRNGKey(3), restarts=4, amp=1.0, max_iters=5,
    )
    assert isinstance(outk, MultistartResult)
    assert outk.th.shape == th0.shape
    assert np.all(np.isfinite(np.asarray(outk.th)))
    assert np.all(np.asarray(outk.score) <= np.asarray(out1.score) + 1e-6)
    # restart 0 is the unperturbed seed, so K=1 equals plan(track_best)
    th_ref, _, _, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5,
        track_best=True,
    )
    np.testing.assert_allclose(np.asarray(out1.th), np.asarray(th_ref),
                               atol=1e-6)
    score_ref, _ = score_candidates(SPEC, ROBOT, th_ref, batch["sdf"])
    np.testing.assert_allclose(np.asarray(out1.score), np.asarray(score_ref),
                               rtol=1e-5)


@pytest.mark.parametrize("model_type", ["feed_forward", "rnn_lstm"])
@pytest.mark.slow
def test_learned_plan_multistart_staged(model_type):
    """Staged pruning on the learned planner: runs for both head types
    (the recurrent carry is gathered with the survivors), validates args,
    and keeps finite per-problem winners."""
    from dgpmp2_tpu.core.multistart import MultistartResult

    planner = _make_planner(model_type)
    batch = _toy_batch()
    rng = jax.random.PRNGKey(4)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    out = planner.plan_multistart(
        variables, params_fix, th0, batch["sdf"], batch["im"],
        jax.random.PRNGKey(5), restarts=4, amp=1.0, max_iters=6,
        prune_iters=3, keep=2,
    )
    assert isinstance(out, MultistartResult)
    assert out.th.shape == th0.shape
    assert np.all(np.isfinite(np.asarray(out.th)))
    with pytest.raises(ValueError):
        planner.plan_multistart(
            variables, params_fix, th0, batch["sdf"], batch["im"],
            jax.random.PRNGKey(5), restarts=4, max_iters=6, prune_iters=9,
            keep=2,
        )


@pytest.mark.slow
def test_train_step_lm_windows():
    """method='lm' threads accept/reject + the lambda carry through the
    chunked TBPTT windows: finite metrics, weights move, and the sliding /
    optimize_tk paths refuse loudly instead of silently training GN."""
    cfg = gn.OptimConfig(reg=0.1, max_iters=8, method="lm")
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, cfg,
        LearnedPlannerConfig(dynamics_mode="diag_identity",
                             static_init=(1.0, 0.1, 0.4)),
    )
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    train_step = make_train_step(planner, tx, LossWeights(),
                                 TrainConfig(T=4, tk=2))
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, jax.random.PRNGKey(0), im_stack,
                             batch["th_opt"])
    v0 = jax.tree.map(lambda x: x.copy(), state.variables)
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
    assert all(bool(jnp.all(jnp.isfinite(v)))
               for v in jax.tree.leaves(metrics))
    moved = sum(float(jnp.max(jnp.abs(a - b))) for a, b in
                zip(jax.tree.leaves(v0), jax.tree.leaves(state.variables)))
    assert moved > 0.0
    with pytest.raises(NotImplementedError):
        make_train_step(planner, tx, LossWeights(),
                        TrainConfig(T=4, tk=2, tk2=3))
    with pytest.raises(NotImplementedError):
        make_train_step(planner, tx, LossWeights(),
                        TrainConfig(T=4, tk=2, optimize_tk=True))


@pytest.mark.slow
def test_train_step_decreases_loss():
    planner = _make_planner()
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    tcfg = TrainConfig(T=4, tk=2, use_inter_loss=True, remat=True)
    train_step = make_train_step(planner, tx, LossWeights(ext_loss_weight=0.01), tcfg)

    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])

    losses = []
    for i in range(5):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfits the fixed toy batch


@pytest.mark.slow
def test_learned_lm_plan_matches_fixed_lm_planner():
    """OptimConfig(method='lm') drives the learned planner's plan() with
    the accept/reject 10x lambda schedule.  With static_init the
    predicted covariances are constant, so learned-LM must reproduce
    gn.plan(method='lm') exactly (convergence checks disabled: gn.plan
    freezes converged problems, the learned scan does not)."""
    cfg = gn.OptimConfig(reg=0.1, max_iters=8, method="lm",
                         conv_check_dtheta=False, conv_check_err=False)
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, cfg,
        LearnedPlannerConfig(dynamics_mode="diag_identity",
                             static_init=(1.0, 0.1, 0.4)),
    )
    batch = _toy_batch()
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(jax.random.PRNGKey(0), im_stack, th0)
    params = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th_l, errs, _, _ = planner.plan(variables, params, th0, batch["sdf"],
                                    batch["im"])
    ref = gn.plan(SPEC, ROBOT, params, th0, batch["sdf"], cfg)
    # f32 tolerance: gn.plan assembles from carried residuals with hoisted
    # static blocks, the learned step assembles fresh — different f32
    # summation orders drift ~3e-4 over 8 LM iterations.  A flipped
    # accept/reject or lambda mismatch would diverge by O(0.1); this
    # tolerance still pins the schedule exactly.
    np.testing.assert_allclose(np.asarray(th_l), np.asarray(ref.th),
                               rtol=2e-3, atol=1e-3)
    # The learned trace logs err at the CURRENT iterate (pre-update),
    # gn.plan logs err_next (post-update): compare shifted by one.
    np.testing.assert_allclose(np.asarray(errs)[1:],
                               np.asarray(ref.err_per_iter)[:-1],
                               rtol=2e-3, atol=1e-4)


def test_static_init_head_matches_fixed_planner():
    """With static_init the learned planner's first step equals the
    fixed-covariance planner exactly (zero-init final kernel + sqrt-bias)."""
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=4),
        LearnedPlannerConfig(dynamics_mode="diag_identity",
                             static_init=(1.0, 0.1, 0.4)),
    )
    batch = _toy_batch()
    rng = jax.random.PRNGKey(0)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    feats = planner.conv_features(variables, im_stack)
    dth_l, _, _, p_used, _ = planner.step(variables, params, th0,
                                          batch["sdf"], feats)
    dth_s = gn.gn_step(SPEC, ROBOT, params, th0, batch["sdf"], 0.1)
    np.testing.assert_allclose(np.asarray(p_used.q_inv),
                               np.asarray(params.q_inv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dth_l), np.asarray(dth_s), atol=1e-4)


def test_recurrent_head_static_init_emits_bias():
    """RecurrentHead honors out_bias: the init forward pass emits exactly
    the static-baseline output regardless of features / hidden state."""
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2),
        LearnedPlannerConfig(dynamics_mode="diag_identity",
                             model_type="rnn_gru", learn_eps=True,
                             eps_max=0.8, static_init=(1.0, 0.1, 0.4)),
    )
    batch = _toy_batch()
    rng = jax.random.PRNGKey(0)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    feats = planner.conv_features(variables, im_stack)
    hidden = planner.init_hidden(jax.random.PRNGKey(1), th0.shape[0],
                                 feats.shape[-1] + (th0.shape[1]) * 2)
    covs, _, _ = planner.predict(variables, th0, feats, hidden=hidden)
    np.testing.assert_allclose(np.asarray(covs.eps), 0.4, atol=1e-5)
    qc_diag = np.asarray(covs.qc_inv)[..., 0, 0]
    np.testing.assert_allclose(qc_diag, 1.0, atol=1e-5)


def test_eps_max_bounded_decode_and_static_init():
    """eps_max decode: eps = eps_max*sigmoid(s) stays in (0, eps_max) and
    the static_init bias still decodes exactly eps0."""
    from dgpmp2_tpu.learn import covariances as cov_lib

    eps0, eps_max = 0.4, 0.8
    lcfg = LearnedPlannerConfig(dynamics_mode="diag_identity",
                                learn_eps=True, eps_max=eps_max,
                                static_init=(1.0, 0.1, eps0))
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2), lcfg,
    )
    bias = planner.static_out_bias(1.0, 0.1, eps0)
    out = jnp.asarray(bias, jnp.float32)[None, :]
    covs = cov_lib.decode(out, SPEC, "diag_identity", True, eps_max)
    np.testing.assert_allclose(np.asarray(covs.eps), eps0, atol=1e-6)
    # arbitrary outputs stay bounded
    rng_out = jax.random.normal(jax.random.PRNGKey(1), out.shape) * 50.0
    covs2 = cov_lib.decode(rng_out, SPEC, "diag_identity", True, eps_max)
    assert float(covs2.eps.max()) <= eps_max
    assert float(covs2.eps.min()) >= 0.0


@pytest.mark.slow
def test_sliding_tbptt_tk2_equals_tk_matches_chunked():
    """Sliding-window TBPTT with tk2 == tk is mathematically identical to
    the chunked path (windows end at the same steps and look back exactly
    one chunk) — gradients must agree (train_planner.py:216-217 semantics).
    Dropout off: the two paths draw per-step rng keys differently."""
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=10),
        LearnedPlannerConfig(dynamics_mode="diag_identity", hidden_dim=16,
                             dropout_prob=0.0),
    )
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    w = LossWeights(ext_loss_weight=0.01)
    step_chunked = make_train_step(planner, tx, w, TrainConfig(T=4, tk=2))
    step_sliding = make_train_step(planner, tx, w, TrainConfig(T=4, tk=2, tk2=2))

    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])

    s1, m1 = step_chunked(state, batch, jax.random.PRNGKey(7))
    s2, m2 = step_sliding(state, batch, jax.random.PRNGKey(7))
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.variables), jax.tree.leaves(s2.variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_smooth_max_penetration_surrogate():
    """Zero when every hinge is inactive; approaches the per-problem max
    interior penetration for large beta; endpoints excluded; differentiable."""
    from dgpmp2_tpu.learn.losses import smooth_max_penetration

    r = jnp.zeros((2, 6, 1))
    np.testing.assert_allclose(
        np.asarray(smooth_max_penetration(r, 30.0)), np.zeros(2), atol=0
    )
    # problem 0: worst interior hinge 0.5; problem 1: only ENDPOINT hinges
    r = r.at[0, 2, 0].set(0.1).at[0, 3, 0].set(0.5)
    r = r.at[1, 0, 0].set(2.0).at[1, 5, 0].set(2.0)
    out = np.asarray(smooth_max_penetration(r, 200.0))
    np.testing.assert_allclose(out, [0.5, 0.0], atol=1e-3)
    g = jax.grad(lambda x: jnp.sum(smooth_max_penetration(x, 30.0)))(r)
    assert float(jnp.abs(g[0, 3, 0])) > 0  # gradient concentrates on worst
    assert np.all(np.isfinite(np.asarray(g)))


def test_one_step_loss_max_pen_term():
    from dgpmp2_tpu.learn.losses import one_step_loss

    b, t1, d = 2, 6, 4
    dth = jnp.zeros((b, t1, d))
    errs = jnp.zeros((b,))
    r_obs = jnp.zeros((b, t1, 1)).at[0, 3, 0].set(0.5)
    w0 = LossWeights(ext_loss_weight=0.0)
    w1 = LossWeights(ext_loss_weight=0.0, max_pen_weight=2.0,
                     max_pen_beta=200.0)
    t_base = one_step_loss(dth, dth, errs, errs, errs, w0, 2)
    t_pen = one_step_loss(dth, dth, errs, errs, errs, w1, 2, r_obs=r_obs)
    assert float(t_base.total) == 0.0
    # mean over B=2 of smooth-max [0.5, 0] = 0.25, times weight 2
    np.testing.assert_allclose(float(t_pen.total), 0.5, atol=1e-3)
    with pytest.raises(ValueError):
        one_step_loss(dth, dth, errs, errs, errs, w1, 2)


@pytest.mark.slow
def test_optimize_tk_single_window_matches_batch_update():
    """``optimize_tk`` with T == tk is one window ⇒ one accumulated-gradient
    update, identical to the standard once-per-batch step
    (train_planner.py:395,417 semantics)."""
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=10),
        LearnedPlannerConfig(dynamics_mode="diag_identity", hidden_dim=16,
                             dropout_prob=0.0),
    )
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    w = LossWeights(ext_loss_weight=0.01)
    step_batch = make_train_step(planner, tx, w, TrainConfig(T=2, tk=2))
    step_tk = make_train_step(planner, tx, w,
                              TrainConfig(T=2, tk=2, optimize_tk=True))

    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])

    s1, m1 = step_batch(state, batch, jax.random.PRNGKey(7))
    s2, m2 = step_tk(state, batch, jax.random.PRNGKey(7))
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.variables), jax.tree.leaves(s2.variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_optimize_tk_multi_window_runs():
    """Two windows: parameters update mid-batch and stay finite."""
    planner = _make_planner()
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    tcfg = TrainConfig(T=4, tk=2, use_inter_loss=True, optimize_tk=True)
    train_step = make_train_step(planner, tx,
                                 LossWeights(ext_loss_weight=0.01), tcfg)
    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])
    state, metrics = train_step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    for leaf in jax.tree.leaves(state.variables):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_sliding_tbptt_overlapping_window_runs():
    """tk2 > tk (overlapping windows, the reference's sliding look-back)
    trains stably and produces finite decreasing loss."""
    planner = _make_planner()
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    tcfg = TrainConfig(T=6, tk=2, tk2=4, use_inter_loss=True)
    train_step = make_train_step(planner, tx, LossWeights(ext_loss_weight=0.01), tcfg)

    rng = jax.random.PRNGKey(2)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])
    losses = []
    for i in range(4):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_costmap_predict_input_channel():
    """costmap_predict feeds max(0, (eps+r) - sdf) as the SDF channel
    (reference learn flag, ``learn_module_fcn.py:25``; safety_dist =
    epsilon_dist + robot_radius, ``learn_module_fcn.py:22``) and the
    learned step still runs with gradients."""
    cfg = gn.OptimConfig(reg=0.1, max_iters=5)
    lcfg = LearnedPlannerConfig(dynamics_mode="diag_identity", hidden_dim=16,
                                costmap_predict=True, costmap_eps=0.4)
    planner = LearnedDiffGPMP2Planner(SPEC, ROBOT, cfg, lcfg)
    batch = _toy_batch()
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    safety = 0.4 + float(max(ROBOT.sphere_radii))
    expected = np.maximum(0.0, safety - np.asarray(batch["sdf"]))
    np.testing.assert_allclose(np.asarray(im_stack[..., 1]), expected,
                               rtol=1e-6)
    assert np.all(np.asarray(im_stack[..., 1]) >= 0.0)

    rng = jax.random.PRNGKey(0)
    variables = planner.init_variables(rng, im_stack, batch["th_opt"])
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th, errs, _, _ = planner.plan(
        variables, params_fix, batch["th_opt"], batch["sdf"], batch["im"],
        max_iters=3,
    )
    assert np.all(np.isfinite(np.asarray(th)))


def test_learned_plan_track_best_non_colliding():
    """track_best returns a trajectory whose best-score is <= the final
    iterate's (reference harness selection, test_planner.py:253-262)."""
    planner = _make_planner()
    batch = _toy_batch()
    rng = jax.random.PRNGKey(1)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th_final, _, _, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5
    )
    th_best, _, _, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5,
        track_best=True,
    )
    assert th_best.shape == th_final.shape

    def score(th):
        from dgpmp2_tpu.core import graph as g
        res = g.eval_residuals(SPEC, ROBOT, params_fix, th, batch["sdf"])
        colliding = np.asarray(
            jnp.any(res.r_obs[..., 1:-1, :] > 0, axis=(-2, -1)))
        gp = np.asarray(jnp.mean(jnp.sum(res.r_gp**2, -1), axis=-1))
        return np.where(colliding, np.inf, gp)

    s_best, s_final = score(th_best), score(th_final)
    assert np.all(s_best <= s_final + 1e-9)


def test_static_init_rejected_for_rank1_modes():
    """qc_full/q_full decode GP blocks as rank-1 outer products s s^T; a
    constant bias yields the singular all-ones matrix, not qc_inv*I, so
    static_init must be rejected rather than silently wrong."""
    for mode in ("qc_full", "q_full"):
        planner = LearnedDiffGPMP2Planner(
            SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2),
            LearnedPlannerConfig(dynamics_mode=mode),
        )
        with pytest.raises(ValueError, match="static_init"):
            planner.static_out_bias(1.0, 0.1, 0.4)


def _perturbed_state(planner, tx, batch, scale=0.05, seed=42):
    rng = jax.random.PRNGKey(0)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    state = init_train_state(planner, tx, rng, im_stack, batch["th_opt"])
    leaves, treedef = jax.tree.flatten(state.variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return state.replace(variables=jax.tree.unflatten(treedef, leaves))


@pytest.mark.slow
def test_err_ext_evaluated_under_fully_fixed_params():
    """err_ext is the anti-gaming metric: it must be computed with the
    ENTIRE fixed param set — including epsilon_dist, which reshapes the
    hinge residuals themselves — not just fixed covariances."""
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=4),
        LearnedPlannerConfig(dynamics_mode="diag_identity", learn_eps=True,
                             eps_max=0.8, dropout_prob=0.0),
    )
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    state = _perturbed_state(planner, tx, batch, scale=0.3)
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    feats = planner.conv_features(state.variables, im_stack)
    th0 = batch["th_opt"]
    _, err, err_ext, p_used, _ = planner.step(
        state.variables, params_fix, th0, batch["sdf"], feats
    )
    # the learned eps really differs from the fixed one (else no test)
    assert float(jnp.max(jnp.abs(p_used.eps - params_fix.eps))) > 1e-4
    expected = graph.graph_error(SPEC, ROBOT, params_fix, th0, batch["sdf"])
    np.testing.assert_allclose(np.asarray(err_ext), np.asarray(expected),
                               rtol=1e-6)
    # and err (learned params) genuinely differs from err_ext
    assert float(jnp.max(jnp.abs(err - err_ext))) > 1e-6


def test_costmap_predict_without_sdf_predict_keeps_map_channel():
    """costmap_predict selects WHICH map channel the conv sees; turning
    sdf_predict off must not silently drop it."""
    lcfg = LearnedPlannerConfig(dynamics_mode="diag_identity",
                                sdf_predict=False, costmap_predict=True,
                                costmap_eps=0.4)
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2), lcfg)
    batch = _toy_batch()
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    assert im_stack.shape[-1] == 2
    safety = 0.4 + float(max(ROBOT.sphere_radii))
    expected = np.maximum(0.0, safety - np.asarray(batch["sdf"]))
    np.testing.assert_allclose(np.asarray(im_stack[..., 1]), expected,
                               rtol=1e-6)
    # im-only when both flags are off
    lcfg2 = LearnedPlannerConfig(dynamics_mode="diag_identity",
                                 sdf_predict=False)
    planner2 = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2), lcfg2)
    assert planner2.stack_inputs(batch["im"], batch["sdf"]).shape[-1] == 1


def test_normalize_im_option_scales_conv_input():
    """normalize_im applies the reference's per-image [-1, 1] min-max
    scaling (learn_module_conv.py:91-96) to every channel."""
    lcfg = LearnedPlannerConfig(dynamics_mode="diag_identity",
                                normalize_im=True)
    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2), lcfg)
    batch = _toy_batch()
    im_stack = np.asarray(planner.stack_inputs(batch["im"], batch["sdf"]))
    assert im_stack.shape[-1] == 2
    np.testing.assert_allclose(im_stack.max(axis=(1, 2)), 1.0, atol=1e-4)
    np.testing.assert_allclose(im_stack.min(axis=(1, 2)), -1.0, atol=1e-4)


@pytest.mark.slow
def test_train_step_threads_dth_prev_under_dtheta_predict():
    """With dtheta_predict the head consumes the previous GN update; the
    chunked trainer must thread it across steps exactly as a manual unroll
    with planner.step does (regression: all paths silently fed zeros)."""
    from dgpmp2_tpu.learn.train import _step_loss
    from dgpmp2_tpu.utils.trajectory import straight_line_traj as slt

    planner = LearnedDiffGPMP2Planner(
        SPEC, ROBOT, gn.OptimConfig(reg=0.1, max_iters=2),
        LearnedPlannerConfig(dynamics_mode="diag_identity", hidden_dim=16,
                             dtheta_predict=True, dropout_prob=0.0),
    )
    batch = _toy_batch()
    tx = make_optimizer("adam", {"alpha": 1e-3})
    w = LossWeights(ext_loss_weight=0.01)
    tcfg = TrainConfig(T=2, tk=1)
    train_step = make_train_step(planner, tx, w, tcfg)
    state = _perturbed_state(planner, tx, batch, scale=0.1)
    _, metrics = train_step(state, batch, jax.random.PRNGKey(7))

    # manual two-step unroll threading dth_prev
    sdf, th_opt = batch["sdf"], batch["th_opt"]
    params_fix = graph.default_params(
        SPEC, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th0 = slt(batch["start"][:, :2], batch["goal"][:, :2],
              SPEC.total_time_sec, SPEC.total_time_step).astype(jnp.float32)
    im_stack = planner.stack_inputs(batch["im"], sdf)
    feats = planner.conv_features(state.variables, im_stack, train=True)
    rng = jax.random.PRNGKey(7)

    def manual(thread_dth):
        th, dth_prev = th0, jnp.zeros_like(th0)
        losses = []
        for rw in jax.random.split(rng, 2):
            rs = jax.random.split(rw, 1)[0]
            dth, _, _, _, _ = planner.step(
                state.variables, params_fix, th, sdf, feats, None,
                train=True, rng=rs, dth_prev=dth_prev,
            )
            th_new = th + dth
            losses.append(_step_loss(SPEC, ROBOT, params_fix, sdf, dth, th,
                                     th_new, th_opt, w).total)
            th = th_new
            dth_prev = dth if thread_dth else jnp.zeros_like(th0)
        return float(jnp.mean(jnp.stack(losses)))

    threaded, dropped = manual(True), manual(False)
    assert abs(threaded - dropped) > 1e-7  # dth_prev genuinely matters
    assert np.isclose(float(metrics["loss"]), threaded, rtol=1e-5)


@pytest.mark.slow
def test_track_best_respects_gp_interpolated_collisions():
    """With use_gp_inter on, the track_best score must also treat
    between-support penetration (r_obsi) as colliding — symmetric with
    gn.plan's best_score."""
    spec = graph.GraphSpec(total_time_step=10, use_gp_inter=True)
    planner = LearnedDiffGPMP2Planner(
        spec, ROBOT, gn.OptimConfig(reg=0.1, max_iters=5),
        LearnedPlannerConfig(dynamics_mode="diag_identity", hidden_dim=16),
    )
    batch = _toy_batch()
    rng = jax.random.PRNGKey(1)
    im_stack = planner.stack_inputs(batch["im"], batch["sdf"])
    th0 = batch["th_opt"]
    variables = planner.init_variables(rng, im_stack, th0)
    params_fix = graph.default_params(
        spec, ROBOT, batch["start"], batch["goal"], **batch["cov_scalars"],
        dtype=jnp.float32,
    )
    th_final, _, _, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5
    )
    th_best, _, _, _ = planner.plan(
        variables, params_fix, th0, batch["sdf"], batch["im"], max_iters=5,
        track_best=True,
    )

    def score(th):
        res = graph.eval_residuals(spec, ROBOT, params_fix, th, batch["sdf"])
        colliding = jnp.any(res.r_obs[..., 1:-1, :] > 0, axis=(-2, -1))
        assert res.r_obsi is not None
        colliding = colliding | jnp.any(res.r_obsi > 0, axis=(-3, -2, -1))
        gp = jnp.mean(jnp.sum(res.r_gp**2, -1), axis=-1)
        return np.asarray(jnp.where(colliding, jnp.inf, gp))

    assert np.all(score(th_best) <= score(th_final) + 1e-9)


def test_eval_metrics_cover_velocity_and_joint_limits():
    """constraint_violation (test_planner.py:311-322) and the companion
    joint_limit_violation appear in evaluate_batch/summarize whenever the
    spec carries the corresponding factor."""
    from dgpmp2_tpu.learn.eval import evaluate_batch, summarize

    spec = graph.GraphSpec(total_time_step=9, use_vel_limits=True,
                           use_joint_limits=True)
    start = jnp.zeros((2, 4), jnp.float64)
    goal = jnp.zeros((2, 4), jnp.float64)
    params = graph.default_params(
        spec, ROBOT, start, goal, qc_inv=np.eye(2), cost_sigma=0.1,
        epsilon_dist=0.3, k_s=0.01, k_g=0.01, k_v=0.1, v_x=1.0, v_y=1.0,
        k_jl=0.1, q_min=[-2.0, -2.0], q_max=[2.0, 2.0], dtype=jnp.float64,
    )
    sdfb = jnp.full((2, 16, 16), 5.0, jnp.float64)
    # Problem 0 obeys both limits everywhere; problem 1 exceeds v_x on 4 of
    # 10 states and leaves the joint box on 2 of 10.
    th = jnp.zeros((2, 10, 4), jnp.float64)
    th = th.at[1, 3:7, 2].set(1.5)   # |v_x| = 1.5 > 1.0
    th = th.at[1, 8:, 0].set(2.5)    # q_x = 2.5 > 2.0
    m = evaluate_batch(spec, ROBOT, params, th, None, sdfb)
    np.testing.assert_allclose(m["constraint_violation"], [0.0, 0.4])
    np.testing.assert_allclose(m["joint_limit_violation"], [0.0, 0.2])
    s = summarize(m)
    np.testing.assert_allclose(s["avg_constraint_violation"], 0.2)
    np.testing.assert_allclose(s["avg_joint_limit_violation"], 0.1)
    # Boundary states (|v| == lim, q == lim) do not count as violations.
    th_edge = jnp.zeros((2, 10, 4), jnp.float64).at[:, :, 2].set(1.0)
    m_edge = evaluate_batch(spec, ROBOT, params, th_edge, None, sdfb)
    np.testing.assert_allclose(m_edge["constraint_violation"], [0.0, 0.0])
