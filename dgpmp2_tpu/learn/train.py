"""Learned-planner training: truncated backprop through unrolled GN steps.

Rebuild of ``diff_gpmp2/learning/train_planner.py`` (SURVEY.md §3.3).  The
reference bounds memory over the unrolled optimizer with a hand-rolled
TBPTT machinery — buffers of ``(th_prev, th_new)`` pairs, windowed manual
``.backward(grad)`` hops, ``retain_graph`` bookkeeping
(``train_planner.py:297-402``).  In JAX that whole subsystem collapses into
a **chunked ``lax.scan``**: the unroll is split into windows of ``tk``
steps; within a window gradients flow through every GN step (including
through the block-solve via its implicit adjoint), and the trajectory carry
is ``stop_gradient``-ed at window boundaries.  ``jax.checkpoint`` on the
window body trades recompute for activation memory on long unrolls.

Two window semantics are supported:

* ``tk2 is None`` (default) — non-overlapping windows of ``tk`` (the
  standard chunked-scan formulation; equals the reference when
  ``tk2 == tk``).  Set ``tk = T`` for full BPTT.
* ``tk2 > tk`` — the reference's *sliding* window
  (``train_planner.py:216-217,365-376``): a loss lands every ``tk`` steps
  and backpropagates through the previous ``tk2`` steps, so windows
  overlap.  Implemented as a stop-gradient rollout recording the
  trajectory, then per-loss-point recomputation of the trailing ``tk2``
  steps under gradient (recompute ≈ one extra forward — the JAX rendering
  of the reference's buffer of chained ``.backward(grad)`` hops).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dgpmp2_tpu.core import graph
from dgpmp2_tpu.learn.learned_planner import LearnedDiffGPMP2Planner
from dgpmp2_tpu.learn.losses import LossTerms, LossWeights, one_step_loss
from dgpmp2_tpu.utils.trajectory import straight_line_traj


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    variables: Any  # {"conv": ..., "head": ...} (params + batch_stats)
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """``optim`` / ``dgpmp2`` learn-YAML sections (``learn_utils.py:44-62``,
    ``train_planner.py:197-217``)."""

    T: int = 10  # unroll length per batch
    tk: int = 5  # TBPTT window (gradient truncation / loss cadence)
    tk2: Optional[int] = None  # sliding look-back (> tk); None = chunked
    use_inter_loss: bool = True
    clip_grad: bool = True
    clip_val: float = 2.0
    remat: bool = True  # jax.checkpoint each window body
    # Reference ``dgpmp2.optimize_tk`` (``train_planner.py:395,417``): step
    # the optimizer after EVERY tk window instead of once per batch.  The
    # reference never zeroes gradients between windows (zero_grad only at
    # batch start, ``train_planner.py:276``), so each step applies the
    # gradient ACCUMULATED over all windows so far — reproduced here.
    optimize_tk: bool = False


def make_optimizer(name: str, opt: dict) -> optax.GradientTransformation:
    """Optimizer factory mirroring ``learn_utils.torch_optimizer``."""
    lr = float(opt.get("alpha", 1e-4))
    wd = float(opt.get("reg_strength", 0.0))
    if name == "adam":
        return optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(lr, momentum=float(opt.get("momentum", 0.0)),
                      nesterov=bool(opt.get("nesterov", False))),
        )
    if name == "rmsprop":
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.rmsprop(lr, momentum=float(opt.get("momentum", 0.0)),
                          centered=bool(opt.get("centered", False))),
        )
    raise ValueError(f"unknown optimizer {name!r}")


def _step_loss(spec, robot, params_fix, sdf, dth, th, th_new, th_opt,
               weights) -> LossTerms:
    """One factor-graph evaluation at ``th_new`` feeding ``one_step_loss``
    (including the hinge rows for the max-penetration surrogate)."""
    res = graph.eval_residuals(spec, robot, params_fix, th_new, sdf)
    err_sg, err_gp, err_obs = graph.unweighted_errors_from_residuals(res)
    return one_step_loss(dth, th_opt - th, err_sg, err_gp, err_obs, weights,
                         spec.dof, r_obs=res.r_obs)


def make_train_step(
    planner: LearnedDiffGPMP2Planner,
    tx: optax.GradientTransformation,
    weights: LossWeights,
    train_cfg: TrainConfig,
):
    """Build the jitted training step.

    The returned function takes ``(state, batch, rng)`` where batch is a
    dict with ``im`` (B,H,W), ``sdf`` (B,H,W), ``start``/``goal`` (B,D),
    ``th_opt`` (B,T+1,D), and returns ``(state, metrics)``.
    """
    spec = planner.spec
    n_chunks = train_cfg.T // train_cfg.tk
    assert n_chunks * train_cfg.tk == train_cfg.T, "tk must divide T"
    # Any explicit tk2 routes through the sliding machinery; tk2 == tk is
    # mathematically identical to the chunked path (tested), tk2 > tk
    # overlaps windows like the reference.
    sliding = train_cfg.tk2 is not None
    if train_cfg.tk2 is not None:
        assert train_cfg.tk2 >= train_cfg.tk, "tk2 must be >= tk"
    # LM training windows (accept/reject + per-problem lambda, mirroring
    # learned_planner.plan(method='lm')): chunked path only — the sliding
    # look-back and optimize_tk replays would need the lambda carry
    # threaded through their window replans; fail loudly instead of
    # silently training GN while eval runs LM.
    lm = planner.cfg.method == "lm"
    if lm and (sliding or train_cfg.optimize_tk):
        raise NotImplementedError(
            "method='lm' training supports the chunked tk path only "
            "(unset tk2 / optimize_tk)")

    def loss_fn(variables, batch, rng):
        im, sdf = batch["im"], batch["sdf"]
        start, goal, th_opt = batch["start"], batch["goal"], batch["th_opt"]
        params_fix = graph.default_params(
            spec, planner.robot, start, goal, **batch["cov_scalars"],
            dtype=jnp.float32,
        )
        th0 = straight_line_traj(
            start[:, : spec.dof], goal[:, : spec.dof],
            spec.total_time_sec, spec.total_time_step,
        ).astype(jnp.float32)

        im_stack = planner.stack_inputs(im, sdf)
        feats = planner.conv_features(variables, im_stack, train=True)
        if planner.learn_cfg.fixed_conv:
            feats = jax.lax.stop_gradient(feats)

        hidden0 = None
        if planner.recurrent:
            pos_len = spec.num_traj_states * 2
            hidden0 = planner.init_hidden(
                jax.random.PRNGKey(0), th0.shape[0], feats.shape[-1] + pos_len
            )

        def window(carry, rng_w):
            th, hid, dth_prev, lam = carry
            th = jax.lax.stop_gradient(th)  # TBPTT truncation boundary
            hid = jax.tree.map(jax.lax.stop_gradient, hid)
            # Previous GN update is a head input under dtheta_predict —
            # thread it exactly as plan() does at eval, truncated at the
            # window boundary like the rest of the carry.
            dth_prev = jax.lax.stop_gradient(dth_prev)
            loss_acc = 0.0
            rngs = jax.random.split(rng_w, train_cfg.tk)
            for i in range(train_cfg.tk):
                dth, err, _, params_used, hid = planner.step(
                    variables, params_fix, th, sdf, feats, hid,
                    train=True, rng=rngs[i], dth_prev=dth_prev,
                    delta=lam if lm else None,
                )
                th_new = th + dth
                if lm:
                    # Same moving-surface accept test as
                    # learned_planner.plan: both errors under THIS
                    # iteration's predicted covariances.
                    err_prop = jax.lax.stop_gradient(graph.graph_error(
                        spec, planner.robot, params_used, th_new, sdf))
                    accept = err_prop < err
                    th_new = jnp.where(accept[:, None, None], th_new, th)
                    dth = jnp.where(accept[:, None, None], dth,
                                    jnp.zeros_like(dth))
                    lam = jnp.where(accept, lam / 10.0, lam * 10.0)
                if train_cfg.use_inter_loss or i == train_cfg.tk - 1:
                    terms = _step_loss(spec, planner.robot, params_fix, sdf,
                                       dth, th, th_new, th_opt, weights)
                    loss_acc = loss_acc + terms.total
                th, dth_prev = th_new, dth
            denom = train_cfg.tk if train_cfg.use_inter_loss else 1
            return (th, hid, dth_prev, lam), loss_acc / denom

        def loss_at(dth, th, th_new):
            return _step_loss(spec, planner.robot, params_fix, sdf,
                              dth, th, th_new, th_opt, weights).total

        def sliding_losses():
            """Sliding tk/tk2 TBPTT (``train_planner.py:216-217,365-376``):
            stop-gradient rollout records the trajectory, then each loss
            point recomputes its trailing tk2 steps under gradient."""
            tk, tk2 = train_cfg.tk, train_cfg.tk2
            rngs_all = jax.random.split(rng, train_cfg.T)

            def roll(carry, rng_t):
                th, hid, dth_prev = carry
                dth, _, _, _, hid_new = planner.step(
                    variables, params_fix, th, sdf, feats, hid,
                    train=True, rng=rng_t, dth_prev=dth_prev,
                )
                return (th + dth, hid_new, dth), (th, hid, dth_prev)

            (th_fin, _, _), (ths, hids, dths_prev) = jax.lax.scan(
                roll, (th0, hidden0, jnp.zeros_like(th0)), rngs_all
            )
            ths = jax.lax.stop_gradient(ths)
            hids = jax.tree.map(jax.lax.stop_gradient, hids)
            dths_prev = jax.lax.stop_gradient(dths_prev)

            def window_k(_, k):
                t_end = (k + 1) * tk  # exclusive: loss step is t_end - 1
                s = t_end - tk2  # may be negative for the first windows
                start = jnp.maximum(s, 0)
                th = ths[start]
                hid = jax.tree.map(lambda x: x[start], hids)
                dth_prev = dths_prev[start]
                loss_acc = 0.0
                for j in range(tk2):
                    g = s + j
                    active = g >= 0
                    gc = jnp.clip(g, 0, train_cfg.T - 1)
                    dth, _, _, _, hid_new = planner.step(
                        variables, params_fix, th, sdf, feats, hid,
                        train=True, rng=rngs_all[gc], dth_prev=dth_prev,
                    )
                    th_new = jnp.where(active, th + dth, th)
                    hid = jax.tree.map(
                        lambda n, o: jnp.where(active, n, o), hid_new, hid
                    )
                    dth_prev = jnp.where(active, dth, dth_prev)
                    # Loss steps (the trailing tk of the window) always have
                    # g >= 0, so no masking is needed on the loss itself.
                    if (train_cfg.use_inter_loss and j >= tk2 - tk) or (
                        j == tk2 - 1
                    ):
                        loss_acc = loss_acc + loss_at(dth, th, th_new)
                    th = th_new
                denom = tk if train_cfg.use_inter_loss else 1
                return None, loss_acc / denom

            body = jax.checkpoint(window_k) if train_cfg.remat else window_k
            _, losses = jax.lax.scan(body, None, jnp.arange(n_chunks))
            return th_fin, losses

        if sliding:
            th, losses = sliding_losses()
        else:
            if train_cfg.remat:
                window = jax.checkpoint(window)
            lam0 = jnp.full((th0.shape[0],), planner.cfg.lm_lambda_init,
                            jnp.float32)
            (th, _, _, _), losses = jax.lax.scan(
                window, (th0, hidden0, jnp.zeros_like(th0), lam0),
                jax.random.split(rng, n_chunks),
            )
        total = jnp.mean(losses)
        final_err = jnp.mean(
            jax.lax.stop_gradient(
                graph.graph_error(spec, planner.robot, params_fix, th, sdf)
            )
        )
        return total, {"loss": total, "final_err": final_err,
                       "final_pos_mse": jnp.mean((th[..., :2] - th_opt[..., :2]) ** 2)}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def window_loss_fn(variables, th, hid, dth_prev, batch, params_fix,
                       rng_w):
        """One tk-window loss from carry ``(th, hid, dth_prev)`` — the unit
        the ``optimize_tk`` path differentiates per optimizer step."""
        sdf, th_opt = batch["sdf"], batch["th_opt"]
        feats = planner.conv_features(
            variables, planner.stack_inputs(batch["im"], sdf), train=True
        )
        if planner.learn_cfg.fixed_conv:
            feats = jax.lax.stop_gradient(feats)
        th = jax.lax.stop_gradient(th)
        hid = jax.tree.map(jax.lax.stop_gradient, hid)
        dth_prev = jax.lax.stop_gradient(dth_prev)
        loss_acc = 0.0
        rngs = jax.random.split(rng_w, train_cfg.tk)
        for i in range(train_cfg.tk):
            dth, _, _, _, hid = planner.step(
                variables, params_fix, th, sdf, feats, hid,
                train=True, rng=rngs[i], dth_prev=dth_prev,
            )
            th_new = th + dth
            if train_cfg.use_inter_loss or i == train_cfg.tk - 1:
                terms = _step_loss(spec, planner.robot, params_fix, sdf,
                                   dth, th, th_new, th_opt, weights)
                loss_acc = loss_acc + terms.total
            th, dth_prev = th_new, dth
        denom = train_cfg.tk if train_cfg.use_inter_loss else 1
        return loss_acc / denom, (th, hid, dth_prev)

    window_grad_fn = jax.value_and_grad(window_loss_fn, has_aux=True)

    @jax.jit
    def train_step_tk(state: TrainState, batch, rng):
        """``optimize_tk`` semantics (``train_planner.py:395,417``): an
        optimizer update after every tk window, each applying the gradient
        accumulated since batch start (the reference zeroes grads only at
        ``train_planner.py:276``), with later windows seeing the updated
        parameters."""
        start, goal = batch["start"], batch["goal"]
        params_fix = graph.default_params(
            spec, planner.robot, start, goal, **batch["cov_scalars"],
            dtype=jnp.float32,
        )
        th0 = straight_line_traj(
            start[:, : spec.dof], goal[:, : spec.dof],
            spec.total_time_sec, spec.total_time_step,
        ).astype(jnp.float32)
        hidden0 = None
        if planner.recurrent:
            feats0 = planner.conv_features(
                state.variables,
                planner.stack_inputs(batch["im"], batch["sdf"]),
            )
            pos_len = spec.num_traj_states * 2
            hidden0 = planner.init_hidden(
                jax.random.PRNGKey(0), th0.shape[0],
                feats0.shape[-1] + pos_len,
            )
        gsum0 = jax.tree.map(jnp.zeros_like, state.variables)

        def body(carry, rng_w):
            variables, opt_state, th, hid, dth_prev, gsum = carry
            (loss, (th, hid, dth_prev)), g = window_grad_fn(
                variables, th, hid, dth_prev, batch, params_fix, rng_w
            )
            gsum = jax.tree.map(jnp.add, gsum, g)
            grads = gsum
            if train_cfg.clip_grad:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, train_cfg.clip_val / (gnorm + 1e-9))
                grads = jax.tree.map(lambda x: x * scale, grads)
            updates, opt_state = tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return (variables, opt_state, th, hid, dth_prev, gsum), loss

        (variables, opt_state, th, _, _, _), losses = jax.lax.scan(
            body,
            (state.variables, state.opt_state, th0, hidden0,
             jnp.zeros_like(th0), gsum0),
            jax.random.split(rng, n_chunks),
        )
        th_opt = batch["th_opt"]
        metrics = {
            "loss": jnp.mean(losses),
            "final_err": jnp.mean(
                graph.graph_error(
                    spec, planner.robot, params_fix, th, batch["sdf"]
                )
            ),
            "final_pos_mse": jnp.mean((th[..., :2] - th_opt[..., :2]) ** 2),
        }
        return (
            TrainState(step=state.step + 1, variables=variables,
                       opt_state=opt_state),
            metrics,
        )

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (loss, metrics), grads = grad_fn(state.variables, batch, rng)
        if train_cfg.clip_grad:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, train_cfg.clip_val / (gnorm + 1e-9))
            grads = jax.tree.map(lambda g: g * scale, grads)
            metrics["grad_norm"] = gnorm
        updates, opt_state = tx.update(grads, state.opt_state, state.variables)
        variables = optax.apply_updates(state.variables, updates)
        return (
            TrainState(step=state.step + 1, variables=variables,
                       opt_state=opt_state),
            metrics,
        )

    if train_cfg.optimize_tk:
        assert not sliding, "optimize_tk does not compose with sliding tk2"
        return train_step_tk
    return train_step


def init_train_state(
    planner: LearnedDiffGPMP2Planner, tx, rng, sample_im_stack, sample_th
) -> TrainState:
    variables = planner.init_variables(rng, sample_im_stack, sample_th)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_state=tx.init(variables),
    )
