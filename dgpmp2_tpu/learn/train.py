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

Semantic note (deliberate deviation, documented): the reference's windows
*slide* (loss at step t backprops through the previous ``tk2`` steps,
updating every ``tk``); chunked TBPTT uses non-overlapping windows of
``tk`` — the standard scan formulation.  Set ``tk = T`` for full BPTT.
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
    tk: int = 5  # TBPTT window (gradient truncation)
    use_inter_loss: bool = True
    clip_grad: bool = True
    clip_val: float = 2.0
    remat: bool = True  # jax.checkpoint each window body


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
            th, hid = carry
            th = jax.lax.stop_gradient(th)  # TBPTT truncation boundary
            hid = jax.tree.map(jax.lax.stop_gradient, hid)
            loss_acc = 0.0
            rngs = jax.random.split(rng_w, train_cfg.tk)
            for i in range(train_cfg.tk):
                dth, _, _, params_used, hid = planner.step(
                    variables, params_fix, th, sdf, feats, hid,
                    train=True, rng=rngs[i],
                )
                th_new = th + dth
                if train_cfg.use_inter_loss or i == train_cfg.tk - 1:
                    err_sg, err_gp, err_obs = graph.unweighted_errors(
                        spec, planner.robot, params_fix, th_new, sdf
                    )
                    terms = one_step_loss(
                        dth, th_opt - th, err_sg, err_gp, err_obs,
                        weights, spec.dof,
                    )
                    loss_acc = loss_acc + terms.total
                th = th_new
            denom = train_cfg.tk if train_cfg.use_inter_loss else 1
            return (th, hid), loss_acc / denom

        if train_cfg.remat:
            window = jax.checkpoint(window)

        (th, _), losses = jax.lax.scan(
            window, (th0, hidden0), jax.random.split(rng, n_chunks)
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
