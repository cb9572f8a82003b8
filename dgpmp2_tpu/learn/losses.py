"""Training losses for the learned planner.

Rebuild of ``one_step_loss`` (``diff_gpmp2/learning/train_planner.py:
75-120``): per GN step the loss compares the *step update* against the
expert's remaining delta, plus externally-weighted graph terms:

    expert_loss = mean‖dθ_pos - (θ*_pos - θ_pos)‖² +
                  λ_vel · mean‖dθ_vel - (θ*_vel - θ_vel)‖²
    ext_loss    = mean(err_gp) + mean(err_sg) + λ_obs · mean(err_obs)
    total       = expert_loss + w_ext · ext_loss

(The reference calls it with ``th_curr = dtheta`` and ``th_opt = th_opt -
th_curr`` — i.e. the MSE is over the update, ``train_planner.py:333,348``.)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    vel_loss_lambda: float = 0.1
    ext_obs_lambda: float = 1.0
    ext_loss_weight: float = 0.0
    # Weight on the expert-imitation MSE (1.0 = reference behavior).  The
    # data generator validates experts CONTACT-free only (d > r), so expert
    # trajectories graze the ε margin; down-weighting imitation and raising
    # the external obstacle term lets the learned covariances trade
    # expert-match for clearance (the margin-solve_rate metric).
    pos_loss_weight: float = 1.0
    # Smooth-max penetration surrogate (not in the reference).  solve_rate
    # is an ANY-state metric — a problem fails on its single worst hinge
    # violation — while the mean-hinge ``ext`` term underweights that worst
    # state by 1/(T·L).  :func:`smooth_max_penetration` targets the metric
    # directly.
    max_pen_weight: float = 0.0
    max_pen_beta: float = 30.0


class LossTerms(NamedTuple):
    total: jnp.ndarray
    pos: jnp.ndarray
    vel: jnp.ndarray
    gp: jnp.ndarray
    sg: jnp.ndarray
    obs: jnp.ndarray
    ext: jnp.ndarray
    maxpen: jnp.ndarray = jnp.float32(0.0)


def smooth_max_penetration(r_obs: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Differentiable surrogate of per-problem max interior penetration.

    ``r_obs`` (B, T+1, L) are hinge residuals; interior states only, the
    ``collision_metrics`` convention (endpoints excluded,
    ``planner_utils.py:92-102``).  Softmax(β·pen)-weighted mean → max as
    β → ∞ and is exactly 0 when every hinge is inactive.
    """
    pen = r_obs[..., 1:-1, :]
    flat = pen.reshape(*pen.shape[:-2], -1)
    w = jax.nn.softmax(beta * flat, axis=-1)
    return jnp.sum(w * flat, axis=-1)


def one_step_loss(
    dtheta: jnp.ndarray,
    target_delta: jnp.ndarray,
    err_sg: jnp.ndarray,
    err_gp: jnp.ndarray,
    err_obs: jnp.ndarray,
    weights: LossWeights,
    dof: int,
    r_obs: Optional[jnp.ndarray] = None,
) -> LossTerms:
    """Args:
      dtheta: (B, T+1, D) the GN update.
      target_delta: (B, T+1, D) expert-remaining delta ``th_opt - th_curr``.
      err_sg/err_gp/err_obs: (B,) unweighted graph errors at ``th_new``
        (:func:`dgpmp2_tpu.core.graph.unweighted_errors`).
      r_obs: optional (B, T+1, L) hinge residuals at ``th_new`` — required
        when ``weights.max_pen_weight > 0``.
    """
    diff = dtheta - target_delta
    pos = jnp.mean(jnp.sum(diff[..., :dof] ** 2, axis=-1))
    vel = jnp.mean(jnp.sum(diff[..., dof:] ** 2, axis=-1))
    expert = pos + weights.vel_loss_lambda * vel
    gp = jnp.mean(err_gp)
    sg = jnp.mean(err_sg)
    obs = jnp.mean(err_obs)
    ext = gp + sg + weights.ext_obs_lambda * obs
    total = weights.pos_loss_weight * expert + weights.ext_loss_weight * ext
    maxpen = jnp.float32(0.0)
    if weights.max_pen_weight:
        if r_obs is None:
            raise ValueError("max_pen_weight > 0 requires r_obs")
        maxpen = jnp.mean(smooth_max_penetration(r_obs, weights.max_pen_beta))
        total = total + weights.max_pen_weight * maxpen
    return LossTerms(total=total, pos=pos, vel=vel, gp=gp, sg=sg, obs=obs,
                     ext=ext, maxpen=maxpen)


def mse_traj(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``learn_utils.mse_traj``: sum over state dim, mean over the rest."""
    return jnp.mean(jnp.sum((pred - target) ** 2, axis=-1))


def huber_traj(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0):
    """Smooth-L1 over trajectories (``learn_utils.torch_loss('huber')``)."""
    diff = jnp.abs(pred - target)
    quad = jnp.minimum(diff, delta)
    return jnp.mean(0.5 * quad**2 + delta * (diff - quad))


def make_loss(name: str, **kwargs):
    """Loss factory mirroring ``learn_utils.torch_loss`` (mse / mse_traj /
    huber; the reference's NormMSELoss is dead code — wrong superclass,
    never importable)."""
    if name == "mse":
        return lambda p, t: jnp.mean((p - t) ** 2)
    if name == "mse_traj":
        return mse_traj
    if name == "huber":
        return lambda p, t: huber_traj(p, t, kwargs.get("delta", 1.0))
    raise ValueError(f"unknown loss {name!r}")
