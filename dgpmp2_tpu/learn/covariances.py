"""Decoding network outputs into PSD factor covariances.

Rebuild of ``DiffGPMP2Planner.get_covariances``
(``diff_gpmp2/gpmp2/diff_gpmp2_planner.py:247-290``) and the ``out_dim``
bookkeeping (``:63-83``).  The network emits a flat vector; PSD-ness is
guaranteed by elementwise / outer-product squaring:

* ``fix_dynamics``   — only obstacle weights are learned; GP covariance
  stays at the YAML value.
* ``diag_identity``  — one scalar per GP factor: ``Q_c⁻¹ = s²·I``.
* ``diag``           — per-axis scalars: ``Q_c⁻¹ = diag(s²)``.  (The
  reference raises NotImplementedError here; we implement the documented
  intent.)
* ``qc_full``        — rank-1 ``Q_c⁻¹ = s sᵀ`` (dof×dof).
* ``q_full``         — rank-1 full GP inverse covariance ``Q⁻¹ = s sᵀ``
  (state_dim×state_dim) injected directly (``plan_layer.py:90``).
* ``learn_eps``      — appends per-state obstacle safety margins ε = s².
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dgpmp2_tpu.core.graph import GraphSpec

MODES = ("fix_dynamics", "diag_identity", "diag", "qc_full", "q_full")


class DecodedCovariances(NamedTuple):
    qc_inv: Optional[jnp.ndarray]  # (B, T, dof, dof) or None (fix_dynamics)
    q_inv: Optional[jnp.ndarray]  # (B, T, D, D) for q_full, else None
    obs_inv: jnp.ndarray  # (B, T+1, L, L)
    eps: Optional[jnp.ndarray]  # (B, T+1, L) when learn_eps


def out_dim(spec: GraphSpec, mode: str, learn_eps: bool = False) -> int:
    """Flat network output dimension (``diff_gpmp2_planner.py:63-83``)."""
    t, tn, l = spec.num_gp_factors, spec.num_traj_states, spec.nlinks
    gp_terms = {
        "fix_dynamics": 0,
        "diag_identity": t,
        "diag": t * spec.dof,
        "qc_full": t * spec.dof,
        "q_full": t * spec.state_dim,
    }[mode]
    d = gp_terms + tn * l
    if learn_eps:
        d += tn * l
    return d


def decode(
    out: jnp.ndarray, spec: GraphSpec, mode: str, learn_eps: bool = False,
    eps_max: float = None,
) -> DecodedCovariances:
    """Decode the flat (B, out_dim) network output into covariances.

    ``eps_max``: when set (and ``learn_eps``), the safety margin decodes as
    ``eps_max * sigmoid(s)`` instead of the unbounded ``s**2`` — bounding
    how far learning can inflate the planner's hinge margin.  Unbounded
    eps lets a task-only loss game the margin-violation solve-rate metric
    (the campaign measured solve 0.99 with goal error 1.3: the planner
    stops tracking the goal and flees obstacles instead)."""
    if mode not in MODES:
        raise ValueError(f"unknown dynamics_mode {mode!r}; expected one of {MODES}")
    b = out.shape[0]
    t, tn, l = spec.num_gp_factors, spec.num_traj_states, spec.nlinks
    dof, d = spec.dof, spec.state_dim
    num_obs = tn * l

    qc_inv = None
    q_inv = None
    if mode == "fix_dynamics":
        gp_terms = 0
    elif mode == "diag_identity":
        gp_terms = t
        s = out[:, :gp_terms].reshape(b, t, 1, 1)
        qc_inv = (s * s) * jnp.eye(dof, dtype=out.dtype)
    elif mode == "diag":
        gp_terms = t * dof
        s = out[:, :gp_terms].reshape(b, t, dof)
        qc_inv = (s * s)[..., None] * jnp.eye(dof, dtype=out.dtype)
    elif mode == "qc_full":
        gp_terms = t * dof
        s = out[:, :gp_terms].reshape(b, t, dof, 1)
        qc_inv = s * jnp.swapaxes(s, -1, -2)
    else:  # q_full
        gp_terms = t * d
        s = out[:, :gp_terms].reshape(b, t, d, 1)
        q_inv = s * jnp.swapaxes(s, -1, -2)

    so = out[:, gp_terms : gp_terms + num_obs].reshape(b, tn, l, 1)
    obs_inv = so * jnp.swapaxes(so, -1, -2)

    eps = None
    if learn_eps:
        se = out[:, gp_terms + num_obs :].reshape(b, tn, l)
        eps = se * se if eps_max is None else eps_max * jax.nn.sigmoid(se)
    return DecodedCovariances(qc_inv=qc_inv, q_inv=q_inv, obs_inv=obs_inv, eps=eps)
