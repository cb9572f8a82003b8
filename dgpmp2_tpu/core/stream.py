"""Stream-layout Gauss-Newton step: assembly directly in the solve layout.

The streaming block-tridiagonal kernel (:mod:`dgpmp2_tpu.ops.pallas.
btd_stream`) wants ``(T, D·D, 8·nb, 128)`` arrays — each block scalar a full
(8, 128) f32 vreg over 1024 problems.  Feeding it from the standard
``(B, T, D, D)`` assembly costs ~0.6 ms per array in layout transposes,
which erases the kernel's win (PERFORMANCE.md).  This module instead
assembles the normal equations *natively* in the stream layout:

  * iteration-invariant pieces (GP/prior Gauss blocks, off-diagonal, the
    streamed inverse covariances) are transposed ONCE per plan
    (:func:`build_stream_static`);
  * per iteration only the small residual pieces move layout — ``r_gp``,
    ``h_obs``, ``r_obs`` etc., ~1.6 MB each at B=1024 — and every Gauss
    contribution (``HᵀΛH``, ``HᵀΛr``) is formed as elementwise vreg math.

Functionally equivalent to ``graph.assemble_from_residuals`` +
``gn.damped_system`` + ``tridiag.btd_solve`` (the rebuild of the
reference's ``plan_layer.py:152-234`` solve path); opt-in via
``OptimConfig(engine="stream")``.  Differentiable: the solve carries the
implicit-adjoint VJP (``btd_solve_stream_pre``) and every layout move is a
plain ``jnp`` op.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from dgpmp2_tpu.core import factors
from dgpmp2_tpu.core import graph as graph_lib
from dgpmp2_tpu.ops.pallas.btd_stream import (
    _BLK, _LANE, _SUB, btd_solve_stream_pre,
)

CHUNK = 16  # time steps per sequential grid step (see btd_stream)


def _nb(b: int) -> int:
    return -(-b // _BLK)


def stream(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, T', *K) -> (T', prod(K), nb·8, 128) with zero batch padding."""
    t = x.shape[1]
    x = x.reshape(b, t, -1)
    x = jnp.moveaxis(x, 0, -1)  # (T', K, B)
    pad = _nb(b) * _BLK - b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], -1)
    return x.reshape(t, x.shape[1], _nb(b) * _SUB, _LANE)


def unstream_vec(x_t: jnp.ndarray, b: int, t_len: int, d: int) -> jnp.ndarray:
    """(TP, D, S, 128) -> (B, t_len, D)."""
    x = x_t[:t_len].reshape(t_len, d, -1)[..., :b]
    return jnp.moveaxis(x, -1, 0)


def _smv(mat_s: jnp.ndarray, vec_s: jnp.ndarray, d: int) -> jnp.ndarray:
    """Stream matvec: (T', D·D, S, L) × (T', D, S, L) -> (T', D, S, L)."""
    m = mat_s.reshape(mat_s.shape[0], d, d, *mat_s.shape[2:])
    return jnp.sum(m * vec_s[:, None], axis=2)


def _rows_gauss(h_s: jnp.ndarray, w_s: jnp.ndarray, r_s: jnp.ndarray,
                k: int, d: int):
    """Gauss contribution of a unary factor with K residual rows.

    h_s: (T', K·D, S, L) stacked Jacobian rows; w_s: (T', K·K, S, L) the
    inverse covariance Λ; r_s: (T', K, S, L) residuals.  Returns
    (diag_add (T', D·D, S, L), rhs_add (T', D, S, L)) =
    (HᵀΛH, HᵀΛr) — obstacle spheres, velocity hinges and the nonholonomic
    row all share this shape (``graph.assemble_from_residuals``).
    """
    t, tail = h_s.shape[0], h_s.shape[2:]
    h = h_s.reshape(t, k, d, *tail)
    w = w_s.reshape(t, k, k, *tail)
    lam_h = jnp.sum(w[:, :, :, None] * h[:, None], axis=2)  # (T',K,D,...)
    diag_add = jnp.sum(
        h[:, :, :, None] * lam_h[:, :, None, :], axis=1
    ).reshape(t, d * d, *tail)
    rhs_add = jnp.sum(lam_h * r_s[:, :, None], axis=1)
    return diag_add, rhs_add


class StreamStatic(struct.PyTreeNode):
    """Iteration-invariant stream-layout pieces (one transpose per plan)."""

    diag_p: jnp.ndarray  # (TP, D·D, S, L) GP/prior diag + pads (+ GN reg)
    off_s: jnp.ndarray  # (T, D·D, S, L) -ΦᵀQ⁻¹
    offp_p: jnp.ndarray  # (TP, D·D, S, L) shifted super-diag
    offf_p: jnp.ndarray  # (TP, D·D, S, L) unshifted super-diag
    phiT_q_s: jnp.ndarray  # (T, D·D, S, L)
    q_inv_s: jnp.ndarray  # (T, D·D, S, L)
    ks_s: jnp.ndarray  # (1, D·D, S, L)
    kg_s: jnp.ndarray  # (1, D·D, S, L)
    obs_w_s: jnp.ndarray  # (T+1, L·L, S, L) streamed Λ_obs
    dyn_w_s: Optional[jnp.ndarray] = None  # (T+1, 1, S, L)
    vel_w_s: Optional[jnp.ndarray] = None  # (T+1, dof·dof, S, L)
    self_w_s: Optional[jnp.ndarray] = None  # (T+1, P·P, S, L) diag Λ_self
    jl_w_s: Optional[jnp.ndarray] = None  # (T+1, dof·dof, S, L)


def _pad_time(x: jnp.ndarray, tpad: int, fill: Optional[jnp.ndarray] = None):
    if not tpad:
        return x
    if fill is None:
        pad = jnp.zeros((tpad, *x.shape[1:]), x.dtype)
    else:
        pad = jnp.broadcast_to(fill, (tpad, *x.shape[1:]))
    return jnp.concatenate([x, pad], axis=0)


def build_stream_static(
    spec: graph_lib.GraphSpec,
    params: graph_lib.GraphParams,
    static: graph_lib.StaticBlocks,
    b: int,
    dtype,
    reg: float = 0.0,
) -> StreamStatic:
    """Stream-transpose the static blocks, fold pads and scalar GN damping.

    ``reg`` is the scalar ``+δI`` damping (GN); pass 0 for LM — its
    per-problem trust-region scaling is applied per iteration in
    :func:`stream_step`.
    """
    d = spec.state_dim
    dd = d * d
    t1 = spec.num_traj_states
    tpad = (-t1) % CHUNK
    sb = _nb(b) * _SUB

    eye_flat = jnp.eye(d, dtype=dtype).reshape(dd)

    diag_s = stream(jnp.broadcast_to(
        static.diag_static, (b, t1, d, d)).astype(dtype), b)
    # Batch padding: identity pivots keep the padded problems' Cholesky
    # defined (they solve to x = 0 since their rhs is 0).
    pad = _nb(b) * _BLK - b
    if pad:
        mask = (jnp.arange(_nb(b) * _BLK) >= b).reshape(1, 1, sb, _LANE)
        diag_s = diag_s + eye_flat[None, :, None, None] * mask.astype(dtype)
    if reg:
        diag_s = diag_s + jnp.asarray(reg, dtype) * eye_flat[None, :, None, None]
    diag_p = _pad_time(diag_s, tpad, eye_flat[:, None, None])

    off_s = stream(jnp.broadcast_to(
        static.off, (b, t1 - 1, d, d)).astype(dtype), b)
    zm = jnp.zeros((1, dd, sb, _LANE), dtype)
    offp_p = jnp.concatenate([zm, off_s] + [zm] * tpad, axis=0)
    offf_p = jnp.concatenate([off_s] + [zm] * (tpad + 1), axis=0)

    phiT_q_s = stream(jnp.broadcast_to(
        static.phiT_q, (b, t1 - 1, d, d)).astype(dtype), b)
    q_inv_s = stream(jnp.broadcast_to(
        params.q_inv, (b, t1 - 1, d, d)).astype(dtype), b)
    ks_s = stream(jnp.broadcast_to(
        params.ks_inv, (b, d, d)).astype(dtype)[:, None], b)
    kg_s = stream(jnp.broadcast_to(
        params.kg_inv, (b, d, d)).astype(dtype)[:, None], b)

    l = spec.nlinks
    obs_w_s = stream(jnp.broadcast_to(
        params.obs_inv, (b, t1, l, l)).astype(dtype), b)
    dyn_w_s = vel_w_s = self_w_s = jl_w_s = None
    if spec.non_holonomic:
        dyn_w_s = stream(jnp.broadcast_to(
            params.dyn_inv, (b, t1)).astype(dtype)[..., None], b)
    if spec.use_vel_limits:
        vel_w_s = stream(jnp.broadcast_to(
            params.vel_inv, (b, t1, spec.dof, spec.dof)).astype(dtype), b)
    if spec.use_joint_limits:
        jl_w_s = stream(jnp.broadcast_to(
            params.jl_inv, (b, t1, spec.dof, spec.dof)).astype(dtype), b)
    if spec.use_self_collision:
        p = spec.num_self_pairs
        lam_self = (jnp.eye(p, dtype=dtype)
                    * params.self_inv[..., None].astype(dtype))
        self_w_s = stream(jnp.broadcast_to(lam_self, (b, t1, p, p)), b)
    return StreamStatic(diag_p=diag_p, off_s=off_s, offp_p=offp_p,
                        offf_p=offf_p, phiT_q_s=phiT_q_s, q_inv_s=q_inv_s,
                        ks_s=ks_s, kg_s=kg_s, obs_w_s=obs_w_s,
                        dyn_w_s=dyn_w_s, vel_w_s=vel_w_s, self_w_s=self_w_s,
                        jl_w_s=jl_w_s)


def _interp_deltas(spec, params, res, dtype):
    """GP-interpolated obstacle contributions in the standard layout.

    Same math as the ``use_gp_inter`` branch of
    ``graph.assemble_from_residuals``, but returning the five per-segment
    delta arrays so the stream path can transpose just those (the interp
    factors are the only ones that touch the off-diagonal).
    """
    lam_m, psi_m = factors.gp_interp_coeffs(
        spec.dof, spec.dt, spec.num_inter, dtype
    )
    h_i = res.h_obsi  # (B, T, nip, L, D)
    lam_t = jnp.swapaxes(lam_m, -1, -2)[:, None, :, :]
    psi_t = jnp.swapaxes(psi_m, -1, -2)[:, None, :, :]
    a_l = jnp.sum(lam_t * h_i[..., None, :], axis=-1)
    a_p = jnp.sum(psi_t * h_i[..., None, :], axis=-1)
    w = params.obs_inv[..., :-1, None, :, :]
    lam_al = jnp.sum(w[..., :, :, None] * a_l[..., None, :, :], axis=-2)
    lam_ap = jnp.sum(w[..., :, :, None] * a_p[..., None, :, :], axis=-2)
    lam_r = jnp.sum(w * res.r_obsi[..., None, :], axis=-1)
    d_diag_l = jnp.sum(a_l[..., :, None] * lam_al[..., None, :], axis=(-4, -3))
    d_diag_p = jnp.sum(a_p[..., :, None] * lam_ap[..., None, :], axis=(-4, -3))
    d_off = jnp.sum(a_l[..., :, None] * lam_ap[..., None, :], axis=(-4, -3))
    d_rhs_l = jnp.sum(a_l * lam_r[..., None], axis=(-3, -2))
    d_rhs_p = jnp.sum(a_p * lam_r[..., None], axis=(-3, -2))
    return d_diag_l, d_diag_p, d_off, d_rhs_l, d_rhs_p


def stream_step(
    spec: graph_lib.GraphSpec,
    params: graph_lib.GraphParams,
    ss: StreamStatic,
    res: graph_lib.FactorResiduals,
    delta=None,
    trust_region: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One damped GN update ``dθ`` computed end-to-end in stream layout.

    ``delta`` is only consulted when ``trust_region`` (LM): the scalar GN
    ``+δI`` was folded into ``ss.diag_p`` at build time.  Returns
    (B, T+1, D) in the standard layout.
    """
    d = spec.state_dim
    dd = d * d
    t1 = spec.num_traj_states
    b = res.r_gp.shape[0]
    dtype = ss.diag_p.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp = ss.diag_p.shape[0]
    tail = ss.diag_p.shape[2:]

    # --- rhs: GP + priors -------------------------------------------------
    r_gp_s = stream(res.r_gp.astype(dtype), b)
    rhs = jnp.zeros((tp, d, *tail), dtype)
    rhs = rhs.at[: t1 - 1].add(_smv(ss.phiT_q_s, r_gp_s, d))
    rhs = rhs.at[1:t1].add(-_smv(ss.q_inv_s, r_gp_s, d))
    r_sg_s = stream(jnp.stack([res.r_s, res.r_g], 1).astype(dtype), b)
    rhs = rhs.at[0].add(_smv(ss.ks_s, r_sg_s[:1], d)[0])
    rhs = rhs.at[t1 - 1].add(_smv(ss.kg_s, r_sg_s[1:], d)[0])

    # --- unary Gauss terms: obstacles, nonholonomic, velocity ------------
    l = spec.nlinks
    h_obs_s = stream(res.h_obs.astype(dtype), b)  # (T+1, L·D, ...)
    r_obs_s = stream(res.r_obs.astype(dtype), b)  # (T+1, L, ...)
    d_add, r_add = _rows_gauss(h_obs_s, ss.obs_w_s, r_obs_s, l, d)
    diag = ss.diag_p.at[:t1].add(d_add)
    rhs = rhs.at[:t1].add(r_add)

    if spec.non_holonomic:
        h_dyn_s = stream(res.h_dyn.astype(dtype), b)
        r_dyn_s = stream(res.r_dyn.astype(dtype)[..., None], b)
        d_add, r_add = _rows_gauss(h_dyn_s, ss.dyn_w_s, r_dyn_s, 1, d)
        diag = diag.at[:t1].add(d_add)
        rhs = rhs.at[:t1].add(r_add)
    if spec.use_vel_limits:
        h_vel_s = stream(res.h_vel.astype(dtype), b)
        r_vel_s = stream(res.r_vel.astype(dtype), b)
        d_add, r_add = _rows_gauss(h_vel_s, ss.vel_w_s, r_vel_s, spec.dof, d)
        diag = diag.at[:t1].add(d_add)
        rhs = rhs.at[:t1].add(r_add)
    if spec.use_joint_limits:
        h_jl_s = stream(res.h_jl.astype(dtype), b)
        r_jl_s = stream(res.r_jl.astype(dtype), b)
        d_add, r_add = _rows_gauss(h_jl_s, ss.jl_w_s, r_jl_s, spec.dof, d)
        diag = diag.at[:t1].add(d_add)
        rhs = rhs.at[:t1].add(r_add)
    if spec.use_self_collision:
        h_self_s = stream(res.h_self.astype(dtype), b)
        r_self_s = stream(res.r_self.astype(dtype), b)
        d_add, r_add = _rows_gauss(h_self_s, ss.self_w_s, r_self_s,
                                   spec.num_self_pairs, d)
        diag = diag.at[:t1].add(d_add)
        rhs = rhs.at[:t1].add(r_add)

    # --- Terminal workspace goal (unary at the last state) ---------------
    if spec.use_workspace_goal:
        h_wg = res.h_wg  # (B, W, D)
        lam_hw = jnp.sum(
            params.wg_inv[..., :, :, None] * h_wg[..., None, :, :], axis=-2
        )
        hTlh = jnp.sum(
            h_wg[..., :, :, None] * lam_hw[..., :, None, :], axis=-3
        )  # (B, D, D)
        hTlr = jnp.sum(lam_hw * res.r_wg[..., None], axis=-2)  # (B, D)
        diag = diag.at[t1 - 1].add(stream(hTlh[:, None].astype(dtype), b)[0])
        rhs = rhs.at[t1 - 1].add(stream(hTlr[:, None].astype(dtype), b)[0])

    # --- GP-interpolated obstacle factors (touch the off-diagonal) -------
    offp_p, offf_p = ss.offp_p, ss.offf_p
    if spec.use_gp_inter:
        d_diag_l, d_diag_p, d_off, d_rhs_l, d_rhs_p = _interp_deltas(
            spec, params, res, dtype
        )
        diag = diag.at[: t1 - 1].add(stream(d_diag_l, b))
        diag = diag.at[1:t1].add(stream(d_diag_p, b))
        rhs = rhs.at[: t1 - 1].add(stream(d_rhs_l, b))
        rhs = rhs.at[1:t1].add(stream(d_rhs_p, b))
        off_s = ss.off_s + stream(d_off, b)
        zm = jnp.zeros((1, dd, *tail), dtype)
        tpad = tp - t1
        offp_p = jnp.concatenate([zm, off_s] + [zm] * tpad, axis=0)
        offf_p = jnp.concatenate([off_s] + [zm] * (tpad + 1), axis=0)

    # --- LM trust-region damping: diag_ii *= (1 + δ_b) --------------------
    if trust_region:
        lam_s = stream(
            jnp.broadcast_to(jnp.asarray(delta, dtype), (b,))[:, None, None], b
        )  # (1, 1, S, L)
        ii = [i * (d + 1) for i in range(d)]
        diag = diag.at[:, ii].multiply(1.0 + lam_s)

    x_t = btd_solve_stream_pre(diag, offp_p, offf_p, rhs, interpret, CHUNK)
    return unstream_vec(x_t, b, t1, d).astype(res.r_gp.dtype)


def gn_step_stream(
    spec: graph_lib.GraphSpec,
    robot,
    params: graph_lib.GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
    delta,
    trust_region: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Standalone stream-engine counterpart of ``gn.gn_step`` (for tests)."""
    res = graph_lib.eval_residuals(spec, robot, params, th, sdf)
    static = graph_lib.assemble_static(spec, params, th.dtype)
    reg = 0.0 if trust_region else float(delta)
    ss = build_stream_static(spec, params, static, th.shape[0], th.dtype, reg)
    return stream_step(spec, params, ss, res, delta, trust_region, interpret)
