"""Double-float (df32) Gauss-Newton step: two-word normal-equation
assembly + block-Thomas solve on the f32 backend.

``docs/F32_PRECISION.md`` §1 measures the f32 single-step ceiling at the
reference's conditioning (``cost_sigma=0.01`` →  weights 1e4,
``/root/reference/examples/configs/gpmp2_2d_params.yaml:17``) at
``~cond·ε₃₂ ≈ 1e-2`` and attributes it to *forming and solving the normal
equations in one f32 word*.  This module is the measurement apparatus for
that attribution: it reruns the exact same step with the residual/Jacobian
evaluation still in plain f32 but the assembly (``HᵀΛH``, ``HᵀΛr``) and the
block-Cholesky solve carried in two-float ``DF(hi, lo)`` arithmetic
(:mod:`dgpmp2_tpu.ops.twofloat`, ~2⁻⁴⁹ effective relative precision).  If
the attribution is right, the df32 step recovers the ~1e-5-grade agreement
of the "residual-eval-only-in-f32" row of the doc's decomposition table —
the north-star tolerance in production (f32-backend) precision.

The reference sidesteps the problem by running float64 end-to-end
(``/root/reference/diff_gpmp2/gpmp2/plan_layer.py:210-234``); TPUs have no
f64 vector unit, so two-float is the TPU-native route to reference-grade
per-step accuracy.  Everything here is elementwise f32 (VPU; IEEE-rounded
on TPU — only matmuls see the MXU) and jit/vmap-compatible.

Scope: the core factor set the conditioning study uses — GP prior,
start/goal priors, obstacle hinges — plus the generic unary factors
(nonholonomic / velocity / joint limits / self-collision).  GP-interpolated
and workspace-goal factors raise ``NotImplementedError``: the df path is an
accuracy instrument and opt-in production fallback, not a second full
engine.

Cost: ~15× the f32 elementwise flops and 2× the words of the standard
assembly+solve — still O(T·D³) block-sparse, and entirely off the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from dgpmp2_tpu.core import graph as graph_lib
from dgpmp2_tpu.ops import twofloat as tf
from dgpmp2_tpu.ops.twofloat import DF


# ---------------------------------------------------------------------------
# DF tensor helpers (static tiny axes only)
# ---------------------------------------------------------------------------


def _zeros(shape) -> DF:
    z = jnp.zeros(shape, jnp.float32)
    return DF(z, z)


def _sum_axis0(x: DF) -> DF:
    """Accurate DF sum over a static leading axis (sequential df adds)."""
    acc = DF(x.hi[0], x.lo[0])
    for i in range(1, x.hi.shape[0]):
        acc = tf.add(acc, DF(x.hi[i], x.lo[i]))
    return acc


def _sum_axes(x: DF, axes) -> DF:
    """Sum over several static axes (normalized positive, descending)."""
    axes = sorted([a % x.hi.ndim for a in axes], reverse=True)
    out = x
    for a in axes:
        out = _sum_axis0(DF(jnp.moveaxis(out.hi, a, 0), jnp.moveaxis(out.lo, a, 0)))
    return out


def _mv(mat: DF, vec: DF) -> DF:
    """(..., i, j) × (..., j) -> (..., i) — DF broadcast-multiply-reduce."""
    prod = tf.mul(mat, DF(vec.hi[..., None, :], vec.lo[..., None, :]))
    return _sum_axes(prod, (-1,))


def _outer_sum(a: DF, b: DF) -> DF:
    """Σ_k a[..., k, :, None] * b[..., k, None, :] (the HᵀΛH pattern)."""
    prod = tf.mul(
        DF(a.hi[..., :, :, None], a.lo[..., :, :, None]),
        DF(b.hi[..., :, None, :], b.lo[..., :, None, :]),
    )
    return _sum_axes(prod, (-3,))


def _lam_full(w: DF, h: DF) -> DF:
    """(Λ h): Σ_k w[..., :, k, None] * h[..., k, :] for full (K, K) Λ."""
    prod = tf.mul(
        DF(w.hi[..., :, :, None], w.lo[..., :, :, None]),
        DF(h.hi[..., None, :, :], h.lo[..., None, :, :]),
    )
    return _sum_axes(prod, (-2,))


def lift(x) -> DF:
    """Lift a plain array to DF exactly (lo = 0), via f32."""
    return tf.df(x)


def _cat(parts, axis) -> DF:
    return tf.df_concat(parts, axis)


# ---------------------------------------------------------------------------
# DF normal-equation assembly (mirrors graph.assemble_from_residuals)
# ---------------------------------------------------------------------------


def _phiT_left(q: DF, dof: int, dt: DF) -> DF:
    top = DF(q.hi[..., :dof, :], q.lo[..., :dof, :])
    bot = tf.add(tf.mul(dt, top), DF(q.hi[..., dof:, :], q.lo[..., dof:, :]))
    return _cat([top, bot], axis=-2)


def _phi_right(m: DF, dof: int, dt: DF) -> DF:
    left = DF(m.hi[..., :, :dof], m.lo[..., :, :dof])
    right = tf.add(tf.mul(dt, left), DF(m.hi[..., :, dof:], m.lo[..., :, dof:]))
    return _cat([left, right], axis=-1)


def df_assemble_from_residuals(
    spec: graph_lib.GraphSpec,
    params: graph_lib.GraphParams,
    res: graph_lib.FactorResiduals,
):
    """DF assembly of the block-tridiagonal normal equations.

    Matches :func:`dgpmp2_tpu.core.graph.assemble_from_residuals` term for
    term (same factor math, ``plan_layer.py:152-234`` semantics) with every
    product and accumulation carried in two-float.  Inputs are the plain
    f32 residuals/Jacobians and params; their f32 rounding is part of the
    measured story (the doc's decomposition bounds it at ~3.6e-6 on dθ).

    Returns (diag, off, rhs) as DF pytrees.
    """
    if spec.use_gp_inter or spec.use_workspace_goal:
        raise NotImplementedError(
            "df32 assembly covers the core + unary factor set; "
            "gp_inter/workspace_goal factors are standard-engine only"
        )
    d = spec.state_dim
    tn = spec.num_traj_states
    dof = spec.dof
    dt = tf.df_from_f64(spec.dt)

    q_inv = lift(params.q_inv)
    phiT_q = _phiT_left(q_inv, dof, dt)  # (B, T, D, D)
    batch = params.q_inv.shape[:-3]

    # diag: pad the two GP contributions to (B, T+1, D, D) and df-add.
    zblk = _zeros((*batch, 1, d, d))
    diag = tf.add(
        _cat([_phi_right(phiT_q, dof, dt), zblk], axis=-3),
        _cat([zblk, q_inv], axis=-3),
    )
    # Endpoint priors: slice-add-concat (exact DF adds, no scatter).
    ks = lift(params.ks_inv)
    first = tf.add(DF(diag.hi[..., :1, :, :], diag.lo[..., :1, :, :]),
                   DF(ks.hi[..., None, :, :], ks.lo[..., None, :, :]))
    diag = _cat([first, DF(diag.hi[..., 1:, :, :], diag.lo[..., 1:, :, :])],
                axis=-3)
    kg = lift(params.kg_inv)
    last = tf.add(DF(diag.hi[..., -1:, :, :], diag.lo[..., -1:, :, :]),
                  DF(kg.hi[..., None, :, :], kg.lo[..., None, :, :]))
    diag = _cat([DF(diag.hi[..., :-1, :, :], diag.lo[..., :-1, :, :]), last],
                axis=-3)
    off = tf.neg(phiT_q)

    # rhs from GP + prior residuals.
    r_gp = lift(res.r_gp)
    zvec = _zeros((*batch, 1, d))
    rhs = tf.add(
        _cat([_mv(phiT_q, r_gp), zvec], axis=-2),
        _cat([zvec, tf.neg(_mv(q_inv, r_gp))], axis=-2),
    )
    rs_term = _mv(lift(params.ks_inv), lift(res.r_s))
    first = tf.add(DF(rhs.hi[..., :1, :], rhs.lo[..., :1, :]),
                   DF(rs_term.hi[..., None, :], rs_term.lo[..., None, :]))
    rhs = _cat([first, DF(rhs.hi[..., 1:, :], rhs.lo[..., 1:, :])], axis=-2)
    rg_term = _mv(lift(params.kg_inv), lift(res.r_g))
    last = tf.add(DF(rhs.hi[..., -1:, :], rhs.lo[..., -1:, :]),
                  DF(rg_term.hi[..., None, :], rg_term.lo[..., None, :]))
    rhs = _cat([DF(rhs.hi[..., :-1, :], rhs.lo[..., :-1, :]), last], axis=-2)

    def unary_gauss(diag, rhs, h: DF, r: DF, lam_h: DF):
        diag = tf.add(diag, _outer_sum(h, lam_h))
        rhs = tf.add(rhs, _sum_axes(tf.mul(lam_h, DF(r.hi[..., None],
                                                     r.lo[..., None])), (-2,)))
        return diag, rhs

    h_obs = lift(res.h_obs)
    diag, rhs = unary_gauss(diag, rhs, h_obs, lift(res.r_obs),
                            _lam_full(lift(params.obs_inv), h_obs))

    if spec.non_holonomic:
        h_dyn = lift(res.h_dyn[..., None, :])
        w = lift(params.dyn_inv[..., None, None])
        diag, rhs = unary_gauss(diag, rhs, h_dyn, lift(res.r_dyn[..., None]),
                                tf.mul(w, h_dyn))
    if spec.use_vel_limits:
        h_vel = lift(res.h_vel)
        diag, rhs = unary_gauss(diag, rhs, h_vel, lift(res.r_vel),
                                _lam_full(lift(params.vel_inv), h_vel))
    if spec.use_joint_limits:
        h_jl = lift(res.h_jl)
        diag, rhs = unary_gauss(diag, rhs, h_jl, lift(res.r_jl),
                                _lam_full(lift(params.jl_inv), h_jl))
    if spec.use_self_collision:
        h_self = lift(res.h_self)
        w = lift(params.self_inv[..., None])
        diag, rhs = unary_gauss(diag, rhs, h_self, lift(res.r_self),
                                tf.mul(w, h_self))
    return diag, off, rhs


def df_damp(diag: DF, delta, trust_region: bool = False) -> DF:
    """Damping in DF: GN ``+δI`` or LM trust-region ``+δ·diag(Λ)``.

    Mirrors :func:`dgpmp2_tpu.core.gn.damped_system` broadcasting: ``delta``
    may be a python scalar (lifted at f64 precision) or a traced (B,)
    per-problem array (LM lambda; lifted exactly from f32 — its value is a
    power-of-ten schedule, not a precision-critical quantity).
    """
    d = diag.hi.shape[-1]
    if isinstance(delta, (int, float)):
        ddf = tf.df_from_f64(delta)
    else:
        ddf = tf.df(delta)
    while ddf.hi.ndim < diag.hi.ndim - 3 + 1:
        ddf = DF(ddf.hi[..., None], ddf.lo[..., None])
    scale = DF(ddf.hi[..., None, None], ddf.lo[..., None, None])
    eye = jnp.eye(d, dtype=jnp.float32)
    if trust_region:
        base = DF(diag.hi * eye, diag.lo * eye)
    else:
        base = DF(eye, jnp.zeros_like(eye))
    return tf.add(diag, tf.mul(scale, base))


# ---------------------------------------------------------------------------
# DF block-Thomas (small-D unrolled, batch in the lane axis —
# the same compute layout as tridiag._btd_factor_smalld)
# ---------------------------------------------------------------------------


def _list2(x: DF):
    """DF (D, E, B) -> nested python lists of DF (B,) scalars."""
    return [
        [DF(x.hi[i, j], x.lo[i, j]) for j in range(x.hi.shape[1])]
        for i in range(x.hi.shape[0])
    ]


def _stack2(rows) -> DF:
    return DF(
        jnp.stack([jnp.stack([e.hi for e in r], 0) for r in rows], 0),
        jnp.stack([jnp.stack([e.lo for e in r], 0) for r in rows], 0),
    )


def _stack1(vec) -> DF:
    return DF(jnp.stack([e.hi for e in vec], 0),
              jnp.stack([e.lo for e in vec], 0))


def _list1(x: DF):
    return [DF(x.hi[i], x.lo[i]) for i in range(x.hi.shape[0])]


def _chol_unrolled(c):
    d = len(c)
    zero = tf.df(jnp.zeros_like(c[0][0].hi))
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = c[j][j]
        for k in range(j):
            s = tf.sub(s, tf.mul(l[j][k], l[j][k]))
        ljj = tf.sqrt(s)
        l[j][j] = ljj
        for i in range(j + 1, d):
            s = c[i][j]
            for k in range(j):
                s = tf.sub(s, tf.mul(l[i][k], l[j][k]))
            l[i][j] = tf.div(s, ljj)
    return l


def _fwd_sub(l, b):
    d = len(l)
    z = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = tf.sub(s, tf.mul(l[i][k], z[k]))
        z.append(tf.div(s, l[i][i]))
    return z


def _bwd_sub(l, z):
    d = len(l)
    x = [None] * d
    for i in reversed(range(d)):
        s = z[i]
        for k in range(i + 1, d):
            s = tf.sub(s, tf.mul(l[k][i], x[k]))
        x[i] = tf.div(s, l[i][i])
    return x


def _chol_solve_mat(l, u):
    d = len(l)
    cols = []
    for c in range(d):
        cols.append(_bwd_sub(l, _fwd_sub(l, [u[i][c] for i in range(d)])))
    return [[cols[c][i] for c in range(d)] for i in range(d)]


def _matmul_lists(a, b):
    d = len(a)
    out = []
    for i in range(d):
        row = []
        for j in range(d):
            s = tf.mul(a[i][0], b[0][j])
            for k in range(1, d):
                s = tf.add(s, tf.mul(a[i][k], b[k][j]))
            row.append(s)
        out.append(row)
    return out


def _matvec_lists(a, v):
    d = len(a)
    out = []
    for i in range(d):
        s = tf.mul(a[i][0], v[0])
        for k in range(1, d):
            s = tf.add(s, tf.mul(a[i][k], v[k]))
        out.append(s)
    return out


def _mat_to_t(x: DF) -> DF:
    def mv_(a):
        return jnp.moveaxis(jnp.moveaxis(a, -3, 0), (-2, -1), (1, 2))
    return DF(mv_(x.hi), mv_(x.lo))


def _vec_to_t(x: DF) -> DF:
    def mv_(a):
        return jnp.moveaxis(jnp.moveaxis(a, -2, 0), -1, 1)
    return DF(mv_(x.hi), mv_(x.lo))


def _vec_from_t(x: DF) -> DF:
    def mv_(a):
        return jnp.moveaxis(jnp.moveaxis(a, 1, -1), 0, -2)
    return DF(mv_(x.hi), mv_(x.lo))


def _idx0(x: DF, i) -> DF:
    return DF(x.hi[i], x.lo[i])


def df_btd_solve(diag: DF, off: DF, rhs: DF) -> DF:
    """Solve ``Λ x = rhs`` in two-float for symmetric block-tridiagonal Λ.

    Same recurrence as :func:`dgpmp2_tpu.ops.tridiag.btd_solve`'s small-D
    path (block-Cholesky Thomas, batch riding the VPU lanes), with every
    scalar op a DF primitive.  D ≤ 8 only (unrolled).
    """
    d = diag.hi.shape[-1]
    if d > 8:
        raise NotImplementedError("df_btd_solve unrolls D<=8 blocks only")
    d_t = _mat_to_t(diag)  # (T, D, D, B)
    u_t = _mat_to_t(off)
    r_t = _vec_to_t(rhs)  # (T, D, B)

    l0 = _stack2(_chol_unrolled(_list2(_idx0(d_t, 0))))

    def fstep(l_prev, inputs):
        u_prev_a, d_i_a = inputs
        lp = _list2(l_prev)
        u_prev = _list2(u_prev_a)
        d_i = _list2(d_i_a)
        x = _chol_solve_mat(lp, u_prev)  # X = C_prev⁻¹ U_prev
        g = [[x[j][i] for j in range(d)] for i in range(d)]  # G = Xᵀ
        gu = _matmul_lists(g, u_prev)
        c_i = [[tf.sub(d_i[i][j], gu[i][j]) for j in range(d)] for i in range(d)]
        l_i = _stack2(_chol_unrolled(c_i))
        return l_i, (l_i, _stack2(g))

    _, (l_rest, gains) = lax.scan(
        fstep, l0, (u_t, DF(d_t.hi[1:], d_t.lo[1:]))
    )
    chol = DF(jnp.concatenate([l0.hi[None], l_rest.hi], 0),
              jnp.concatenate([l0.lo[None], l_rest.lo], 0))

    # Forward substitution: y_0 = r_0 ; y_i = r_i - G_{i-1} y_{i-1}
    def fwd(y_prev, inputs):
        g_a, r_a = inputs
        gv = _matvec_lists(_list2(g_a), _list1(y_prev))
        y = _stack1([tf.sub(ri, gi) for ri, gi in zip(_list1(r_a), gv)])
        return y, y

    y0 = _idx0(r_t, 0)
    _, y_rest = lax.scan(fwd, y0, (gains, DF(r_t.hi[1:], r_t.lo[1:])))
    y = DF(jnp.concatenate([y0.hi[None], y_rest.hi], 0),
           jnp.concatenate([y0.lo[None], y_rest.lo], 0))

    def solve_one(l_a, b_vec):
        l = _list2(l_a)
        return _stack1(_bwd_sub(l, _fwd_sub(l, b_vec)))

    x_last = solve_one(_idx0(chol, -1), _list1(_idx0(y, -1)))

    def bwd(x_next, inputs):
        l_a, u_a, y_a = inputs
        uv = _matvec_lists(_list2(u_a), _list1(x_next))
        t = [tf.sub(yi, ui) for yi, ui in zip(_list1(y_a), uv)]
        x = solve_one(l_a, t)
        return x, x

    _, x_rest = lax.scan(
        bwd, x_last,
        (DF(chol.hi[:-1], chol.lo[:-1]), u_t, DF(y.hi[:-1], y.lo[:-1])),
        reverse=True,
    )
    x = DF(jnp.concatenate([x_rest.hi, x_last.hi[None]], 0),
           jnp.concatenate([x_rest.lo, x_last.lo[None]], 0))
    return _vec_from_t(x)


# ---------------------------------------------------------------------------
# The df32 GN step
# ---------------------------------------------------------------------------


def df32_step_from_residuals(
    spec: graph_lib.GraphSpec,
    params: graph_lib.GraphParams,
    res: graph_lib.FactorResiduals,
    delta,
    trust_region: bool = False,
) -> jnp.ndarray:
    """df32 assembly + solve from precomputed residuals — the unit
    :func:`dgpmp2_tpu.core.gn.plan` calls per iteration under
    ``engine='df32'`` (LM per-problem lambda and trust-region supported)."""
    diag, off, rhs = df_assemble_from_residuals(spec, params, res)
    diag = df_damp(diag, delta, trust_region)
    return tf.to_f32(df_btd_solve(diag, off, rhs))


def df32_gn_step(
    spec: graph_lib.GraphSpec,
    robot,
    params: graph_lib.GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
    delta,
    trust_region: bool = False,
) -> jnp.ndarray:
    """One GN update with df32 assembly + solve; drop-in for
    :func:`dgpmp2_tpu.core.gn.gn_step` on the core factor set.

    Residual/Jacobian evaluation stays plain f32 (its contribution to step
    error is ~3.6e-6 except at hinge-activation flips, docs/F32_PRECISION.md
    §1b); everything downstream is two-float.  Returns the f32 rounding of
    the DF step.
    """
    th32 = th.astype(jnp.float32)
    res = graph_lib.eval_residuals(spec, robot, params, th32,
                                   sdf.astype(jnp.float32))
    return df32_step_from_residuals(spec, params, res, delta, trust_region)
