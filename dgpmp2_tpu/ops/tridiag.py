"""Batched symmetric block-tridiagonal solver.

The Gauss-Newton normal matrix of a GPMP2 factor graph, ``Λ = AᵀKA``, is
symmetric positive-definite and **block-tridiagonal** with ``D×D`` blocks
(D = state_dim): GP factors couple only neighbouring states, all other
factors are unary.  The reference materializes the dense ``(B, M, N)``
Jacobian and solves dense ``(B, N, N)`` normal equations by Cholesky plus
two explicit triangular inversions (``diff_gpmp2/gpmp2/plan_layer.py:
152-234``) — O(T²)–O(T³) work on >99 % zeros.  Here we store only the block
diagonal/off-diagonal and run a block-Thomas (block-Cholesky) recurrence:
O(T·D³) work, O(T·D²) memory, batched over problems.

Storage convention
------------------
``diag``  : (..., T, D, D)   block ``Λ[i, i]``
``off``   : (..., T-1, D, D) block ``Λ[i, i+1]`` (the (i+1, i) block is its
            transpose — only the upper blocks are stored)
``rhs``   : (..., T, D)

All functions accept arbitrary leading batch dimensions.  The recurrence
scans over the *time* axis with the whole batch as the inner vectorized
unit, so each scan step is a batched (B, D, D) triangular solve / matmul —
the shape XLA maps well onto TPU vector units.

Differentiation
---------------
:func:`btd_solve` carries a custom VJP using the implicit-function adjoint
of a linear solve: with ``x = Λ⁻¹ r`` and output cotangent ``x̄``,

    λ       = Λ⁻¹ x̄            (Λ symmetric)
    r̄       = λ
    diaḡ_i  = -λ_i x_iᵀ
    off̄_i   = -(λ_i x_{i+1}ᵀ + x_i λ_{i+1}ᵀ)

The backward solve reuses the forward pass's block-Cholesky factors, so a
full GN-step VJP costs one extra substitution sweep instead of
differentiating through the factorization (unrolled-Cholesky AD is both
slower and less stable).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_solve


class BTDFactors(NamedTuple):
    """Block-Thomas factorization of a symmetric block-tridiagonal matrix.

    chol: (..., T, D, D) lower-Cholesky factors of the Schur-complement
          pivots ``C_i = D_i - U_{i-1}ᵀ C_{i-1}⁻¹ U_{i-1}``.
    gain: (..., T-1, D, D) elimination gains ``G_i = U_iᵀ C_i⁻¹`` (indexed by
          the off-diagonal they eliminate: gain[i] acts on step i -> i+1).
    """

    chol: jnp.ndarray
    gain: jnp.ndarray


def _t(x):
    return jnp.swapaxes(x, -1, -2)


def _chol(c):
    return jnp.linalg.cholesky(c)


def _cho_solve_l(l, b):
    """Solve ``C x = b`` given lower-Cholesky ``l`` of C; b is (..., D, K)."""
    return cho_solve((l, True), b)


# ---------------------------------------------------------------------------
# Small-D specialization: unrolled scalar Cholesky, batch in the lane axis
# ---------------------------------------------------------------------------
#
# For GPMP2, D = state_dim is 4 or 6.  XLA's generic batched Cholesky /
# triangular solve is a poor fit at that size (loopy lowering), and on TPU
# the (B, D, D) matmuls inside the recurrence route through the MXU at
# bf16 default precision — enough rounding to break SPD-ness of the Schur
# pivots and NaN the sqrt.  The small-D path instead:
#
#  * transposes to (T, D, D, B) so every scalar of the DxD algebra is a
#    (B,)-vector riding the VPU lanes (B = 1024 is exactly one f32 vreg
#    sublane x lane tile),
#  * unrolls Cholesky / substitutions / tiny matmuls into static elementwise
#    graphs (exact f32, no MXU, no LAPACK loop),
#
# which is the same compute layout the Pallas kernel uses.

_SMALLD_MAX = 8


def _list2(x):
    """(D, E, B) array -> nested python lists of (B,) arrays."""
    return [[x[i, j] for j in range(x.shape[1])] for i in range(x.shape[0])]


def _stack2(rows):
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def _chol_unrolled(c):
    """Lower Cholesky of (D, D, B) as unrolled scalar ops; returns lists."""
    d = len(c)
    zero = jnp.zeros_like(c[0][0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = c[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        ljj = jnp.sqrt(s)
        inv = 1.0 / ljj
        l[j][j] = ljj
        for i in range(j + 1, d):
            s = c[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    return l


def _fwd_sub(l, b):
    """Solve L z = b (lists of (B,) arrays)."""
    d = len(l)
    z = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * z[k]
        z.append(s / l[i][i])
    return z


def _bwd_sub(l, z):
    """Solve Lᵀ x = z."""
    d = len(l)
    x = [None] * d
    for i in reversed(range(d)):
        s = z[i]
        for k in range(i + 1, d):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return x


def _chol_solve_mat(l, u):
    """Solve C X = U column-by-column; U, X as (D, D) lists of (B,)."""
    d = len(l)
    cols = []
    for c in range(d):
        col = [u[i][c] for i in range(d)]
        cols.append(_bwd_sub(l, _fwd_sub(l, col)))
    # cols[c][i] = X[i][c]
    return [[cols[c][i] for c in range(d)] for i in range(d)]


def _matmul_lists(a, b):
    d = len(a)
    return [
        [sum(a[i][k] * b[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def _matvec_lists(a, v):
    d = len(a)
    return [sum(a[i][k] * v[k] for k in range(d)) for i in range(d)]


def _mat_to_t(x):
    """(..., T, D, D) -> (T, D, D, ...batch) so batch rides the lanes."""
    return jnp.moveaxis(jnp.moveaxis(x, -3, 0), (-2, -1), (1, 2))


def _mat_from_t(x):
    return jnp.moveaxis(jnp.moveaxis(x, (1, 2), (-2, -1)), 0, -3)


def _vec_to_t(x):
    """(..., T, D) -> (T, D, ...batch)."""
    return jnp.moveaxis(jnp.moveaxis(x, -2, 0), -1, 1)


def _vec_from_t(x):
    return jnp.moveaxis(jnp.moveaxis(x, 1, -1), 0, -2)


def _btd_factor_smalld(diag, off):
    d_t = _mat_to_t(diag)  # (T, D, D, B)
    u_t = _mat_to_t(off)

    l0 = _stack2(_chol_unrolled(_list2(d_t[0])))

    def step(l_prev, inputs):
        u_prev_a, d_i_a = inputs
        lp = _list2(l_prev)
        u_prev = _list2(u_prev_a)
        d_i = _list2(d_i_a)
        x = _chol_solve_mat(lp, u_prev)  # X = C_prev^{-1} U_prev
        g = [[x[j][i] for j in range(len(x))] for i in range(len(x))]  # Xᵀ
        gu = _matmul_lists(g, u_prev)
        c_i = [
            [d_i[i][j] - gu[i][j] for j in range(len(d_i))]
            for i in range(len(d_i))
        ]
        l_i = _stack2(_chol_unrolled(c_i))
        return l_i, (l_i, _stack2(g))

    _, (l_rest, gains) = lax.scan(step, l0, (u_t, d_t[1:]))
    chol = jnp.concatenate([l0[None], l_rest], axis=0)  # (T, D, D, B)
    return BTDFactors(_mat_from_t(chol), _mat_from_t(gains))


def _btd_solve_factored_smalld(factors, off, rhs):
    l_t = _mat_to_t(factors.chol)  # (T, D, D, B)
    g_t = _mat_to_t(factors.gain)
    u_t = _mat_to_t(off)
    r_t = _vec_to_t(rhs)  # (T, D, B)

    def fwd(y_prev, inputs):
        g_a, r_a = inputs
        g = _list2(g_a)
        y = [r_a[i] - v for i, v in enumerate(_matvec_lists(g, list(y_prev)))]
        y = jnp.stack(y, 0)
        return y, y

    y0 = r_t[0]
    _, y_rest = lax.scan(fwd, y0, (g_t, r_t[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    def solve_one(l_a, b_a):
        l = _list2(l_a)
        return jnp.stack(_bwd_sub(l, _fwd_sub(l, list(b_a))), 0)

    x_last = solve_one(l_t[-1], y[-1])

    def bwd(x_next, inputs):
        l_a, u_a, y_a = inputs
        u = _list2(u_a)
        t = [y_a[i] - v for i, v in enumerate(_matvec_lists(u, list(x_next)))]
        x = solve_one(l_a, jnp.stack(t, 0))
        return x, x

    _, x_rest = lax.scan(bwd, x_last, (l_t[:-1], u_t, y[:-1]), reverse=True)
    x = jnp.concatenate([x_rest, x_last[None]], axis=0)
    return _vec_from_t(x)


def btd_factor(diag: jnp.ndarray, off: jnp.ndarray) -> BTDFactors:
    """Block-Thomas factorization (forward elimination of the pivots)."""
    if diag.shape[-1] <= _SMALLD_MAX:
        return _btd_factor_smalld(diag, off)
    # Scan over time: move the T axis to the front.
    d_t = jnp.moveaxis(diag, -3, 0)  # (T, ..., D, D)
    u_t = jnp.moveaxis(off, -3, 0)  # (T-1, ..., D, D)

    c0 = d_t[0]
    l0 = _chol(c0)

    def step(l_prev, inputs):
        u_prev, d_i = inputs
        # G = U_prevᵀ C_prev⁻¹  ==  (C_prev⁻¹ U_prev)ᵀ  (C symmetric)
        g = _t(_cho_solve_l(l_prev, u_prev))
        # Full-precision matmul: TPU bf16 MXU rounding can push the Schur
        # pivot off SPD and NaN the Cholesky.
        c_i = d_i - jnp.matmul(g, u_prev, precision=lax.Precision.HIGHEST)
        l_i = _chol(c_i)
        return l_i, (l_i, g)

    _, (l_rest, gains) = lax.scan(step, l0, (u_t, d_t[1:]))
    chol = jnp.concatenate([l0[None], l_rest], axis=0)
    return BTDFactors(jnp.moveaxis(chol, 0, -3), jnp.moveaxis(gains, 0, -3))


def btd_solve_factored(
    factors: BTDFactors, off: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Substitution sweeps given a precomputed factorization."""
    if rhs.shape[-1] <= _SMALLD_MAX:
        return _btd_solve_factored_smalld(factors, off, rhs)
    l_t = jnp.moveaxis(factors.chol, -3, 0)
    g_t = jnp.moveaxis(factors.gain, -3, 0)
    u_t = jnp.moveaxis(off, -3, 0)
    r_t = jnp.moveaxis(rhs, -2, 0)  # (T, ..., D)

    # Forward: y_0 = r_0 ; y_i = r_i - G_{i-1} y_{i-1}
    def fwd(y_prev, inputs):
        g, r = inputs
        y = r - (g @ y_prev[..., None])[..., 0]
        return y, y

    y0 = r_t[0]
    _, y_rest = lax.scan(fwd, y0, (g_t, r_t[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)

    # Backward: x_T = C_T⁻¹ y_T ; x_i = C_i⁻¹ (y_i - U_i x_{i+1})
    x_last = _cho_solve_l(l_t[-1], y[-1][..., None])[..., 0]

    def bwd(x_next, inputs):
        l_i, u_i, y_i = inputs
        x = _cho_solve_l(l_i, (y_i - (u_i @ x_next[..., None])[..., 0])[..., None])[
            ..., 0
        ]
        return x, x

    _, x_rest = lax.scan(
        bwd, x_last, (l_t[:-1], u_t, y[:-1]), reverse=True
    )
    x = jnp.concatenate([x_rest, x_last[None]], axis=0)
    return jnp.moveaxis(x, 0, -2)


@jax.custom_vjp
def btd_solve(diag: jnp.ndarray, off: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve ``Λ x = rhs`` for symmetric block-tridiagonal ``Λ``.

    Args:
      diag: (..., T, D, D) diagonal blocks (SPD after damping).
      off:  (..., T-1, D, D) super-diagonal blocks ``Λ[i, i+1]``.
      rhs:  (..., T, D).

    Returns:
      x: (..., T, D).
    """
    factors = btd_factor(diag, off)
    return btd_solve_factored(factors, off, rhs)


def _btd_solve_fwd(diag, off, rhs):
    factors = btd_factor(diag, off)
    x = btd_solve_factored(factors, off, rhs)
    return x, (factors, off, x)


def _btd_solve_bwd(res, x_bar):
    factors, off, x = res
    lam = btd_solve_factored(factors, off, x_bar)
    rhs_bar = lam
    diag_bar = -lam[..., :, :, None] * x[..., :, None, :]
    off_bar = -(
        lam[..., :-1, :, None] * x[..., 1:, None, :]
        + x[..., :-1, :, None] * lam[..., 1:, None, :]
    )
    return diag_bar, off_bar, rhs_bar


btd_solve.defvjp(_btd_solve_fwd, _btd_solve_bwd)


# ---------------------------------------------------------------------------
# Block cyclic reduction: log-depth solver for TPU
# ---------------------------------------------------------------------------
#
# The Thomas recurrence is work-optimal but serial in T: at T = 100 the scan
# runs ~100 dependent steps of tiny vectorized work — latency-bound on TPU.
# Cyclic reduction eliminates all odd-indexed states simultaneously,
# halving the system per level: log2(T) levels of *full-batch* elementwise
# work (the reduced system is the Schur complement onto the even states, so
# SPD-ness is preserved level by level).  ~2x the flops of Thomas, ~14x
# fewer dependent steps at T = 101.
#
# The system is padded to n = 2^K + 1 with decoupled identity equations;
# each level stores (chol(D_odd), L = U_rᵀ D_odd⁻¹, R = U_l D_odd⁻¹) so a
# factorization is reusable across right-hand sides — the custom VJP's
# backward solve reuses it just like the Thomas path.


def _lt(x):
    """Transpose a list-of-lists matrix."""
    d = len(x)
    return [[x[j][i] for j in range(d)] for i in range(d)]


def _to_lists(x):
    """(..., m, D, D) -> D x D lists of (..., m) arrays."""
    return [[x[..., i, j] for j in range(x.shape[-1])] for i in range(x.shape[-2])]


def _from_lists(rows):
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def _vec_to_lists(x):
    return [x[..., i] for i in range(x.shape[-1])]


def _vec_from_lists(v):
    return jnp.stack(v, -1)


def _pad_pow2p1(diag, off, rhs):
    t = diag.shape[-3]
    k = max(1, (t - 2).bit_length())
    n = 2**k + 1
    if n < t:
        k += 1
        n = 2**k + 1
    pad = n - t
    if pad == 0:
        return diag, off, rhs, 0
    eye = jnp.broadcast_to(
        jnp.eye(diag.shape[-1], dtype=diag.dtype),
        (*diag.shape[:-3], pad, *diag.shape[-2:]),
    )
    diag = jnp.concatenate([diag, eye], axis=-3)
    zoff = jnp.zeros((*off.shape[:-3], pad, *off.shape[-2:]), off.dtype)
    off = jnp.concatenate([off, zoff], axis=-3)
    zrhs = jnp.zeros((*rhs.shape[:-2], pad, rhs.shape[-1]), rhs.dtype)
    rhs = jnp.concatenate([rhs, zrhs], axis=-2)
    return diag, off, rhs, pad


class CRFactors(NamedTuple):
    """Per-level (chol_odd, L, R) in (..., m, D, D) layout plus the base
    factorization as a length-tagged tuple: 1 block -> (chol,); 2 blocks ->
    (chol(D0), chol(Schur), W = U0ᵀ D0⁻¹, U0)."""

    levels: tuple
    base: tuple
    pad: int


def cr_factor(diag: jnp.ndarray, off: jnp.ndarray) -> CRFactors:
    diag, off, _, pad = _pad_pow2p1(
        diag, off, jnp.zeros((*diag.shape[:-2], diag.shape[-1]), diag.dtype)
    )
    levels = []
    while diag.shape[-3] > 2:
        d_odd = _to_lists(diag[..., 1::2, :, :])
        u_l = _to_lists(off[..., 0::2, :, :])  # couples (even k, odd k)
        u_r = _to_lists(off[..., 1::2, :, :])  # couples (odd k, even k+1)
        chol_odd = _chol_unrolled(d_odd)
        # L = U_rᵀ D_odd⁻¹  = (D_odd⁻¹ U_r)ᵀ ;  R = U_l D_odd⁻¹ = (D_odd⁻¹ U_lᵀ)ᵀ
        l_mat = _lt(_chol_solve_mat(chol_odd, u_r))
        r_mat = _lt(_chol_solve_mat(chol_odd, _lt(u_l)))
        # Reduced even system.
        d_even = _to_lists(diag[..., 0::2, :, :])
        lu_r = _matmul_lists(l_mat, u_r)  # U_rᵀ D⁻¹ U_r  -> even k+1
        ru_lt = _matmul_lists(r_mat, _lt(u_l))  # U_l D⁻¹ U_lᵀ -> even k
        d_even_a = _from_lists(d_even)
        d_even_a = d_even_a.at[..., 1:, :, :].add(-_from_lists(lu_r))
        d_even_a = d_even_a.at[..., :-1, :, :].add(-_from_lists(ru_lt))
        new_off = -_from_lists(_matmul_lists(r_mat, u_r))
        levels.append(
            (_from_lists(chol_odd), _from_lists(l_mat), _from_lists(r_mat))
        )
        diag = d_even_a
        off = new_off
    if diag.shape[-3] == 1:
        base = (_from_lists(_chol_unrolled(_to_lists(diag[..., 0, :, :]))),)
    else:  # 2-block Schur base
        d0 = _to_lists(diag[..., 0, :, :])
        d1 = _to_lists(diag[..., 1, :, :])
        u0 = _to_lists(off[..., 0, :, :])
        chol0 = _chol_unrolled(d0)
        w = _lt(_chol_solve_mat(chol0, u0))  # U0ᵀ D0⁻¹
        wu = _matmul_lists(w, u0)
        schur = [
            [d1[i][j] - wu[i][j] for j in range(len(d1))] for i in range(len(d1))
        ]
        chol_s = _chol_unrolled(schur)
        base = (
            _from_lists(chol0),
            _from_lists(chol_s),
            _from_lists(w),
            off[..., 0, :, :],
        )
    return CRFactors(levels=tuple(levels), base=base, pad=pad)


def cr_solve_factored(factors: CRFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    t_orig = rhs.shape[-2]
    if factors.pad:
        z = jnp.zeros((*rhs.shape[:-2], factors.pad, rhs.shape[-1]), rhs.dtype)
        rhs = jnp.concatenate([rhs, z], axis=-2)

    # Downward sweep: reduce rhs to the base equation.
    stack = []
    r = rhs
    for chol_odd, l_mat, r_mat in factors.levels:
        r_odd = r[..., 1::2, :]
        r_even = r[..., 0::2, :]
        lm, rm = _to_lists(l_mat), _to_lists(r_mat)
        ro = _vec_to_lists(r_odd)
        r_even = r_even.at[..., 1:, :].add(-_vec_from_lists(_matvec_lists(lm, ro)))
        r_even = r_even.at[..., :-1, :].add(-_vec_from_lists(_matvec_lists(rm, ro)))
        stack.append(r_odd)
        r = r_even

    # Base solve.
    if len(factors.base) == 1:
        bl = _to_lists(factors.base[0])
        x = _vec_from_lists(
            _bwd_sub(bl, _fwd_sub(bl, _vec_to_lists(r[..., 0, :])))
        )[..., None, :]
    else:
        chol0_a, chol_s_a, w_a, u0_a = factors.base
        chol0, chol_s = _to_lists(chol0_a), _to_lists(chol_s_a)
        w, u0 = _to_lists(w_a), _to_lists(u0_a)
        r0 = _vec_to_lists(r[..., 0, :])
        r1 = _vec_to_lists(r[..., 1, :])
        wr0 = _matvec_lists(w, r0)
        x1 = _bwd_sub(chol_s, _fwd_sub(chol_s, [r1[i] - wr0[i] for i in range(len(r1))]))
        u0x1 = _matvec_lists(u0, x1)
        x0 = _bwd_sub(
            chol0, _fwd_sub(chol0, [r0[i] - u0x1[i] for i in range(len(r0))])
        )
        x = jnp.stack([_vec_from_lists(x0), _vec_from_lists(x1)], axis=-2)

    # Upward sweep: recover odd states.
    for (chol_odd, l_mat, r_mat), r_odd in zip(
        reversed(factors.levels), reversed(stack)
    ):
        cl = _to_lists(chol_odd)
        # x_odd = D_odd⁻¹ r_odd - Rᵀ x_left - Lᵀ x_right
        t = _vec_to_lists(r_odd)
        s3 = _bwd_sub(cl, _fwd_sub(cl, t))
        x_left = _vec_to_lists(x[..., :-1, :])
        x_right = _vec_to_lists(x[..., 1:, :])
        rt = _lt(_to_lists(r_mat))
        lt_ = _lt(_to_lists(l_mat))
        x_odd = [
            s3[i]
            - _matvec_lists(rt, x_left)[i]
            - _matvec_lists(lt_, x_right)[i]
            for i in range(len(s3))
        ]
        x_odd = _vec_from_lists(x_odd)
        # Interleave evens (x) and odds.
        n = x.shape[-2] + x_odd.shape[-2]
        out = jnp.zeros((*x.shape[:-2], n, x.shape[-1]), x.dtype)
        out = out.at[..., 0::2, :].set(x)
        out = out.at[..., 1::2, :].set(x_odd)
        x = out

    return x[..., :t_orig, :]


@jax.custom_vjp
def btd_solve_cr(diag: jnp.ndarray, off: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Cyclic-reduction solve of the same system as :func:`btd_solve`."""
    return cr_solve_factored(cr_factor(diag, off), rhs)


def _btd_solve_cr_fwd(diag, off, rhs):
    factors = cr_factor(diag, off)
    x = cr_solve_factored(factors, rhs)
    return x, (factors, x)


def _btd_solve_cr_bwd(res, x_bar):
    factors, x = res
    lam = cr_solve_factored(factors, x_bar)
    rhs_bar = lam
    diag_bar = -lam[..., :, :, None] * x[..., :, None, :]
    off_bar = -(
        lam[..., :-1, :, None] * x[..., 1:, None, :]
        + x[..., :-1, :, None] * lam[..., 1:, None, :]
    )
    return diag_bar, off_bar, rhs_bar


btd_solve_cr.defvjp(_btd_solve_cr_fwd, _btd_solve_cr_bwd)


# Default engine selector.  Measured on a v5e at B=1024, T=101, D=4:
#   * scan Thomas      ~2.5 ms/solve (latency-bound: 100 dependent steps)
#   * cyclic reduction  log-depth but its unrolled graph compiles for
#                       minutes on the remote TPU toolchain — opt-in only
#   * Pallas kernel    ~0.75 ms/solve, sub-second compile -> TPU default
# CPU/verification paths use the scan (f64-capable, small compile).
_CR_MIN_T = 10**9  # cyclic reduction is opt-in via btd_solve_cr
_PALLAS_MIN_T = 16


def _use_pallas(diag):
    return (
        jax.default_backend() == "tpu"
        and diag.dtype == jnp.float32
        and diag.shape[-1] <= 6
        and diag.ndim == 4  # (B, T, D, D)
        and diag.shape[-3] >= _PALLAS_MIN_T
    )


def btd_solve_auto(diag, off, rhs):
    if _use_pallas(diag):
        # The streaming full-batch kernel (btd_stream) measures faster in
        # isolation (0.61 vs 0.75 ms at B=1024, T=101) but REGRESSES the
        # full plan loop to 3.7 ms: its (B,T,DD)->(T,DD,8,128) layout
        # transposes materialize inside the scan.  Until assembly emits the
        # streaming layout natively, the tiled kernel stays the default.
        from dgpmp2_tpu.ops.pallas.btd_solve import btd_solve_pallas

        return btd_solve_pallas(diag, off, rhs)
    if diag.shape[-3] >= _CR_MIN_T and diag.shape[-1] <= _SMALLD_MAX:
        return btd_solve_cr(diag, off, rhs)
    return btd_solve(diag, off, rhs)


# ---------------------------------------------------------------------------
# Test / debug helpers
# ---------------------------------------------------------------------------


def btd_matvec(diag, off, x):
    """``Λ x`` for the block-tridiagonal storage above."""
    y = jnp.einsum("...tij,...tj->...ti", diag, x)
    upper = jnp.einsum("...tij,...tj->...ti", off, x[..., 1:, :])
    lower = jnp.einsum("...tji,...tj->...ti", off, x[..., :-1, :])
    y = y.at[..., :-1, :].add(upper)
    y = y.at[..., 1:, :].add(lower)
    return y


def btd_to_dense(diag, off):
    """Expand block-tridiagonal storage to a dense (..., T*D, T*D) matrix."""
    t, d = diag.shape[-3], diag.shape[-1]
    batch = diag.shape[:-3]
    n = t * d
    dense = jnp.zeros((*batch, n, n), diag.dtype)
    for i in range(t):
        dense = dense.at[..., i * d : (i + 1) * d, i * d : (i + 1) * d].set(
            diag[..., i, :, :]
        )
    for i in range(t - 1):
        dense = dense.at[..., i * d : (i + 1) * d, (i + 1) * d : (i + 2) * d].set(
            off[..., i, :, :]
        )
        dense = dense.at[..., (i + 1) * d : (i + 2) * d, i * d : (i + 1) * d].set(
            _t(off[..., i, :, :])
        )
    return dense
