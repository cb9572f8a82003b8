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

# Default engine selector.  Measured on a v5e at B=1024, T=101, D=4:
#   * scan Thomas      ~2.5 ms/solve (latency-bound: 100 dependent steps)
#   * Pallas kernel    ~0.75 ms/solve, sub-second compile -> TPU default
# CPU/verification paths use the scan (f64-capable, small compile).
# (A log-depth cyclic-reduction solver was evaluated and retired to
# benchmarks/cyclic_reduction.py — minutes of compile on the remote
# toolchain, never faster at production sizes.)
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
