"""Block cyclic reduction: log-depth block-tridiagonal solver (EXPERIMENT).

Retired from the production module (dgpmp2_tpu/ops/tridiag.py) per the
round-1 review: correct and fully tested, ~2x the flops of Thomas at 1/14th
the dependent steps — but its unrolled graph takes the remote TPU toolchain
minutes to compile and it never beat the Pallas tiled/streaming kernels at
production sizes (PERFORMANCE.md).  Kept here with its tests
(benchmarks/test_cyclic_reduction.py, run explicitly — not collected by the
default suite) as the record of the experiment and for future long-T
regimes (T >> 1000) where log-depth could win.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dgpmp2_tpu.ops.tridiag import (  # noqa: F401
    _bwd_sub, _chol_unrolled, _chol_solve_mat, _fwd_sub, _matmul_lists,
    _matvec_lists,
)

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

