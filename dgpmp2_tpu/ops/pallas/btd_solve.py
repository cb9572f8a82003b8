"""Pallas TPU kernel: batched symmetric block-tridiagonal solve.

The XLA formulations of the block-Thomas recurrence pay either sequential
``lax.scan`` overhead (~100 dependent loop steps of tiny ops) or, for
cyclic reduction, an enormous unrolled graph that the compiler chews on for
minutes.  This kernel runs the whole recurrence *inside* one Pallas program:

  * layout ``(T, D·D, B_tile)`` — every scalar of the D×D block algebra is a
    ``(1, B_tile)`` lane vector (the guide's batch-in-lanes rule),
  * grid over batch tiles; each program holds its tile's diag/off/rhs plus
    Cholesky/gain/forward-sweep scratch entirely in VMEM (~4 MB at
    B_tile = 128, T = 101, D = 4),
  * ``fori_loop`` over T for the factorization + forward sweep, a second
    reversed ``fori_loop`` for back-substitution — no per-step dispatch, no
    MXU (exact f32 on the VPU: immune to the bf16-matmul SPD hazard).

Same storage convention and custom-VJP adjoint as
:mod:`dgpmp2_tpu.ops.tridiag` (the linear-solve adjoint runs this same
kernel on the cotangent).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row(arr, i):
    """(DD, B) -> (1, B) row i (static)."""
    return arr[i : i + 1, :]


def _mat_rows(arr, d):
    """(DD, B) -> DxD nested lists of (1, B) rows."""
    return [[_row(arr, i * d + j) for j in range(d)] for i in range(d)]


def _vec_rows(arr, d):
    return [_row(arr, i) for i in range(d)]


def _cat2(rows):
    return jnp.concatenate([jnp.concatenate(r, 0) for r in rows], 0)


def _cat1(rows):
    return jnp.concatenate(rows, 0)


def _chol_lists(c, d):
    """Unrolled lower Cholesky on lists of (1, B) rows."""
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


def _fwd_sub(l, b, d):
    z = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * z[k]
        z.append(s / l[i][i])
    return z


def _bwd_sub(l, z, d):
    x = [None] * d
    for i in reversed(range(d)):
        s = z[i]
        for k in range(i + 1, d):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return x


def _chol_solve_mat(l, u, d):
    cols = []
    for c in range(d):
        cols.append(_bwd_sub(l, _fwd_sub(l, [u[i][c] for i in range(d)], d), d))
    return [[cols[c][i] for c in range(d)] for i in range(d)]


def _matmul(a, b, d):
    return [
        [sum(a[i][k] * b[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def _matvec(a, v, d):
    return [sum(a[i][k] * v[k] for k in range(d)) for i in range(d)]


def _make_kernel(t_len: int, d: int):
    dd = d * d

    def kernel(diag_ref, off_ref, rhs_ref, x_ref, chol_ref, y_ref):
        # ---- t = 0 ------------------------------------------------------
        l0 = _chol_lists(_mat_rows(diag_ref[0], d), d)
        chol_ref[0] = _cat2(l0)
        y_ref[0] = rhs_ref[0]

        # ---- forward factorization + sweep ------------------------------
        def fwd(t, carry):
            l_prev_flat, y_prev_flat = carry
            lp = _mat_rows(l_prev_flat, d)
            u_prev = _mat_rows(off_ref[t - 1], d)
            d_i = _mat_rows(diag_ref[t], d)
            x_m = _chol_solve_mat(lp, u_prev, d)  # C_prev^{-1} U_prev
            g = [[x_m[j][i] for j in range(d)] for i in range(d)]  # transpose
            gu = _matmul(g, u_prev, d)
            c_i = [[d_i[i][j] - gu[i][j] for j in range(d)] for i in range(d)]
            l_i = _chol_lists(c_i, d)
            l_i_flat = _cat2(l_i)
            y_prev = _vec_rows(y_prev_flat, d)
            r_i = _vec_rows(rhs_ref[t], d)
            gy = _matvec(g, y_prev, d)
            y_i = _cat1([r_i[i] - gy[i] for i in range(d)])
            chol_ref[t] = l_i_flat
            y_ref[t] = y_i
            return (l_i_flat, y_i)

        l_last, y_last = lax.fori_loop(
            1, t_len, fwd, (chol_ref[0], y_ref[0])
        )

        # ---- back substitution ------------------------------------------
        ll = _mat_rows(l_last, d)
        x_last = _cat1(
            _bwd_sub(ll, _fwd_sub(ll, _vec_rows(y_last, d), d), d)
        )
        x_ref[t_len - 1] = x_last

        def bwd(k, x_next_flat):
            t = t_len - 2 - k
            l_t = _mat_rows(chol_ref[t], d)
            u_t = _mat_rows(off_ref[t], d)
            y_t = _vec_rows(y_ref[t], d)
            x_next = _vec_rows(x_next_flat, d)
            ux = _matvec(u_t, x_next, d)
            rhs_t = [y_t[i] - ux[i] for i in range(d)]
            x_t = _cat1(_bwd_sub(l_t, _fwd_sub(l_t, rhs_t, d), d))
            x_ref[t] = x_t
            return x_t

        lax.fori_loop(0, t_len - 1, bwd, x_last)

    return kernel


def _pallas_solve_tiled(diag_t, off_t, rhs_t, b_tile: int):
    """diag_t (T, DD, B), off_t (T-1, DD, B), rhs_t (T, D, B) -> x (T, D, B)."""
    t_len, dd, b = diag_t.shape
    d = int(round(dd**0.5))
    grid = (b // b_tile,)

    kernel = _make_kernel(t_len, d)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_len, dd, b_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len - 1, dd, b_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, d, b_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_len, d, b_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, d, b), diag_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_len, dd, b_tile), diag_t.dtype),
            pltpu.VMEM((t_len, d, b_tile), diag_t.dtype),
        ],
    )(diag_t, off_t, rhs_t)


def _solve_impl(diag, off, rhs, b_tile, interpret=False):
    b, t_len, d, _ = diag.shape
    pad = (-b) % b_tile
    diag_t = jnp.moveaxis(diag.reshape(b, t_len, d * d), 0, -1)
    off_t = jnp.moveaxis(off.reshape(b, t_len - 1, d * d), 0, -1)
    rhs_t = jnp.moveaxis(rhs, 0, -1)
    if pad:
        # Padded problems get the identity system (x = 0).
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=diag.dtype).reshape(d * d, 1), (t_len, d * d, pad)
        )
        diag_t = jnp.concatenate([diag_t, eye], axis=-1)
        off_t = jnp.concatenate(
            [off_t, jnp.zeros((t_len - 1, d * d, pad), diag.dtype)], axis=-1
        )
        rhs_t = jnp.concatenate(
            [rhs_t, jnp.zeros((t_len, d, pad), diag.dtype)], axis=-1
        )
    if interpret:
        kernel_out = pl.pallas_call(
            _make_kernel(t_len, d),
            grid=((b + pad) // b_tile,),
            in_specs=[
                pl.BlockSpec((t_len, d * d, b_tile), lambda i: (0, 0, i)),
                pl.BlockSpec((t_len - 1, d * d, b_tile), lambda i: (0, 0, i)),
                pl.BlockSpec((t_len, d, b_tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((t_len, d, b_tile), lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((t_len, d, b + pad), diag.dtype),
            scratch_shapes=[
                pltpu.VMEM((t_len, d * d, b_tile), diag.dtype),
                pltpu.VMEM((t_len, d, b_tile), diag.dtype),
            ],
            interpret=True,
        )(diag_t, off_t, rhs_t)
    else:
        kernel_out = _pallas_solve_tiled(diag_t, off_t, rhs_t, b_tile)
    x = jnp.moveaxis(kernel_out[..., :b], -1, 0)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def btd_solve_pallas(diag, off, rhs, b_tile: int = 128, interpret: bool = False):
    """Solve ``Λ x = rhs`` (same contract as ``tridiag.btd_solve``) with the
    whole recurrence fused into one Pallas kernel per batch tile.

    Args:
      diag: (B, T, D, D); off: (B, T-1, D, D); rhs: (B, T, D).  f32.
      b_tile: batch tile per grid program (VMEM budget knob).
      interpret: run in the Pallas interpreter (CPU testing).
    """
    return _solve_impl(diag, off, rhs, b_tile, interpret)


def _fwd(diag, off, rhs, b_tile, interpret):
    x = _solve_impl(diag, off, rhs, b_tile, interpret)
    return x, (diag, off, x)


def _bwd(b_tile, interpret, res, x_bar):
    diag, off, x = res
    lam = _solve_impl(diag, off, x_bar, b_tile, interpret)
    rhs_bar = lam
    diag_bar = -lam[..., :, :, None] * x[..., :, None, :]
    off_bar = -(
        lam[..., :-1, :, None] * x[..., 1:, None, :]
        + x[..., :-1, :, None] * lam[..., 1:, None, :]
    )
    return diag_bar, off_bar, rhs_bar


btd_solve_pallas.defvjp(_fwd, _bwd)
