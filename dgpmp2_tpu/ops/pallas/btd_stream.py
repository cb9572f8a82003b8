"""Streaming full-batch block-tridiagonal solve (Pallas TPU).

The tiled kernel in :mod:`btd_solve` processes 128-problem tiles, so every
scalar of the D×D algebra is a (1, 128) vector — one eighth of a vreg.
This kernel instead keeps the FULL batch in flight and streams the *time*
axis through a sequential Pallas grid:

  * layout ``(T, D·D, B/128, 128)`` — each block scalar is an (8, 128)
    tile, a full f32 vreg, so one VPU instruction covers 1024 problems;
  * ``grid=(T,)`` — TPU grids execute sequentially, so VMEM scratch carries
    the recurrence state (previous pivot Cholesky + forward sweep) across
    grid steps while Pallas double-buffers the per-step HBM blocks
    automatically (the guide's pipeline pattern without hand-written DMA);
  * a second reverse-indexed grid does the back-substitution.

Work per grid step: ~200 full-width vreg ops (divisions hoisted into d
reciprocal-sqrts per factorization; Schur update computed lower-triangle
only); HBM traffic: one read of (diag, off, rhs) + write/readback of
(chol, y) + write of x.

Same contract and custom VJP as ``tridiag.btd_solve``; batch is padded to a
multiple of 1024 lanes-block (8·128) with identity systems.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8
_LANE = 128
_BLK = _SUB * _LANE  # batch elements per (8, 128) vreg tile


def _rows(arr, d):
    """(DD, S, L) ref-read -> DxD nested lists of (S, L) arrays."""
    return [[arr[i * d + j] for j in range(d)] for i in range(d)]


def _vrows(arr, d):
    return [arr[i] for i in range(d)]


def _cat2(rows):
    return jnp.stack([r for row in rows for r in row], 0)


def _cat1(rows):
    return jnp.stack(rows, 0)


def _chol(c, d):
    """Cholesky with the diagonal stored INVERTED (1/l_jj).

    Vector division is multi-cycle on the VPU; the triangular subs below
    consume the pivot only as a reciprocal, so storing 1/l_jj turns ~8
    divisions per substitution into multiplies (d divisions + d sqrts per
    factorization total).
    """
    zero = jnp.zeros_like(c[0][0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = c[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        inv = jax.lax.rsqrt(s)
        l[j][j] = inv  # INVERTED pivot
        for i in range(j + 1, d):
            s = c[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    return l


def _fwd_sub(l, b, d):
    """Forward substitution; ``l`` carries 1/l_jj on the diagonal."""
    z = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * z[k]
        z.append(s * l[i][i])
    return z


def _bwd_sub(l, z, d):
    x = [None] * d
    for i in reversed(range(d)):
        s = z[i]
        for k in range(i + 1, d):
            s = s - l[k][i] * x[k]
        x[i] = s * l[i][i]
    return x


def _chol_solve_mat(l, u, d):
    cols = []
    for c in range(d):
        cols.append(_bwd_sub(l, _fwd_sub(l, [u[i][c] for i in range(d)], d), d))
    return [[cols[c][i] for c in range(d)] for i in range(d)]


def _matvec(a, v, d):
    return [sum(a[i][k] * v[k] for k in range(d)) for i in range(d)]


def _rows_arr(arr, d):
    """(DD, S, L) array -> DxD lists of (S, L) arrays."""
    return [[arr[i * d + j] for j in range(d)] for i in range(d)]


def _make_fwd_kernel(d, chunk):
    """Forward factorization over a T-chunk per grid step.

    Grid-step overhead on this backend is ~6 µs, so one time step per grid
    step wastes most of the wall-clock; a chunk of ``chunk`` steps carries
    the recurrence in registers inside the (unrolled) chunk and through
    VMEM scratch across chunks.
    """

    def step(l_prev, y_prev, u_prev, d_i, r_i):
        # X = C_prev^-1 U  (column solves against the cached factor); the
        # Schur update U^T C^-1 U is SYMMETRIC — only the lower triangle is
        # computed (the Cholesky below never reads the upper).
        x_m = _chol_solve_mat(l_prev, u_prev, d)
        c_i = [[None] * d for _ in range(d)]
        for i in range(d):
            for j in range(i + 1):
                s = d_i[i][j]
                for k in range(d):
                    s = s - u_prev[k][i] * x_m[k][j]
                c_i[i][j] = s
        l_i = _chol(c_i, d)
        # gy = U^T C^-1 y_prev = X^T y_prev.
        y_i = [
            r_i[i] - sum(x_m[k][i] * y_prev[k] for k in range(d))
            for i in range(d)
        ]
        return l_i, y_i

    def kernel(diag_ref, offp_ref, rhs_ref, chol_ref, y_ref, l_scr, y_scr):
        t = pl.program_id(1)  # grid = (batch_block, T/chunk)
        for c in range(chunk):
            d_i = _rows_arr(diag_ref[c], d)
            r_i = _vrows(rhs_ref[c], d)
            if c == 0:
                # Cross-chunk boundary: previous state lives in scratch
                # (except at the very first chunk, where step 0 is the
                # recurrence seed).
                @pl.when(t == 0)
                def _():
                    l0 = _chol(d_i, d)
                    chol_ref[0] = _cat2(l0)
                    y_ref[0] = _cat1(r_i)
                    l_scr[...] = _cat2(l0)
                    y_scr[...] = _cat1(r_i)

                @pl.when(t > 0)
                def _():
                    l_prev = _rows_arr(l_scr[...], d)
                    y_prev = _vrows(y_scr[...], d)
                    u_prev = _rows_arr(offp_ref[0], d)
                    l_i, y_i = step(l_prev, y_prev, u_prev, d_i, r_i)
                    chol_ref[0] = _cat2(l_i)
                    y_ref[0] = _cat1(y_i)
                    l_scr[...] = _cat2(l_i)
                    y_scr[...] = _cat1(y_i)
            else:
                # Within the chunk the carry comes straight from the refs we
                # just wrote (VMEM-resident block, no HBM round trip).
                l_prev = _rows_arr(chol_ref[c - 1], d)
                y_prev = _vrows(y_ref[c - 1], d)
                u_prev = _rows_arr(offp_ref[c], d)
                l_i, y_i = step(l_prev, y_prev, u_prev, d_i, r_i)
                chol_ref[c] = _cat2(l_i)
                y_ref[c] = _cat1(y_i)
                if c == chunk - 1:
                    l_scr[...] = _cat2(l_i)
                    y_scr[...] = _cat1(y_i)

    return kernel


def _make_bwd_kernel(d, chunk):
    def kernel(chol_ref, off_ref, y_ref, x_ref, x_scr):
        t = pl.program_id(1)  # reversed chunk walk via index maps
        # Blocks arrive with time ascending inside the chunk; walk backward.
        for c in reversed(range(chunk)):
            l_t = _rows_arr(chol_ref[c], d)
            y_t = _vrows(y_ref[c], d)
            if c == chunk - 1:
                @pl.when(t == 0)
                def _():
                    x = _cat1(_bwd_sub(l_t, _fwd_sub(l_t, y_t, d), d))
                    x_ref[chunk - 1] = x
                    x_scr[...] = x

                @pl.when(t > 0)
                def _():
                    u_t = _rows_arr(off_ref[c], d)
                    x_next = _vrows(x_scr[...], d)
                    ux = _matvec(u_t, x_next, d)
                    rhs_t = [y_t[i] - ux[i] for i in range(d)]
                    x = _cat1(_bwd_sub(l_t, _fwd_sub(l_t, rhs_t, d), d))
                    x_ref[chunk - 1] = x
                    x_scr[...] = x
            else:
                u_t = _rows_arr(off_ref[c], d)
                x_next = _vrows(x_ref[c + 1], d)
                ux = _matvec(u_t, x_next, d)
                rhs_t = [y_t[i] - ux[i] for i in range(d)]
                x = _cat1(_bwd_sub(l_t, _fwd_sub(l_t, rhs_t, d), d))
                x_ref[c] = x
                if c == 0:
                    x_scr[...] = x

    return kernel


def _solve_pre_impl(diag_p, offp_p, offf_p, rhs_p, interpret=False, chunk=16):
    """Solve on arrays already in the padded stream layout.

    Args (TP divisible by ``chunk``, S = nb·8):
      diag_p: (TP, D·D, S, 128) — identity blocks in all padded slots.
      offp_p: (TP, D·D, S, 128) — shifted super-diagonal, offp[t] = off[t-1],
              offp[0] = 0 and zeros in the time pad.
      offf_p: (TP, D·D, S, 128) — unshifted, offf[t] = off[t] (t < T-1).
      rhs_p:  (TP, D, S, 128) — zeros in padded slots.
    Returns x in the same layout as ``rhs_p`` (padded slots solve to 0).

    This is the entry the stream-layout GN engine uses: assembly produces
    these arrays natively, so no (B, T, D, D) <-> stream transposes happen
    per iteration (the 0.585 ms/array round-trip that made the standard
    wrapper regress the plan loop).
    """
    tp, dd, sb, _ = diag_p.shape
    d = int(round(dd**0.5))
    if sb % _SUB or tp % chunk:
        # The grid math below would silently truncate (unwritten output
        # blocks, mis-seeded backward sweep) — the caller must pad.
        raise ValueError(
            f"stream solve needs sb % {_SUB} == 0 and TP % chunk == 0; got "
            f"sb={sb}, TP={tp}, chunk={chunk}"
        )
    nb = sb // _SUB
    n_chunks = tp // chunk
    shape_m = (chunk, dd, _SUB, _LANE)
    shape_v = (chunk, d, _SUB, _LANE)

    m_spec = pl.BlockSpec(shape_m, lambda i, t: (t, 0, i, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec(shape_v, lambda i, t: (t, 0, i, 0),
                          memory_space=pltpu.VMEM)
    out_m = jax.ShapeDtypeStruct((tp, dd, sb, _LANE), diag_p.dtype)
    out_v = jax.ShapeDtypeStruct((tp, d, sb, _LANE), diag_p.dtype)
    chol_t, y_t = pl.pallas_call(
        _make_fwd_kernel(d, chunk),
        grid=(nb, n_chunks),
        in_specs=[m_spec, m_spec, v_spec],
        out_specs=[m_spec, v_spec],
        out_shape=[out_m, out_v],
        scratch_shapes=[
            pltpu.VMEM((dd, _SUB, _LANE), diag_p.dtype),
            pltpu.VMEM((d, _SUB, _LANE), diag_p.dtype),
        ],
        interpret=interpret,
    )(diag_p, offp_p, rhs_p)

    def rev(i, t):
        return (n_chunks - 1 - t, 0, i, 0)

    m_rev = pl.BlockSpec(shape_m, rev, memory_space=pltpu.VMEM)
    v_rev = pl.BlockSpec(shape_v, rev, memory_space=pltpu.VMEM)
    x_t = pl.pallas_call(
        _make_bwd_kernel(d, chunk),
        grid=(nb, n_chunks),
        in_specs=[m_rev, m_rev, v_rev],
        out_specs=v_rev,
        out_shape=out_v,
        scratch_shapes=[pltpu.VMEM((d, _SUB, _LANE), diag_p.dtype)],
        interpret=interpret,
    )(chol_t, offf_p, y_t)
    return x_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def btd_solve_stream_pre(diag_p, offp_p, offf_p, rhs_p,
                         interpret: bool = False, chunk: int = 16):
    """Differentiable stream-layout solve (see :func:`_solve_pre_impl`).

    The system is symmetric (sub-diagonal = super-diagonalᵀ), so the adjoint
    solve reuses the same factor-ready layout.  The off-diagonal cotangent is
    routed entirely through ``offp_p`` (``offf_p`` gets zeros): both are
    linear rearrangements of the same underlying blocks, so callers that
    build them from one ``off`` array recover the full
    ``-(λᵢx_{i+1}ᵀ + xᵢλ_{i+1}ᵀ)`` via the concatenate pullbacks.
    """
    return _solve_pre_impl(diag_p, offp_p, offf_p, rhs_p, interpret, chunk)


def _pre_fwd(diag_p, offp_p, offf_p, rhs_p, interpret, chunk):
    x = _solve_pre_impl(diag_p, offp_p, offf_p, rhs_p, interpret, chunk)
    return x, (diag_p, offp_p, offf_p, x)


def _pre_bwd(interpret, chunk, res, x_bar):
    diag_p, offp_p, offf_p, x = res
    lam = _solve_pre_impl(diag_p, offp_p, offf_p, x_bar, interpret, chunk)
    tp, d = x.shape[0], x.shape[1]
    tail = x.shape[2:]
    diag_bar = -(lam[:, :, None] * x[:, None, :]).reshape(tp, d * d, *tail)
    # offp[t] carries off[t-1]: cotangent -(λ_{t-1} x_tᵀ + x_{t-1} λ_tᵀ).
    cross = (lam[:-1, :, None] * x[1:, None, :]
             + x[:-1, :, None] * lam[1:, None, :])
    offp_bar = jnp.zeros_like(offp_p).at[1:].add(
        -cross.reshape(tp - 1, d * d, *tail)
    )
    return diag_bar, offp_bar, jnp.zeros_like(offf_p), lam


btd_solve_stream_pre.defvjp(_pre_fwd, _pre_bwd)


def _solve_impl(diag, off, rhs, interpret=False, chunk=16):
    b, t_len, d, _ = diag.shape
    dd = d * d
    pad = (-b) % _BLK
    bp = b + pad
    nb = bp // _BLK

    def mat_layout(x):
        # (B, T, D, D) -> (T, DD, nb*SUB, LANE)
        x = jnp.moveaxis(x.reshape(b, -1, dd), 0, -1)  # (T', DD, B)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1
            )
        return x.reshape(x.shape[0], dd, nb * _SUB, _LANE)

    def vec_layout(x):
        x = jnp.moveaxis(x, 0, -1)  # (T, D, B)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1
            )
        return x.reshape(x.shape[0], d, nb * _SUB, _LANE)

    # Pad T to a chunk multiple with decoupled identity steps (off = 0 into
    # the pad region, so padded states solve to x = 0 and do not perturb the
    # real back-substitution boundary).
    tpad = (-t_len) % chunk
    tp = t_len + tpad

    diag_t = mat_layout(diag)
    if pad:
        # Identity pivots on the padded problems keep the Cholesky defined.
        eye = jnp.eye(d, dtype=diag.dtype).reshape(dd)
        mask = jnp.arange(bp) >= b
        mask = mask.reshape(1, 1, nb * _SUB, _LANE)
        diag_t = diag_t + eye[None, :, None, None] * mask
    if tpad:
        eye_blk = jnp.broadcast_to(
            jnp.eye(d, dtype=diag.dtype).reshape(1, dd, 1, 1),
            (tpad, dd, nb * _SUB, _LANE),
        )
        diag_t = jnp.concatenate([diag_t, eye_blk], axis=0)
    off_t = mat_layout(off)  # (T-1, ...)
    zpad_m = jnp.zeros((1, dd, nb * _SUB, _LANE), diag.dtype)
    # Shifted off for the forward pass: offp[t] = off[t-1], offp[0] = 0.
    offp_t = jnp.concatenate([zpad_m, off_t] + [zpad_m] * tpad, axis=0)
    # Unshifted off padded to tp entries (off_full[g] = 0 for g >= T-1).
    offf_t = jnp.concatenate([off_t] + [zpad_m] * (tpad + 1), axis=0)
    rhs_t = vec_layout(rhs)
    if tpad:
        rhs_t = jnp.concatenate(
            [rhs_t, jnp.zeros((tpad, d, nb * _SUB, _LANE), diag.dtype)], axis=0
        )

    x_t = _solve_pre_impl(diag_t, offp_t, offf_t, rhs_t, interpret, chunk)

    x = x_t.reshape(tp, d, bp)[:t_len, :, :b]
    return jnp.moveaxis(x, -1, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def btd_solve_stream(diag, off, rhs, interpret: bool = False, chunk: int = 16):
    """Streaming full-batch solve; same contract as ``tridiag.btd_solve``."""
    return _solve_impl(diag, off, rhs, interpret, chunk)


def _fwd_rule(diag, off, rhs, interpret, chunk):
    x = _solve_impl(diag, off, rhs, interpret, chunk)
    return x, (diag, off, x)


def _bwd_rule(interpret, chunk, res, x_bar):
    diag, off, x = res
    lam = _solve_impl(diag, off, x_bar, interpret, chunk)
    rhs_bar = lam
    diag_bar = -lam[..., :, :, None] * x[..., :, None, :]
    off_bar = -(
        lam[..., :-1, :, None] * x[..., 1:, None, :]
        + x[..., :-1, :, None] * lam[..., 1:, None, :]
    )
    return diag_bar, off_bar, rhs_bar


btd_solve_stream.defvjp(_fwd_rule, _bwd_rule)
