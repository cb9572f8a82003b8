"""Pallas TPU kernel: trajectory-locality tiled trilinear SDF lookup.

The 3-D plan loop is gather-bound: the XLA formulation issues 8 scattered
4-byte loads per sample into a ~1 MB voxel table (112 ns/sample on a v5e —
PERFORMANCE.md "3-D workspaces"), and a v2-style full-table one-hot MXU
pass is ruled out on flop grounds (the x-contraction touches all D·H rows
for an 8-tap read).  This kernel exploits the structure the XLA gather
ignores: **consecutive trajectory states query spatially adjacent
voxels**.  Per problem the volume streams HBM→VMEM once (the pipelined
input block — sequential DMA at bandwidth, no scattered loads), and each
tile of ``p_t`` consecutive states reads a small (BZ, BY, W) brick of it:

    x-side (per tile):   wx_cat = [wx | dwx]            (W, 2p_t) one-hots
                         C = brick(BZ·BY, W) @ wx_cat   (MXU, tiny)
    zy-side:             Wcat = [wzy; dy; dz]           (3p_t, BZ·BY)
                         G = Wcat @ C                   (MXU, tiny)
                         d/∂px/∂py/∂pz = banded diagonals of G

Both one-hot contractions run over ``BZ·BY = 256`` brick rows instead of
``D·H = 4096`` volume rows — 16× less MXU work than the full-table pass —
and every per-state quantity lives in its natural layout (weights are
built *column-major* from host-transposed index arrays; no in-kernel
transposes, the v1 trap).  The brick origin per tile is precomputed on
the XLA side from the tile's own states; a tile whose states span more
than the brick (kinked early-GN iterates, OOB excursions) falls back to
an in-kernel **full-volume** pass for that tile only (``@pl.when`` on a
per-tile flag) — correctness never depends on the locality assumption.

Semantics match :func:`dgpmp2_tpu.ops.sdf.trilinear_lookup` ("intended"
OOB mode) exactly: clamped corner indices, weights from the unclamped
fractional part, out-of-bounds ⇒ ``MAX_D`` with zero gradient (applied by
the XLA wrapper).  Differentiation replays the XLA trilinear formulation
under ``jax.vjp`` (same pattern as the 2-D kernels' ``_mxu_replay_bwd``).

Reference hot path this generalizes: the 2-D batched bilinear gather at
``diff_gpmp2/gpmp2/obstacle/obstacle_cost.py:35`` →
``utils/sdf_utils.py:38-107`` (the reference is planar; 3-D is new
surface).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_tiles: int, p_t: int, bz: int, by: int,
                 d_: int, h: int, w: int):
    r_brick = bz * by
    r_full = d_ * h

    def zy_weights(r11, r12, r21, r22, fy_c, fz_c, n_rows):
        """Stacked zy weight matrix (3p_t, n_rows) from (p_t, 1) index and
        fraction columns.  Row bands: value weights (az⊗ay one-hot combos),
        then ∂/∂py combos, then ∂/∂pz combos.  Clamped-together corners
        (r12 == r11 etc.) cancel exactly as in the XLA formulation."""
        row_r = jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
        o11 = (r11 == row_r).astype(jnp.float32)  # (p_t, n_rows)
        o12 = (r12 == row_r).astype(jnp.float32)
        o21 = (r21 == row_r).astype(jnp.float32)
        o22 = (r22 == row_r).astype(jnp.float32)
        ay1 = 1.0 - fy_c
        az1 = 1.0 - fz_c
        wzy = az1 * (ay1 * o11 + fy_c * o12) + fz_c * (ay1 * o21 + fy_c * o22)
        dy = az1 * (o12 - o11) + fz_c * (o22 - o21)
        dz = ay1 * (o21 - o11) + fy_c * (o22 - o12)
        return jnp.concatenate([wzy, dy, dz], axis=0)  # (3p_t, n_rows)

    def extract_write(g, t, d_ref, dx_ref, dy_ref, dz_ref):
        """Pull the four banded diagonals out of G = Wcat @ [C | C2] and
        write them as (1, p_t) rows at tile t's output columns:
        d[s] = G[s, s], ∂px[s] = G[s, p_t+s], ∂py[s] = G[p_t+s, s],
        ∂pz[s] = G[2p_t+s, s]."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (3 * p_t, 2 * p_t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (3 * p_t, 2 * p_t), 1)
        m_d = ((rows == cols) & (rows < p_t)).astype(jnp.float32)
        m_x = (cols == rows + p_t).astype(jnp.float32)
        m_y = ((rows == cols + p_t) & (cols < p_t)).astype(jnp.float32)
        m_z = (rows == cols + 2 * p_t).astype(jnp.float32)
        sl = slice(t * p_t, (t + 1) * p_t)
        d_ref[0, 0:1, sl] = jnp.sum(g * m_d, axis=0, keepdims=True)[:, :p_t]
        dx_ref[0, 0:1, sl] = jnp.sum(g * m_x, axis=0, keepdims=True)[:, p_t:]
        dy_ref[0, 0:1, sl] = jnp.sum(g * m_y, axis=0, keepdims=True)[:, :p_t]
        dz_ref[0, 0:1, sl] = jnp.sum(g * m_z, axis=0, keepdims=True)[:, :p_t]

    def kernel(z0_ref, y0_ref, good_ref, vol_ref,
               px1_ref, px2_ref, fx_ref,
               l11_ref, l12_ref, l21_ref, l22_ref,
               g11_ref, g12_ref, g21_ref, g22_ref,
               fy_ref, fz_ref,
               d_ref, dx_ref, dy_ref, dz_ref):
        col_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        for t in range(n_tiles):
            sl = slice(t * p_t, (t + 1) * p_t)
            ox1 = (col_w == px1_ref[0, 0:1, sl]).astype(jnp.float32)  # (w, p_t)
            ox2 = (col_w == px2_ref[0, 0:1, sl]).astype(jnp.float32)
            dwx = ox2 - ox1
            wx = ox1 + fx_ref[0, 0:1, sl] * dwx
            xcat = jnp.concatenate([wx, dwx], axis=1)  # (w, 2p_t)

            fy_c = fy_ref[0, :, t:t + 1]  # (p_t, 1), host-transposed
            fz_c = fz_ref[0, :, t:t + 1]
            z0 = z0_ref[0, 0, t]
            y0 = pl.multiple_of(y0_ref[0, 0, t], 8)

            @pl.when(good_ref[0, 0, t] != 0)
            def _():
                brick = vol_ref[0, pl.ds(z0, bz), pl.ds(y0, by), :]
                c = jnp.dot(brick.reshape(r_brick, w), xcat,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                wcat = zy_weights(
                    l11_ref[0, :, t:t + 1], l12_ref[0, :, t:t + 1],
                    l21_ref[0, :, t:t + 1], l22_ref[0, :, t:t + 1],
                    fy_c, fz_c, r_brick,
                )
                g = jnp.dot(wcat, c, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                extract_write(g, t, d_ref, dx_ref, dy_ref, dz_ref)

            @pl.when(good_ref[0, 0, t] == 0)
            def _():
                c = jnp.dot(vol_ref[0].reshape(r_full, w), xcat,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                wcat = zy_weights(
                    g11_ref[0, :, t:t + 1], g12_ref[0, :, t:t + 1],
                    g21_ref[0, :, t:t + 1], g22_ref[0, :, t:t + 1],
                    fy_c, fz_c, r_full,
                )
                g = jnp.dot(wcat, c, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                extract_write(g, t, d_ref, dx_ref, dy_ref, dz_ref)

    return kernel


def _col_layout(arr, b, n_tiles, p_t):
    """(B, p_pad) state-major → (B, p_t, n_tiles): per-tile columns land in
    sublane layout so the kernel builds (p_t, n_rows) weight matrices by
    broadcast compare — no in-kernel transposes."""
    return arr.reshape(b, n_tiles, p_t).transpose(0, 2, 1)


def _axis_prep(pw, n, valid, b, n_tiles, p_t, brick_n, align=1):
    """Per-axis corner indices, fraction, tile origin and coverage flag.

    pw: (B, p_pad) pixel coordinates along this axis; n: grid extent;
    brick_n: brick extent; align: origin alignment (8 for the sublane axis
    so the dynamic slice stays on the fast path).  Invalid states (OOB or
    padding) are excluded from the origin min/max — their local indices
    clamp into the brick and their outputs are overridden by the wrapper.
    """
    p1f = jnp.floor(pw)
    f = (pw - p1f).astype(jnp.float32)
    p1 = jnp.clip(p1f.astype(jnp.int32), 0, n - 1)
    p2 = jnp.clip(p1f.astype(jnp.int32) + 1, 0, n - 1)
    lo = jnp.where(valid, p1, n).reshape(b, n_tiles, p_t).min(axis=-1)
    hi = jnp.where(valid, p2, 0).reshape(b, n_tiles, p_t).max(axis=-1)
    o = jnp.clip(lo, 0, max(n - brick_n, 0))
    if align > 1:
        o = (o // align) * align
    ok = hi <= o + brick_n - 1
    o_state = jnp.repeat(o, p_t, axis=-1)  # (B, p_pad)
    l1 = jnp.clip(p1 - o_state, 0, brick_n - 1)
    l2 = jnp.clip(p2 - o_state, 0, brick_n - 1)
    return p1, p2, f, l1, l2, o, ok


def _lookup3d_impl(sdf, points, res, x_lims, y_lims, z_lims,
                   p_t: int = 8, bz: int = 16, by: int = 16,
                   interpret: bool = False):
    # Same refusal as sdf.trilinear_lookup: the y->row flip below assumes
    # a centered world; an asymmetric y extent would silently read wrong
    # rows, so both engines must fail identically on it.
    if abs(y_lims[0] + y_lims[1]) > 1e-9:
        raise NotImplementedError(
            f"asymmetric y_lims {tuple(y_lims)} are not supported by the "
            "reference y->row transform; recenter the world"
        )
    b, d_, h, w = sdf.shape
    p = points.shape[-2]
    bz = min(bz, d_)
    by = min(by, h)
    n_tiles = -(-p // p_t)
    p_pad = n_tiles * p_t

    x = points[..., 0].astype(jnp.float32)
    y = points[..., 1].astype(jnp.float32)
    z = points[..., 2].astype(jnp.float32)
    if p_pad != p:
        fill = jnp.zeros((b, p_pad - p), jnp.float32)
        x = jnp.concatenate([x, fill], axis=-1)
        y = jnp.concatenate([y, fill], axis=-1)
        z = jnp.concatenate([z, fill], axis=-1)

    inv = 1.0 / res
    px = -x_lims[0] * inv + x * inv
    py = -y_lims[0] * inv - y * inv
    pz = -z_lims[0] * inv + z * inv
    inside = (
        (x >= x_lims[0]) & (x <= x_lims[1])
        & (y >= y_lims[0]) & (y <= y_lims[1])
        & (z >= z_lims[0]) & (z <= z_lims[1])
    )
    state_idx = jnp.arange(p_pad)[None, :]
    valid = inside & (state_idx < p)

    px1, px2, fx, _, _, _, _ = _axis_prep(px, w, valid, b, n_tiles, p_t, w)
    py1, py2, fy, ly1, ly2, y0, oky = _axis_prep(
        py, h, valid, b, n_tiles, p_t, by, align=8)
    pz1, pz2, fz, lz1, lz2, z0, okz = _axis_prep(
        pz, d_, valid, b, n_tiles, p_t, bz)
    good = (okz & oky).astype(jnp.int32)

    col = functools.partial(_col_layout, b=b, n_tiles=n_tiles, p_t=p_t)
    l11 = col(lz1 * by + ly1)
    l12 = col(lz1 * by + ly2)
    l21 = col(lz2 * by + ly1)
    l22 = col(lz2 * by + ly2)
    g11 = col(pz1 * h + py1)
    g12 = col(pz1 * h + py2)
    g21 = col(pz2 * h + py1)
    g22 = col(pz2 * h + py2)
    fy_c = col(fy)
    fz_c = col(fz)

    kernel = _make_kernel(n_tiles, p_t, bz, by, d_, h, w)
    # Pallas TPU block rule: the last two block dims must be 8/128-divisible
    # or equal the array dims — per-problem rows get a unit middle axis so
    # the (1, 1, n) block matches the (B, 1, n) array exactly.
    out_shape = jax.ShapeDtypeStruct((b, 1, p_pad), jnp.float32)
    spec_smem = pl.BlockSpec((1, 1, n_tiles), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    spec_row = pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_col = pl.BlockSpec((1, p_t, n_tiles), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    d_raw, ddpx, ddpy, ddpz = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec_smem, spec_smem, spec_smem,
            pl.BlockSpec((1, d_, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_row, spec_row, spec_row,
            spec_col, spec_col, spec_col, spec_col,
            spec_col, spec_col, spec_col, spec_col,
            spec_col, spec_col,
        ],
        out_specs=[spec_row, spec_row, spec_row, spec_row],
        out_shape=[out_shape, out_shape, out_shape, out_shape],
        interpret=interpret,
    )(z0[:, None], y0[:, None], good[:, None], sdf.astype(jnp.float32),
      px1[:, None], px2[:, None], fx[:, None],
      l11, l12, l21, l22, g11, g12, g21, g22, fy_c, fz_c)
    d_raw, ddpx, ddpy, ddpz = (a[:, 0] for a in (d_raw, ddpx, ddpy, ddpz))

    max_d = jnp.float32(x_lims[1] - x_lims[0])
    d = jnp.where(inside, d_raw, max_d)[:, :p]
    gx = jnp.where(inside, ddpx * inv, 0.0)
    gy = jnp.where(inside, -ddpy * inv, 0.0)
    gz = jnp.where(inside, ddpz * inv, 0.0)
    grad = jnp.stack([gx, gy, gz], axis=-1)[:, :p, :]
    return d, grad


def _replay_bwd(res_, x_lims, y_lims, z_lims, *extra):
    """Custom-VJP backward: replay the XLA trilinear formulation under
    ``jax.vjp`` for exact cotangents (trailing nondiff args ignored)."""
    saved, cot = extra[-2], extra[-1]
    from dgpmp2_tpu.ops.sdf import trilinear_lookup

    sdf, points = saved
    _, vjp_fn = jax.vjp(
        lambda s, p: trilinear_lookup(s, p, res_, x_lims, y_lims, z_lims),
        sdf, points,
    )
    return vjp_fn(cot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def trilinear_lookup_pallas(sdf, points, res, x_lims, y_lims, z_lims,
                            p_t: int = 8, bz: int = 16, by: int = 16,
                            interpret: bool = False):
    """Trajectory-locality tiled trilinear lookup (see module docstring).

    Same contract as :func:`dgpmp2_tpu.ops.sdf.trilinear_lookup` in
    "intended" OOB mode: returns ``(d (B, P), grad (B, P, 3))``.
    """
    return _lookup3d_impl(sdf, points, res, x_lims, y_lims, z_lims,
                          p_t, bz, by, interpret)


def _fwd(sdf, points, res, x_lims, y_lims, z_lims, p_t, bz, by, interpret):
    out = _lookup3d_impl(sdf, points, res, x_lims, y_lims, z_lims,
                         p_t, bz, by, interpret)
    return out, (sdf, points)


trilinear_lookup_pallas.defvjp(_fwd, _replay_bwd)
