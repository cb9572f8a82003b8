"""Pallas TPU kernel: fused bilinear SDF lookup (value + gradient).

The XLA one-hot MXU formulation of the lookup is bandwidth-bound: the
(B, P, H) interpolation one-hots round-trip HBM (~400 MB per evaluation at
B=1024) for ~1.45 ms.  This kernel performs the identical math but builds
the one-hots *in VMEM* per batch tile and feeds them straight to the MXU:

    per sample s in the tile:
        wy, dwy : (P, H) row one-hots           (VPU compares, never in HBM)
        t1, t2  = wy @ S_s, dwy @ S_s           (MXU, P x H x W)
        d       = Σ_w t1·wx ;  ∂d/∂px = Σ_w t1·dwx ;  ∂d/∂py = Σ_w t2·wx

HBM traffic collapses to the SDF batch itself plus tiny point/output
arrays.  Semantics (clamped corners, out-of-bounds ⇒ MAX_D with zero
gradient) match :func:`dgpmp2_tpu.ops.sdf.bilinear_lookup` exactly.

Differentiation: fast Pallas forward with a custom VJP that replays the
XLA ``bilinear_lookup_mxu`` formulation under ``jax.vjp`` — exact
cotangents for both the SDF and the query points without hand-deriving the
piecewise-bilinear second-order terms.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(s_per_prog: int, p_pad: int, h: int, w: int,
                 res: float, x_lims, y_lims):
    orig_px = -x_lims[0] / res
    orig_py = -y_lims[0] / res
    max_d = x_lims[1] - x_lims[0]

    def kernel(sdf_ref, x_ref, y_ref, d_ref, gx_ref, gy_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        for s in range(s_per_prog):
            x = x_ref[s : s + 1, :]  # (1, P)
            y = y_ref[s : s + 1, :]
            px = orig_px + x / res
            py = orig_py - y / res
            px1 = jnp.floor(px)
            py1 = jnp.floor(py)
            fx = px - px1
            fy = py - py1
            px1c = jnp.clip(px1.astype(jnp.int32), 0, w - 1)
            px2c = jnp.clip(px1.astype(jnp.int32) + 1, 0, w - 1)
            py1c = jnp.clip(py1.astype(jnp.int32), 0, h - 1)
            py2c = jnp.clip(py1.astype(jnp.int32) + 1, 0, h - 1)

            # (P, 1) columns against (1, H)/(1, W) iotas -> (P, H)/(P, W).
            py1t = jnp.transpose(py1c)
            py2t = jnp.transpose(py2c)
            fyt = jnp.transpose(fy)
            oy1 = (py1t == rows).astype(jnp.float32)
            oy2 = (py2t == rows).astype(jnp.float32)
            wy = (1.0 - fyt) * oy1 + fyt * oy2
            dwy = oy2 - oy1

            s_img = sdf_ref[s]  # (H, W)
            t1 = jnp.dot(wy, s_img, preferred_element_type=jnp.float32)
            t2 = jnp.dot(dwy, s_img, preferred_element_type=jnp.float32)

            px1t = jnp.transpose(px1c)
            px2t = jnp.transpose(px2c)
            fxt = jnp.transpose(fx)
            ox1 = (px1t == cols).astype(jnp.float32)
            ox2 = (px2t == cols).astype(jnp.float32)
            wx = (1.0 - fxt) * ox1 + fxt * ox2
            dwx = ox2 - ox1

            d = jnp.sum(t1 * wx, axis=-1, keepdims=True)  # (P, 1)
            ddpx = jnp.sum(t1 * dwx, axis=-1, keepdims=True)
            ddpy = jnp.sum(t2 * wx, axis=-1, keepdims=True)

            inside = (
                (x >= x_lims[0]) & (x <= x_lims[1])
                & (y >= y_lims[0]) & (y <= y_lims[1])
            )
            d_row = jnp.where(inside, jnp.transpose(d), max_d)
            gx_row = jnp.where(inside, jnp.transpose(ddpx) / res, 0.0)
            gy_row = jnp.where(inside, -jnp.transpose(ddpy) / res, 0.0)
            d_ref[s : s + 1, :] = d_row
            gx_ref[s : s + 1, :] = gx_row
            gy_ref[s : s + 1, :] = gy_row

    return kernel


def _pad_inputs(sdf, points, s_per_prog):
    """Pad points to a 128-lane multiple and the batch to a grid multiple.

    Returns ``(sdf, x, y, b, p, p_pad, b_pad)`` — the shared prologue of
    every fused-lookup variant."""
    b, h, w = sdf.shape
    p = points.shape[-2]
    p_pad = -(-p // 128) * 128
    b_pad = -(-b // s_per_prog) * s_per_prog

    x = points[..., 0]
    y = points[..., 1]
    if p_pad != p:
        fill = jnp.zeros((b, p_pad - p), points.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
        y = jnp.concatenate([y, fill], axis=-1)
    if b_pad != b:
        sdf = jnp.concatenate(
            [sdf, jnp.zeros((b_pad - b, h, w), sdf.dtype)], axis=0
        )
        zf = jnp.zeros((b_pad - b, p_pad), x.dtype)
        x = jnp.concatenate([x, zf], axis=0)
        y = jnp.concatenate([y, zf], axis=0)
    return sdf, x, y, b, p, p_pad, b_pad


def _mxu_replay_bwd(res_, x_lims, y_lims, *extra):
    """Shared custom-VJP backward: replay the XLA one-hot formulation under
    ``jax.vjp`` for exact cotangents (trailing nondiff args ignored)."""
    saved, cot = extra[-2], extra[-1]
    from dgpmp2_tpu.ops.sdf import bilinear_lookup_mxu

    sdf, points = saved
    _, vjp_fn = jax.vjp(
        lambda s, p: bilinear_lookup_mxu(s, p, res_, x_lims, y_lims),
        sdf, points,
    )
    return vjp_fn(cot)


def _lookup_impl(sdf, points, res, x_lims, y_lims,
                 s_per_prog: int = 8, interpret: bool = False):
    sdf, x, y, b, p, p_pad, b_pad = _pad_inputs(sdf, points, s_per_prog)
    h, w = sdf.shape[-2:]

    kernel = _make_kernel(s_per_prog, p_pad, h, w, res, tuple(x_lims),
                          tuple(y_lims))
    out_shape = jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32)
    d, gx, gy = pl.pallas_call(
        kernel,
        grid=(b_pad // s_per_prog,),
        in_specs=[
            pl.BlockSpec((s_per_prog, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(sdf.astype(jnp.float32), x.astype(jnp.float32), y.astype(jnp.float32))
    d = d[:b, :p]
    grad = jnp.stack([gx[:b, :p], gy[:b, :p]], axis=-1)
    return d, grad


def _make_kernel_v2(s_per_prog: int, p_pad: int, h: int, w: int,
                    res: float, x_lims, y_lims):
    """Transpose-free formulation (v2).

    The v1 kernel spends ~1.3 µs/sample on (1,P)↔(P,1) relayouts (9 small
    transposes per sample — sublane/lane swaps are slow in Mosaic).  v2
    keeps every per-sample quantity in its natural (1, P) ROW layout and
    builds *transposed* one-hots by comparing a (W, 1)/(H, 1) column iota
    against the row — a broadcast compare, no relayout:

        WxT_cat = [ax1·Ox1 + ax2·Ox2 | Ox2 − Ox1]   (W, 2P)
        C_cat   = S @ WxT_cat                        (H, 2P)   one MXU dot
        C, C2   = C_cat[:, :P], C_cat[:, P:]
        wy, dwy : (H, P) y-side one-hot combos       (VPU)
        d       = Σ_h wy∘C     (sublane reduce → (1, P) row)
        ∂d/∂px  = Σ_h wy∘C2 ;  ∂d/∂py = Σ_h dwy∘C

    Sublane reductions are full-vreg adds (cheap); every output lands as a
    (1, P) row and writes straight into the (S, P) output block.
    """
    orig_px = -x_lims[0] / res
    orig_py = -y_lims[0] / res
    max_d = x_lims[1] - x_lims[0]

    def kernel(sdf_ref, x_ref, y_ref, d_ref, gx_ref, gy_ref):
        col_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        col_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        # Tile-wide pixel math, vectorized over (S, P) — outside the loop.
        x = x_ref[:]
        y = y_ref[:]
        px = orig_px + x * (1.0 / res)
        py = orig_py - y * (1.0 / res)
        px1f = jnp.floor(px)
        py1f = jnp.floor(py)
        fx = px - px1f
        fy = py - py1f
        px1 = jnp.clip(px1f.astype(jnp.int32), 0, w - 1)
        px2 = jnp.clip(px1f.astype(jnp.int32) + 1, 0, w - 1)
        py1 = jnp.clip(py1f.astype(jnp.int32), 0, h - 1)
        py2 = jnp.clip(py1f.astype(jnp.int32) + 1, 0, h - 1)
        inside = (
            (x >= x_lims[0]) & (x <= x_lims[1])
            & (y >= y_lims[0]) & (y <= y_lims[1])
        )

        for s in range(s_per_prog):
            ox1 = (col_w == px1[s : s + 1, :]).astype(jnp.float32)  # (W, P)
            ox2 = (col_w == px2[s : s + 1, :]).astype(jnp.float32)
            dwx = ox2 - ox1
            wx = ox1 + fx[s : s + 1, :] * dwx
            wx_cat = jnp.concatenate([wx, dwx], axis=1)  # (W, 2P)

            c_cat = jnp.dot(
                sdf_ref[s], wx_cat, preferred_element_type=jnp.float32
            )  # (H, 2P)
            c = c_cat[:, :p_pad]
            c2 = c_cat[:, p_pad:]

            oy1 = (col_h == py1[s : s + 1, :]).astype(jnp.float32)  # (H, P)
            oy2 = (col_h == py2[s : s + 1, :]).astype(jnp.float32)
            dwy = oy2 - oy1
            wy = oy1 + fy[s : s + 1, :] * dwy

            d_row = jnp.sum(wy * c, axis=0, keepdims=True)  # (1, P)
            ddpx = jnp.sum(wy * c2, axis=0, keepdims=True)
            ddpy = jnp.sum(dwy * c, axis=0, keepdims=True)

            ins = inside[s : s + 1, :]
            d_ref[s : s + 1, :] = jnp.where(ins, d_row, max_d)
            gx_ref[s : s + 1, :] = jnp.where(ins, ddpx * (1.0 / res), 0.0)
            gy_ref[s : s + 1, :] = jnp.where(ins, -ddpy * (1.0 / res), 0.0)

    return kernel


def _lookup_impl_v2(sdf, points, res, x_lims, y_lims,
                    s_per_prog: int = 32, interpret: bool = False):
    sdf, x, y, b, p, p_pad, b_pad = _pad_inputs(sdf, points, s_per_prog)
    h, w = sdf.shape[-2:]

    kernel = _make_kernel_v2(s_per_prog, p_pad, h, w, res, tuple(x_lims),
                             tuple(y_lims))
    out_shape = jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32)
    spec_sp = pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    d, gx, gy = pl.pallas_call(
        kernel,
        grid=(b_pad // s_per_prog,),
        in_specs=[
            pl.BlockSpec((s_per_prog, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_sp,
            spec_sp,
        ],
        out_specs=[spec_sp, spec_sp, spec_sp],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(sdf.astype(jnp.float32), x.astype(jnp.float32), y.astype(jnp.float32))
    d = d[:b, :p]
    grad = jnp.stack([gx[:b, :p], gy[:b, :p]], axis=-1)
    return d, grad


def _make_kernel_v3(s_per_prog: int, p_pad: int, h: int, w: int,
                    res: float, x_lims, y_lims, n_limbs: int):
    """Limb-decomposed MXU formulation (v3).

    v2's single dot is an f32 matmul — on the MXU that costs multiple
    bf16 passes per operand pair.  v3 keeps the one-hots PURE 0/1 (exactly
    representable in bf16) and splits the SDF into ``n_limbs`` bf16 limbs
    (S = Σ_l L_l, each next limb the bf16 rounding residual of the
    previous): every dot is then a single-pass bf16×bf16→f32 matmul and
    each one-hot column selects exactly one element, so the product is the
    limb value itself — the only error is the limb-split truncation
    (~2^-8·n_limbs relative: 3 limbs ≈ f32, 2 limbs ≈ 1.5e-5 rel).

    The fractional-x interpolation weight (the part that made v2's matmul
    operand non-0/1, forcing f32) moves to the VPU after the dot:

        o_cat = [Ox1 | Ox2]          (W, 2P) bf16 pure one-hots
        c     = Σ_l L_l @ o_cat      (H, 2P) f32, n_limbs MXU passes
        cdx   = c2 − c1 ;  cx = c1 + fx·cdx      (VPU)
        y-side identical to v2 (wy/dwy combos + sublane reduces).
    """
    orig_px = -x_lims[0] / res
    orig_py = -y_lims[0] / res
    max_d = x_lims[1] - x_lims[0]

    def kernel(limb_ref, x_ref, y_ref, d_ref, gx_ref, gy_ref):
        col_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        col_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        x = x_ref[:]
        y = y_ref[:]
        px = orig_px + x * (1.0 / res)
        py = orig_py - y * (1.0 / res)
        px1f = jnp.floor(px)
        py1f = jnp.floor(py)
        fx = px - px1f
        fy = py - py1f
        px1 = jnp.clip(px1f.astype(jnp.int32), 0, w - 1)
        px2 = jnp.clip(px1f.astype(jnp.int32) + 1, 0, w - 1)
        py1 = jnp.clip(py1f.astype(jnp.int32), 0, h - 1)
        py2 = jnp.clip(py1f.astype(jnp.int32) + 1, 0, h - 1)
        inside = (
            (x >= x_lims[0]) & (x <= x_lims[1])
            & (y >= y_lims[0]) & (y <= y_lims[1])
        )

        for s in range(s_per_prog):
            ox1 = (col_w == px1[s : s + 1, :]).astype(jnp.bfloat16)  # (W, P)
            ox2 = (col_w == px2[s : s + 1, :]).astype(jnp.bfloat16)
            o_cat = jnp.concatenate([ox1, ox2], axis=1)  # (W, 2P)

            c_cat = jnp.dot(limb_ref[s, 0], o_cat,
                            preferred_element_type=jnp.float32)  # (H, 2P)
            for l in range(1, n_limbs):
                c_cat = c_cat + jnp.dot(limb_ref[s, l], o_cat,
                                        preferred_element_type=jnp.float32)
            c1 = c_cat[:, :p_pad]
            c2 = c_cat[:, p_pad:]
            cdx = c2 - c1
            cx = c1 + fx[s : s + 1, :] * cdx  # (H, P), fx row-broadcast

            oy1 = (col_h == py1[s : s + 1, :]).astype(jnp.float32)  # (H, P)
            oy2 = (col_h == py2[s : s + 1, :]).astype(jnp.float32)
            dwy = oy2 - oy1
            wy = oy1 + fy[s : s + 1, :] * dwy

            d_row = jnp.sum(wy * cx, axis=0, keepdims=True)  # (1, P)
            ddpx = jnp.sum(wy * cdx, axis=0, keepdims=True)
            ddpy = jnp.sum(dwy * cx, axis=0, keepdims=True)

            ins = inside[s : s + 1, :]
            d_ref[s : s + 1, :] = jnp.where(ins, d_row, max_d)
            gx_ref[s : s + 1, :] = jnp.where(ins, ddpx * (1.0 / res), 0.0)
            gy_ref[s : s + 1, :] = jnp.where(ins, -ddpy * (1.0 / res), 0.0)

    return kernel


def _limb_split(sdf, n_limbs):
    """S = Σ_l limbs[l] with each limb the bf16 rounding of the residual.

    Inside the GN plan loop the SDF is a scan constant, so XLA hoists this
    whole decomposition out of the loop — it costs one pass over the SDF
    per *plan*, not per iteration.
    """
    rem = sdf.astype(jnp.float32)
    limbs = []
    for _ in range(n_limbs):
        l = rem.astype(jnp.bfloat16)
        limbs.append(l)
        rem = rem - l.astype(jnp.float32)
    return jnp.stack(limbs, axis=1)  # (B, L, H, W) bf16


def _lookup_impl_v3(sdf, points, res, x_lims, y_lims,
                    s_per_prog: int = 32, n_limbs: int = 3,
                    interpret: bool = False):
    sdf, x, y, b, p, p_pad, b_pad = _pad_inputs(sdf, points, s_per_prog)
    h, w = sdf.shape[-2:]

    limbs = _limb_split(sdf, n_limbs)
    kernel = _make_kernel_v3(s_per_prog, p_pad, h, w, res, tuple(x_lims),
                             tuple(y_lims), n_limbs)
    out_shape = jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32)
    spec_sp = pl.BlockSpec((s_per_prog, p_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    d, gx, gy = pl.pallas_call(
        kernel,
        grid=(b_pad // s_per_prog,),
        in_specs=[
            pl.BlockSpec((s_per_prog, n_limbs, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_sp,
            spec_sp,
        ],
        out_specs=[spec_sp, spec_sp, spec_sp],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(limbs, x.astype(jnp.float32), y.astype(jnp.float32))
    d = d[:b, :p]
    grad = jnp.stack([gx[:b, :p], gy[:b, :p]], axis=-1)
    return d, grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def bilinear_lookup_pallas_v3(sdf, points, res, x_lims, y_lims,
                              s_per_prog: int = 32, n_limbs: int = 3,
                              interpret: bool = False):
    """Limb-decomposed fused lookup (see :func:`_make_kernel_v3`).

    Same contract as :func:`dgpmp2_tpu.ops.sdf.bilinear_lookup`; forward
    accuracy ~f32 at ``n_limbs=3``, ~1.5e-5 relative at ``n_limbs=2``.
    """
    return _lookup_impl_v3(sdf, points, res, x_lims, y_lims, s_per_prog,
                           n_limbs, interpret)


def _fwd_v3(sdf, points, res, x_lims, y_lims, s_per_prog, n_limbs, interpret):
    out = _lookup_impl_v3(sdf, points, res, x_lims, y_lims, s_per_prog,
                          n_limbs, interpret)
    return out, (sdf, points)


bilinear_lookup_pallas_v3.defvjp(_fwd_v3, _mxu_replay_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def bilinear_lookup_pallas_v2(sdf, points, res, x_lims, y_lims,
                              s_per_prog: int = 32, interpret: bool = False):
    """Transpose-free fused lookup (see :func:`_make_kernel_v2`).

    Same contract as :func:`dgpmp2_tpu.ops.sdf.bilinear_lookup`.
    """
    return _lookup_impl_v2(sdf, points, res, x_lims, y_lims, s_per_prog,
                           interpret)


def _fwd_v2(sdf, points, res, x_lims, y_lims, s_per_prog, interpret):
    out = _lookup_impl_v2(sdf, points, res, x_lims, y_lims, s_per_prog,
                          interpret)
    return out, (sdf, points)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def bilinear_lookup_pallas(sdf, points, res, x_lims, y_lims,
                           s_per_prog: int = 8, interpret: bool = False):
    """Fused-lookup kernel with XLA-replay backward (see module docstring).

    Same contract as :func:`dgpmp2_tpu.ops.sdf.bilinear_lookup`: returns
    ``(d (B, P), grad (B, P, 2))``.
    """
    return _lookup_impl(sdf, points, res, x_lims, y_lims, s_per_prog,
                        interpret)


def _fwd(sdf, points, res, x_lims, y_lims, s_per_prog, interpret):
    out = _lookup_impl(sdf, points, res, x_lims, y_lims, s_per_prog, interpret)
    return out, (sdf, points)


bilinear_lookup_pallas.defvjp(_fwd, _mxu_replay_bwd)
bilinear_lookup_pallas_v2.defvjp(_fwd_v2, _mxu_replay_bwd)
