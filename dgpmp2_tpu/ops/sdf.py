"""Signed-distance-field construction and differentiable lookup.

TPU-native replacements for the reference's SDF stack
(``diff_gpmp2/utils/sdf_utils.py``, ``diff_gpmp2/env/env_2d.py:105-175``):

* :func:`edt` / :func:`sdf_from_occupancy` — exact Euclidean distance
  transform computed **on device** with static shapes.  The reference calls
  ``scipy.ndimage.distance_transform_edt`` on host
  (``utils/sdf_utils.py:17``); here the squared EDT is a separable min-plus
  reduction (two dense 1-D passes) that vectorizes onto the VPU/MXU and
  batches with ``vmap`` — exact, jittable, no host round-trip.
* :func:`bilinear_lookup` — bilinearly interpolated SDF value + analytic
  spatial gradient at world-space query points, the hot gather on the GN
  path (``utils/sdf_utils.py:38-107``).  Out-of-bounds queries clamp to
  ``MAX_D = x_lims[1]-x_lims[0]`` with zero gradient, which is the
  *intended* semantics of the reference (its bool-tensor mask arithmetic is
  version-dependent; see SURVEY.md §2.10 — we implement the intent).

Conventions
-----------
Images are row-major with row 0 at the *top* of the world (y is flipped):
pixel ``(row, col)`` covers world x = x_lims[0] + (col+?)·res, y decreasing
with row, exactly matching the reference's world↔pixel transform
(``env_2d.py:76-99``): ``px = -x_lims[0]/res + x/res``,
``py = -y_lims[0]/res - y/res``.

The gradient returned here is the TRUE spatial gradient ``∇d = (∂d/∂x,
∂d/∂y)``.  (The reference's ``bilinear_interpolate`` returns ``-∇d`` and its
obstacle cost negates it again; we skip the double negation.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Exact Euclidean distance transform (device-side, static shapes)
# ---------------------------------------------------------------------------


# Peak bytes the min-plus intermediate may occupy before the transform
# switches to output-chunked evaluation (lax.map serializes the chunks, so
# only one lives in HBM at a time).  At 128² a batch of B maps costs
# B·8.4 MB dense — B=2048 is 17 GB and OOMs a v5e; chunked, any B fits.
# Default 2 GB: measured on v5e, B=4096@128² runs 21 us/image at 2 GB vs
# 117 us at 512 MB (fewer, larger lax.map steps) while leaving >13 GB HBM
# for co-resident planner state.  Parsed lazily (per call, from
# DGPMP2_EDT_CHUNK_MB) so setting the env var after import works and a
# malformed value degrades to the default with a warning instead of
# breaking every import of this module.
_EDT_CHUNK_MB_DEFAULT = 2048.0


def _edt_chunk_bytes() -> int:
    import os
    import warnings

    raw = os.environ.get("DGPMP2_EDT_CHUNK_MB")
    if raw is None:
        return int(_EDT_CHUNK_MB_DEFAULT * 2**20)
    try:
        return int(float(raw) * 2**20)
    except ValueError:
        warnings.warn(
            f"DGPMP2_EDT_CHUNK_MB={raw!r} is not a number; using the "
            f"{_EDT_CHUNK_MB_DEFAULT:.0f} MB default"
        )
        return int(_EDT_CHUNK_MB_DEFAULT * 2**20)


def _edt_1d_sq(cost_sq: jnp.ndarray) -> jnp.ndarray:
    """Exact 1-D squared distance transform along the last axis.

    ``out[i] = min_j cost_sq[..., j] + (i-j)**2`` computed as a dense
    (n × n) min-reduction — O(n²) ops but fully parallel, which on TPU beats
    the data-dependent Felzenszwalb parabola scan for the ~128–512 px grids
    this framework targets.  When the (..., n, n) broadcast would exceed
    ``DGPMP2_EDT_CHUNK_MB`` (large batches: SDF construction for whole
    datasets / serving warm-up), the output axis is evaluated in chunks
    under ``lax.map`` so peak memory stays bounded while every chunk is
    still a fully parallel min-reduction — the TPU-friendly middle ground
    between the dense form and the sequential Felzenszwalb envelope scan
    (``csrc/dgpmp2_native.cpp`` keeps the true O(n) scan for the host-side
    C path).
    """
    n = cost_sq.shape[-1]
    i = jnp.arange(n, dtype=cost_sq.dtype)
    lanes = 1
    for s in cost_sq.shape[:-1]:
        lanes *= int(s)
    itemsize = jnp.dtype(cost_sq.dtype).itemsize
    chunk_bytes = _edt_chunk_bytes()
    if lanes * n * n * itemsize <= chunk_bytes:
        # (n, n) pairwise squared offsets; broadcast against (..., 1, n)
        # costs.  Integer arithmetic throughout keeps the transform
        # bit-exact.
        pair = (i[:, None] - i[None, :]) ** 2
        return jnp.min(cost_sq[..., None, :] + pair, axis=-1)

    k = max(1, min(n, chunk_bytes // (lanes * n * itemsize)))
    nchunk = -(-n // k)
    pad = nchunk * k - n
    # Padded output rows recompute row 0 (harmless) and are sliced off.
    ipad = jnp.pad(i, (0, pad)) if pad else i
    groups = ipad.reshape(nchunk, k)

    def one(ig):
        pair = (ig[:, None] - i[None, :]) ** 2  # (k, n)
        return jnp.min(cost_sq[..., None, :] + pair, axis=-1)  # (..., k)

    out = jax.lax.map(one, groups)  # (nchunk, ..., k)
    out = jnp.moveaxis(out, 0, -2)  # (..., nchunk, k)
    out = out.reshape(*cost_sq.shape[:-1], nchunk * k)
    return out[..., :n] if pad else out


def edt_sq(mask: jnp.ndarray, spatial_ndim: int = 2) -> jnp.ndarray:
    """Squared EDT of a boolean mask: distance to the nearest True cell.

    Cells where ``mask`` is True have distance 0.  Separable: one 1-D pass
    per spatial axis (Felzenszwalb & Huttenlocher decomposition of the
    squared Euclidean metric), over the last ``spatial_ndim`` axes — 2 for
    images, 3 for voxel grids; any leading axes are batch.
    """
    dims = mask.shape[-spatial_ndim:]
    dtype = jnp.int32
    # Finite "infinity": larger than any achievable squared distance, so an
    # all-False mask yields this cap instead of inf (keeps downstream math
    # NaN-free; scipy's EDT of an empty feature set is similarly degenerate).
    cap = jnp.asarray(sum(d * d for d in dims) + 1, dtype)
    cost = jnp.where(mask, jnp.zeros((), dtype), cap)
    # One dense min-plus pass per spatial axis, innermost last.
    for ax in range(-spatial_ndim, 0):
        if ax != -1:
            cost = jnp.swapaxes(_edt_1d_sq(jnp.swapaxes(cost, -1, ax)), -1, ax)
        else:
            cost = _edt_1d_sq(cost)
    return jnp.minimum(cost, cap)


def edt(mask: jnp.ndarray, dtype=None, spatial_ndim: int = 2) -> jnp.ndarray:
    """Euclidean distance (in pixels) to the nearest True cell of ``mask``.

    The squared transform is computed in exact int32 arithmetic; only the
    final sqrt is floating point, so results are bit-faithful to scipy's
    ``distance_transform_edt`` up to the sqrt rounding.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return jnp.sqrt(edt_sq(mask, spatial_ndim).astype(dtype))


def sdf_from_occupancy(
    image: jnp.ndarray,
    res: float = 1.0,
    threshold: float = 0.75,
    padlen: int = 1,
) -> jnp.ndarray:
    """Signed distance field from a grayscale occupancy image.

    Mirrors the reference pipeline (``utils/sdf_utils.py:6-21``): threshold
    at ``threshold`` (>th ⇒ free space, matching ``image > 0.75``), pad with
    a 1-px free border, then ``(edt(free) - edt(occupied)) * res`` — positive
    in free space, negative inside obstacles.  Unlike the reference the pad
    is stripped again so the output shape matches the input (the reference
    keeps the pad, growing the image by 2px; downstream it recomputes
    ``res`` from the sdf shape, so the two conventions agree to < 1 cell —
    we keep shapes stable because static shapes are king under jit).

    Works on (H, W) or batched (..., H, W) input; for (..., D, H, W) voxel
    occupancy use :func:`sdf_from_occupancy_3d`.
    """
    return _sdf_from_occupancy_nd(image, res, threshold, padlen, 2)


def sdf_from_occupancy_3d(
    voxels: jnp.ndarray,
    res: float = 1.0,
    threshold: float = 0.75,
    padlen: int = 1,
) -> jnp.ndarray:
    """Signed distance field from a 3-D occupancy grid (..., D, H, W).

    The 2-D pipeline generalized (no reference analog — the reference is
    2-D only, ``utils/sdf_utils.py:6-21``): threshold (>th ⇒ free), pad a
    1-voxel free border, ``(edt(free) - edt(occupied)) * res``, strip the
    pad.  Same exact separable min-plus EDT, one extra axis pass; the
    chunked evaluation bounds peak memory identically.
    """
    return _sdf_from_occupancy_nd(voxels, res, threshold, padlen, 3)


def _sdf_from_occupancy_nd(image, res, threshold, padlen, spatial_ndim):
    free = image > threshold
    if padlen > 0:
        pad = ([(0, 0)] * (free.ndim - spatial_ndim)
               + [(padlen, padlen)] * spatial_ndim)
        free = jnp.pad(free, pad, constant_values=True)
    occupied = ~free
    # edt(mask) = distance to the nearest True cell, so distance-to-obstacle
    # (positive in free space) is edt(occupied) and vice versa.
    out = (edt(occupied, spatial_ndim=spatial_ndim)
           - edt(free, spatial_ndim=spatial_ndim)) * res
    if padlen > 0:
        sl = (Ellipsis,) + (slice(padlen, -padlen),) * spatial_ndim
        out = out[sl]
    return out


def costmap_2d(sdf: jnp.ndarray, eps) -> jnp.ndarray:
    """Hinge costmap: ``max(0, eps - sdf)`` (``utils/sdf_utils.py:26-32``)."""
    return jnp.where(sdf <= eps, eps - sdf, jnp.zeros_like(sdf))


def safe_sdf(sdf: jnp.ndarray, eps) -> jnp.ndarray:
    """``eps - sdf`` without the hinge (``utils/sdf_utils.py:34-36``)."""
    return eps - sdf


# ---------------------------------------------------------------------------
# Bilinear SDF lookup with analytic Jacobian
# ---------------------------------------------------------------------------


def _interp_weights(px, py):
    px1 = jnp.floor(px)
    py1 = jnp.floor(py)
    fx = px - px1
    fy = py - py1
    return px1.astype(jnp.int32), py1.astype(jnp.int32), fx, fy


# Out-of-bounds semantics for the lookup:
#   "intended"  — d = MAX_D with zero gradient outside the world limits (the
#                 reference's *intended* behavior, SURVEY.md §2.10; default).
#   "reference" — bit-faithful to the reference running under modern torch
#                 (the bool-mask arithmetic at utils/sdf_utils.py:96-103
#                 degenerates to always-in-limits, and the interpolation
#                 weights are computed from the *clamped* corner indices at
#                 :69-84, so a fully out-of-grid point collapses to d = 0
#                 with zero gradient).  Used by the golden-parity tests.
_OOB_MODE = "intended"


def set_oob_mode(mode: str) -> None:
    """Select out-of-bounds lookup semantics: 'intended' | 'reference'.

    The mode is captured at TRACE time by jitted callers and is not part
    of any jit cache key, so switching it must invalidate compiled
    executables — otherwise a function traced under the old mode would
    silently keep its old semantics on the next call.

    .. warning:: the invalidation is ``jax.clear_caches()`` — it drops
       every compiled executable process-wide.  A live ``PlanningService``
       would pay the full XLA recompile (~20-40 s) on its next dispatch.
       Set this once at process startup, never mid-serving; it exists for
       parity testing, not as a runtime switch."""
    global _OOB_MODE
    if mode not in ("intended", "reference"):
        raise ValueError(mode)
    if mode != _OOB_MODE:
        _OOB_MODE = mode
        jax.clear_caches()


def _axis_weights(p, p1c, p2c, f):
    """(low, high) interpolation weights along one axis.

    Intended mode uses the fractional part (corner clamping never changes
    in-bounds weights); reference mode recomputes from the clamped indices so
    the weights sum to ``p2c - p1c`` (zero when both corners clamp together,
    reproducing the reference's collapse-to-zero outside the grid)."""
    if _OOB_MODE == "reference":
        dtype = f.dtype
        return p2c.astype(dtype) - p, p - p1c.astype(dtype)
    return 1.0 - f, f


def bilinear_lookup(
    sdf: jnp.ndarray,
    points: jnp.ndarray,
    res: float,
    x_lims,
    y_lims,
):
    """Bilinear SDF interpolation with analytic spatial gradient.

    Args:
      sdf: (..., H, W) distance field in metric units (leading dims batch).
      points: (..., P, 2) world-space query points ``(x, y)`` with matching
        leading batch dims.
      res: metres per pixel.
      x_lims, y_lims: world extents ``(lo, hi)``.

    Returns:
      ``(d, grad)`` with ``d`` shaped (..., P) and ``grad`` shaped
      (..., P, 2) holding ``∇d = (∂d/∂x, ∂d/∂y)``.  Points outside the
      world limits get ``d = MAX_D = x_lims[1]-x_lims[0]`` and zero
      gradient (intended reference semantics, see module docstring).

    Matches the reference's pixel mapping (``utils/sdf_utils.py:55-62``):
    ``px = -x_lims[0]/res + x/res``, ``py = -y_lims[0]/res - y/res`` (note
    the y flip uses -y_lims[0]; for the symmetric worlds the reference
    ships this equals +y_lims[1]).  Corner indices clamp to the image so
    border queries interpolate the edge texel.
    """
    h, w = sdf.shape[-2], sdf.shape[-1]
    dtype = sdf.dtype
    x = points[..., 0].astype(dtype)
    y = points[..., 1].astype(dtype)
    max_d = jnp.asarray(x_lims[1] - x_lims[0], dtype)

    orig_px = -x_lims[0] / res
    orig_py = -y_lims[0] / res
    px = orig_px + x / res
    py = orig_py - y / res

    px1, py1, fx, fy = _interp_weights(px, py)
    px1c = jnp.clip(px1, 0, w - 1)
    px2c = jnp.clip(px1 + 1, 0, w - 1)
    py1c = jnp.clip(py1, 0, h - 1)
    py2c = jnp.clip(py1 + 1, 0, h - 1)

    # Flat gather: one take per corner over the trailing (H*W) axis.  The
    # leading batch dims of sdf and points line up, so index arithmetic
    # vectorizes; take_along_axis keeps everything on-device as one fused
    # gather per corner.
    flat = sdf.reshape(*sdf.shape[:-2], h * w)

    def take(pyi, pxi):
        idx = pyi * w + pxi
        return jnp.take_along_axis(flat, idx, axis=-1)

    d11 = take(py1c, px1c)  # (y1, x1)
    d21 = take(py1c, px2c)  # (y1, x2)
    d12 = take(py2c, px1c)  # (y2, x1)
    d22 = take(py2c, px2c)  # (y2, x2)

    ax1, ax2 = _axis_weights(px, px1c, px2c, fx)
    ay1, ay2 = _axis_weights(py, py1c, py2c, fy)
    d = ay1 * (ax1 * d11 + ax2 * d21) + ay2 * (ax1 * d12 + ax2 * d22)

    # ∂d/∂px, ∂d/∂py then chain through px = x/res, py = -y/res.
    dd_dpx = ay1 * (d21 - d11) + ay2 * (d22 - d12)
    dd_dpy = ax1 * (d12 - d11) + ax2 * (d22 - d21)
    gx = dd_dpx / res
    gy = -dd_dpy / res

    if _OOB_MODE == "reference":
        return d, jnp.stack([gx, gy], axis=-1)

    in_x = (x >= x_lims[0]) & (x <= x_lims[1])
    in_y = (y >= y_lims[0]) & (y <= y_lims[1])
    inside = in_x & in_y

    d = jnp.where(inside, d, max_d)
    zero = jnp.zeros((), dtype)
    grad = jnp.stack(
        [jnp.where(inside, gx, zero), jnp.where(inside, gy, zero)], axis=-1
    )
    return d, grad


def bilinear_lookup_mxu(
    sdf: jnp.ndarray,
    points: jnp.ndarray,
    res: float,
    x_lims,
    y_lims,
):
    """MXU formulation of :func:`bilinear_lookup` — identical math, no gather.

    TPUs hate fine-grained random gathers: the take-based lookup costs ~5 ms
    at B=1024, P=101 on a v5e while the whole GN solve is ~1 ms.  Bilinear
    interpolation is a *linear* functional of the image, so express it as
    matmuls against interpolation one-hots and let the MXU do it:

        d(b, p)      = Σ_h Σ_w  Wy[b,p,h] · S[b,h,w] · Wx[b,p,w]
        ∂d/∂px(b, p) = Σ_h Σ_w  Wy[b,p,h] · S[b,h,w] · dWx[b,p,w]
        ∂d/∂py(b, p) = Σ_h Σ_w dWy[b,p,h] · S[b,h,w] ·  Wx[b,p,w]

    where ``Wy`` has ``(1-fy, fy)`` at the two interpolation rows and ``dWy``
    has ``(-1, +1)`` (zero when clamped, matching the gather path's clamped
    corners exactly).  Cost: two (B,P,H)x(B,H,W) batched matmuls — ~7 GFLOP
    at the default problem size, microseconds on the MXU, versus hundreds of
    thousands of scalar gathers.

    Equivalent to :func:`bilinear_lookup` to f32 rounding; property-tested
    against it.
    """
    h, w = sdf.shape[-2], sdf.shape[-1]
    dtype = sdf.dtype
    x = points[..., 0].astype(dtype)
    y = points[..., 1].astype(dtype)
    max_d = jnp.asarray(x_lims[1] - x_lims[0], dtype)

    px = -x_lims[0] / res + x / res
    py = -y_lims[0] / res - y / res
    px1, py1, fx, fy = _interp_weights(px, py)
    px1c = jnp.clip(px1, 0, w - 1)
    px2c = jnp.clip(px1 + 1, 0, w - 1)
    py1c = jnp.clip(py1, 0, h - 1)
    py2c = jnp.clip(py1 + 1, 0, h - 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w,), 0)
    oy1 = (py1c[..., None] == rows).astype(dtype)  # (..., P, H)
    oy2 = (py2c[..., None] == rows).astype(dtype)
    ox1 = (px1c[..., None] == cols).astype(dtype)  # (..., P, W)
    ox2 = (px2c[..., None] == cols).astype(dtype)

    ax1, ax2 = _axis_weights(px, px1c, px2c, fx)
    ay1, ay2 = _axis_weights(py, py1c, py2c, fy)
    wy = ay1[..., None] * oy1 + ay2[..., None] * oy2
    dwy = oy2 - oy1  # ∂/∂py one-hot; zero when clamped (oy1 == oy2)
    wx = ax1[..., None] * ox1 + ax2[..., None] * ox2
    dwx = ox2 - ox1

    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("...ph,...hw->...pw", wy, sdf, precision=hi)
    t2 = jnp.einsum("...ph,...hw->...pw", dwy, sdf, precision=hi)
    d = jnp.sum(t * wx, axis=-1)
    dd_dpx = jnp.sum(t * dwx, axis=-1)
    dd_dpy = jnp.sum(t2 * wx, axis=-1)
    gx = dd_dpx / res
    gy = -dd_dpy / res

    if _OOB_MODE == "reference":
        return d, jnp.stack([gx, gy], axis=-1)

    inside = (
        (x >= x_lims[0]) & (x <= x_lims[1]) & (y >= y_lims[0]) & (y <= y_lims[1])
    )
    d = jnp.where(inside, d, max_d)
    zero = jnp.zeros((), dtype)
    grad = jnp.stack(
        [jnp.where(inside, gx, zero), jnp.where(inside, gy, zero)], axis=-1
    )
    return d, grad


def bilinear_lookup_rows(
    sdf: jnp.ndarray,
    points: jnp.ndarray,
    res: float,
    x_lims,
    y_lims,
):
    """Row-gather formulation of :func:`bilinear_lookup` — TPU sweet spot.

    Element gathers are catastrophic on TPU (~5 ms for B=1024, P=101 corners
    on a v5e) and the fully-dense MXU one-hot formulation compiles poorly at
    batch 1024.  Middle ground: gather the two interpolation *rows* per
    query (contiguous W-length vectors — DMA-friendly), then do the x-axis
    interpolation as a lane-wise one-hot dot:

        R1[b,p,:] = S[b, py1, :] ;  R2[b,p,:] = S[b, py2, :]   (row gathers)
        R  = (1-fy)·R1 + fy·R2
        d        = Σ_w R·Wx          ∂d/∂px = Σ_w R·dWx
        ∂d/∂py   = Σ_w (R2-R1)·Wx

    Same clamped-corner / out-of-bounds semantics as the gather path
    (property-tested against it).
    """
    h, w = sdf.shape[-2], sdf.shape[-1]
    dtype = sdf.dtype
    x = points[..., 0].astype(dtype)
    y = points[..., 1].astype(dtype)
    max_d = jnp.asarray(x_lims[1] - x_lims[0], dtype)

    px = -x_lims[0] / res + x / res
    py = -y_lims[0] / res - y / res
    px1, py1, fx, fy = _interp_weights(px, py)
    px1c = jnp.clip(px1, 0, w - 1)
    px2c = jnp.clip(px1 + 1, 0, w - 1)
    py1c = jnp.clip(py1, 0, h - 1)
    py2c = jnp.clip(py1 + 1, 0, h - 1)

    ax1, ax2 = _axis_weights(px, px1c, px2c, fx)
    ay1, ay2 = _axis_weights(py, py1c, py2c, fy)

    # Row gathers along the H axis: (..., P, W) each.
    r1 = jnp.take_along_axis(sdf, py1c[..., None], axis=-2)
    r2 = jnp.take_along_axis(sdf, py2c[..., None], axis=-2)
    r = ay1[..., None] * r1 + ay2[..., None] * r2
    dr = r2 - r1

    cols = jax.lax.broadcasted_iota(jnp.int32, (w,), 0)
    ox1 = (px1c[..., None] == cols).astype(dtype)
    ox2 = (px2c[..., None] == cols).astype(dtype)
    wx = ax1[..., None] * ox1 + ax2[..., None] * ox2
    dwx = ox2 - ox1

    d = jnp.sum(r * wx, axis=-1)
    dd_dpx = jnp.sum(r * dwx, axis=-1)
    dd_dpy = jnp.sum(dr * wx, axis=-1)
    gx = dd_dpx / res
    gy = -dd_dpy / res

    if _OOB_MODE == "reference":
        return d, jnp.stack([gx, gy], axis=-1)

    inside = (
        (x >= x_lims[0]) & (x <= x_lims[1]) & (y >= y_lims[0]) & (y <= y_lims[1])
    )
    d = jnp.where(inside, d, max_d)
    zero = jnp.zeros((), dtype)
    grad = jnp.stack(
        [jnp.where(inside, gx, zero), jnp.where(inside, gy, zero)], axis=-1
    )
    return d, grad


def _pallas_ok(sdf, points) -> bool:
    """Fused-kernel applicability: 3-D f32 batch with modest image size."""
    return (
        sdf.ndim == 3
        and points.ndim == 3
        and sdf.dtype == jnp.float32
        and sdf.shape[-1] <= 512
        and sdf.shape[-2] <= 512
    )


# Lookup engine selection: fused Pallas on TPU, gather on CPU.
_LOOKUP_METHOD = "auto"
def _pallas_lookup(sdf, points, res, x_lims, y_lims):
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas

    return bilinear_lookup_pallas(
        sdf, points, res, tuple(x_lims), tuple(y_lims)
    )


def _pallas_spp(sdf, bytes_per_px: int = 4) -> int:
    """Samples per grid program sized so the SDF tile stays ~2 MB (Mosaic
    double-buffers input blocks; 32 is the measured sweet spot at 128²).
    ``bytes_per_px``: 4 for the f32 v2 kernel, 2·n_limbs for the bf16
    limb-decomposed v3 kernel."""
    tile_bytes = sdf.shape[-1] * sdf.shape[-2] * bytes_per_px
    spp = max(1, (2 * 1024 * 1024) // tile_bytes)
    return min(32, spp)


def _pallas_v2_lookup(sdf, points, res, x_lims, y_lims):
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v2

    return bilinear_lookup_pallas_v2(
        sdf, points, res, tuple(x_lims), tuple(y_lims), _pallas_spp(sdf)
    )


def _pallas_v3_lookup(sdf, points, res, x_lims, y_lims, n_limbs: int = 3):
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v3

    return bilinear_lookup_pallas_v3(
        sdf, points, res, tuple(x_lims), tuple(y_lims),
        _pallas_spp(sdf, 2 * n_limbs), n_limbs,
    )


def _pallas_v3_2_lookup(sdf, points, res, x_lims, y_lims):
    """2-limb variant: ~1.5e-5 relative forward accuracy, fewer MXU passes."""
    return _pallas_v3_lookup(sdf, points, res, x_lims, y_lims, n_limbs=2)


def _pallas_v3_1_lookup(sdf, points, res, x_lims, y_lims):
    """1-limb variant: the SDF lives in plain bf16 (~0.4% relative error) —
    halves the per-iteration HBM/DMA traffic and runs one single-pass bf16
    MXU dot per sample.  Quality-sensitive paths should stay on the exact
    engines; this is an opt-in speed/accuracy trade for serving."""
    return _pallas_v3_lookup(sdf, points, res, x_lims, y_lims, n_limbs=1)


_LOOKUP_FNS = {
    "gather": bilinear_lookup,
    "mxu": bilinear_lookup_mxu,
    "rows": bilinear_lookup_rows,
    "pallas": _pallas_lookup,
    "pallas_v2": _pallas_v2_lookup,
    "pallas_v3": _pallas_v3_lookup,
    "pallas_v3_2": _pallas_v3_2_lookup,
    "pallas_v3_1": _pallas_v3_1_lookup,
}


def set_lookup_method(method: str) -> None:
    """Override the bilinear lookup engine: 'auto' | 'gather' | 'mxu' |
    'rows' | 'pallas' | 'pallas_v2' | 'pallas_v3' | 'pallas_v3_2' |
    'pallas_v3_1' (bf16 SDF, ~0.4% relative — serving-only trade).

    Like :func:`set_oob_mode`, the method is captured at trace time, so
    switching invalidates jit caches — otherwise an already-compiled
    executable would silently keep the old engine.  Same serving caveat:
    the flush is process-wide (``jax.clear_caches()``), so a live
    ``PlanningService`` recompiles on its next dispatch — choose the
    engine at startup, not mid-serving."""
    global _LOOKUP_METHOD
    if method != "auto" and method not in _LOOKUP_FNS:
        raise ValueError(method)
    if method != _LOOKUP_METHOD:
        _LOOKUP_METHOD = method
        jax.clear_caches()


def lookup(sdf, points, res, x_lims, y_lims):
    """Backend-dispatched bilinear lookup (see :func:`set_lookup_method`)."""
    # Scalar hygiene: callers often pass np.float64 scalars (e.g. limits
    # loaded from .npz) which are STRONGLY typed under jax x64 and would
    # silently promote the whole lookup — and everything assembled from it
    # — to float64 in CPU f32 verification runs.  Python floats are weakly
    # typed and never promote.
    res = float(res)
    x_lims = (float(x_lims[0]), float(x_lims[1]))
    y_lims = (float(y_lims[0]), float(y_lims[1]))
    # The y→row transform (py = -y_lims[0]/res − y/res, replicating the
    # reference's ``sdf_utils.bilinear_interpolate``) is only correct for
    # symmetric y limits; an asymmetric world would silently read wrong
    # rows, so refuse it loudly (every shipped config is symmetric).
    if abs(y_lims[0] + y_lims[1]) > 1e-9:
        raise NotImplementedError(
            f"asymmetric y_lims {tuple(y_lims)} are not supported by the "
            "reference y->row transform; recenter the world"
        )
    method = _LOOKUP_METHOD
    if method == "auto":
        # Measured on a v5e (B=1024, P=101, 128x128 SDFs, loop-in-jit):
        # gather 5.2 ms, rows 2.9 ms, mxu one-hot 1.45 ms, fused Pallas v1
        # 1.37 ms, transpose-free Pallas v2 0.66 ms per evaluation.
        # v2 (ops/pallas/sdf_lookup.py:_make_kernel_v2) is the TPU default;
        # the "reference" OOB mode (golden parity) is XLA-only.
        if (
            jax.default_backend() == "tpu"
            and _OOB_MODE == "intended"
            and _pallas_ok(sdf, points)
        ):
            method = "pallas_v2"
        else:
            method = "mxu" if jax.default_backend() == "tpu" else "gather"
    return _LOOKUP_FNS[method](sdf, points, res, x_lims, y_lims)


@functools.partial(jax.jit, static_argnames=("x_lims", "y_lims", "res"))
def bilinear_lookup_jit(sdf, points, res, x_lims, y_lims):
    return bilinear_lookup(sdf, points, res, x_lims, y_lims)


# 3-D lookup engine selection (mirrors the 2-D _LOOKUP_METHOD switch):
# trajectory-locality tiled Pallas kernel on TPU, XLA 8-tap gather elsewhere.
_LOOKUP3D_METHOD = "auto"


def _pallas3d_ok(sdf, points) -> bool:
    """Tiled-kernel applicability: a (B, D, H, W) f32 batch whose volume
    fits the per-problem VMEM block (≤2 MiB — 64³ and every shipped voxel
    family qualify) with an 8-row-collapsible H (the brick reshape and the
    aligned sublane slice need it)."""
    return (
        sdf.ndim == 4
        and points.ndim == 3
        and sdf.dtype == jnp.float32
        and sdf.shape[-2] % 8 == 0
        and sdf.shape[-3] >= 16
        and sdf.shape[-2] >= 16
        and sdf.shape[-1] * sdf.shape[-2] * sdf.shape[-3] * 4
        <= 2 * 1024 * 1024
    )


def _pallas_tile_lookup3d(sdf, points, res, x_lims, y_lims, z_lims):
    from dgpmp2_tpu.ops.pallas.sdf_lookup3d import trilinear_lookup_pallas

    if _OOB_MODE != "intended":
        raise NotImplementedError(
            "pallas_tile implements the intended OOB semantics only; use "
            "the gather engine for reference-parity experiments"
        )
    res = float(res)
    x_lims = (float(x_lims[0]), float(x_lims[1]))
    y_lims = (float(y_lims[0]), float(y_lims[1]))
    z_lims = (float(z_lims[0]), float(z_lims[1]))
    # Same guard as trilinear_lookup: the y->row flip assumes a centered
    # world, so both engines must refuse asymmetric y_lims identically
    # (otherwise only the gather engine fails and pallas_tile silently
    # reads wrong rows).
    if abs(y_lims[0] + y_lims[1]) > 1e-9:
        raise NotImplementedError(
            f"asymmetric y_lims {tuple(y_lims)} are not supported by the "
            "reference y->row transform; recenter the world"
        )
    # Explicit opt-in gets a loud applicability error instead of an opaque
    # Mosaic lowering failure (H not 8-divisible, volume > the 2 MiB VMEM
    # block) or a silent f32 downcast of an f64 field.
    if not _pallas3d_ok(sdf, points):
        raise ValueError(
            "pallas_tile needs a (B, D, H, W) float32 sdf with H % 8 == 0, "
            f"D,H >= 16 and volume <= 2 MiB; got sdf {sdf.shape} "
            f"{sdf.dtype}, points ndim {points.ndim} — use the gather "
            "engine for this input"
        )

    return trilinear_lookup_pallas(sdf, points, res, x_lims, y_lims, z_lims)


_LOOKUP3D_FNS = {
    "gather": lambda *a: trilinear_lookup(*a),
    "pallas_tile": _pallas_tile_lookup3d,
}


def set_lookup3d_method(method: str) -> None:
    """Override the trilinear lookup engine: 'auto' | 'gather' |
    'pallas_tile'.  Same trace-time-capture caveat as
    :func:`set_lookup_method` — switching clears every jit cache."""
    global _LOOKUP3D_METHOD
    if method != "auto" and method not in _LOOKUP3D_FNS:
        raise ValueError(method)
    if method != _LOOKUP3D_METHOD:
        _LOOKUP3D_METHOD = method
        jax.clear_caches()


def lookup_nd(sdf, points, res, x_lims, y_lims, z_lims=None):
    """Workspace-dimension dispatcher: 2-D backend-selected bilinear lookup
    when ``z_lims`` is None, backend-selected 3-D trilinear otherwise."""
    if z_lims is None:
        return lookup(sdf, points, res, x_lims, y_lims)
    method = _LOOKUP3D_METHOD
    if method == "auto":
        # Measured on a v5e (benchmarks/bench_lookup3d.py — committed
        # bench, P=101 trajectory-shaped queries into 64³ f32 worlds,
        # loop-in-jit x50): XLA 8-tap gather 112.9 ns/sample at B=1024
        # (141.0 at B=128) vs the trajectory-locality tiled Pallas kernel
        # 120.8 ns/sample at p_t=16 / B=1024 — near parity on its best
        # case, and 437 ns/sample on scattered queries where every tile
        # takes the full-volume fallback, while the gather is
        # access-pattern-insensitive (113.6 ns scattered).  An earlier
        # in-comment claim of 8.9 ns/sample for this gather was a
        # measurement artifact (uncommitted run, never reproduced); the
        # committed bench agrees with the 112 ns/sample the round-3
        # plan-loop differencing inferred (PERFORMANCE.md "3-D lookup
        # engines").  The gather is the default everywhere; the tiled
        # kernel stays opt-in (set_lookup3d_method("pallas_tile")) as the
        # measured-negative record for the locality roadmap item.
        method = "gather"
    return _LOOKUP3D_FNS[method](sdf, points, res, x_lims, y_lims, z_lims)


# ---------------------------------------------------------------------------
# Trilinear SDF lookup (3-D workspaces; no reference analog)
# ---------------------------------------------------------------------------


def trilinear_lookup(
    sdf: jnp.ndarray,
    points: jnp.ndarray,
    res: float,
    x_lims,
    y_lims,
    z_lims,
):
    """Trilinearly interpolated 3-D SDF value + analytic spatial gradient.

    The 3-D companion of :func:`bilinear_lookup` (the reference is 2-D
    only).  Voxel layout is ``sdf[..., z, row, col]``: the trailing two
    axes follow the 2-D image convention exactly (x → col, y → row with
    the y flip), and the depth axis is unflipped — voxel z-index 0 sits at
    ``z_lims[0]``, ``pz = (z - z_lims[0]) / res``.

    Args:
      sdf: (..., D, H, W) distance field in metric units.
      points: (..., P, 3) world-space queries ``(x, y, z)``.
      res: metres per voxel (cubical voxels).
      x_lims, y_lims, z_lims: world extents ``(lo, hi)``.

    Returns:
      ``(d, grad)``: d (..., P) and grad (..., P, 3) = ∇d.  Out-of-bounds
      queries get ``d = MAX_D = x_lims[1]-x_lims[0]`` with zero gradient
      ("intended" mode; the "reference" OOB mode also applies, giving the
      clamped-weight collapse for parity experiments).
    """
    res = float(res)
    x_lims = (float(x_lims[0]), float(x_lims[1]))
    y_lims = (float(y_lims[0]), float(y_lims[1]))
    z_lims = (float(z_lims[0]), float(z_lims[1]))
    if abs(y_lims[0] + y_lims[1]) > 1e-9:
        raise NotImplementedError(
            f"asymmetric y_lims {tuple(y_lims)} are not supported by the "
            "reference y->row transform; recenter the world"
        )
    nz, h, w = sdf.shape[-3], sdf.shape[-2], sdf.shape[-1]
    dtype = sdf.dtype
    x = points[..., 0].astype(dtype)
    y = points[..., 1].astype(dtype)
    z = points[..., 2].astype(dtype)
    max_d = jnp.asarray(x_lims[1] - x_lims[0], dtype)

    px = -x_lims[0] / res + x / res
    py = -y_lims[0] / res - y / res
    pz = -z_lims[0] / res + z / res

    px1, py1, fx, fy = _interp_weights(px, py)
    pz1 = jnp.floor(pz)
    fz = pz - pz1
    pz1 = pz1.astype(jnp.int32)
    px1c = jnp.clip(px1, 0, w - 1)
    px2c = jnp.clip(px1 + 1, 0, w - 1)
    py1c = jnp.clip(py1, 0, h - 1)
    py2c = jnp.clip(py1 + 1, 0, h - 1)
    pz1c = jnp.clip(pz1, 0, nz - 1)
    pz2c = jnp.clip(pz1 + 1, 0, nz - 1)

    flat = sdf.reshape(*sdf.shape[:-3], nz * h * w)

    def take(pzi, pyi, pxi):
        idx = (pzi * h + pyi) * w + pxi
        return jnp.take_along_axis(flat, idx, axis=-1)

    # 8 corners: d{z}{y}{x} with 1 = low corner, 2 = high corner.
    d111 = take(pz1c, py1c, px1c)
    d112 = take(pz1c, py1c, px2c)
    d121 = take(pz1c, py2c, px1c)
    d122 = take(pz1c, py2c, px2c)
    d211 = take(pz2c, py1c, px1c)
    d212 = take(pz2c, py1c, px2c)
    d221 = take(pz2c, py2c, px1c)
    d222 = take(pz2c, py2c, px2c)

    ax1, ax2 = _axis_weights(px, px1c, px2c, fx)
    ay1, ay2 = _axis_weights(py, py1c, py2c, fy)
    az1, az2 = _axis_weights(pz, pz1c, pz2c, fz)

    # Interpolate x, then y, then z.
    dy11 = ax1 * d111 + ax2 * d112
    dy12 = ax1 * d121 + ax2 * d122
    dy21 = ax1 * d211 + ax2 * d212
    dy22 = ax1 * d221 + ax2 * d222
    dz1 = ay1 * dy11 + ay2 * dy12
    dz2 = ay1 * dy21 + ay2 * dy22
    d = az1 * dz1 + az2 * dz2

    # Analytic partials in index space, chained through the world→index
    # maps (px = x/res, py = -y/res, pz = z/res).
    dd_dpx = (az1 * (ay1 * (d112 - d111) + ay2 * (d122 - d121))
              + az2 * (ay1 * (d212 - d211) + ay2 * (d222 - d221)))
    dd_dpy = az1 * (dy12 - dy11) + az2 * (dy22 - dy21)
    dd_dpz = dz2 - dz1
    gx = dd_dpx / res
    gy = -dd_dpy / res
    gz = dd_dpz / res

    if _OOB_MODE == "reference":
        return d, jnp.stack([gx, gy, gz], axis=-1)

    inside = (
        (x >= x_lims[0]) & (x <= x_lims[1])
        & (y >= y_lims[0]) & (y <= y_lims[1])
        & (z >= z_lims[0]) & (z <= z_lims[1])
    )
    d = jnp.where(inside, d, max_d)
    zero = jnp.zeros((), dtype)
    grad = jnp.stack([jnp.where(inside, gx, zero),
                      jnp.where(inside, gy, zero),
                      jnp.where(inside, gz, zero)], axis=-1)
    return d, grad
