"""SDF construction & bilinear lookup: parity vs scipy and finite differences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from dgpmp2_tpu.ops import sdf as sdf_ops


def _ref_sdf(image, res=1.0, padlen=1):
    """Reference pipeline (diff_gpmp2/utils/sdf_utils.py:6-21), pad kept off
    for shape parity with our implementation."""
    im = np.array(image > 0.75, dtype=np.float64)
    if padlen > 0:
        im = np.pad(im, padlen, "constant", constant_values=1.0)
    inv = 1.0 - im
    out = (ndimage.distance_transform_edt(im) - ndimage.distance_transform_edt(inv)) * res
    if padlen > 0:
        out = out[padlen:-padlen, padlen:-padlen]
    return out


def _random_image(rng, n=48):
    img = np.ones((n, n))
    for _ in range(4):
        r, c = rng.integers(0, n - 10, 2)
        h, w = rng.integers(4, 10, 2)
        img[r : r + h, c : c + w] = 0.0
    return img


def test_edt_matches_scipy():
    rng = np.random.default_rng(0)
    img = _random_image(rng)
    mask = img < 0.5  # obstacle cells
    ours = np.asarray(sdf_ops.edt(jnp.asarray(mask)))
    ref = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_edt_chunked_matches_dense(monkeypatch):
    """Force the output-chunked lax.map path (budget too small for the dense
    (..., n, n) broadcast) and check bit-parity with the dense path + scipy.

    Budget 92160 = 5 output rows per chunk at this shape, so n=48 exercises
    the ragged-tail padding branch (48 = 9*5 + 3)."""
    rng = np.random.default_rng(6)
    imgs = np.stack([_random_image(rng) for _ in range(2)])
    mask = imgs < 0.5
    dense = np.asarray(sdf_ops.edt(jnp.asarray(mask)))
    monkeypatch.setenv("DGPMP2_EDT_CHUNK_MB", str(92160 / 2**20))
    chunked = np.asarray(sdf_ops.edt(jnp.asarray(mask)))
    np.testing.assert_array_equal(chunked, dense)
    ref = np.stack([ndimage.distance_transform_edt(~m) for m in mask])
    np.testing.assert_allclose(chunked, ref, atol=1e-9)
    # Single-row chunks (k=1): the degenerate extreme.
    monkeypatch.setenv("DGPMP2_EDT_CHUNK_MB", str(1 / 2**20))
    np.testing.assert_array_equal(np.asarray(sdf_ops.edt(jnp.asarray(mask))), dense)


def test_sdf_chunked_under_jit(monkeypatch):
    monkeypatch.setenv("DGPMP2_EDT_CHUNK_MB", str(92160 / 2**20))
    rng = np.random.default_rng(7)
    img = _random_image(rng)
    out = jax.jit(lambda im: sdf_ops.sdf_from_occupancy(im, res=0.1))(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), _ref_sdf(img, res=0.1), atol=1e-9)


def test_sdf_from_occupancy_matches_reference():
    rng = np.random.default_rng(1)
    img = _random_image(rng)
    res = 10.0 / img.shape[0]
    ours = np.asarray(sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=res))
    ref = _ref_sdf(img, res=res)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_sdf_batched():
    rng = np.random.default_rng(2)
    imgs = np.stack([_random_image(rng) for _ in range(3)])
    out = sdf_ops.sdf_from_occupancy(jnp.asarray(imgs), res=0.1)
    assert out.shape == imgs.shape
    single = sdf_ops.sdf_from_occupancy(jnp.asarray(imgs[1]), res=0.1)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-12)


def test_bilinear_lookup_values_and_gradient():
    # Smooth analytic field sampled on a grid: interpolation should be close
    # and the analytic gradient should match finite differences of the
    # *interpolant* exactly.
    n = 64
    x_lims = (-5.0, 5.0)
    y_lims = (-5.0, 5.0)
    res = (x_lims[1] - x_lims[0]) / n
    rng = np.random.default_rng(3)
    field = rng.standard_normal((n, n))
    sdf = jnp.asarray(field)

    pts = jnp.asarray(rng.uniform(-4.5, 4.5, size=(1, 17, 2)))
    d, grad = sdf_ops.bilinear_lookup(sdf[None], pts, res, x_lims, y_lims)

    # Finite differences of the interpolant w.r.t. the query point.
    h = 1e-6
    for k, axis in [(0, jnp.array([h, 0.0])), (1, jnp.array([0.0, h]))]:
        dp, _ = sdf_ops.bilinear_lookup(sdf[None], pts + axis, res, x_lims, y_lims)
        dm, _ = sdf_ops.bilinear_lookup(sdf[None], pts - axis, res, x_lims, y_lims)
        fd = (dp - dm) / (2 * h)
        np.testing.assert_allclose(np.asarray(grad[..., k]), np.asarray(fd), atol=1e-5)


def test_bilinear_lookup_exact_at_pixel_centers():
    n = 16
    x_lims = (-2.0, 2.0)
    y_lims = (-2.0, 2.0)
    res = (x_lims[1] - x_lims[0]) / n
    rng = np.random.default_rng(4)
    field = rng.standard_normal((n, n))
    # World coords of pixel (row, col): px = col -> x = (col - n/2)*res,
    # py = row -> y = -(row - n/2)*res  (reference mapping, sdf_utils.py:55-62)
    rows, cols = np.meshgrid(np.arange(1, n - 1), np.arange(1, n - 1), indexing="ij")
    xs = (cols - n / 2) * res
    ys = -(rows - n / 2) * res
    pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))[None]
    d, _ = sdf_ops.bilinear_lookup(jnp.asarray(field)[None], pts, res, x_lims, y_lims)
    np.testing.assert_allclose(
        np.asarray(d[0]), field[rows.ravel(), cols.ravel()], atol=1e-12
    )


def test_bilinear_out_of_bounds():
    n = 8
    lims = (-1.0, 1.0)
    res = 2.0 / n
    sdf = jnp.ones((1, n, n))
    pts = jnp.asarray([[[5.0, 0.0], [0.0, -7.0], [0.0, 0.0]]])
    d, grad = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    max_d = lims[1] - lims[0]
    assert d[0, 0] == max_d and d[0, 1] == max_d
    assert d[0, 2] == 1.0
    np.testing.assert_array_equal(np.asarray(grad[0, :2]), 0.0)


def test_bilinear_lookup_jittable_and_differentiable():
    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(5)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)))
    pts = jnp.asarray(rng.uniform(-4, 4, size=(2, 9, 2)))

    def loss(sdf, pts):
        d, g = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
        return jnp.sum(d**2) + jnp.sum(g**2)

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(sdf, pts)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_mxu_lookup_matches_gather():
    n = 64
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(7)
    sdf = jnp.asarray(rng.standard_normal((3, n, n)))
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-4.9, 4.9, (3, 40, 2)),
             rng.uniform(-7, 7, (3, 10, 2))],  # includes out-of-bounds
            axis=1,
        )
    )
    d1, g1 = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    d2, g2 = sdf_ops.bilinear_lookup_mxu(sdf, pts, res, lims, lims)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


def test_mxu_lookup_differentiable():
    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(8)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)))
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 9, 2)))

    def loss(fn, sdf, pts):
        d, g = fn(sdf, pts, res, lims, lims)
        return jnp.sum(d**2) + jnp.sum(g**2)

    g1 = jax.grad(lambda s: loss(sdf_ops.bilinear_lookup, s, pts))(sdf)
    g2 = jax.grad(lambda s: loss(sdf_ops.bilinear_lookup_mxu, s, pts))(sdf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_rows_lookup_matches_gather():
    n = 64
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(9)
    sdf = jnp.asarray(rng.standard_normal((3, n, n)))
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-4.9, 4.9, (3, 40, 2)),
             rng.uniform(-7, 7, (3, 10, 2))],
            axis=1,
        )
    )
    d1, g1 = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    d2, g2 = sdf_ops.bilinear_lookup_rows(sdf, pts, res, lims, lims)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


def test_rows_lookup_differentiable():
    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(10)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)))
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 9, 2)))

    def loss(fn, s):
        d, g = fn(s, pts, res, lims, lims)
        return jnp.sum(d**2) + jnp.sum(g**2)

    g1 = jax.grad(lambda s: loss(sdf_ops.bilinear_lookup, s))(sdf)
    g2 = jax.grad(lambda s: loss(sdf_ops.bilinear_lookup_rows, s))(sdf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_pallas_lookup_matches_gather_interpret():
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas

    n = 64
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(11)
    sdf = jnp.asarray(rng.standard_normal((3, n, n)), jnp.float32)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-4.9, 4.9, (3, 40, 2)), rng.uniform(-7, 7, (3, 10, 2))],
            axis=1,
        ),
        jnp.float32,
    )
    d1, g1 = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    d2, g2 = bilinear_lookup_pallas(sdf, pts, res, lims, lims, 2, True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_pallas_v2_lookup_matches_gather_interpret():
    """The TPU-default transpose-free kernel, exercised in interpret mode
    (padding paths included: b=3 with s_per_prog=2, p=50 -> p_pad=128)."""
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v2

    n = 64
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(15)
    sdf = jnp.asarray(rng.standard_normal((3, n, n)), jnp.float32)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-4.9, 4.9, (3, 40, 2)), rng.uniform(-7, 7, (3, 10, 2))],
            axis=1,
        ),
        jnp.float32,
    )
    d1, g1 = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    d2, g2 = bilinear_lookup_pallas_v2(sdf, pts, res, lims, lims, 2, True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_pallas_v2_vjp_matches():
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v2

    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(16)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 9, 2)), jnp.float32)
    cot = (
        jnp.asarray(rng.standard_normal((2, 9)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 9, 2)), jnp.float32),
    )
    g_ref = jax.vjp(
        lambda s, p: sdf_ops.bilinear_lookup(s, p, res, lims, lims), sdf, pts
    )[1](cot)
    g_pal = jax.vjp(
        lambda s, p: bilinear_lookup_pallas_v2(s, p, res, lims, lims, 2, True),
        sdf, pts,
    )[1](cot)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_v3_lookup_matches_gather_interpret():
    """Limb-decomposed kernel: 3 limbs ≈ f32, 2 limbs ~1.5e-5 relative."""
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v3

    n = 64
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(13)
    sdf = jnp.asarray(rng.standard_normal((3, n, n)), jnp.float32)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-4.9, 4.9, (3, 40, 2)), rng.uniform(-7, 7, (3, 10, 2))],
            axis=1,
        ),
        jnp.float32,
    )
    d1, g1 = sdf_ops.bilinear_lookup(sdf, pts, res, lims, lims)
    # 1 limb = plain bf16 SDF: ~2^-9 relative of the ~3-sigma value range.
    for n_limbs, atol in ((3, 1e-4), (2, 5e-4), (1, 3e-2)):
        d2, g2 = bilinear_lookup_pallas_v3(sdf, pts, res, lims, lims, 2,
                                           n_limbs, True)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=atol)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=10 * atol)


def test_pallas_v3_vjp_matches():
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas_v3

    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(14)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 9, 2)), jnp.float32)
    cot = (
        jnp.asarray(rng.standard_normal((2, 9)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 9, 2)), jnp.float32),
    )
    g_ref = jax.vjp(
        lambda s, p: sdf_ops.bilinear_lookup(s, p, res, lims, lims), sdf, pts
    )[1](cot)
    g_pal = jax.vjp(
        lambda s, p: bilinear_lookup_pallas_v3(s, p, res, lims, lims, 2, 3,
                                               True),
        sdf, pts,
    )[1](cot)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_lookup_vjp_matches():
    from dgpmp2_tpu.ops.pallas.sdf_lookup import bilinear_lookup_pallas

    n = 32
    lims = (-5.0, 5.0)
    res = 10.0 / n
    rng = np.random.default_rng(12)
    sdf = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-4, 4, (2, 9, 2)), jnp.float32)
    cot = (
        jnp.asarray(rng.standard_normal((2, 9)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 9, 2)), jnp.float32),
    )
    g_ref = jax.vjp(
        lambda s, p: sdf_ops.bilinear_lookup(s, p, res, lims, lims), sdf, pts
    )[1](cot)
    g_pal = jax.vjp(
        lambda s, p: bilinear_lookup_pallas(s, p, res, lims, lims, 2, True),
        sdf, pts,
    )[1](cot)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
