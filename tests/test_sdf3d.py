"""3-D SDF stack: separable EDT, voxel SDF construction, trilinear lookup.

The reference is 2-D only (``diff_gpmp2/utils/sdf_utils.py``, scipy EDT on
images); the 3-D path is new surface built from the same separable
min-plus decomposition (one extra axis pass) and the image conventions
extended per ``ops/sdf.py:trilinear_lookup``.  scipy's
``distance_transform_edt`` is the oracle, exactly as it is for 2-D.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import ndimage

from dgpmp2_tpu.ops import sdf as sdf_ops


def _random_mask(rng, shape, p=0.1):
    m = rng.random(shape) < p
    if not m.any():          # EDT of an empty feature set is degenerate
        m.flat[0] = True
    return m


@pytest.mark.parametrize("shape", [(9, 12, 7), (16, 16, 16), (4, 5, 6)])
def test_edt3d_matches_scipy(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    mask = _random_mask(rng, shape)
    ours = np.asarray(sdf_ops.edt(jnp.asarray(mask), spatial_ndim=3))
    # scipy: distance to nearest ZERO cell; ours: to nearest True cell.
    ref = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-9)


def test_edt3d_batched_and_chunked(monkeypatch):
    """Batch axes pass through, and the memory-bounded chunked evaluation
    is bit-identical to the dense min-plus form."""
    rng = np.random.default_rng(3)
    mask = _random_mask(rng, (2, 8, 10, 6))
    dense = np.asarray(sdf_ops.edt_sq(jnp.asarray(mask), spatial_ndim=3))
    for b in range(2):
        ref = ndimage.distance_transform_edt(~mask[b]) ** 2
        np.testing.assert_allclose(dense[b], ref.round().astype(np.int64))
    # The chunk budget is parsed lazily from the env var per call, so
    # setting it post-import takes effect (ADVICE r3: no import-time parse).
    monkeypatch.setenv("DGPMP2_EDT_CHUNK_MB", str(4096 / 2**20))
    chunked = np.asarray(sdf_ops.edt_sq(jnp.asarray(mask), spatial_ndim=3))
    np.testing.assert_array_equal(dense, chunked)


def test_sdf_from_occupancy_3d_signs_and_scale():
    """Free voxels get +distance-to-obstacle, occupied get -distance-to-free,
    scaled by res — the 2-D pipeline's contract in 3-D."""
    vox = np.ones((12, 12, 12), np.float32)   # >0.75 => free
    vox[4:8, 4:8, 4:8] = 0.0                  # occupied cube
    res = 0.5
    sdf = np.asarray(sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res))
    assert sdf.shape == vox.shape
    # Deep inside the cube: negative; the very center is 2 voxels from free.
    assert sdf[5, 5, 5] < 0
    np.testing.assert_allclose(sdf[5, 5, 5], -2 * res, atol=1e-6)
    # Far corner: positive, roughly the euclidean voxel distance to the cube.
    d_corner = np.sqrt(3 * 4.0**2) * res  # corner (0,0,0) -> cube corner (4,4,4)
    np.testing.assert_allclose(sdf[0, 0, 0], d_corner, rtol=0.02)
    # 2-D slice of a z-invariant world == 2-D SDF (obstacle spans all z).
    vox_col = np.ones((8, 10, 10), np.float32)
    vox_col[:, 3:6, 3:6] = 0.0  # column through every z-layer
    s3 = np.asarray(sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox_col), res=1.0))
    s2 = np.asarray(sdf_ops.sdf_from_occupancy(jnp.asarray(vox_col[0]), res=1.0))
    # Interior z-slices see the same in-plane geometry; the 3-D field can
    # only be <= the 2-D one near the open z-faces of the padded border.
    np.testing.assert_allclose(s3[4], s2, atol=1.0 + 1e-6)
    np.testing.assert_allclose(s3[4][1:-1, 1:-1], s2[1:-1, 1:-1], atol=1e-6)


LIMS = dict(x_lims=(-5.0, 5.0), y_lims=(-5.0, 5.0), z_lims=(-2.0, 6.0))


def _world():
    """(16, 20, 20) voxel world with a box obstacle, res 0.5."""
    vox = np.ones((16, 20, 20), np.float32)
    vox[6:10, 8:12, 8:12] = 0.0
    res = 0.5
    sdf = sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res)
    return sdf, res


def test_trilinear_exact_at_voxel_centers():
    sdf, res = _world()
    nz, h, w = sdf.shape
    rng = np.random.default_rng(0)
    iz = rng.integers(0, nz, 40)
    iy = rng.integers(0, h, 40)
    ix = rng.integers(0, w, 40)
    # Invert the index maps: px = -x0/res + x/res etc.
    x = (ix + LIMS["x_lims"][0] / res) * res
    y = -(iy + LIMS["y_lims"][0] / res) * res
    z = (iz + LIMS["z_lims"][0] / res) * res
    pts = jnp.asarray(np.stack([x, y, z], -1))
    d, _ = sdf_ops.trilinear_lookup(sdf, pts, res, **LIMS)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(sdf)[iz, iy, ix], rtol=0, atol=1e-9
    )


def test_trilinear_gradient_matches_autodiff():
    """The analytic gradient equals jax.grad through the interpolation at
    interior, non-lattice points (where trilinear d is differentiable)."""
    sdf, res = _world()

    def f(p):
        d, _ = sdf_ops.trilinear_lookup(sdf, p[None], res, **LIMS)
        return d[0]

    rng = np.random.default_rng(1)
    pts = np.stack([
        rng.uniform(-4.4, 4.4, 30),
        rng.uniform(-4.4, 4.4, 30),
        rng.uniform(-1.4, 5.4, 30),
    ], -1) + 0.123 * res  # keep off the voxel lattice
    _, grad = sdf_ops.trilinear_lookup(sdf, jnp.asarray(pts), res, **LIMS)
    for i in range(len(pts)):
        g_ad = jax.grad(f)(jnp.asarray(pts[i]))
        np.testing.assert_allclose(np.asarray(grad[i]), np.asarray(g_ad),
                                   rtol=1e-7, atol=1e-9)


def test_trilinear_out_of_bounds():
    sdf, res = _world()
    pts = jnp.asarray([
        [9.0, 0.0, 0.0],    # x out
        [0.0, -9.0, 0.0],   # y out
        [0.0, 0.0, 9.0],    # z out (asymmetric z-lims)
        [0.0, 0.0, -3.0],   # z out low
        [0.0, 0.0, 0.0],    # inside
    ])
    d, g = sdf_ops.trilinear_lookup(sdf, pts, res, **LIMS)
    max_d = LIMS["x_lims"][1] - LIMS["x_lims"][0]
    np.testing.assert_allclose(np.asarray(d[:4]), max_d)
    np.testing.assert_allclose(np.asarray(g[:4]), 0.0)
    assert float(d[4]) < max_d
    assert float(jnp.linalg.norm(g[4])) > 0.0


@pytest.mark.slow
def test_trilinear_reference_oob_mode_collapses_to_zero():
    """Under the 'reference' OOB mode (bit-faithful clamped-index weights,
    ops/sdf.py:_axis_weights) a fully out-of-grid query collapses to
    d = 0 with zero gradient — same semantics as the 2-D lookup's parity
    branch, extended to the z axis."""
    sdf, res = _world()
    try:
        sdf_ops.set_oob_mode("reference")
        pts = jnp.asarray([[40.0, 40.0, 40.0], [0.0, 0.0, 0.0]])
        d, g = sdf_ops.trilinear_lookup(sdf, pts, res, **LIMS)
        assert float(d[0]) == 0.0
        np.testing.assert_allclose(np.asarray(g[0]), 0.0)
        # In-bounds values agree with the intended mode.
        sdf_ops.set_oob_mode("intended")
        d2, g2 = sdf_ops.trilinear_lookup(sdf, pts[1:], res, **LIMS)
        sdf_ops.set_oob_mode("reference")
        d3, g3 = sdf_ops.trilinear_lookup(sdf, pts[1:], res, **LIMS)
        np.testing.assert_allclose(np.asarray(d3), np.asarray(d2))
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g2))
    finally:
        sdf_ops.set_oob_mode("intended")


def test_trilinear_z_convention_unflipped():
    """Voxel z-index 0 sits at z_lims[0]; higher z reads deeper layers
    (no flip), while y keeps the image-row flip."""
    nz, h, w = 4, 4, 4
    sdf = jnp.arange(nz, dtype=jnp.float32)[:, None, None] * jnp.ones((h, w))
    res = 1.0
    lims = dict(x_lims=(-2.0, 2.0), y_lims=(-2.0, 2.0), z_lims=(0.0, 4.0))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.5]])
    d, g = sdf_ops.trilinear_lookup(sdf, pts, res, **lims)
    assert float(d[0]) == 0.0 and float(d[1]) == 2.5
    # d increases with z at 1 per metre -> gz = 1 (at z=2.5, mid-cell:
    # the exact lattice top z=3 clamps to a one-sided zero like 2-D edges).
    np.testing.assert_allclose(np.asarray(g[:, 2]), [1.0, 1.0], atol=1e-6)
