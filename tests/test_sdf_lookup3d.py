"""Trajectory-locality tiled trilinear Pallas kernel vs the XLA gather.

The kernel (ops/pallas/sdf_lookup3d.py) must match
:func:`dgpmp2_tpu.ops.sdf.trilinear_lookup` ("intended" OOB mode) on every
path: in-brick tiles, the full-volume fallback (tiles whose states span
more than the brick), OOB queries, clamped edge corners, state-count
padding, and non-cubic grids.  Interpret mode on CPU; the real-TPU
lowering and the committed gather-vs-kernel measurement live in
``benchmarks/bench_lookup3d.py`` (results: PERFORMANCE.md "3-D lookup
engines" — the kernel is the measured-negative record there, the XLA
gather is the production default).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.ops.pallas.sdf_lookup3d import trilinear_lookup_pallas

LIMS = (-5.0, 5.0)


def _world(rng, b, n):
    return jnp.asarray(rng.standard_normal((b, n, n, n)), jnp.float32)


def _traj_points(rng, b, p, noise=0.1):
    """Smooth start→goal paths — the access pattern the tiling targets."""
    t = np.linspace(0, 1, p)[None, :, None]
    s = rng.uniform(-4.5, -3.5, (b, 1, 3))
    g = rng.uniform(3.5, 4.5, (b, 1, 3))
    return jnp.asarray(
        s + t * (g - s) + noise * rng.standard_normal((b, p, 3)), jnp.float32
    )


def _parity(sdf, pts, res, atol_d=2e-5, atol_g=1e-4, **kw):
    d0, g0 = sdf_ops.trilinear_lookup(sdf, pts, res, LIMS, LIMS, LIMS)
    d1, g1 = trilinear_lookup_pallas(
        sdf, pts, res, LIMS, LIMS, LIMS, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=atol_d)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=atol_g)


@pytest.mark.slow
def test_matches_gather_on_trajectories():
    rng = np.random.default_rng(0)
    n = 32
    sdf = _world(rng, 3, n)
    pts = _traj_points(rng, 3, 101)  # 101 -> p_pad=104: padding path too
    _parity(sdf, pts, 10.0 / n)


@pytest.mark.slow
def test_fallback_on_kinked_and_scattered_states():
    """Tiles whose states span more than the brick must take the in-kernel
    full-volume path and still match exactly."""
    rng = np.random.default_rng(1)
    n = 32
    sdf = _world(rng, 2, n)
    pts = np.array(_traj_points(rng, 2, 48))
    pts[0, 10] = [-4.0, 4.0, -4.0]  # kink: corner excursion mid-tile
    pts[0, 11] = [4.0, -4.0, 4.0]  # opposite corner, same tile
    pts[1, 24:32] = rng.uniform(-4.9, 4.9, (8, 3))  # fully scattered tile
    pts = jnp.asarray(pts, jnp.float32)
    # The scattered tile genuinely exceeds a 16-voxel brick at this res.
    span = np.ptp(np.asarray(pts[1, 24:32]), axis=0) / (10.0 / n)
    assert span.max() > 16
    _parity(sdf, pts, 10.0 / n)


@pytest.mark.slow
def test_oob_and_edge_points():
    rng = np.random.default_rng(2)
    n = 24
    sdf = _world(rng, 2, n)
    pts = np.array(_traj_points(rng, 2, 32))
    pts[0, 0] = [7.0, 0.0, 0.0]  # OOB -> MAX_D, zero grad
    pts[0, 1] = [0.0, -8.0, 0.0]
    pts[1, 2] = [5.0, 5.0, 5.0]  # exact upper corner (clamped p2)
    pts[1, 3] = [-5.0, -5.0, -5.0]  # exact lower corner
    pts = jnp.asarray(pts, jnp.float32)
    _parity(sdf, pts, 10.0 / n)
    d1, g1 = trilinear_lookup_pallas(
        sdf, pts, 10.0 / n, LIMS, LIMS, LIMS, interpret=True
    )
    assert float(d1[0, 0]) == LIMS[1] - LIMS[0]
    assert float(jnp.max(jnp.abs(g1[0, :2]))) == 0.0


@pytest.mark.slow
def test_non_cubic_grid_and_tile_sizes():
    rng = np.random.default_rng(3)
    d_, h, w = 20, 24, 40
    sdf = jnp.asarray(rng.standard_normal((2, d_, h, w)), jnp.float32)
    # res must satisfy the cubical-voxel convention only for GraphSpec;
    # the raw lookup takes any extents — keep x-derived res, shrink y/z use.
    res = 10.0 / w
    pts = jnp.asarray(
        rng.uniform(-2.0, 2.0, (2, 33, 3)), jnp.float32
    )  # 33 -> padding on every p_t
    for p_t in (8, 16):
        d0, g0 = sdf_ops.trilinear_lookup(sdf, pts, res, LIMS, LIMS, LIMS)
        d1, g1 = trilinear_lookup_pallas(
            sdf, pts, res, LIMS, LIMS, LIMS, p_t, 16, 16, True
        )
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-4)


@pytest.mark.slow
def test_vjp_matches_gather():
    """Backward replays the XLA trilinear formulation — cotangents for the
    SDF and the points must match the gather engine's."""
    rng = np.random.default_rng(4)
    n = 24
    sdf = _world(rng, 2, n)
    pts = _traj_points(rng, 2, 24)
    res = 10.0 / n

    def loss(fn):
        def f(s, p):
            d, g = fn(s, p)
            return jnp.sum(jnp.sin(d)) + jnp.sum(g**2)

        return f

    gs0, gp0 = jax.grad(
        loss(lambda s, p: sdf_ops.trilinear_lookup(s, p, res, LIMS, LIMS,
                                                   LIMS)),
        (0, 1),
    )(sdf, pts)
    gs1, gp1 = jax.grad(
        loss(lambda s, p: trilinear_lookup_pallas(s, p, res, LIMS, LIMS,
                                                  LIMS, 8, 16, 16, True)),
        (0, 1),
    )(sdf, pts)
    np.testing.assert_allclose(np.asarray(gs0), np.asarray(gs1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp0), np.asarray(gp1), atol=1e-3)


def test_dispatch_guards():
    assert sdf_ops._pallas3d_ok(
        jnp.zeros((2, 32, 32, 32), jnp.float32), jnp.zeros((2, 8, 3))
    )
    # H not 8-collapsible
    assert not sdf_ops._pallas3d_ok(
        jnp.zeros((2, 32, 20, 32), jnp.float32), jnp.zeros((2, 8, 3))
    )
    # volume exceeds the VMEM block budget
    assert not sdf_ops._pallas3d_ok(
        jnp.zeros((1, 96, 96, 96), jnp.float32), jnp.zeros((1, 8, 3))
    )
    # f64 stays on the gather engine (CPU verification mode)
    assert not sdf_ops._pallas3d_ok(
        jnp.zeros((2, 32, 32, 32), jnp.float64), jnp.zeros((2, 8, 3))
    )


@pytest.mark.slow
def test_pallas_tile_refuses_reference_oob_mode():
    sdf_ops.set_oob_mode("reference")
    try:
        with pytest.raises(NotImplementedError):
            sdf_ops._pallas_tile_lookup3d(
                jnp.zeros((1, 16, 16, 16), jnp.float32),
                jnp.zeros((1, 8, 3), jnp.float32),
                0.625, LIMS, LIMS, LIMS,
            )
    finally:
        sdf_ops.set_oob_mode("intended")


def test_pallas_tile_guards_inapplicable_inputs():
    """Explicit pallas_tile opt-in on inputs the kernel cannot lower must
    fail with a clear ValueError — not an opaque Mosaic error (H not
    8-divisible, oversized volume) or a silent f32 downcast (f64 field)."""
    pts = jnp.zeros((1, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="gather engine"):
        sdf_ops._pallas_tile_lookup3d(
            jnp.zeros((1, 32, 32, 32), jnp.float64), pts, 0.3125,
            LIMS, LIMS, LIMS)
    with pytest.raises(ValueError, match="gather engine"):
        sdf_ops._pallas_tile_lookup3d(
            jnp.zeros((1, 32, 20, 32), jnp.float32), pts, 0.3125,
            LIMS, LIMS, LIMS)


def test_pallas_tile_refuses_asymmetric_y_lims():
    """Both engines must refuse a non-centered y extent identically: the
    y->row flip assumes symmetry, and a pallas_tile that silently accepted
    it would read wrong rows where the gather engine raises."""
    sdf = jnp.zeros((1, 16, 16, 16), jnp.float32)
    pts = jnp.zeros((1, 8, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="asymmetric"):
        sdf_ops._pallas_tile_lookup3d(sdf, pts, 0.625, LIMS, (-4.0, 5.0),
                                      LIMS)
    with pytest.raises(NotImplementedError, match="asymmetric"):
        trilinear_lookup_pallas(sdf, pts, 0.625, LIMS, (-4.0, 5.0), LIMS,
                                interpret=True)
