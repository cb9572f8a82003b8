"""Native C++ runtime: EDT/SDF parity and RRT* validity."""
import numpy as np
import pytest

from dgpmp2_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_edt_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    mask = rng.random((96, 64)) < 0.08
    ours = native.edt_sq(mask)
    ref = ndimage.distance_transform_edt(~mask) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_native_sdf_matches_jax():
    import jax.numpy as jnp

    from dgpmp2_tpu.ops import sdf as sdf_ops

    img = np.ones((64, 64))
    img[20:35, 25:40] = 0.0
    ours = native.sdf_2d(img > 0.75, res=10 / 64)
    ref = np.asarray(
        sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float32), res=10 / 64)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rrt_star_finds_valid_path():
    import jax.numpy as jnp

    from dgpmp2_tpu.ops import sdf as sdf_ops

    img = np.ones((96, 96))
    img[30:66, 30:66] = 0.0  # central block
    sdf = native.sdf_2d(img > 0.75, res=10 / 96)
    path = native.rrt_star(sdf, (-4, -4), (4, 4), (-5, 5), (-5, 5),
                           clearance=0.45, plan_time=3.0, seed=3)
    assert path is not None
    interp = native.interpolate_path(path, 101)
    assert interp.shape == (101, 2)
    np.testing.assert_allclose(interp[0], [-4, -4], atol=1e-5)
    np.testing.assert_allclose(interp[-1], [4, 4], atol=1e-5)
    d, _ = sdf_ops.bilinear_lookup(
        jnp.asarray(sdf)[None], jnp.asarray(interp)[None], 10 / 96,
        (-5.0, 5.0), (-5.0, 5.0),
    )
    assert float(d.min()) > 0.4  # clears the robot radius everywhere


def test_rrt_star_impossible_returns_none():
    img = np.zeros((32, 32))  # fully occupied
    sdf = native.sdf_2d(img > 0.75, res=10 / 32)
    path = native.rrt_star(sdf, (-4, -4), (4, 4), (-5, 5), (-5, 5),
                           clearance=0.4, plan_time=0.5, seed=0)
    assert path is None
