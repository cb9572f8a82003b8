"""Block-tridiagonal solver: correctness vs dense solve + VJP vs AD."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.ops import tridiag


def _random_spd_btd(rng, b, t, d, dtype=jnp.float64):
    """Random SPD block-tridiagonal system (diagonally dominant)."""
    diag = rng.standard_normal((b, t, d, d))
    diag = diag @ np.swapaxes(diag, -1, -2) + (d * 4) * np.eye(d)
    off = 0.3 * rng.standard_normal((b, t - 1, d, d))
    rhs = rng.standard_normal((b, t, d))
    return (
        jnp.asarray(diag, dtype),
        jnp.asarray(off, dtype),
        jnp.asarray(rhs, dtype),
    )


def test_solve_matches_dense():
    rng = np.random.default_rng(0)
    diag, off, rhs = _random_spd_btd(rng, b=3, t=11, d=4)
    x = tridiag.btd_solve(diag, off, rhs)
    dense = tridiag.btd_to_dense(diag, off)
    x_ref = jnp.linalg.solve(dense, rhs.reshape(3, -1)[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(x).reshape(3, -1), np.asarray(x_ref), rtol=1e-9, atol=1e-9
    )


def test_matvec_roundtrip():
    rng = np.random.default_rng(1)
    diag, off, rhs = _random_spd_btd(rng, b=2, t=7, d=3)
    x = tridiag.btd_solve(diag, off, rhs)
    back = tridiag.btd_matvec(diag, off, x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rhs), rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_custom_vjp_matches_dense_autodiff():
    rng = np.random.default_rng(2)
    diag, off, rhs = _random_spd_btd(rng, b=2, t=6, d=3)
    cot = jnp.asarray(rng.standard_normal((2, 6, 3)))

    def f_btd(diag, off, rhs):
        return jnp.sum(tridiag.btd_solve(diag, off, rhs) * cot)

    def f_dense(diag, off, rhs):
        dense = tridiag.btd_to_dense(diag, off)
        x = jnp.linalg.solve(dense, rhs.reshape(rhs.shape[0], -1)[..., None])[..., 0]
        return jnp.sum(x.reshape(rhs.shape) * cot)

    g_btd = jax.grad(f_btd, argnums=(0, 1, 2))(diag, off, rhs)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(diag, off, rhs)

    # rhs gradients match directly.
    np.testing.assert_allclose(
        np.asarray(g_btd[2]), np.asarray(g_dense[2]), rtol=1e-8, atol=1e-10
    )
    # The dense path sees Λ as a full matrix: its diag-block cotangent is
    # what lands on the (i,i) blocks; off-diagonal cotangent is split across
    # (i,i+1) and (i+1,i). Our storage puts the (i+1,i) contribution
    # (transposed) onto off too — compare accordingly.
    np.testing.assert_allclose(
        np.asarray(g_btd[0]), np.asarray(g_dense[0]), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g_btd[1]), np.asarray(g_dense[1]), rtol=1e-8, atol=1e-10
    )


def test_vjp_finite_difference():
    rng = np.random.default_rng(3)
    diag, off, rhs = _random_spd_btd(rng, b=1, t=5, d=2)

    def f(rhs):
        return jnp.sum(tridiag.btd_solve(diag, off, rhs) ** 2)

    g = jax.grad(f)(rhs)
    h = 1e-6
    v = jnp.asarray(rng.standard_normal(rhs.shape))
    fd = (f(rhs + h * v) - f(rhs - h * v)) / (2 * h)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-5)


def test_jit_and_vmap():
    rng = np.random.default_rng(4)
    diag, off, rhs = _random_spd_btd(rng, b=4, t=9, d=4)
    x1 = jax.jit(tridiag.btd_solve)(diag, off, rhs)
    x2 = jax.vmap(tridiag.btd_solve)(diag, off, rhs)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-10)
