"""Cyclic-reduction solver: parity with Thomas + VJP correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarks import cyclic_reduction as tridiag_cr
from dgpmp2_tpu.ops import tridiag
from tests.test_tridiag import _random_spd_btd


@pytest.mark.parametrize("t", [2, 3, 5, 9, 16, 33, 101])
def test_cr_matches_thomas(t):
    rng = np.random.default_rng(t)
    diag, off, rhs = _random_spd_btd(rng, b=2, t=t, d=4)
    x_cr = tridiag_cr.btd_solve_cr(diag, off, rhs)
    x_th = tridiag.btd_solve(diag, off, rhs)
    np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_th), rtol=1e-8,
                               atol=1e-9)


def test_cr_vjp_matches_thomas_vjp():
    rng = np.random.default_rng(0)
    diag, off, rhs = _random_spd_btd(rng, b=2, t=13, d=3)
    cot = jnp.asarray(rng.standard_normal((2, 13, 3)))

    def f(solver):
        def g(diag, off, rhs):
            return jnp.sum(solver(diag, off, rhs) * cot)
        return jax.grad(g, argnums=(0, 1, 2))(diag, off, rhs)

    g_cr = f(tridiag_cr.btd_solve_cr)
    g_th = f(tridiag.btd_solve)
    for a, b in zip(g_cr, g_th):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-9)


def test_cr_jit_vmap():
    rng = np.random.default_rng(1)
    diag, off, rhs = _random_spd_btd(rng, b=4, t=11, d=4)
    x1 = jax.jit(tridiag_cr.btd_solve_cr)(diag, off, rhs)
    x2 = jax.vmap(tridiag_cr.btd_solve_cr)(diag, off, rhs)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-9)


def test_auto_dispatch():
    rng = np.random.default_rng(2)
    diag, off, rhs = _random_spd_btd(rng, b=1, t=40, d=4)
    x = tridiag.btd_solve_auto(diag, off, rhs)
    back = tridiag.btd_matvec(diag, off, x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rhs), rtol=1e-7,
                               atol=1e-8)


@pytest.mark.parametrize("b,t,chunk", [(5, 9, 4), (130, 13, 16), (64, 101, 16)])
def test_stream_matches_thomas(b, t, chunk):
    from dgpmp2_tpu.ops.pallas.btd_stream import btd_solve_stream

    rng = np.random.default_rng(b + t)
    diag = rng.standard_normal((b, t, 4, 4))
    diag = (diag @ np.swapaxes(diag, -1, -2) + 16 * np.eye(4)).astype(np.float32)
    off = (0.3 * rng.standard_normal((b, t - 1, 4, 4))).astype(np.float32)
    rhs = rng.standard_normal((b, t, 4)).astype(np.float32)
    x_ref = tridiag.btd_solve(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(rhs))
    x_str = btd_solve_stream(jnp.asarray(diag), jnp.asarray(off),
                             jnp.asarray(rhs), True, chunk)
    np.testing.assert_allclose(np.asarray(x_str), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)


def test_stream_vjp_matches_thomas():
    from dgpmp2_tpu.ops.pallas.btd_stream import btd_solve_stream

    rng = np.random.default_rng(5)
    b, t = 6, 11
    diag = rng.standard_normal((b, t, 4, 4))
    diag = (diag @ np.swapaxes(diag, -1, -2) + 16 * np.eye(4)).astype(np.float32)
    off = (0.3 * rng.standard_normal((b, t - 1, 4, 4))).astype(np.float32)
    rhs = rng.standard_normal((b, t, 4)).astype(np.float32)
    cot = jnp.asarray(rng.standard_normal((b, t, 4)).astype(np.float32))

    def f(solver):
        return jax.grad(
            lambda d_, o, r: jnp.sum(solver(d_, o, r) * cot), argnums=(0, 1, 2)
        )(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(rhs))

    g_ref = f(tridiag.btd_solve)
    g_str = f(lambda d_, o, r: btd_solve_stream(d_, o, r, True, 4))
    for a, b_ in zip(g_ref, g_str):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
