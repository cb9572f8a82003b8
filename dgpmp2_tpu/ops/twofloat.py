"""Two-float (double-float / "float-float") arithmetic and a df32
normal-equation assembly + block-Thomas solve.

Purpose: measure — not just argue — the closing claim of
``docs/F32_PRECISION.md`` §1: that the f32 single-step error ceiling
(~cond·ε₃₂ ≈ 1e-2 at the reference's ``cost_sigma=0.01`` conditioning,
``/root/reference/examples/configs/gpmp2_2d_params.yaml:17``) is intrinsic
to *forming and solving the normal equations in one f32 word*, and that a
two-word representation recovers ~f64-grade steps on the f32 backend.
The reference avoids the problem wholesale by running float64 end-to-end
(``/root/reference/diff_gpmp2/gpmp2/plan_layer.py:210-234``); this module
is the TPU-native answer for the cases where f64 is unavailable (TPU
vector units are f32) but reference-grade per-step accuracy is required.

Representation: ``DF(hi, lo)`` — an unevaluated sum ``hi + lo`` of two
f32 words with ``hi = fl(hi + lo)``, giving ~49 bits of effective
significand (≈ 2⁻⁴⁹ ≈ 1.8e-15 relative).  All primitives are the
classical error-free transforms (Knuth TwoSum, Dekker/Veltkamp TwoProd —
branch-free, IEEE-exact, no FMA required) and the Bailey-style float-float
add/mul/div/sqrt built from them.  Everything is elementwise jnp — it
vectorizes over arbitrary batch shapes and runs on the TPU VPU (elementwise
f32 on TPU is IEEE-rounded; only *matmuls* route through the reduced-
precision MXU, and this module contains none).

Cost: ~10-20 f32 flops per df op — a constant-factor (~15×) elementwise
slowdown over plain f32, still massively cheaper than emulating f64 via
integer ops, and bandwidth-dominated in practice (2× the words).

XLA-safety note: error-free transforms break under unsafe FP reassociation
(``(a + b) - a`` must NOT fold to ``b``).  XLA's algebraic simplifier does
not apply such rewrites to floating-point HLO by default (no fast-math),
and ``tests/test_twofloat.py`` pins the property numerically on every run.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class DF(NamedTuple):
    """Unevaluated two-float sum ``hi + lo`` (both same-shape f32 arrays)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


# Veltkamp split constant for f32 (p=24 significand bits): 2^12 + 1.
_SPLIT = 4097.0


def df(x) -> DF:
    """Lift an exact f32 array to DF (lo = 0)."""
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def df_from_f64(x) -> DF:
    """Represent a float64 value (numpy/python) as DF to O(ε₃₂²).

    The standard way to feed exact constants (dt, damping, limits) into
    the two-float pipeline: hi = fl32(x), lo = fl32(x - hi).
    """
    import numpy as np

    x64 = np.asarray(x, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi, lo each ≤ 12 significand bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free transform: a * b = p + e exactly (Dekker, no FMA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x: DF, y: DF) -> DF:
    """DF + DF (Bailey accurate variant, ~2⁻⁴⁹ relative)."""
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    return DF(*fast_two_sum(s, e))


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def mul(x: DF, y: DF) -> DF:
    """DF * DF."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*fast_two_sum(p, e))


def div(x: DF, y: DF) -> DF:
    """DF / DF (one Newton correction on the f32 quotient)."""
    q1 = x.hi / y.hi
    # r = x - y * q1, computed in DF.
    r = sub(x, mul(y, DF(q1, jnp.zeros_like(q1))))
    q2 = (r.hi + r.lo) / y.hi
    return DF(*fast_two_sum(q1, q2))


def sqrt(x: DF) -> DF:
    """DF sqrt (one Newton correction; x must be non-negative).

    Guarded for hi == 0 (returns exact zero instead of 0/0 NaN) so
    degenerate damped pivots stay finite.
    """
    s1 = jnp.sqrt(x.hi)
    safe = jnp.where(s1 > 0, s1, 1.0)
    # r = x - s1², s2 = r / (2 s1).
    p, e = two_prod(safe, safe)
    r = sub(x, DF(p, e))
    s2 = (r.hi + r.lo) / (2.0 * safe)
    s2 = jnp.where(s1 > 0, s2, 0.0)
    return DF(*fast_two_sum(s1, s2))


def to_f32(x: DF) -> jnp.ndarray:
    """Round to one f32 word."""
    return x.hi + x.lo


def to_f64(x: DF) -> jnp.ndarray:
    """Exact value as f64 (for verification against f64 oracles; only
    meaningful on backends with x64 enabled)."""
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


# ---------------------------------------------------------------------------
# Structural helpers (componentwise on hi/lo)
# ---------------------------------------------------------------------------


def df_concat(parts, axis):
    return DF(
        jnp.concatenate([p.hi for p in parts], axis=axis),
        jnp.concatenate([p.lo for p in parts], axis=axis),
    )


def df_index(x: DF, idx) -> DF:
    return DF(x.hi[idx], x.lo[idx])


def df_stack(parts, axis=0):
    return DF(
        jnp.stack([p.hi for p in parts], axis=axis),
        jnp.stack([p.lo for p in parts], axis=axis),
    )


def df_sum_list(parts) -> DF:
    """Accurate sum of a static list of DF terms (sequential df adds)."""
    acc = parts[0]
    for p in parts[1:]:
        acc = add(acc, p)
    return acc


def mv(mat: DF, vec: DF) -> DF:
    """(..., i, j) × (..., j) -> (..., i) with a static inner loop (D ≤ 8)."""
    d = mat.hi.shape[-1]
    terms = [
        mul(df_index(mat, (..., slice(None), j)), df_index(vec, (..., j, None)))
        for j in range(d)
    ]
    # each term is (..., i) shaped via broadcasting of (..., j) scalars
    out = terms[0]
    for t in terms[1:]:
        out = add(out, t)
    return out
