"""Angle normalization utilities (array-capable).

Rebuild of ``diff_gpmp2/utils/angles.py`` — the reference's scalar-only
helpers become jnp-vectorized (work on scalars or arrays, jit-safe).
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_angle_positive(angle):
    """Normalize (radians) to [0, 2π)."""
    return (angle % TWO_PI + TWO_PI) % TWO_PI


def normalize_angle(angle):
    """Normalize (radians) to (-π, π]."""
    ang = normalize_angle_positive(angle)
    return jnp.where(ang > jnp.pi, ang - TWO_PI, ang)


def angular_distance(ang1, ang2):
    """Signed angular distance ``ang2 - ang1`` normalized to (-π, π]."""
    return normalize_angle(ang2 - ang1)
