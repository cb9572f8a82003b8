"""Small matrix helpers (``diff_gpmp2/utils/mat_utils.py``)."""
from __future__ import annotations

import jax.numpy as jnp


def isotropic_matrix(sig, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """``sig * I_dim`` (``mat_utils.py:4-6``); sig may be traced."""
    return jnp.asarray(sig, dtype) * jnp.eye(dim, dtype=dtype)
