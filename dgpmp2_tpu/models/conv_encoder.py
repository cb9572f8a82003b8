"""Convolutional environment encoder (flax.linen).

Rebuild of ``diff_gpmp2/learning/learn_module_conv.py:8-85``: a 5-block CNN
over the 2-channel ``(im, sdf)`` stack — Conv3×3(16)/norm/ReLU/MaxPool ×2,
Conv3×3(16)/norm/ReLU/MaxPool, Conv3×3(32)/norm/ReLU/MaxPool, Conv3×3(32)/
norm/ReLU — flattening to ``32·(im_size/16)²`` features.  He-normal init
matches the reference's manual ``normal_(0, sqrt(2/n))``
(``learn_module_conv.py:59-65``).

Documented deviation: the reference normalizes with BatchNorm; we use
LayerNorm.  BatchNorm's running statistics are mutable state that (a)
complicates the ``lax.scan``-unrolled GN training loop and (b) silently
de-synchronizes under data-parallel sharding without cross-replica syncing.
LayerNorm is stateless and shard-invariant — the standard TPU choice.

TPU notes: NHWC layout (XLA-native on TPU), compute dtype configurable —
conv stacks are exactly what the MXU wants in bf16, while the GN solve
stays f32.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvEncoder(nn.Module):
    features: Sequence[int] = (16, 16, 16, 32, 32)
    pool_after: Sequence[bool] = (True, True, True, True, False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, H, W, C) image stack -> (B, 32·(H/16)·(W/16)) features."""
        x = x.astype(self.dtype)
        for feats, pool in zip(self.features, self.pool_after):
            x = nn.Conv(
                feats,
                (3, 3),
                padding=1,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
            )(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape(x.shape[0], -1)


class ConvEncoder3D(nn.Module):
    """Voxel-world encoder: the 2-D stack with 3³ kernels and 2³ pooling
    over (B, D, H, W, C) input (3-D workspaces are beyond the 2-D-only
    reference; flax convolutions are rank-generic, so this is the same
    architecture one dimension up).  Output: (B, 32·(D/16)·(H/16)·(W/16))
    features — e.g. 256 at 32³, 864 at 48³."""

    features: Sequence[int] = (16, 16, 16, 32, 32)
    pool_after: Sequence[bool] = (True, True, True, True, False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for feats, pool in zip(self.features, self.pool_after):
            x = nn.Conv(
                feats,
                (3, 3, 3),
                padding=1,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
            )(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        return x.reshape(x.shape[0], -1)


def normalize_im(im: jnp.ndarray) -> jnp.ndarray:
    """Per-image min-max normalization to [-1, 1]
    (``learn_module_conv.py:91-96``). im: (B, *spatial, C) — the spatial
    axes (2-D images or 3-D voxels) are reduced, batch and channel kept."""
    axes = tuple(range(1, im.ndim - 1))
    mx = jnp.max(im, axis=axes, keepdims=True)
    mn = jnp.min(im, axis=axes, keepdims=True)
    return 2.0 * ((im - mn) / (mx - mn + 1e-6) - 0.5)
