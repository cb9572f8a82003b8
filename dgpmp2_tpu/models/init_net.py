"""Trajectory-initializer network (flax.linen).

Rebuild of ``diff_gpmp2/learning/initialization_network.py:9-81``: the same
CNN trunk as the covariance encoder plus a classifier head predicting the
*interior* ``(num_states-2)·state_dim`` of an initial-trajectory delta, with
endpoints pinned to zero (``initialization_network.py:68-81``).  Trained
supervised against expert trajectories (straight line + predicted delta →
expert, ``train_initializer.py:47-56``).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dgpmp2_tpu.models.conv_encoder import ConvEncoder


class InitNet(nn.Module):
    num_states: int
    state_dim: int
    hidden: int = 512
    dropout_prob: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, th, train: bool = False):
        """x: (B, H, W, C) env stack; th: (B, T+1, D) seed trajectory.

        Returns (B, T+1, D) delta trajectories with zero endpoint rows.
        """
        feats = ConvEncoder(dtype=self.dtype)(x, train=train)
        conc = jnp.concatenate(
            [feats, th.reshape(th.shape[0], -1).astype(self.dtype)], axis=-1
        )
        h = conc
        for _ in range(2):
            h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
            h = nn.Dense(self.hidden, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.relu(h)
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        out = nn.Dense((self.num_states - 2) * self.state_dim,
                       kernel_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype)(h)
        interior = out.reshape(-1, self.num_states - 2, self.state_dim)
        z = jnp.zeros((interior.shape[0], 1, self.state_dim), interior.dtype)
        return jnp.concatenate([z, interior, z], axis=1)
