"""Covariance-prediction head (flax.linen).

Rebuild of ``diff_gpmp2/learning/learn_module_fcn.py:9-131``: maps
(conv features ⊕ flattened trajectory xy positions) to the flat covariance
vector ``out_dim``.  Variants:

* ``feed_forward`` — Dropout(0.5)/Dense(1000)/BN/ReLU ×1,
  Dropout/Dense(640)/BN/ReLU, Dropout/Dense(out_dim)
  (``learn_module_fcn.py:39-50``), Xavier-uniform init.
* ``rnn_gru`` / ``rnn_lstm`` — recurrent head threading hidden state across
  GN iterations (``learn_module_fcn.py:59-67,125-131``).

The trajectory enters as its xy positions only (``learn_module_fcn.py:
70-74,118``): (B, T+1, 2) flattened.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FeedForwardHead(nn.Module):
    """``out_bias`` (optional, length ``out_dim``): constant initial output.

    The covariance decode squares the head output, so a zero-init head
    starts the planner with ~zero factor weights — learning then has to
    *recover* sane covariances before it can refine them.  Setting
    ``out_bias`` to the square roots of the static YAML weights starts the
    learned planner exactly AT the fixed-covariance baseline
    (see ``LearnedDiffGPMP2Planner.static_out_bias``).
    """

    out_dim: int
    hidden: Tuple[int, ...] = (1000, 640)
    dropout_prob: float = 0.5
    dtype: jnp.dtype = jnp.float32
    out_bias: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, feats, th_pos_flat, train: bool = False):
        x = jnp.concatenate([feats, th_pos_flat], axis=-1).astype(self.dtype)
        for h in self.hidden:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
            x = nn.Dense(h, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        if self.out_bias is not None:
            # Zero-init the final kernel so the forward pass at init is
            # exactly the bias (the static-covariance planner); training
            # grows the data-dependent refinement from zero.
            bias_init = (
                lambda key, shape, dtype=self.dtype: jnp.asarray(self.out_bias,
                                                                 dtype)
            )
            kernel_init = nn.initializers.zeros_init()
        else:
            bias_init = nn.initializers.zeros_init()
            kernel_init = nn.initializers.xavier_uniform()
        return nn.Dense(self.out_dim, kernel_init=kernel_init,
                        bias_init=bias_init, dtype=self.dtype)(x)


class RecurrentHead(nn.Module):
    """GRU/LSTM head: one recurrence step per GN iteration.

    ``out_bias`` works exactly as on :class:`FeedForwardHead`: zero-init
    final kernel + constant bias, so the init forward pass emits the
    static-baseline output regardless of the recurrent state.
    """

    out_dim: int
    hidden_dim: int = 64
    num_hidden: int = 1
    cell_type: str = "lstm"  # or "gru"
    dtype: jnp.dtype = jnp.float32
    out_bias: Optional[Tuple[float, ...]] = None

    @nn.nowrap
    def _cells(self, named: bool = True):
        mk = nn.LSTMCell if self.cell_type == "lstm" else nn.GRUCell
        return [
            mk(self.hidden_dim, dtype=self.dtype,
               name=f"cell{i}" if named else None)
            for i in range(self.num_hidden)
        ]

    @nn.compact
    def __call__(self, feats, th_pos_flat, hidden):
        x = jnp.concatenate([feats, th_pos_flat], axis=-1).astype(self.dtype)
        new_hidden = []
        for i, cell in enumerate(self._cells()):
            h, x = cell(hidden[i], x)
            new_hidden.append(h)
        if self.out_bias is not None:
            bias_init = (
                lambda key, shape, dtype=self.dtype: jnp.asarray(self.out_bias,
                                                                 dtype)
            )
            kernel_init = nn.initializers.zeros_init()
        else:
            bias_init = nn.initializers.zeros_init()
            kernel_init = nn.initializers.xavier_uniform()
        out = nn.Dense(self.out_dim, kernel_init=kernel_init,
                       bias_init=bias_init, dtype=self.dtype)(x)
        return out, tuple(new_hidden)

    @nn.nowrap
    def initialize_carry(self, rng, batch_size, input_len):
        cells = self._cells(named=False)  # unbound: names not allowed
        shape = (batch_size, input_len)
        return tuple(c.initialize_carry(rng, shape) for c in cells)


def traj_positions_flat(th: jnp.ndarray, pos_dim: int = 2) -> jnp.ndarray:
    """(B, T+1, D) -> (B, (T+1)·pos_dim) positions, the head's trajectory
    input (``learn_module_fcn.py:70-74,118``; xy in the 2-D reference,
    xyz for 3-D workspaces)."""
    return th[..., :pos_dim].reshape(th.shape[0], -1)
