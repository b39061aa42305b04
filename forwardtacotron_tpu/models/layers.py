"""Shared flax modules: BatchNormConv / Highway / CBHG / RNN wrappers.

TPU re-design of models/common_layers.py in the reference. Layout is
time-major (B, T, C) end to end — the reference's channel-first
transposes disappear, convolutions map onto XLA's NTC conv lowering,
and the CBHG's BiGRU runs as a `lax.scan` (ops/rnn.py) with its input
projection batched onto the MXU.

Structural parity notes (for checkpoint conversion):
- BatchNormConv order is conv -> (relu) -> batchnorm
  (common_layers.py:49-52), eps 1e-5, momentum 0.1 (torch convention).
- CBHG (common_layers.py:55-119): K bank convs (k=1..K) sliced back to
  seq_len, maxpool(k=2, s=1, pad 1), two projection convs, residual,
  pre-highway linear (no bias), N highway layers, BiGRU.
- The CBHG GRU intentionally runs over padded frames without masking,
  exactly like the reference's unpacked nn.GRU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.ops import rnn as rnn_ops


def torch_uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _DirParams(nn.Module):
    """Parameter container for one RNN direction (torch layout). Kept as
    a submodule so the param tree keeps fwd/bwd scopes for checkpoint
    conversion while the computation runs fused in the parent."""
    hidden: int
    n_gates: int

    @nn.compact
    def __call__(self, in_dim: int):
        bound = 1.0 / (self.hidden ** 0.5)
        init = torch_uniform_init(bound)
        g = self.n_gates
        return {
            'w_ih': self.param('w_ih', init, (g * self.hidden, in_dim)),
            'w_hh': self.param('w_hh', init, (g * self.hidden, self.hidden)),
            'b_ih': self.param('b_ih', init, (g * self.hidden,)),
            'b_hh': self.param('b_hh', init, (g * self.hidden,)),
        }


class TorchGRU(nn.Module):
    """Single-direction GRU with torch parameter layout (r|z|n gates)."""
    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        bound = 1.0 / (self.hidden ** 0.5)
        init = torch_uniform_init(bound)
        params = {
            'w_ih': self.param('w_ih', init, (3 * self.hidden, d)),
            'w_hh': self.param('w_hh', init, (3 * self.hidden, self.hidden)),
            'b_ih': self.param('b_ih', init, (3 * self.hidden,)),
            'b_hh': self.param('b_hh', init, (3 * self.hidden,)),
        }
        return rnn_ops.gru(params, x, reverse=self.reverse, lengths=lengths)


class TorchBiGRU(nn.Module):
    """Bidirectional GRU: both directions advance in ONE fused scan
    (ops/rnn.py:_bidir_fused) — half the sequential steps, identical
    math to two separate direction passes. `fast=True` opts long
    sequences into the fused Pallas kernel (inference only)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 pad_value: float = 0.0, fast: bool = False) -> jnp.ndarray:
        fwd = _DirParams(self.hidden, 3, name='fwd')(x.shape[-1])
        bwd = _DirParams(self.hidden, 3, name='bwd')(x.shape[-1])
        return rnn_ops.bigru(fwd, bwd, x, lengths=lengths,
                             pad_value=pad_value,
                             fast=fast and not self.is_initializing())


class TorchBiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 pad_value: float = 0.0, fast: bool = False) -> jnp.ndarray:
        fwd = _DirParams(self.hidden, 4, name='fwd')(x.shape[-1])
        bwd = _DirParams(self.hidden, 4, name='bwd')(x.shape[-1])
        return rnn_ops.bilstm(fwd, bwd, x, lengths=lengths,
                              pad_value=pad_value,
                              fast=fast and not self.is_initializing())


class BatchNormConv(nn.Module):
    out_channels: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        seq_len = x.shape[1]
        pad = self.kernel // 2
        x = nn.Conv(self.out_channels, (self.kernel,),
                    padding=((pad, pad),), use_bias=False, name='conv')(x)
        x = x[:, :seq_len]  # even kernels produce one extra frame
        if self.relu:
            x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bnorm')(x)
        return x


class HighwayNetwork(nn.Module):
    size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = nn.Dense(self.size, name='W1',
                      bias_init=nn.initializers.zeros)(x)
        x2 = nn.Dense(self.size, name='W2')(x)
        g = nn.sigmoid(x2)
        return g * nn.relu(x1) + (1.0 - g) * x


def _mask_time(x: jnp.ndarray, lengths: Optional[jnp.ndarray],
               fill: float = 0.0) -> jnp.ndarray:
    if lengths is None:
        return x
    mask = jnp.arange(x.shape[1])[None, :, None] < lengths[:, None, None]
    return jnp.where(mask, x, fill)


class CBHG(nn.Module):
    K: int
    channels: int
    proj_channels: Sequence[int]
    num_highways: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 lengths: Optional[jnp.ndarray] = None,
                 fast: bool = False) -> jnp.ndarray:
        """With `lengths`, every stage is cut at each item's true length
        (convs see zero padding, maxpool sees -inf, the BiGRU reverses
        from the true end) so a padded static-bucket run computes the
        same valid-position values as an exact-length run — this is the
        jit-friendly inference path. Without `lengths`, padding flows
        through unmasked, matching the reference's behavior on padded
        training batches."""
        seq_len = x.shape[1]
        x = _mask_time(x, lengths)
        residual = x

        bank = [BatchNormConv(self.channels, k, name=f'bank_{k}')(x, train)
                for k in range(1, self.K + 1)]
        x = jnp.concatenate(bank, axis=-1)

        x = _mask_time(x, lengths, fill=-jnp.inf)
        x = nn.max_pool(x, (2,), strides=(1,), padding=((1, 1),))
        x = x[:, :seq_len]
        x = _mask_time(x, lengths)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = BatchNormConv(self.proj_channels[0], 3, name='proj1')(x, train)
        x = _mask_time(x, lengths)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = BatchNormConv(self.proj_channels[1], 3, relu=False,
                          name='proj2')(x, train)

        x = x + residual
        x = _mask_time(x, lengths)

        x = nn.Dense(self.channels, use_bias=False, name='pre_highway')(x)
        for i in range(self.num_highways):
            x = HighwayNetwork(self.channels, name=f'highway_{i}')(x)

        return TorchBiGRU(self.channels, name='rnn')(x, lengths=lengths,
                                                     fast=fast)
