"""LengthRegulator: duration-driven upsampling as a vectorized gather.

The reference implements this with a per-item python loop of
`repeat_interleave` + `pad_sequence` (models/common_layers.py:7-19) —
ragged and host-driven. On TPU it becomes a fixed-shape gather-expand:

    reps   = floor(max(dur, 0) + 0.5)          # same rounding as torch
    ends   = cumsum(reps)                      # phoneme end frames
    idx[t] = searchsorted(ends, t, 'right')    # frame -> phoneme map
    out    = x[idx]  (zero beyond total length, like pad_sequence)

Output length is a static `max_t` so the op is jit-stable; the true mel
lengths are returned alongside.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _length_regulate(x: jnp.ndarray, dur: jnp.ndarray, max_t: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    out, _, _ = _lr_fwd_core(x, dur, max_t)
    return out


def _lr_fwd_core(x, dur, max_t):
    dur = jnp.maximum(dur.astype(jnp.float32), 0.0)
    reps = jnp.floor(dur + 0.5).astype(jnp.int32)
    ends = jnp.cumsum(reps, axis=1)                       # (B, T)
    frame_idx = jnp.arange(max_t, dtype=jnp.int32)

    idx = jax.vmap(
        lambda e: jnp.searchsorted(e, frame_idx, side='right'))(ends)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)

    total = ends[:, -1]
    valid = frame_idx[None, :] < total[:, None]
    out = jnp.where(valid[..., None], out, 0.0)
    return out, total, (idx, valid)


def _lr_vjp_fwd(x, dur, max_t):
    out, _, (idx, valid) = _lr_fwd_core(x, dur, max_t)
    # zero-size dtype carrier: residuals must be JAX values
    return out, (idx, valid, jnp.zeros((0, x.shape[1]), x.dtype), dur)


def _lr_vjp_bwd(max_t, res, dy):
    """Gather backward as a one-hot matmul instead of XLA's serialized
    scatter-add (the scatter made fwd+bwd through this op ~2 ms of the
    train step — tools/train_breakdown.py; the (B,max_t,T) one-hot
    einsum is ~3 GFLOP of MXU work instead). Durations get zero
    cotangent: the frame map goes through floor/int rounding, exactly
    like the reference's repeat_interleave."""
    idx, valid, x_proto, dur = res
    T = x_proto.shape[1]
    dy = jnp.where(valid[..., None], dy, 0.0)
    onehot = jax.nn.one_hot(idx, T, dtype=dy.dtype)       # (B, max_t, T)
    dx = jnp.einsum('bts,btc->bsc', onehot, dy)
    return dx.astype(x_proto.dtype), jnp.zeros_like(dur)


_length_regulate.defvjp(_lr_vjp_fwd, _lr_vjp_bwd)


@partial(jax.jit, static_argnames=('max_t',))
def length_regulate(x: jnp.ndarray, dur: jnp.ndarray, max_t: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand x (B, T, C) by durations dur (B, T) -> (B, max_t, C).

    Returns (expanded, total_lengths). Rounding matches the reference:
    dur clamped at 0, then (dur + 0.5) truncated to int
    (common_layers.py:13-16). Differentiable in x (custom_vjp: the
    backward runs as a one-hot matmul on the MXU, see _lr_vjp_bwd).
    """
    out = _length_regulate(x, dur, max_t)
    # total lengths recomputed outside the custom_vjp so the public
    # tuple return stays as-is while the vjp covers only `out`
    reps = jnp.floor(jnp.maximum(dur.astype(jnp.float32), 0.0)
                     + 0.5).astype(jnp.int32)
    total = jnp.cumsum(reps, axis=1)[:, -1]
    return out, total
