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


@partial(jax.jit, static_argnames=('max_t',))
def length_regulate(x: jnp.ndarray, dur: jnp.ndarray, max_t: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand x (B, T, C) by durations dur (B, T) -> (B, max_t, C).

    Returns (expanded, total_lengths). Rounding matches the reference:
    dur clamped at 0, then (dur + 0.5) truncated to int
    (common_layers.py:13-16).
    """
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
    return out, total
