"""Length masks and masked losses.

Parity surface: trainer/common.py:69-92 in the reference (MaskedL1 +
pad_mask). Layout here is time-major (B, T, C); the mask covers the time
axis and is broadcast over channels, and normalization divides by the
channel-expanded mask sum exactly like the reference
(`loss / mask.sum()` with mask expanded to the full tensor shape).
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_mask(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) float mask."""
    return (jnp.arange(max_len)[None, :] < lens[:, None]).astype(jnp.float32)


def masked_l1(x: jnp.ndarray, target: jnp.ndarray, lens: jnp.ndarray
              ) -> jnp.ndarray:
    """Mean absolute error over valid (time < len) positions.

    x, target: (B, T, C) or (B, T); lens: (B,).
    """
    if x.ndim == 2:
        x, target = x[..., None], target[..., None]
    mask = pad_mask(lens, target.shape[1])[..., None]
    n_channels = x.shape[-1]
    loss = jnp.sum(jnp.abs(x * mask - target * mask))
    return loss / jnp.maximum(jnp.sum(mask) * n_channels, 1.0)
