"""Attention quality scores (parity: utils/metrics.py:4-31).

loc_score measures monotonicity (fraction of adjacent argmax moves within
r), sharp_score the mean peak attention — both masked by mel length.
Used to filter bad training items for the forward model
(utils/dataset.py:208-218).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def attention_score(att: jnp.ndarray, mel_lens: jnp.ndarray, r: int = 1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """att (B, T_dec, T_text); mel_lens (B,). Returns (loc, sharp) (B,)."""
    b, t_max, c_max = att.shape
    mel_lens = mel_lens // r
    mel_range = jnp.arange(t_max)
    mask = (mel_range[None, :] < mel_lens[:, None]).astype(jnp.float32)

    max_loc = jnp.argmax(att, axis=2)
    max_loc_diff = jnp.abs(max_loc[:, 1:] - max_loc[:, :-1])
    loc_score = ((max_loc_diff >= 0) & (max_loc_diff <= r)).astype(
        jnp.float32)
    loc_score = jnp.sum(loc_score * mask[:, 1:], axis=1)
    loc_score = loc_score / jnp.maximum(mel_lens - 1, 1)

    sharp_score = jnp.max(att, axis=2)
    sharp_score = jnp.mean(sharp_score * mask, axis=1)
    return loc_score, sharp_score
