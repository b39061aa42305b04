"""Adversarial vocoder losses (LSGAN + feature matching + mel L1).

The loss recipe of the official HiFi-GAN training setup, expressed as
pure jnp functions over the (logits, feature-map) lists returned by
models/gan_discriminators.py:

- discriminator: sum_d mean((1 - D_d(y))^2) + mean(D_d(y_hat)^2)
- generator adversarial: sum_d mean((1 - D_d(y_hat))^2)
- feature matching: 2 * sum_d sum_layers mean(|f_r - f_g|)
- mel reconstruction: 45 * mean(|mel(y_hat) - mel(y)|) with the
  framework's on-device log-mel (dsp/stft.py:wav_to_mel_fn), so the
  generator is trained in the same mel convention the TTS models emit.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

FM_WEIGHT = 2.0
MEL_WEIGHT = 45.0


def discriminator_loss(logits_real: List[jnp.ndarray],
                       logits_gen: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for lr, lg in zip(logits_real, logits_gen):
        loss = loss + jnp.mean((1.0 - lr) ** 2) + jnp.mean(lg ** 2)
    return loss


def generator_adversarial_loss(logits_gen: List[jnp.ndarray]
                               ) -> jnp.ndarray:
    loss = 0.0
    for lg in logits_gen:
        loss = loss + jnp.mean((1.0 - lg) ** 2)
    return loss


def feature_matching_loss(fmaps_real: List[List[jnp.ndarray]],
                          fmaps_gen: List[List[jnp.ndarray]]
                          ) -> jnp.ndarray:
    loss = 0.0
    for fr_list, fg_list in zip(fmaps_real, fmaps_gen):
        for fr, fg in zip(fr_list, fg_list):
            loss = loss + jnp.mean(jnp.abs(fr - fg))
    return FM_WEIGHT * loss


def mel_l1_loss(wav_to_mel, y: jnp.ndarray, y_hat: jnp.ndarray
                ) -> jnp.ndarray:
    return MEL_WEIGHT * jnp.mean(
        jnp.abs(wav_to_mel(y_hat) - wav_to_mel(y)))
