"""HiFi-GAN discriminators (multi-period + multi-scale) for TPU
adversarial vocoder training.

The reference repo trains only WaveRNN; its docs point users at an
EXTERNAL HiFi-GAN for best quality (reference README.md sample pages,
gen_forward.py hifigan export). This module supplies the adversarial
half so the generator in models/hifigan.py can be TRAINED here, on
TPU, against the same discriminator architecture as the official
setup:

- MultiPeriodDiscriminator: one sub-discriminator per period p in
  (2, 3, 5, 7, 11); audio (B, T) is reshaped to (B, T/p, p) and run
  through a stack of 2-D convs with kernel (5, 1) stride (3, 1) —
  here expressed channels-last so XLA lowers them onto the MXU.
- MultiScaleDiscriminator: 3 sub-discriminators on (x, avgpool2(x),
  avgpool4(x)) with large-kernel grouped 1-D convs.

Deliberate deviation: convs are plain (no weight/spectral norm
parametrization) — simpler functional training state; the norm only
conditions GAN optimization, and the generator checkpoints remain
format-compatible either way (conversion folds norms).

All sub-discriminators return (logits, feature_maps) for the LSGAN
and feature-matching losses in train/gan_losses.py.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


class PeriodDiscriminator(nn.Module):
    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # (B, T) -> (B, T/p, p, 1) channels-last 2-D layout
        b, t = x.shape
        p = self.period
        pad = (p - t % p) % p
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode='reflect')
        x = x.reshape(b, -1, p, 1)
        fmaps = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(ch, (5, 1), strides=(3, 1),
                        padding=((2, 2), (0, 0)), name=f'conv_{i}')(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmaps.append(x)
        x = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)),
                    name='conv_4')(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)),
                    name='conv_post')(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class ScaleDiscriminator(nn.Module):

    @nn.compact
    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        b = x.shape[0]
        x = x[..., None]                       # (B, T, 1)
        fmaps = []
        specs = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
                 (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
                 (1024, 5, 1, 1)]
        for i, (ch, k, s, g) in enumerate(specs):
            x = nn.Conv(ch, (k,), strides=(s,),
                        padding=((k // 2, k // 2),),
                        feature_group_count=g, name=f'conv_{i}')(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmaps.append(x)
        x = nn.Conv(1, (3,), padding=((1, 1),), name='conv_post')(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


def _avg_pool1d(x: jnp.ndarray, k: int = 4, stride: int = 2) -> jnp.ndarray:
    y = nn.avg_pool(x[..., None], (k,), strides=(stride,),
                    padding=((2, 2),))
    return y[..., 0]


class HiFiGANDiscriminators(nn.Module):
    """MPD + MSD in one module; returns per-sub-discriminator logits
    and feature maps for real and generated audio."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        logits_r, logits_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(p, name=f'mpd_{p}')
            lr, fr = d(y)
            lg, fg = d(y_hat)
            logits_r.append(lr)
            logits_g.append(lg)
            fmaps_r.append(fr)
            fmaps_g.append(fg)
        ys, ys_hat = y, y_hat
        for i in range(self.n_scales):
            if i > 0:
                ys = _avg_pool1d(ys)
                ys_hat = _avg_pool1d(ys_hat)
            d = ScaleDiscriminator(name=f'msd_{i}')
            lr, fr = d(ys)
            lg, fg = d(ys_hat)
            logits_r.append(lr)
            logits_g.append(lg)
            fmaps_r.append(fr)
            fmaps_g.append(fg)
        return logits_r, logits_g, fmaps_r, fmaps_g
