"""Batched on-device F0 estimation.

Replaces WORLD's `dio` (pyworld C++, reference preprocess.py:79-80) with
a TPU-native normalized-autocorrelation pitch tracker computed with
batched FFTs — the whole utterance's frames are estimated in one XLA
call instead of a sequential C++ loop:

1. frame the signal (centered, one frame per hop, matching dio's
   frame_period = hop_length / sample_rate * 1000);
2. per frame, compute the normalized autocorrelation (NAC) via
   Wiener-Khinchin (rfft -> |.|^2 -> irfft) with energy normalization;
3. restrict lags to [sr/f0_ceil, sr/f0_floor], take the best peak with
   parabolic interpolation for sub-sample lag precision;
4. declare unvoiced (f0=0, like dio) when peak NAC or frame RMS is low.

Defaults mirror dio's range (f0_floor=71 Hz, f0_ceil=800 Hz). Outputs
1 + len(y)//hop frames, the count dio produces for the same hop, so the
duration-cumsum indexing in alignment feature extraction
(train_tacotron.py:76-80 in the reference) lines up unchanged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('sample_rate', 'hop_length', 'win_length',
                                   'f0_floor', 'f0_ceil', 'center'))
def estimate_f0(y: jnp.ndarray, sample_rate: int, hop_length: int,
                win_length: int = 1024, f0_floor: float = 71.0,
                f0_ceil: float = 800.0, nac_threshold: float = 0.35,
                energy_threshold: float = 1e-4,
                center: bool = True) -> jnp.ndarray:
    """F0 per frame; 0.0 for unvoiced frames. Supports leading batch dims.

    center=False expects pre-padded input (win_length//2 both sides) and
    emits 1 + (len - win_length) // hop frames."""
    min_lag = max(int(sample_rate / f0_ceil), 2)
    max_lag = min(int(np.ceil(sample_rate / f0_floor)), win_length - 2)

    if center:
        pad = win_length // 2
        pad_width = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y_p = jnp.pad(y, pad_width, mode='reflect')
        n_frames = 1 + y.shape[-1] // hop_length
    else:
        y_p = y
        n_frames = 1 + (y.shape[-1] - win_length) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(win_length)[None, :])
    frames = jnp.take(y_p, jnp.asarray(idx), axis=-1)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    # autocorrelation via FFT (zero-pad to 2*win for linear correlation)
    n_fft = 2 * win_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft, axis=-1)
    ac = ac[..., :win_length]

    energy = ac[..., 0:1]
    nac = ac / jnp.maximum(energy, 1e-12)

    lags = jnp.arange(win_length)
    valid = (lags >= min_lag) & (lags <= max_lag)
    nac_masked = jnp.where(valid, nac, -1.0)

    peak_val = jnp.max(nac_masked, axis=-1)

    # octave-error suppression (in the spirit of dio's best-path
    # candidate selection): among local maxima within 13% of the global
    # peak, prefer the SMALLEST lag — a sine's autocorrelation peaks
    # equally at p, 2p, 3p and naive argmax can land an octave low.
    is_local_max = jnp.concatenate(
        [jnp.zeros_like(nac_masked[..., :1], dtype=bool),
         (nac_masked[..., 1:-1] >= nac_masked[..., :-2])
         & (nac_masked[..., 1:-1] >= nac_masked[..., 2:]),
         jnp.zeros_like(nac_masked[..., :1], dtype=bool)], axis=-1)
    candidate = valid & is_local_max & \
        (nac_masked >= 0.87 * peak_val[..., None])
    # smallest candidate lag; fall back to global argmax if none
    first_candidate = jnp.argmax(candidate, axis=-1)
    has_candidate = jnp.any(candidate, axis=-1)
    best_lag = jnp.where(has_candidate, first_candidate,
                         jnp.argmax(nac_masked, axis=-1))
    best_val = jnp.take_along_axis(nac_masked, best_lag[..., None],
                                   axis=-1)[..., 0]

    # parabolic interpolation around the peak
    lag_m = jnp.clip(best_lag - 1, 0, win_length - 1)
    lag_p = jnp.clip(best_lag + 1, 0, win_length - 1)
    y0 = jnp.take_along_axis(nac, lag_m[..., None], axis=-1)[..., 0]
    y1 = best_val
    y2 = jnp.take_along_axis(nac, lag_p[..., None], axis=-1)[..., 0]
    denom = y0 - 2 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-9,
                                                  denom, 1.0),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    refined_lag = best_lag.astype(jnp.float32) + delta

    f0 = sample_rate / jnp.maximum(refined_lag, 1.0)
    rms = jnp.sqrt(energy[..., 0] / win_length)
    voiced = (best_val > nac_threshold) & (rms > energy_threshold) & \
             (f0 >= f0_floor) & (f0 <= f0_ceil)
    f0 = jnp.where(voiced, f0, 0.0).astype(jnp.float32)

    # median-of-3 smoothing across frames kills single-frame outliers
    # (dio applies temporal best-path smoothing for the same reason)
    left = jnp.concatenate([f0[..., :1], f0[..., :-1]], axis=-1)
    right = jnp.concatenate([f0[..., 1:], f0[..., -1:]], axis=-1)
    stacked = jnp.stack([left, f0, right], axis=-1)
    f0_med = jnp.median(stacked, axis=-1)
    # keep hard unvoiced decisions (median would bridge 1-frame gaps of
    # voicing, which is fine, but must not invent pitch where the frame
    # and both neighbors are unvoiced — median already handles that)
    return f0_med.astype(jnp.float32)


def extract_pitch(y: np.ndarray, sample_rate: int, hop_length: int
                  ) -> np.ndarray:
    """Host convenience wrapper returning numpy float32 (dio layout)."""
    return np.asarray(estimate_f0(jnp.asarray(y, dtype=jnp.float32),
                                  sample_rate, hop_length))


def extract_pitch_bucketed(y: np.ndarray, sample_rate: int,
                           hop_length: int, win_length: int = 1024,
                           bucket_multiple: int = 16384) -> np.ndarray:
    """Jit-stable variant: reflect-pads host-side, zero-pads to a length
    ladder, slices to the exact frame count (1 + len // hop, matching
    WORLD dio's output count). Same values as `extract_pitch`."""
    y = np.asarray(y, dtype=np.float32)
    true_frames = 1 + len(y) // hop_length
    pad = win_length // 2
    y_p = np.pad(y, (pad, pad), mode='reflect')
    bucket = int(np.ceil(len(y_p) / bucket_multiple)) * bucket_multiple
    y_p = np.pad(y_p, (0, bucket - len(y_p)))
    f0 = estimate_f0(jnp.asarray(y_p), sample_rate, hop_length,
                     win_length=win_length, center=False)
    return np.asarray(f0[:true_frames])
