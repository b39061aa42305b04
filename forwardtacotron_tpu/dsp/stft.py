"""Batched STFT / mel filterbank / ISTFT as XLA ops.

Replaces the reference's librosa 0.7.2 host DSP (utils/dsp.py:71-110) with
on-device jnp: same semantics (center=True, reflect padding, periodic hann
window, slaney-normalized mel filterbank, magnitude spectrum) so extracted
features are numerically interchangeable. Everything accepts leading batch
dimensions and is jit-compatible with static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) hann window, as used by librosa/torch."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)
    return freqs


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float, dtype=np.float32) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft//2).

    Matches librosa.filters.mel(htk=False, norm=1) used by
    melspectrogram at reference utils/dsp.py:78-84.
    """
    if fmax is None:
        fmax = sample_rate / 2
    fft_freqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)


def _frame_indices(n_samples_padded: int, n_fft: int, hop_length: int):
    n_frames = 1 + (n_samples_padded - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    return idx, n_frames


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'center', 'pad_mode'))
def stft(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
         center: bool = True, pad_mode: str = 'reflect') -> jnp.ndarray:
    """Complex STFT, output (..., n_frames, 1 + n_fft // 2).

    librosa-0.7.2-compatible: centered reflect padding, periodic hann.
    Note librosa returns (freq, time); we use time-major throughout and
    transpose at the compatibility surface.
    """
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(jnp.asarray(hann_window(win_length)),
                         (pad, n_fft - win_length - pad))
    else:
        window = jnp.asarray(hann_window(win_length))
    if center:
        pad_width = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad_width, mode=pad_mode)
    idx, _ = _frame_indices(y.shape[-1], n_fft, hop_length)
    frames = jnp.take(y, jnp.asarray(idx), axis=-1)  # (..., T, n_fft)
    return jnp.fft.rfft(frames * window, axis=-1)


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'length'))
def istft(spec: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
          length: int | None = None) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with NOLA normalization.

    `spec` is time-major: (..., n_frames, 1 + n_fft // 2).
    """
    window = jnp.asarray(hann_window(win_length))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)

    idx, _ = _frame_indices(total, n_fft, hop_length)
    idx = jnp.asarray(idx)

    flat_batch = frames.reshape((-1, n_frames, n_fft))

    def overlap_add(f):
        out = jnp.zeros(total, dtype=f.dtype)
        return out.at[idx].add(f)

    y = jax.vmap(overlap_add)(flat_batch)

    wsum = jnp.zeros(total).at[idx].add(jnp.square(window)[None, :].repeat(
        n_frames, axis=0))
    y = y / jnp.maximum(wsum, 1e-10)

    y = y.reshape(spec.shape[:-2] + (total,))
    start = n_fft // 2
    if length is None:
        length = total - n_fft
    return jax.lax.dynamic_slice_in_dim(y, start, length, axis=-1)


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length'))
def magnitude_stft(y: jnp.ndarray, n_fft: int, hop_length: int,
                   win_length: int) -> jnp.ndarray:
    return jnp.abs(stft(y, n_fft, hop_length, win_length))


def wav_to_mel_fn(mel_basis: jnp.ndarray, n_fft: int, hop_length: int,
                  win_length: int, normalize: bool = True,
                  center: bool = True):
    """Build a jitted wav -> log-mel function (time-major (..., T, n_mels)).

    Parity: utils/dsp.py:71-87 (|stft| -> mel_basis @ S -> clip(1e-5) -> log).
    center=False expects the caller to have applied the reflect padding
    (used by the bucketed preprocessing path for jit-stable shapes).
    """
    mel_basis = jnp.asarray(mel_basis)

    @jax.jit
    def wav_to_mel(y: jnp.ndarray) -> jnp.ndarray:
        spec = jnp.abs(stft(y, n_fft, hop_length, win_length, center=center))
        mel = spec @ mel_basis.T
        if normalize:
            mel = jnp.log(jnp.clip(mel, min=1e-5))
        return mel

    return wav_to_mel
