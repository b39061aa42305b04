"""On-device Griffin-Lim vocoder: mel -> linear (NNLS) -> phase recovery.

Replaces the reference's librosa path (utils/dsp.py:89-103:
mel_to_stft(power=1) + griffinlim(n_iter=32)) with XLA:

- mel inversion solves the non-negative least squares problem
  argmin_{S>=0} ||mel_basis @ S - M||^2 with accelerated projected
  gradient descent (fixed iteration count, jit-stable), the same problem
  librosa's util.nnls solves host-side with scipy;
- Griffin-Lim runs as a `lax.fori_loop` of ISTFT/STFT round trips with
  momentum 0.99 and random phase init (librosa defaults).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from forwardtacotron_tpu.dsp.stft import istft, stft


@partial(jax.jit, static_argnames=('n_iter',))
def nnls_mel_inverse(mel_basis: jnp.ndarray, mel: jnp.ndarray,
                     n_iter: int = 200) -> jnp.ndarray:
    """Solve S >= 0 minimizing ||A @ S - M|| for A=(n_mels, n_freq).

    `mel` is time-major (..., T, n_mels); returns (..., T, n_freq).
    Accelerated projected gradient (FISTA-style) with step 1/L where
    L = ||A^T A||_2 estimated by power iteration.
    """
    A = mel_basis  # (n_mels, n_freq)
    M = mel

    # Lipschitz constant of the gradient: largest eigenvalue of A^T A.
    v = jnp.ones((A.shape[1],), dtype=A.dtype)

    def power_iter(_, v):
        w = A.T @ (A @ v)
        return w / (jnp.linalg.norm(w) + 1e-12)

    v = jax.lax.fori_loop(0, 30, power_iter, v)
    L = jnp.vdot(v, A.T @ (A @ v)) / (jnp.vdot(v, v) + 1e-12)
    step = 1.0 / (L + 1e-12)

    # init: transpose projection (scaled), a common warm start
    x = jnp.maximum(M @ A, 0.0)

    def body(i, carry):
        x, y, t = carry
        grad = (y @ A.T - M) @ A      # d/dS ||S A^T - M||^2 (up to 2x)
        x_new = jnp.maximum(y - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(0, n_iter, body, (x, x, jnp.asarray(1.0)))
    return x


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'n_iter', 'length'))
def griffinlim(spec_mag: jnp.ndarray, key: jax.Array, n_fft: int,
               hop_length: int, win_length: int, n_iter: int = 32,
               momentum: float = 0.99, length: int | None = None
               ) -> jnp.ndarray:
    """Phase recovery from a magnitude spectrogram.

    `spec_mag` time-major (..., T, n_freq). Returns waveform (..., samples).
    """
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, spec_mag.shape))
    rebuilt = jnp.zeros_like(angles)

    def body(i, carry):
        angles, rebuilt = carry
        tprev = rebuilt
        inverse = istft(spec_mag * angles, n_fft, hop_length, win_length,
                        length=length)
        rebuilt = stft(inverse, n_fft, hop_length, win_length)
        angles = rebuilt - (momentum / (1 + momentum)) * tprev
        angles = angles / jnp.maximum(jnp.abs(angles), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, rebuilt))
    return istft(spec_mag * angles, n_fft, hop_length, win_length,
                 length=length)


def mel_to_wav_fn(mel_basis, n_fft: int, hop_length: int, win_length: int,
                  n_iter: int = 32, nnls_iter: int = 200):
    """Build a jitted log-mel -> waveform Griffin-Lim function.

    Parity surface: DSP.griffinlim (utils/dsp.py:89-103) — input is the
    normalized log-mel (denormalized with exp here).
    """
    mel_basis = jnp.asarray(mel_basis)

    @jax.jit
    def mel_to_wav(mel: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        lin = nnls_mel_inverse(mel_basis, jnp.exp(mel), n_iter=nnls_iter)
        return griffinlim(lin, key, n_fft, hop_length, win_length,
                          n_iter=n_iter)

    return mel_to_wav
