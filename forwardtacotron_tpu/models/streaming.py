"""Streaming WaveRNN synthesis: incremental audio chunk emission.

The reference synthesizes a whole utterance before any audio exists
(fatchord_version.py:171-265 returns one array). For long-form input —
the README's selling point is whole-article synthesis (README.md:17-18)
— that means waiting for the full generation and holding every fold
lane in memory at once. This module streams instead: the upsampled
conditioning is folded exactly like generate_wav, but the fold lanes
are sampled in bounded GROUPS, and each group's crossfaded audio is
yielded as soon as it is final.

Semantics are identical to the batched path: each fold lane starts from
zero hidden state in either case, and the equal-power crossfade
(xfade_and_unfold, fatchord_version.py:343-406) only mixes neighbouring
folds, so the concatenation of the yielded chunks reproduces
generate_wav's bookkeeping bit-for-bit given the same per-fold samples.
Memory is O(group) instead of O(num_folds), and the first chunk is
ready after one group instead of the whole utterance.
"""
from __future__ import annotations

import wave
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.models.wavernn import (fold_device, pad_tensor)

_STREAM_JIT_CACHE: Dict = {}


def _xfade_curves(overlap: int):
    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.concatenate([np.zeros(silence_len),
                              np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.ones(silence_len),
                               np.sqrt(0.5 * (1 - t))])
    return fade_in, fade_out


def stream_fold_groups(samples_by_group: Iterator[np.ndarray],
                       target: int, overlap: int) -> Iterator[np.ndarray]:
    """Crossfade-unfold fold-lane sample groups into a stream of final
    audio chunks. Concatenating the yielded chunks equals
    xfade_and_unfold(all_samples) exactly (same fades, same overlap
    adds), except emission is incremental: after fold i only samples
    before fold i+1's start are final, so `overlap` samples are carried
    between chunks."""
    fade_in, fade_out = _xfade_curves(overlap)
    stride = target + overlap
    carry = np.zeros(overlap, dtype=np.float64)
    for y in samples_by_group:
        y = y.astype(np.float64).copy()        # (G, target + 2*overlap)
        y[:, :overlap] *= fade_in
        y[:, -overlap:] *= fade_out
        g = y.shape[0]
        unfolded = np.zeros(g * stride + overlap, dtype=np.float64)
        for i in range(g):
            unfolded[i * stride:i * stride + target + 2 * overlap] += y[i]
        unfolded[:overlap] += carry
        carry = unfolded[-overlap:].copy()
        yield unfolded[:-overlap]
    yield carry


def write_wav_streaming(chunks: Iterator[np.ndarray],
                        path: Union[str, Path], sample_rate: int) -> int:
    """Write float chunks to a 16-bit PCM wav incrementally (audio is on
    disk and playable up to the last flushed chunk while later chunks
    are still being sampled). Returns total samples written."""
    total = 0
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        for chunk in chunks:
            pcm = (np.clip(chunk, -1.0, 1.0) * 32767).astype('<i2')
            w.writeframes(pcm.tobytes())
            total += len(pcm)
    return total


def stream_wav(model, variables: Dict, mel: np.ndarray,
               target: Optional[int] = None, overlap: int = 550,
               group: int = 8, mu_law: bool = True, seed: int = 0,
               use_pallas: Optional[bool] = None,
               sample_fn: Optional[Callable] = None,
               greedy: bool = False) -> Iterator[np.ndarray]:
    """Generator of float64 audio chunks for one utterance.

    Mirrors generate_wav (models/wavernn.py) — pad, upsample, fold,
    sample, mu-law decode, crossfade — but yields audio as fold groups
    complete. np.concatenate(list(stream_wav(...)))  is sample-exact to
    generate_wav's bookkeeping for the same per-fold samples (sampling
    noise differs per group seed in stochastic mode).

    sample_fn(mels_f, aux_f, seed) -> (G, T) float samples overrides the
    sampler (used by tests; default picks Pallas kernel or lax.scan like
    generate_wav).
    """
    from forwardtacotron_tpu.dsp.audio import DSP

    mel = np.asarray(mel, dtype=np.float32)
    if mel.shape[0] == model.feat_dims and mel.shape[-1] != model.feat_dims:
        mel = mel.T
    mel = mel[None]                                    # (1, T, M)

    mu_law = mu_law if model.mode == 'RAW' else False
    wave_len = (mel.shape[1] - 1) * model.hop_length

    mel = pad_tensor(mel, pad=model.pad, side='both')
    up_key = (model, 'upsample')
    if up_key not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[up_key] = jax.jit(
            lambda v, m: model.apply(v, m, method='upsample_cond'))
    mels_up, aux = _STREAM_JIT_CACHE[up_key](variables, jnp.asarray(mel))
    if use_pallas is None and sample_fn is None:
        from forwardtacotron_tpu.kernels.wavernn_sample import (
            pallas_supported)
        use_pallas = pallas_supported(model)
    if target is None:
        from forwardtacotron_tpu.models.wavernn import (TARGET_REFERENCE,
                                                        TARGET_TPU)
        target = TARGET_TPU if use_pallas else TARGET_REFERENCE
    mels_f = fold_device(mels_up, target, overlap)
    aux_f = fold_device(aux, target, overlap)
    num_folds = int(mels_f.shape[0])

    if sample_fn is None:
        if use_pallas:
            from forwardtacotron_tpu.kernels.wavernn_sample import (
                wavernn_sample_pallas)

            def sample_fn(m, a, s):
                return wavernn_sample_pallas(model, variables,
                                             m, a, seed=s, greedy=greedy)
        else:
            scan_key = (model, 'scan')
            if scan_key not in _STREAM_JIT_CACHE:
                _STREAM_JIT_CACHE[scan_key] = jax.jit(
                    lambda v, m, a, k, g: model.apply(
                        v, m, a, k, method='sample_scan', greedy=g),
                    static_argnums=(4,))

            def sample_fn(m, a, s):
                return np.asarray(_STREAM_JIT_CACHE[scan_key](
                    variables, m, a, jax.random.PRNGKey(s), greedy))

    def groups():
        for g0 in range(0, num_folds, group):
            g1 = min(g0 + group, num_folds)
            samples = sample_fn(mels_f[g0:g1], aux_f[g0:g1], seed + g0)
            samples = np.asarray(samples, dtype=np.float64)
            if mu_law:
                samples = DSP.decode_mu_law(samples, model.n_classes, False)
            yield samples

    emitted = 0
    fade_out = np.linspace(1, 0, 20 * model.hop_length)
    fade_start = wave_len - len(fade_out)
    for chunk in stream_fold_groups(groups(), target, overlap):
        # trim to true wave length and apply the terminal fade-out
        # exactly like generate_wav (models/wavernn.py)
        start, end = emitted, emitted + len(chunk)
        emitted = end
        if start >= wave_len:
            return
        chunk = chunk[:max(0, wave_len - start)]
        lo = max(fade_start, start)
        if lo < start + len(chunk):
            idx = np.arange(lo - start, len(chunk))
            chunk = chunk.copy()
            chunk[idx] *= fade_out[lo - fade_start:
                                   lo - fade_start + len(idx)]
        yield chunk
