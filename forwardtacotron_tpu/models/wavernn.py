"""WaveRNN vocoder (fatchord version), TPU-native.

Re-design of models/fatchord_version.py. Training is the teacher-forced
sequence model (GRUs over the whole window as lax.scan with MXU-batched
input projections). Generation — the reference's #1 perf sink, a python
loop running 2 GRUCells + 3 FCs + a categorical sample per audio sample
(fatchord_version.py:203-244) — becomes ONE `lax.scan` over upsampled
frames with:

- all conditioning projections hoisted out of the loop: the I-layer,
  rnn2 input, fc1/fc2 aux contributions are precomputed for the whole
  utterance as big matmuls, so the scan body touches only the
  recurrent/hot path;
- on-device categorical sampling (Gumbel / logistic inverse-CDF) with
  per-step PRNG keys threaded as scan inputs;
- the reference's batched fold/xfade-unfold trick (intra-utterance
  parallelism, fatchord_version.py:294-406) kept as the batching
  strategy, with the folds running as scan batch lanes.

Weight layouts are torch-compatible for checkpoint conversion.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from forwardtacotron_tpu.models.layers import torch_uniform_init
from forwardtacotron_tpu.ops import rnn as rnn_ops
from forwardtacotron_tpu.ops.mol import (
    greedy_from_discretized_mix_logistic,
    sample_from_discretized_mix_logistic)


class ResBlock(nn.Module):
    dims: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.dims, (1,), use_bias=False, name='conv1')(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='batch_norm1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.dims, (1,), use_bias=False, name='conv2')(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='batch_norm2')(h)
        return h + residual


class MelResNet(nn.Module):
    res_blocks: int
    compute_dims: int
    res_out_dims: int
    pad: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k_size = self.pad * 2 + 1
        h = nn.Conv(self.compute_dims, (k_size,), padding='VALID',
                    use_bias=False, name='conv_in')(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='batch_norm')(h)
        h = nn.relu(h)
        for i in range(self.res_blocks):
            h = ResBlock(self.compute_dims, name=f'res_{i}')(h, train)
        return nn.Conv(self.res_out_dims, (1,), name='conv_out')(h)


def _shared_time_conv(x: jnp.ndarray, kernel: jnp.ndarray, pad: int
                      ) -> jnp.ndarray:
    """Apply one shared 1-D kernel along time to every channel.

    Equivalent to the reference's Conv2d(1, 1, (1, k)) over the (freq,
    time) image (fatchord_version.py:78). x (B, T, C), kernel (k,)."""
    B, T, C = x.shape
    lhs = x.transpose(0, 2, 1).reshape(B * C, 1, T)
    rhs = kernel.reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=('NCH', 'OIH', 'NCH'))
    T2 = out.shape[-1]
    return out.reshape(B, C, T2).transpose(0, 2, 1)


class UpsampleNetwork(nn.Module):
    feat_dims: int
    upsample_scales: Tuple[int, ...]
    compute_dims: int
    res_blocks: int
    res_out_dims: int
    pad: int

    @nn.compact
    def __call__(self, m: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """m (B, T, n_mels) time-major -> (mels_up, aux), both
        (B, (T - 2*pad) * prod(scales), C)."""
        total_scale = int(np.prod(self.upsample_scales))
        indent = self.pad * total_scale

        aux = MelResNet(self.res_blocks, self.compute_dims,
                        self.res_out_dims, self.pad, name='resnet')(m, train)
        aux = jnp.repeat(aux, total_scale, axis=1)

        x = m
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.repeat(x, scale, axis=1)
            k_size = scale * 2 + 1
            kernel = self.param(f'up_conv_{i}',
                                lambda key, shape: jnp.full(
                                    shape, 1.0 / k_size),
                                (k_size,))
            x = _shared_time_conv(x, kernel, pad=scale)
        x = x[:, indent:-indent]
        return x, aux


class WaveRNN(nn.Module):
    rnn_dims: int = 512
    fc_dims: int = 512
    bits: int = 9
    pad: int = 2
    upsample_factors: Tuple[int, ...] = (4, 8, 8)
    feat_dims: int = 80
    compute_dims: int = 128
    res_out_dims: int = 128
    res_blocks: int = 10
    hop_length: int = 256
    sample_rate: int = 22050
    mode: str = 'RAW'

    @property
    def n_classes(self) -> int:
        if self.mode == 'RAW':
            return 2 ** self.bits
        if self.mode == 'MOL':
            return 30
        raise ValueError(f'Unknown model mode: {self.mode}')

    @property
    def aux_dims(self) -> int:
        return self.res_out_dims // 4

    def setup(self) -> None:
        self.upsample = UpsampleNetwork(
            self.feat_dims, tuple(self.upsample_factors),
            self.compute_dims, self.res_blocks, self.res_out_dims,
            self.pad)
        # dense layers as explicit params (torch Linear layout transposed)
        # so the sampling scan can slice them for loop hoisting
        in_I = self.feat_dims + self.aux_dims + 1

        def linear(name, fan_in, fan_out):
            init_l = torch_uniform_init(1.0 / (fan_in ** 0.5))
            return (self.param(f'{name}_kernel', init_l, (fan_in, fan_out)),
                    self.param(f'{name}_bias', init_l, (fan_out,)))

        self.I_kernel, self.I_bias = linear('I', in_I, self.rnn_dims)
        self.fc1_kernel, self.fc1_bias = linear(
            'fc1', self.rnn_dims + self.aux_dims, self.fc_dims)
        self.fc2_kernel, self.fc2_bias = linear(
            'fc2', self.fc_dims + self.aux_dims, self.fc_dims)
        self.fc3_kernel, self.fc3_bias = linear(
            'fc3', self.fc_dims, self.n_classes)

        bound1 = 1.0 / (self.rnn_dims ** 0.5)
        init = torch_uniform_init(bound1)
        d = self.rnn_dims
        self._rnn1 = {
            'w_ih': self.param('rnn1_w_ih', init, (3 * d, d)),
            'w_hh': self.param('rnn1_w_hh', init, (3 * d, d)),
            'b_ih': self.param('rnn1_b_ih', init, (3 * d,)),
            'b_hh': self.param('rnn1_b_hh', init, (3 * d,)),
        }
        self._rnn2 = {
            'w_ih': self.param('rnn2_w_ih', init, (3 * d, d + self.aux_dims)),
            'w_hh': self.param('rnn2_w_hh', init, (3 * d, d)),
            'b_ih': self.param('rnn2_b_ih', init, (3 * d,)),
            'b_hh': self.param('rnn2_b_hh', init, (3 * d,)),
        }

    def __call__(self, x: jnp.ndarray, mels: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """Teacher-forced training forward (fatchord_version.py:132-169).

        x (B, T_seq) float wave input; mels (B, T_win, n_mels)
        time-major. Returns logits (B, T_seq, n_classes)."""
        mels_up, aux = self.upsample(mels, train)
        d = self.aux_dims
        a1 = aux[..., 0 * d:1 * d]
        a2 = aux[..., 1 * d:2 * d]
        a3 = aux[..., 2 * d:3 * d]
        a4 = aux[..., 3 * d:4 * d]

        h = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = h @ self.I_kernel + self.I_bias
        res = h
        h = rnn_ops.gru(self._rnn1, h)
        h = h + res
        res = h
        h = rnn_ops.gru(self._rnn2, jnp.concatenate([h, a2], axis=-1))
        h = h + res
        h = nn.relu(jnp.concatenate([h, a3], axis=-1)
                    @ self.fc1_kernel + self.fc1_bias)
        h = nn.relu(jnp.concatenate([h, a4], axis=-1)
                    @ self.fc2_kernel + self.fc2_bias)
        return h @ self.fc3_kernel + self.fc3_bias

    def upsample_cond(self, mels: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Conditioning for generation (eval-mode upsampling)."""
        return self.upsample(mels, train=False)

    def sample_scan(self, mels_up: jnp.ndarray, aux: jnp.ndarray,
                    key: jax.Array, greedy: bool = False,
                    weights_dtype=jnp.bfloat16) -> jnp.ndarray:
        """The AR sampling loop as one lax.scan
        (replaces fatchord_version.py:203-244).

        mels_up/aux (B, T, C); returns float samples (B, T) in [-1, 1].
        Loop weights are cast to `weights_dtype` (bfloat16 by default:
        halves the per-step HBM weight stream, measured 1.3x faster on
        TPU v5e with no audible effect on the categorical output —
        logits stay fp32). Pass jnp.float32 for bit-exact tests.
        """
        B, T, _ = mels_up.shape
        d = self.aux_dims
        a1 = aux[..., 0 * d:1 * d]
        a2 = aux[..., 1 * d:2 * d]
        a3 = aux[..., 2 * d:3 * d]
        a4 = aux[..., 3 * d:4 * d]

        # hoist every conditioning projection out of the loop (one big
        # MXU matmul each instead of T tiny ones)
        w_x = self.I_kernel[0]             # (rnn_dims,) for the sample
        I_pre = (jnp.concatenate([mels_up, a1], axis=-1)
                 @ self.I_kernel[1:] + self.I_bias)   # (B, T, rnn)

        wd = weights_dtype
        r2 = self._rnn2
        w_ih2_x = r2['w_ih'][:, :self.rnn_dims].astype(wd)
        w_ih2_a = r2['w_ih'][:, self.rnn_dims:]
        gi2_pre = a2 @ w_ih2_a.T + r2['b_ih']  # (B, T, 3H)

        fc1_k, fc1_b = self.fc1_kernel.astype(wd), self.fc1_bias
        fc1_pre = a3 @ self.fc1_kernel[self.rnn_dims:] + fc1_b
        fc2_k, fc2_b = self.fc2_kernel.astype(wd), self.fc2_bias
        fc2_pre = a4 @ self.fc2_kernel[self.fc_dims:] + fc2_b
        fc3_k, fc3_b = self.fc3_kernel.astype(wd), self.fc3_bias

        r1 = {k: (v.astype(wd) if k.startswith('w') else v)
              for k, v in self._rnn1.items()}
        r2 = {k: (v.astype(wd) if k.startswith('w') else v)
              for k, v in r2.items()}
        keys = jax.random.split(key, T)

        def step(carry, inp):
            x_prev, h1, h2 = carry
            I_pre_t, gi2_pre_t, fc1_pre_t, fc2_pre_t, k = inp

            xt = x_prev[:, None] * w_x[None, :] + I_pre_t
            gi1 = xt @ r1['w_ih'].T + r1['b_ih']
            h1 = rnn_ops.gru_cell_from_gi(r1, gi1, h1)

            x1 = xt + h1
            gi2 = x1 @ w_ih2_x.T + gi2_pre_t
            h2 = rnn_ops.gru_cell_from_gi(r2, gi2, h2)

            x2 = x1 + h2
            f1 = jax.nn.relu(x2 @ fc1_k[:self.rnn_dims] + fc1_pre_t)
            f2 = jax.nn.relu(f1 @ fc2_k[:self.fc_dims] + fc2_pre_t)
            logits = f2 @ fc3_k + fc3_b

            if self.mode == 'MOL':
                if greedy:
                    sample = greedy_from_discretized_mix_logistic(logits)
                else:
                    sample = sample_from_discretized_mix_logistic(logits, k)
                x_new = sample
            else:
                if greedy:
                    cls = jnp.argmax(logits, axis=-1)
                else:
                    cls = jax.random.categorical(k, logits, axis=-1)
                sample = 2.0 * cls.astype(jnp.float32) \
                    / (self.n_classes - 1.0) - 1.0
                x_new = sample
            return (x_new, h1, h2), sample

        carry0 = (jnp.zeros((B,)), jnp.zeros((B, self.rnn_dims)),
                  jnp.zeros((B, self.rnn_dims)))
        xs = (jnp.swapaxes(I_pre, 0, 1), jnp.swapaxes(gi2_pre, 0, 1),
              jnp.swapaxes(fc1_pre, 0, 1), jnp.swapaxes(fc2_pre, 0, 1),
              keys)
        _, samples = jax.lax.scan(step, carry0, xs)
        return jnp.swapaxes(samples, 0, 1)  # (B, T)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'WaveRNN':
        model_config = dict(config['vocoder']['model'])
        mode = model_config.pop('mode')
        return cls(bits=config['dsp']['bits'],
                   feat_dims=config['dsp']['num_mels'],
                   hop_length=config['dsp']['hop_length'],
                   sample_rate=config['dsp']['sample_rate'],
                   upsample_factors=tuple(
                       model_config.pop('upsample_factors')),
                   mode=mode, **model_config)


_GEN_JIT_CACHE: Dict = {}


# ------------------------------------------------------- fold / unfold

def pad_tensor(x: np.ndarray, pad: int, side: str = 'both') -> np.ndarray:
    """(B, T, C) zero pad in time (fatchord_version.py:282-292)."""
    b, t, c = x.shape
    total = t + 2 * pad if side == 'both' else t + pad
    padded = np.zeros((b, total, c), dtype=x.dtype)
    if side in ('before', 'both'):
        padded[:, pad:pad + t] = x
    else:
        padded[:, :t] = x
    return padded


def fold_indices(total_len: int, target: int, overlap: int
                 ) -> Tuple[np.ndarray, int]:
    """Static gather indices implementing fold_with_overlap: returns
    (idx (num_folds, target + 2*overlap), padded_len). Indices beyond
    total_len map to padded zeros."""
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    padded_len = total_len
    if remaining != 0:
        num_folds += 1
        padded_len = total_len + (target + 2 * overlap - remaining)
    starts = np.arange(num_folds) * (target + overlap)
    idx = starts[:, None] + np.arange(target + 2 * overlap)[None, :]
    return idx.astype(np.int32), padded_len


def fold_device(x, target: int, overlap: int):
    """Device-side fold: (1, T, C) jnp array -> (num_folds, L, C) via one
    gather; no host round-trip (the numpy fold_with_overlap stays for
    tests/parity)."""
    idx, padded_len = fold_indices(x.shape[1], target, overlap)
    if padded_len > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, padded_len - x.shape[1]), (0, 0)))
    return jnp.take(x[0], jnp.asarray(idx), axis=0)


def fold_with_overlap(x: np.ndarray, target: int, overlap: int
                      ) -> np.ndarray:
    """(1, T, C) -> (num_folds, target + 2*overlap, C)
    (fatchord_version.py:294-341)."""
    _, total_len, features = x.shape
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = pad_tensor(x, padding, side='after')
    folded = np.zeros((num_folds, target + 2 * overlap, features),
                      dtype=x.dtype)
    for i in range(num_folds):
        start = i * (target + overlap)
        folded[i] = x[0, start:start + target + 2 * overlap]
    return folded


def xfade_unfold_device(y: jnp.ndarray, overlap: int) -> jnp.ndarray:
    """Equal-power crossfade overlap-add on device, no scatter: lane i's
    tail ([target+overlap:]) overlaps lane i+1's head, so the unfold is
    a flatten of the first target+overlap samples plus a shifted add of
    the tails (traceable f32 version of xfade_and_unfold;
    fatchord_version.py:343-406)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    stride = target + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = jnp.linspace(-1.0, 1.0, fade_len)
    fade_in = jnp.concatenate([jnp.zeros(silence_len),
                               jnp.sqrt(0.5 * (1.0 + t))])
    fade_out = jnp.concatenate([jnp.ones(silence_len),
                                jnp.sqrt(0.5 * (1.0 - t))])

    y = y.at[:, :overlap].multiply(fade_in[None, :])
    y = y.at[:, -overlap:].multiply(fade_out[None, :])

    main = y[:, :stride].reshape(num_folds * stride)
    main = jnp.concatenate([main, jnp.zeros(overlap, y.dtype)])
    tails = jnp.pad(y[:, stride:], ((0, 0), (0, target)))
    tails = jnp.concatenate([jnp.zeros(stride, y.dtype),
                             tails.reshape(num_folds * stride)[:-target]])
    return main + tails


def vocode(model: 'WaveRNN', variables: Dict, mel: np.ndarray,
           target: Optional[int] = None, overlap: int = 550,
           mu_law: bool = True, seed: int = 0, greedy: bool = False,
           use_pallas: Optional[bool] = None,
           pcm16: bool = False) -> np.ndarray:
    """Fully-fused mel -> waveform vocoding: upsample, fold (gather),
    conditioning precomputes, AR sampling (Pallas kernel or lax.scan),
    mu-law decode, crossfade overlap-add, tail fade — ONE jitted XLA
    program per mel length, one device dispatch, one host fetch of the
    final audio. On a tunneled/remote TPU each separate dispatch+fetch
    costs ~25 ms round-trip, so the fused program is the serving path;
    `generate_wav` keeps the step-by-step version for parity tests.

    mel: (n_mels, T) or (T, n_mels). Returns float32 (wave_len,), or
    int16 PCM when `pcm16=True` — the conversion runs on device, which
    HALVES the device->host fetch (the dominant non-compute cost on a
    tunneled TPU: ~19 ms of a 60 ms 8.5 s-utterance vocode round-trip
    is the f32 result transfer).
    """
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        pallas_supported, sample_conditioned)

    mel = np.asarray(mel, dtype=np.float32)
    if mel.shape[0] == model.feat_dims and mel.shape[-1] != model.feat_dims:
        mel = mel.T
    n_frames = mel.shape[0]
    mu_law = mu_law if model.mode == 'RAW' else False
    if use_pallas is None:
        use_pallas = pallas_supported(model)
    if target is None:
        target = TARGET_TPU if use_pallas else TARGET_REFERENCE
    wave_len = (n_frames - 1) * model.hop_length

    cache_key = (model, 'vocode', n_frames, target, overlap, mu_law,
                 greedy, use_pallas, pcm16)
    run = _GEN_JIT_CACHE.get(cache_key)
    if run is None:
        def _run(variables, mel, seed):
            m = jnp.pad(mel[None], ((0, 0), (model.pad, model.pad),
                                    (0, 0)))
            mels_up, aux = model.apply(variables, m,
                                       method='upsample_cond')
            mels_f = fold_device(mels_up, target, overlap)
            aux_f = fold_device(aux, target, overlap)
            if use_pallas:
                samples = sample_conditioned(
                    model, variables['params'], mels_f, aux_f,
                    seed[None], greedy=greedy)
            else:
                samples = model.apply(variables, mels_f, aux_f,
                                      jax.random.PRNGKey(seed),
                                      method='sample_scan', greedy=greedy)
            wave = samples
            if mu_law:
                wave = DSP.decode_mu_law(wave, model.n_classes, False)
            wave = xfade_unfold_device(wave, overlap)
            wave = wave[:wave_len]
            # utterances shorter than the 20-frame fade get fully faded
            n_fade = min(20 * model.hop_length, wave_len)
            fade = jnp.linspace(1.0, 0.0, n_fade)
            wave = wave.at[wave_len - n_fade:].multiply(fade)
            if pcm16:
                wave = (jnp.clip(wave, -1.0, 1.0)
                        * 32767.0).astype(jnp.int16)
            return wave

        run = jax.jit(_run)
        _GEN_JIT_CACHE[cache_key] = run
    wav = run(variables, jnp.asarray(mel),
              jnp.asarray(seed, jnp.int32))
    return np.asarray(wav)


def build_vocode_program(model: 'WaveRNN', target: int, overlap: int,
                         mu_law: bool, greedy: bool = False,
                         use_pallas: bool = False, pcm16: bool = False):
    """The pure device core of batched vocoding: a jittable
    (variables, mel_b (B, T, n_mels), wave_lens (B,), seed ()) ->
    (B, total) waveform function with STATIC fold geometry — shared by
    `vocode_batch` (below) and the StableHLO export (utils/export.py),
    which serializes it fused behind the mel decoder."""
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        sample_conditioned)

    def _run(variables, mel_b, wave_lens, seed):
        B = mel_b.shape[0]
        m = jnp.pad(mel_b, ((0, 0), (model.pad, model.pad), (0, 0)))
        mels_up, aux = model.apply(variables, m,
                                   method='upsample_cond')
        idx, padded_len = fold_indices(mels_up.shape[1], target,
                                       overlap)
        if padded_len > mels_up.shape[1]:
            pad_t = padded_len - mels_up.shape[1]
            mels_up = jnp.pad(mels_up, ((0, 0), (0, pad_t), (0, 0)))
            aux = jnp.pad(aux, ((0, 0), (0, pad_t), (0, 0)))
        idx = jnp.asarray(idx)                     # (F, L)
        F, L = idx.shape
        mels_f = jnp.take(mels_up, idx, axis=1)    # (B, F, L, C)
        aux_f = jnp.take(aux, idx, axis=1)
        mels_f = mels_f.reshape(B * F, L, -1)
        aux_f = aux_f.reshape(B * F, L, -1)
        if use_pallas:
            samples = sample_conditioned(
                model, variables['params'], mels_f, aux_f,
                seed[None], greedy=greedy)
        else:
            samples = model.apply(variables, mels_f, aux_f,
                                  jax.random.PRNGKey(seed),
                                  method='sample_scan', greedy=greedy)
        wave = samples
        if mu_law:
            wave = DSP.decode_mu_law(wave, model.n_classes, False)
        wave = jax.vmap(xfade_unfold_device, in_axes=(0, None))(
            wave.reshape(B, F, L), overlap)        # (B, total)
        total = wave.shape[1]
        # per-utterance trim + terminal fade from the lengths array
        pos = jnp.arange(total)[None, :]
        wl = wave_lens[:, None].astype(jnp.float32)
        n_fade = jnp.float32(20 * model.hop_length)
        # matches vocode's linspace(1, 0, n_fade) tail exactly
        factor = jnp.clip((wl - 1.0 - pos.astype(jnp.float32))
                          / (n_fade - 1.0), 0.0, 1.0)
        wave = wave * factor * (pos < wave_lens[:, None])
        if pcm16:
            wave = (jnp.clip(wave, -1.0, 1.0)
                    * 32767.0).astype(jnp.int16)
        return wave

    return _run


def vocode_batch(model: 'WaveRNN', variables: Dict, mels,
                 target: Optional[int] = None, overlap: int = 550,
                 mu_law: bool = True, seed: int = 0, greedy: bool = False,
                 use_pallas: Optional[bool] = None, pcm16: bool = False,
                 frame_bucket: int = 64, mesh=None):
    """Serve MANY utterances in one fused device program (beyond the
    reference, which vocodes one utterance per call).

    Mels are padded to a common `frame_bucket` multiple, upsampled as a
    batch, each row folded with the same geometry, and ALL fold lanes
    packed into the sampling kernel together (lane-group batching in
    kernels/wavernn_sample.py handles >128 lanes). One dispatch and one
    host fetch amortize the per-call round-trip (~25 ms on a tunneled
    TPU) across the whole batch, and short utterances no longer leave
    kernel lanes idle. Per-lane results are independent, so outputs
    match per-utterance `vocode` calls (greedy mode exactly; sampled
    mode draws per-lane noise from shifted streams).

    mels: list of (n_mels, T_i) or (T_i, n_mels) arrays.
    Returns a list of per-utterance waveforms with exact lengths
    (float32, or int16 when pcm16=True).

    With `mesh` (a jax.sharding.Mesh with a 'data' axis), the
    utterance batch is sharded over the mesh's data axis via
    shard_map: each device vocodes its own slice of utterances (the
    whole pipeline, Pallas sampler included, runs per-shard), scaling
    serving throughput linearly over chips with no collectives in the
    hot path. The utterance count is padded up to a multiple of the
    data-axis size with silent dummies that are dropped from the
    result. Greedy outputs are identical to the unsharded path; in
    sampled mode each shard draws from a distinct noise stream.
    """
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        pallas_supported, sample_conditioned)

    prepped = []
    for mel in mels:
        mel = np.asarray(mel, dtype=np.float32)
        if mel.shape[0] == model.feat_dims \
                and mel.shape[-1] != model.feat_dims:
            mel = mel.T
        prepped.append(mel)
    n_requested = len(prepped)
    n_shard = 1
    if mesh is not None:
        n_shard = int(mesh.shape.get('data', 1))
    while len(prepped) % n_shard != 0:
        prepped.append(np.full((2, model.feat_dims), -4.0, np.float32))
    n_frames = [m.shape[0] for m in prepped]
    t_pad = ((max(n_frames) + frame_bucket - 1)
             // frame_bucket) * frame_bucket
    batch = np.zeros((len(prepped), t_pad, model.feat_dims), np.float32)
    for i, m in enumerate(prepped):
        batch[i, :m.shape[0]] = m

    mu_law = mu_law if model.mode == 'RAW' else False
    if use_pallas is None:
        use_pallas = pallas_supported(model)
    if target is None:
        target = TARGET_TPU if use_pallas else TARGET_REFERENCE
    wave_lens = np.asarray([(n - 1) * model.hop_length
                            for n in n_frames], np.int32)

    cache_key = (model, 'vocode_batch', len(prepped), t_pad, target,
                 overlap, mu_law, greedy, use_pallas, pcm16,
                 mesh if n_shard > 1 else None)
    run = _GEN_JIT_CACHE.get(cache_key)
    if run is None:
        _run = build_vocode_program(model, target=target, overlap=overlap,
                                    mu_law=mu_law, greedy=greedy,
                                    use_pallas=use_pallas, pcm16=pcm16)

        if n_shard > 1:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            def _sharded(variables, mel_b, wave_lens, seed):
                # decorrelate sampled-mode noise across shards; greedy
                # ignores the seed entirely, so greedy outputs stay
                # exactly equal to the unsharded program
                shard_seed = seed + jax.lax.axis_index('data') * 7919
                return _run(variables, mel_b, wave_lens, shard_seed)

            specs = P('data')
            run = jax.jit(shard_map(
                _sharded, mesh=mesh,
                in_specs=(P(), specs, specs, P()),
                out_specs=specs, check_vma=False))
        else:
            run = jax.jit(_run)
        _GEN_JIT_CACHE[cache_key] = run
    out = np.asarray(run(variables, jnp.asarray(batch),
                         jnp.asarray(wave_lens),
                         jnp.asarray(seed, jnp.int32)))
    return [out[i, :wave_lens[i]] for i in range(n_requested)]


def xfade_and_unfold(y: np.ndarray, target: int, overlap: int
                     ) -> np.ndarray:
    """(num_folds, target + 2*overlap) -> (total,) with equal-power
    crossfade (fatchord_version.py:343-406)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    silence = np.zeros(silence_len, dtype=np.float64)
    linear = np.ones(silence_len, dtype=np.float64)

    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.sqrt(0.5 * (1 + t))
    fade_out = np.sqrt(0.5 * (1 - t))
    fade_in = np.concatenate([silence, fade_in])
    fade_out = np.concatenate([linear, fade_out])

    y = y.astype(np.float64).copy()
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out

    unfolded = np.zeros(total_len, dtype=np.float64)
    for i in range(num_folds):
        start = i * (target + overlap)
        unfolded[start:start + target + 2 * overlap] += y[i]
    return unfolded


# Reference fold target (fatchord_version.py:190, tuned for one GPU
# stream) and the TPU-tuned value: the Pallas sampler is sequential-
# step-latency bound up to ~32 fold lanes, so shorter/wider folds are
# ~1.5x faster end to end (measured on v5e); overlap stays at the
# reference's 550-sample equal-power crossfade.
TARGET_REFERENCE = 11_000
TARGET_TPU = 2_750


def generate_wav(model: WaveRNN, variables: Dict, mel: np.ndarray,
                 batched: bool = True, target: Optional[int] = None,
                 overlap: int = 550, mu_law: bool = True,
                 seed: int = 0, use_pallas: Optional[bool] = None,
                 fused: Optional[bool] = None,
                 pcm16: bool = False) -> np.ndarray:
    """Full generation pipeline (fatchord_version.py:171-265): pad,
    upsample, fold, scan-sample, mu-law decode, crossfade-unfold,
    fade-out. `mel` is (n_mels, T) or (T, n_mels).

    use_pallas: run the fused Pallas sampling kernel
    (kernels/wavernn_sample.py) instead of the lax.scan sampler.
    Default auto: the kernel when supported (TPU + RAW/MOL +
    128-aligned dims), scan otherwise. `target=None` auto-selects the
    fold length: TARGET_TPU for the kernel, the reference's 11000
    otherwise.

    fused: delegate to `vocode` — the whole pipeline as ONE device
    program with a single host fetch (f32 crossfade instead of this
    path's f64 host crossfade). Default auto: on for batched TPU runs;
    the stepwise path stays for CPU and parity tests."""
    from forwardtacotron_tpu.dsp.audio import DSP

    if fused is None:
        fused = batched and jax.devices()[0].platform in ('tpu', 'axon')
    if fused and batched:
        return vocode(model, variables, mel, target=target, pcm16=pcm16,
                      overlap=overlap, mu_law=mu_law, seed=seed,
                      use_pallas=use_pallas)

    mel = np.asarray(mel, dtype=np.float32)
    if mel.shape[0] == model.feat_dims and mel.shape[-1] != model.feat_dims:
        mel = mel.T  # -> (T, n_mels)
    mel = mel[None]  # (1, T, M)

    mu_law = mu_law if model.mode == 'RAW' else False
    wave_len = (mel.shape[1] - 1) * model.hop_length

    mel = pad_tensor(mel, pad=model.pad, side='both')
    up_key = (model, 'upsample')
    if up_key not in _GEN_JIT_CACHE:
        _GEN_JIT_CACHE[up_key] = jax.jit(
            lambda v, m: model.apply(v, m, method='upsample_cond'))
    mels_up, aux = _GEN_JIT_CACHE[up_key](variables, jnp.asarray(mel))

    if use_pallas is None:
        from forwardtacotron_tpu.kernels.wavernn_sample import (
            pallas_supported)
        use_pallas = pallas_supported(model)
    if target is None:
        target = TARGET_TPU if use_pallas else TARGET_REFERENCE
    # stay device-resident: fold is a gather, sampling reads straight
    # from HBM — the only host transfers are the input mel and the
    # final audio
    if batched:
        mels_up = fold_device(mels_up, target, overlap)
        aux = fold_device(aux, target, overlap)
    if use_pallas:
        from forwardtacotron_tpu.kernels.wavernn_sample import (
            wavernn_sample_pallas)
        output = wavernn_sample_pallas(model, variables, mels_up, aux,
                                       seed=seed).astype(np.float64)
    else:
        key = jax.random.PRNGKey(seed)
        scan_key = (model, 'scan')
        if scan_key not in _GEN_JIT_CACHE:
            _GEN_JIT_CACHE[scan_key] = jax.jit(
                lambda v, m, a, k: model.apply(v, m, a, k,
                                               method='sample_scan'))
        samples = _GEN_JIT_CACHE[scan_key](variables, mels_up, aux, key)
        output = np.asarray(samples).astype(np.float64)

    if mu_law:
        output = DSP.decode_mu_law(output, model.n_classes, False)

    if batched:
        output = xfade_and_unfold(output, target, overlap)
    else:
        output = output[0]

    output = output[:wave_len]
    n_fade = min(20 * model.hop_length, len(output))
    fade_out = np.linspace(1, 0, n_fade)
    output[len(output) - n_fade:] *= fade_out
    if pcm16:  # host-side on the stepwise path; on-device in vocode
        output = (np.clip(output, -1.0, 1.0) * 32767.0).astype(np.int16)
    return output
