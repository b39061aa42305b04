"""FastPitch: transformer-based non-AR mel synthesizer.

Re-design of models/fast_pitch.py in the reference: FFT blocks
(self-attention + two convs + layernorms) for prenet/postnet and the
duration/pitch/energy SeriesPredictors, the same pitch/energy
conditioning projections and LengthRegulator as ForwardTacotron.
Time-major (B, T, C) layout; attention uses a key-padding mask derived
from pad tokens (reference make_token_len_mask, fast_pitch.py:43-44) or
mel lengths (fast_pitch.py:47-51). Parameter layout converts one-to-one
from torch (in_proj packed qkv for MultiheadAttention).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from forwardtacotron_tpu.ops.length_regulator import length_regulate
from forwardtacotron_tpu.text.symbols import phonemes

PADDING_VALUE = -11.5129


def positional_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible self-attention
    (packed qkv in_proj + out_proj, scaled dot product, key padding)."""
    d_model: int
    n_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.n_heads
        Dh = D // H
        bound = 1.0 / (D ** 0.5)

        def xavier(key, shape, dtype=jnp.float32):
            limit = (6.0 / (shape[0] + shape[-1])) ** 0.5
            return jax.random.uniform(key, shape, dtype, -limit, limit)

        in_proj_w = self.param('in_proj_weight', xavier, (3 * D, D))
        in_proj_b = self.param('in_proj_bias', nn.initializers.zeros,
                               (3 * D,))
        qkv = x @ in_proj_w.T + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k) / jnp.sqrt(Dh)
        if key_padding_mask is not None:
            # True = padded (torch convention)
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name='out_proj',
                        kernel_init=xavier)(out)


class FFTBlock(nn.Module):
    d_model: int
    n_heads: int
    conv1_kernel: int
    conv2_kernel: int
    d_fft: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 train: bool = False, masked: bool = False) -> jnp.ndarray:
        """masked=True zeroes padded positions before the conv path so a
        padded static bucket computes exactly what an exact-length run
        would (inference); masked=False keeps the reference's training
        behavior where padded positions flow through the convs."""
        seq_len = x.shape[1]
        attn = MultiheadSelfAttention(self.d_model, self.n_heads,
                                      self.dropout, name='self_attn')(
            x, key_padding_mask, train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name='norm1')(x)

        conv_in = x
        if masked and key_padding_mask is not None:
            conv_in = jnp.where(key_padding_mask[..., None], 0.0, x)
        h = nn.Conv(self.d_fft, (self.conv1_kernel,),
                    padding=(((self.conv1_kernel // 2,) * 2,)),
                    name='conv1')(conv_in)[:, :seq_len]
        h = nn.relu(h)
        if masked and key_padding_mask is not None:
            h = jnp.where(key_padding_mask[..., None], 0.0, h)
        h = nn.Conv(self.d_model, (self.conv2_kernel,),
                    padding=(((self.conv2_kernel // 2,) * 2,)),
                    name='conv2')(h)[:, :seq_len]
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name='norm2')(x)


class ForwardTransformer(nn.Module):
    d_model: int
    d_fft: int
    layers: int
    heads: int
    conv1_kernel: int
    conv2_kernel: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 train: bool = False, masked: bool = False) -> jnp.ndarray:
        scale = self.param('pos_scale', nn.initializers.ones, (1,))
        pe = jnp.asarray(positional_table(self.d_model))
        x = x + scale * pe[:x.shape[1]]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.layers):
            x = FFTBlock(self.d_model, self.heads, self.conv1_kernel,
                         self.conv2_kernel, self.d_fft, self.dropout,
                         name=f'layer_{i}')(x, key_padding_mask, train,
                                            masked)
        return nn.LayerNorm(epsilon=1e-5, name='norm')(x)


class SeriesPredictor(nn.Module):
    num_chars: int
    d_model: int
    n_heads: int
    d_fft: int
    layers: int
    conv1_kernel: int
    conv2_kernel: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 alpha: float = 1.0, train: bool = False,
                 masked: bool = False,
                 spk: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.d_model, name='embedding')(x)
        if spk is not None:
            h = h + nn.Dense(self.d_model, use_bias=False,
                             name='spk_proj')(spk)[:, None, :]
        if masked and key_padding_mask is not None:
            h = jnp.where(key_padding_mask[..., None], 0.0, h)
        h = ForwardTransformer(self.d_model, self.d_fft, self.layers,
                               self.n_heads, self.conv1_kernel,
                               self.conv2_kernel, self.dropout,
                               name='transformer')(h, key_padding_mask,
                                                   train, masked)
        h = nn.Dense(1, name='lin')(h)
        return h[..., 0] / alpha


class FastPitch(nn.Module):
    num_chars: int = len(phonemes)
    durpred_dropout: float = 0.5
    durpred_d_model: int = 128
    durpred_n_heads: int = 2
    durpred_layers: int = 4
    durpred_d_fft: int = 128
    pitch_dropout: float = 0.5
    pitch_d_model: int = 128
    pitch_n_heads: int = 2
    pitch_layers: int = 4
    pitch_d_fft: int = 128
    energy_dropout: float = 0.5
    energy_d_model: int = 128
    energy_n_heads: int = 2
    energy_layers: int = 4
    energy_d_fft: int = 128
    pitch_strength: float = 1.0
    energy_strength: float = 1.0
    d_model: int = 256
    conv1_kernel: int = 9
    conv2_kernel: int = 1
    prenet_layers: int = 4
    prenet_heads: int = 2
    prenet_fft: int = 1024
    prenet_dropout: float = 0.1
    postnet_layers: int = 4
    postnet_heads: int = 2
    postnet_fft: int = 1024
    postnet_dropout: float = 0.1
    n_mels: int = 80
    # beyond-parity: multi-speaker conditioning (see forward_tacotron.py);
    # n_speakers == 1 creates no extra parameters.
    n_speakers: int = 1
    speaker_embed_dims: int = 64

    def setup(self) -> None:
        self.embedding = nn.Embed(self.num_chars, self.d_model)
        self.dur_pred = SeriesPredictor(
            self.num_chars, self.durpred_d_model, self.durpred_n_heads,
            self.durpred_d_fft, self.durpred_layers, self.conv1_kernel,
            self.conv2_kernel, self.durpred_dropout)
        self.pitch_pred = SeriesPredictor(
            self.num_chars, self.pitch_d_model, self.pitch_n_heads,
            self.pitch_d_fft, self.pitch_layers, self.conv1_kernel,
            self.conv2_kernel, self.pitch_dropout)
        self.energy_pred = SeriesPredictor(
            self.num_chars, self.energy_d_model, self.energy_n_heads,
            self.energy_d_fft, self.energy_layers, self.conv1_kernel,
            self.conv2_kernel, self.energy_dropout)
        self.prenet = ForwardTransformer(
            self.d_model, self.prenet_fft, self.prenet_layers,
            self.prenet_heads, self.conv1_kernel, self.conv2_kernel,
            self.prenet_dropout)
        self.postnet = ForwardTransformer(
            self.d_model, self.postnet_fft, self.postnet_layers,
            self.postnet_heads, self.conv1_kernel, self.conv2_kernel,
            self.postnet_dropout)
        self.pitch_proj = nn.Conv(self.d_model, (3,), padding=((1, 1),))
        self.energy_proj = nn.Conv(self.d_model, (3,), padding=((1, 1),))
        self.lin = nn.Dense(self.n_mels)
        if self.n_speakers > 1:
            self.speaker_embedding = nn.Embed(self.n_speakers,
                                              self.speaker_embed_dims)
            self.speaker_proj = nn.Dense(self.d_model, use_bias=False)

    def _speaker_emb(self, x: jnp.ndarray,
                     speaker: Optional[jnp.ndarray]
                     ) -> Optional[jnp.ndarray]:
        """(B, E) speaker embedding, or None in single-speaker mode."""
        if self.n_speakers <= 1:
            return None
        if speaker is None:
            speaker = jnp.zeros((x.shape[0],), jnp.int32)
        return self.speaker_embedding(speaker.astype(jnp.int32))

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward (fast_pitch.py:242-284)."""
        x = batch['x']
        mel_len = batch['mel_len']
        max_t = batch['mel'].shape[1]
        pad_mask = x == 0  # token pad mask (fast_pitch.py:43-44)
        spk_emb = self._speaker_emb(x, batch.get('speaker'))

        dur_hat = self.dur_pred(x, pad_mask, train=train, spk=spk_emb)
        pitch_hat = self.pitch_pred(x, pad_mask, train=train, spk=spk_emb)
        energy_hat = self.energy_pred(x, pad_mask, train=train, spk=spk_emb)

        h = self.embedding(x)
        if spk_emb is not None:
            h = h + self.speaker_proj(spk_emb)[:, None, :]
        h = self.prenet(h, pad_mask, train=train)
        h = h + self.pitch_proj(batch['pitch'][..., None]) \
            * self.pitch_strength
        h = h + self.energy_proj(batch['energy'][..., None]) \
            * self.energy_strength

        h, _ = length_regulate(h, batch['dur'], max_t=max_t)

        mel_pad_mask = jnp.arange(max_t)[None, :] >= mel_len[:, None]
        h = self.postnet(h, mel_pad_mask, train=train)
        mel = self.lin(h)

        # reference pads frames beyond the batch-max LR length with the
        # padding value and returns the SAME tensor for mel/mel_post
        # (fast_pitch.py:280-284, 305-308); per-item frames between
        # mel_len and the batch max keep their postnet values.
        max_total = jnp.max(mel_len)
        mask = jnp.arange(max_t)[None, :, None] < max_total
        mel = jnp.where(mask, mel, PADDING_VALUE)
        return {'mel': mel, 'mel_post': mel, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def predict_series(self, x: jnp.ndarray, alpha: float = 1.0,
                       pitch_scale: float = 1.0, energy_scale: float = 1.0,
                       x_len: Optional[jnp.ndarray] = None,
                       speaker: Optional[jnp.ndarray] = None
                       ) -> Dict[str, jnp.ndarray]:
        pad_mask = x == 0
        if x_len is not None:
            pad_mask = jnp.arange(x.shape[1])[None, :] >= x_len[:, None]
        spk_emb = self._speaker_emb(x, speaker)
        dur_hat = self.dur_pred(x, pad_mask, alpha=alpha, masked=True,
                                spk=spk_emb)
        dur_valid = jnp.where(pad_mask, 0.0, dur_hat)
        total = jnp.sum(dur_valid.astype(jnp.int32))
        dur_hat = jnp.where(total <= 0, jnp.full_like(dur_hat, 2.0), dur_hat)
        pitch_hat = self.pitch_pred(x, pad_mask, masked=True,
                                    spk=spk_emb) * pitch_scale
        energy_hat = self.energy_pred(x, pad_mask, masked=True,
                                      spk=spk_emb) * energy_scale
        return {'dur': dur_hat, 'pitch': pitch_hat, 'energy': energy_hat}

    def generate_from_series(self, x: jnp.ndarray, dur: jnp.ndarray,
                             pitch: jnp.ndarray, energy: jnp.ndarray,
                             max_t: int,
                             x_len: Optional[jnp.ndarray] = None,
                             speaker: Optional[jnp.ndarray] = None
                             ) -> Dict[str, jnp.ndarray]:
        pad_mask = x == 0
        if x_len is not None:
            pad_mask = jnp.arange(x.shape[1])[None, :] >= x_len[:, None]
        h = self.embedding(x)
        spk_emb = self._speaker_emb(x, speaker)
        if spk_emb is not None:
            h = h + self.speaker_proj(spk_emb)[:, None, :]
        h = jnp.where(pad_mask[..., None], 0.0, h)
        h = self.prenet(h, pad_mask, train=False, masked=True)
        h = h + self.pitch_proj(
            jnp.where(pad_mask, 0.0, pitch)[..., None]) * self.pitch_strength
        h = h + self.energy_proj(
            jnp.where(pad_mask, 0.0, energy)[..., None]) \
            * self.energy_strength
        dur = jnp.where(pad_mask, 0.0, dur)
        h = jnp.where(pad_mask[..., None], 0.0, h)
        h, mel_len = length_regulate(h, dur, max_t=max_t)
        mel_pad_mask = jnp.arange(max_t)[None, :] >= mel_len[:, None]
        h = self.postnet(h, mel_pad_mask, train=False, masked=True)
        mel = self.lin(h)
        return {'mel': mel, 'mel_post': mel, 'pitch': pitch,
                'energy': energy, 'mel_len': mel_len}

    def generate(self, x: jnp.ndarray, max_t: int, alpha: float = 1.0,
                 pitch_scale: float = 1.0, energy_scale: float = 1.0,
                 x_len: Optional[jnp.ndarray] = None,
                 speaker: Optional[jnp.ndarray] = None,
                 **_ignored) -> Dict[str, jnp.ndarray]:
        series = self.predict_series(x, alpha=alpha,
                                     pitch_scale=pitch_scale,
                                     energy_scale=energy_scale, x_len=x_len,
                                     speaker=speaker)
        out = self.generate_from_series(x, series['dur'], series['pitch'],
                                        series['energy'], max_t=max_t,
                                        x_len=x_len, speaker=speaker)
        out['dur'] = series['dur']
        return out

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'FastPitch':
        model_config = dict(config['fast_pitch']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
