"""ForwardTacotron: non-autoregressive RNN mel synthesizer, TPU-native.

Re-design of models/forward_tacotron.py in the reference (ForwardTacotron
V2: CBHG encoder + duration/pitch/energy SeriesPredictors + pitch/energy
conditioning projections + LengthRegulator + BiLSTM decoder + CBHG
postnet). Differences from the reference that matter on TPU:

- time-major (B, T, C) layout everywhere; no channel transposes;
- LengthRegulator is a fixed-shape vectorized gather
  (ops/length_regulator.py) instead of ragged repeat_interleave;
- all recurrences are lax.scan kernels with MXU-batched input projections;
- inference runs fully jitted on padded static buckets. To keep numerics
  identical to the reference's exact-length execution, every conv /
  maxpool / GRU stage is masked at the true sequence boundary when
  `lengths` are provided (see CBHG masking in _masked_cbhg / the
  SeriesPredictor): a padded run then computes bit-equivalent values for
  all valid positions.

Structural parity (for weight conversion): module tree mirrors the
reference attribute names (embedding, prenet, pitch_pred, energy_pred,
dur_pred, pitch_proj, energy_proj, lstm, lin, postnet, post_proj);
see models/torch_compat.py for the state_dict mapping.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import (BatchNormConv, CBHG,
                                               TorchBiGRU, TorchBiLSTM)
from forwardtacotron_tpu.ops.length_regulator import length_regulate
from forwardtacotron_tpu.text.symbols import phonemes

PADDING_VALUE = -11.5129


def _time_mask(x: jnp.ndarray, lengths: Optional[jnp.ndarray],
               fill: float = 0.0) -> jnp.ndarray:
    if lengths is None:
        return x
    mask = jnp.arange(x.shape[1])[None, :, None] < lengths[:, None, None]
    return jnp.where(mask, x, fill)


class SeriesPredictor(nn.Module):
    """embed -> [conv5-relu-BN-dropout]x3 -> BiGRU -> Dense(1).

    Parity: models/forward_tacotron.py:14-55. `spk` (B, E) optionally
    conditions the predictor on a speaker embedding (beyond the
    single-speaker reference): projected to emb_dim and added to the
    token embeddings, so durations/pitch/energy become speaker-aware.
    """
    num_chars: int
    emb_dim: int = 64
    conv_dims: int = 256
    rnn_dims: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, alpha: float = 1.0,
                 train: bool = False,
                 lengths: Optional[jnp.ndarray] = None,
                 spk: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.emb_dim, name='embedding')(x)
        if spk is not None:
            h = h + nn.Dense(self.emb_dim, use_bias=False,
                             name='spk_proj')(spk)[:, None, :]
        h = _time_mask(h, lengths)
        for i in range(3):
            h = BatchNormConv(self.conv_dims, 5, name=f'conv_{i}')(h, train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = _time_mask(h, lengths)
        h = TorchBiGRU(self.rnn_dims, name='rnn')(h, lengths=lengths)
        h = nn.Dense(1, name='lin')(h)
        return h[..., 0] / alpha  # (B, T)


class ForwardTacotron(nn.Module):
    embed_dims: int = 256
    series_embed_dims: int = 64
    num_chars: int = len(phonemes)
    durpred_conv_dims: int = 256
    durpred_rnn_dims: int = 64
    durpred_dropout: float = 0.5
    pitch_conv_dims: int = 256
    pitch_rnn_dims: int = 128
    pitch_dropout: float = 0.5
    pitch_strength: float = 1.0
    energy_conv_dims: int = 256
    energy_rnn_dims: int = 64
    energy_dropout: float = 0.5
    energy_strength: float = 1.0
    rnn_dims: int = 512
    prenet_dims: int = 256
    prenet_k: int = 16
    postnet_num_highways: int = 4
    prenet_dropout: float = 0.5
    postnet_dims: int = 256
    postnet_k: int = 8
    prenet_num_highways: int = 4
    postnet_dropout: float = 0.0
    n_mels: int = 80
    # beyond-parity: multi-speaker conditioning. n_speakers == 1 (the
    # reference's single-speaker setting) creates NO extra parameters,
    # so reference-converted checkpoints load unchanged.
    n_speakers: int = 1
    speaker_embed_dims: int = 64

    def setup(self) -> None:
        self.embedding = nn.Embed(self.num_chars, self.embed_dims)
        self.prenet = CBHG(K=self.prenet_k, channels=self.prenet_dims,
                           proj_channels=[self.prenet_dims, self.embed_dims],
                           num_highways=self.prenet_num_highways,
                           dropout=self.prenet_dropout)
        self.dur_pred = SeriesPredictor(
            num_chars=self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.durpred_conv_dims, rnn_dims=self.durpred_rnn_dims,
            dropout=self.durpred_dropout)
        self.pitch_pred = SeriesPredictor(
            num_chars=self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.pitch_conv_dims, rnn_dims=self.pitch_rnn_dims,
            dropout=self.pitch_dropout)
        self.energy_pred = SeriesPredictor(
            num_chars=self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.energy_conv_dims, rnn_dims=self.energy_rnn_dims,
            dropout=self.energy_dropout)
        self.pitch_proj = nn.Conv(2 * self.prenet_dims, (3,),
                                  padding=((1, 1),))
        self.energy_proj = nn.Conv(2 * self.prenet_dims, (3,),
                                   padding=((1, 1),))
        self.lstm = TorchBiLSTM(self.rnn_dims)
        self.lin = nn.Dense(self.n_mels)
        self.postnet = CBHG(K=self.postnet_k, channels=self.postnet_dims,
                            proj_channels=[self.postnet_dims, self.n_mels],
                            num_highways=self.postnet_num_highways,
                            dropout=self.postnet_dropout)
        self.post_proj = nn.Dense(self.n_mels, use_bias=False)
        if self.n_speakers > 1:
            self.speaker_embedding = nn.Embed(self.n_speakers,
                                              self.speaker_embed_dims)
            self.speaker_proj = nn.Dense(2 * self.prenet_dims,
                                         use_bias=False)

    def _speaker_emb(self, x: jnp.ndarray,
                     speaker: Optional[jnp.ndarray]
                     ) -> Optional[jnp.ndarray]:
        """(B, E) speaker embedding, or None in single-speaker mode.
        A missing speaker id defaults to 0 so single-speaker call
        sites keep working against a multi-speaker model."""
        if self.n_speakers <= 1:
            return None
        if speaker is None:
            speaker = jnp.zeros((x.shape[0],), jnp.int32)
        return self.speaker_embedding(speaker.astype(jnp.int32))

    def _encode(self, x: jnp.ndarray, pitch: jnp.ndarray,
                energy: jnp.ndarray, train: bool,
                lengths: Optional[jnp.ndarray],
                spk_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Token encoder + pitch/energy conditioning. pitch/energy (B, T)."""
        h = self.embedding(x)
        h = _time_mask(h, lengths)
        h = self.prenet(h, train=train, lengths=lengths)
        pitch_proj = self.pitch_proj(_time_mask(pitch[..., None], lengths))
        h = h + pitch_proj * self.pitch_strength
        energy_proj = self.energy_proj(_time_mask(energy[..., None], lengths))
        h = h + energy_proj * self.energy_strength
        if spk_emb is not None:
            h = h + self.speaker_proj(spk_emb)[:, None, :]
        return h

    def _decode(self, h: jnp.ndarray, mel_lens: Optional[jnp.ndarray],
                train: bool, masked: bool = False,
                fast: bool = False) -> Dict[str, jnp.ndarray]:
        """BiLSTM main net + linear + CBHG postnet. h already expanded.

        masked=False reproduces the reference's teacher-forced batch path
        (padding flows through the postnet, like the torch model on padded
        batches); masked=True is the padded-exact inference path where
        every stage is cut at the true mel length so a static bucket
        computes the same values as an exact-length run. `fast` opts the
        inference path into the fused Pallas BiRNN kernels (bf16, no
        autodiff — never set during training).
        """
        y = self.lstm(h, lengths=mel_lens, pad_value=PADDING_VALUE,
                      fast=fast)
        mel = self.lin(y)
        post_in = _time_mask(mel, mel_lens) if masked else mel
        post = self.postnet(post_in, train=train,
                            lengths=mel_lens if masked else None,
                            fast=fast)
        mel_post = self.post_proj(post)
        return {'mel': mel, 'mel_post': mel_post}

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced training forward (reference
        forward_tacotron.py:184-242). batch: x (B,Tx) int, mel (B,Tm,M),
        mel_len (B,), dur (B,Tx), pitch (B,Tx), energy (B,Tx)."""
        x = batch['x']
        mel_len = batch['mel_len']
        max_t = batch['mel'].shape[1]
        spk_emb = self._speaker_emb(x, batch.get('speaker'))

        dur_hat = self.dur_pred(x, train=train, spk=spk_emb)
        pitch_hat = self.pitch_pred(x, train=train, spk=spk_emb)
        energy_hat = self.energy_pred(x, train=train, spk=spk_emb)

        h = self._encode(x, batch['pitch'], batch['energy'], train,
                         lengths=None, spk_emb=spk_emb)
        h, _ = length_regulate(h, batch['dur'], max_t=max_t)
        out = self._decode(h, mel_len, train)
        out.update(dur=dur_hat, pitch=pitch_hat, energy=energy_hat)
        return out

    def generate(self, x: jnp.ndarray, max_t: int, alpha: float = 1.0,
                 pitch_scale: float = 1.0, energy_scale: float = 1.0,
                 x_len: Optional[jnp.ndarray] = None,
                 speaker: Optional[jnp.ndarray] = None,
                 fast: bool = True) -> Dict[str, jnp.ndarray]:
        """Fully-jitted inference (reference .generate / .generate_jit,
        forward_tacotron.py:244-330). `max_t` is the static mel bucket;
        returned 'mel_len' gives the true generated length. `fast`
        selects the Pallas BiRNN kernels on TPU (see
        generate_from_series). `speaker` (B,) int ids select the voice
        in multi-speaker mode (ignored when n_speakers == 1)."""
        series = self.predict_series(x, alpha=alpha,
                                     pitch_scale=pitch_scale,
                                     energy_scale=energy_scale, x_len=x_len,
                                     speaker=speaker)
        out = self.generate_from_series(
            x, series['dur'], series['pitch'], series['energy'],
            max_t=max_t, x_len=x_len, speaker=speaker, fast=fast)
        out['dur'] = series['dur']
        return out

    def predict_series(self, x: jnp.ndarray, alpha: float = 1.0,
                       pitch_scale: float = 1.0, energy_scale: float = 1.0,
                       x_len: Optional[jnp.ndarray] = None,
                       speaker: Optional[jnp.ndarray] = None,
                       fused: Optional[bool] = None
                       ) -> Dict[str, jnp.ndarray]:
        """Predict dur/pitch/energy series. `fused=None` auto-selects the
        single-scan grouped-predictor path (predict_series_fused) for
        small batches, where sequential scan latency dominates."""
        from forwardtacotron_tpu.ops.rnn import FUSE_BIDIR_MAX_BATCH
        if fused is None:
            fused = (not self.is_initializing()
                     and x.shape[0] <= FUSE_BIDIR_MAX_BATCH)
        if fused and self._series_fusable() and not self.is_initializing():
            return self.predict_series_fused(
                x, alpha=alpha, pitch_scale=pitch_scale,
                energy_scale=energy_scale, x_len=x_len, speaker=speaker)
        spk_emb = self._speaker_emb(x, speaker)
        dur_hat = self.dur_pred(x, alpha=alpha, lengths=x_len, spk=spk_emb)
        dur_hat = self._dur_floor(x, dur_hat, x_len)
        pitch_hat = self.pitch_pred(x, lengths=x_len,
                                    spk=spk_emb) * pitch_scale
        energy_hat = self.energy_pred(x, lengths=x_len,
                                      spk=spk_emb) * energy_scale
        return {'dur': dur_hat, 'pitch': pitch_hat, 'energy': energy_hat}

    def _dur_floor(self, x: jnp.ndarray, dur_hat: jnp.ndarray,
                   x_len: Optional[jnp.ndarray]) -> jnp.ndarray:
        # degenerate-duration floor (forward_tacotron.py:254-255)
        if x_len is not None:
            dur_valid = jnp.where(
                jnp.arange(x.shape[1])[None] < x_len[:, None], dur_hat, 0.0)
        else:
            dur_valid = dur_hat
        total = jnp.sum(dur_valid.astype(jnp.int32))
        return jnp.where(total <= 0, jnp.full_like(dur_hat, 2.0), dur_hat)

    def _series_fusable(self) -> bool:
        return (self.durpred_conv_dims == self.pitch_conv_dims
                == self.energy_conv_dims)

    def predict_series_fused(self, x: jnp.ndarray, alpha: float = 1.0,
                             pitch_scale: float = 1.0,
                             energy_scale: float = 1.0,
                             x_len: Optional[jnp.ndarray] = None,
                             speaker: Optional[jnp.ndarray] = None
                             ) -> Dict[str, jnp.ndarray]:
        """All three SeriesPredictors in ONE scan (inference only).

        The unfused path pays 3 sequential BiGRU scans (dur, pitch,
        energy); here embeddings become one stacked gather, the conv
        stacks one grouped convolution, and the three BiGRUs a 6-group
        (3 predictors x 2 directions) grouped scan — identical math on
        the valid lanes (see ops/rnn.py:grouped_bigru), ~3x fewer
        sequential steps. Reads the same parameters the unfused modules
        own, so checkpoints are oblivious to which path runs.
        """
        from forwardtacotron_tpu.ops.rnn import grouped_bigru, pad_gru_gates
        preds = [self.dur_pred, self.pitch_pred, self.energy_pred]
        variables = [p.variables for p in preds]
        params = [v['params'] for v in variables]
        stats = [v['batch_stats'] for v in variables]
        G = 3
        conv_dims = self.durpred_conv_dims
        H = max(self.durpred_rnn_dims, self.pitch_rnn_dims,
                self.energy_rnn_dims)
        h_groups = [self.durpred_rnn_dims, self.pitch_rnn_dims,
                    self.energy_rnn_dims]

        # stacked embedding gather: (B, T, G*emb)
        table = jnp.concatenate([p['embedding']['embedding'] for p in params],
                                axis=-1)
        h = table[x]
        spk_emb = self._speaker_emb(x, speaker)
        if spk_emb is not None:
            # per-predictor spk_proj, concatenated to match the stacked
            # embedding layout — identical math to the unfused path
            add = jnp.concatenate(
                [spk_emb @ p['spk_proj']['kernel'] for p in params],
                axis=-1)
            h = h + add[:, None, :]
        h = _time_mask(h, x_len)

        # grouped conv stacks: conv5(no bias) -> relu -> BN(eval)
        for i in range(3):
            kernel = jnp.concatenate(
                [p[f'conv_{i}']['conv']['kernel'] for p in params], axis=-1)
            h = jax.lax.conv_general_dilated(
                h, kernel, window_strides=(1,), padding=((2, 2),),
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                feature_group_count=G)
            h = jax.nn.relu(h)
            scale = jnp.concatenate(
                [p[f'conv_{i}']['bnorm']['scale'] for p in params])
            bias = jnp.concatenate(
                [p[f'conv_{i}']['bnorm']['bias'] for p in params])
            mean = jnp.concatenate(
                [s[f'conv_{i}']['bnorm']['mean'] for s in stats])
            var = jnp.concatenate(
                [s[f'conv_{i}']['bnorm']['var'] for s in stats])
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            h = _time_mask(h, x_len)

        B, T = x.shape
        h = h.reshape(B, T, G, conv_dims)

        # 6-group fused BiGRU: weights padded per gate block to common H
        def stack(dir_name, key, pad_cols):
            ws = []
            for p, hg in zip(params, h_groups):
                w = pad_gru_gates(p['rnn'][dir_name][key], hg, H)
                if pad_cols and hg != H:
                    w = jnp.pad(w, ((0, 0), (0, H - hg)))
                ws.append(w)
            return jnp.stack(ws)

        w_ih = jnp.stack([stack('fwd', 'w_ih', False),
                          stack('bwd', 'w_ih', False)])   # (2, G, 3H, D)
        w_hh = jnp.stack([stack('fwd', 'w_hh', True),
                          stack('bwd', 'w_hh', True)])    # (2, G, 3H, H)
        b_ih = jnp.stack([stack('fwd', 'b_ih', False),
                          stack('bwd', 'b_ih', False)])
        b_hh = jnp.stack([stack('fwd', 'b_hh', False),
                          stack('bwd', 'b_hh', False)])
        from forwardtacotron_tpu.ops.rnn import _fast_kernel_ok
        if _fast_kernel_ok(x, H):
            # long inputs: the whole 6-group ensemble in one Pallas
            # kernel launch (kernels/birnn.py)
            from forwardtacotron_tpu.kernels.birnn import birnn_pallas
            y = birnn_pallas('gru', w_ih, w_hh, b_ih, b_hh, h,
                             lengths=x_len)
        else:
            y = grouped_bigru(w_ih, w_hh, b_ih, b_hh, h, lengths=x_len)

        # per-group output head: Dense((2Hg,) -> 1), zero-padded to H
        w_out, b_out = [], []
        for p, hg in zip(params, h_groups):
            k = p['lin']['kernel'][:, 0]                  # (2Hg,)
            w = jnp.stack([jnp.pad(k[:hg], (0, H - hg)),
                           jnp.pad(k[hg:], (0, H - hg))])  # (2, H)
            w_out.append(w)
            b_out.append(p['lin']['bias'][0])
        out = jnp.einsum('btgch,gch->btg', y, jnp.stack(w_out)) \
            + jnp.stack(b_out)

        dur_hat = self._dur_floor(x, out[..., 0] / alpha, x_len)
        return {'dur': dur_hat,
                'pitch': out[..., 1] * pitch_scale,
                'energy': out[..., 2] * energy_scale}

    def generate_from_series(self, x: jnp.ndarray, dur: jnp.ndarray,
                             pitch: jnp.ndarray, energy: jnp.ndarray,
                             max_t: int,
                             x_len: Optional[jnp.ndarray] = None,
                             speaker: Optional[jnp.ndarray] = None,
                             fast: bool = True) -> Dict[str, jnp.ndarray]:
        """Expand + decode. `fast=True` (default) uses the fused Pallas
        BiRNN kernels for the decoder/postnet recurrences on TPU (bf16,
        ~1e-3 mel error); pass fast=False for bit-parity with the scan
        path (e.g. golden-mel gates)."""
        h = self._encode(x, pitch, energy, train=False, lengths=x_len,
                         spk_emb=self._speaker_emb(x, speaker))
        if x_len is not None:
            dur = jnp.where(jnp.arange(x.shape[1])[None] < x_len[:, None],
                            dur, 0.0)
            h = _time_mask(h, x_len)
        h, mel_len = length_regulate(h, dur, max_t=max_t)
        out = self._decode(h, mel_len, train=False, masked=True, fast=fast)
        out.update(pitch=pitch, energy=energy, mel_len=mel_len)
        return out

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'ForwardTacotron':
        model_config = dict(config['forward_tacotron']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
