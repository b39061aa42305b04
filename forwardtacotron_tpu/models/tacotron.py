"""Tacotron teacher: autoregressive seq2seq with LSA attention.

Re-design of models/tacotron.py in the reference. Its only role in the
pipeline is producing attention matrices for duration extraction (and
optional GTA mels) — see SURVEY.md §1.4. TPU formulation:

- the reference's python `for t in range(0, steps, r)` decoder loop
  (tacotron.py:250-256) becomes a single `lax.scan` whose carry holds
  (attn GRU hidden, two LSTM hidden/cell pairs, context vector,
  cumulative + previous attention) — the LSA state that the reference
  keeps as module attributes (tacotron.py:75-97);
- teacher-forced prenet inputs for every step are gathered up front, so
  the scan body is pure matmul + attention;
- `generate` uses `lax.while_loop` with the same stop criterion (all
  output frames below stop_threshold after step 10, tacotron.py:312);
- zoneout (p=0.1) and prenet dropout use per-step PRNG keys threaded as
  scan inputs (train only).

Weight layout matches torch cell layouts for checkpoint conversion
(GRUCell/LSTMCell stacked gates — see ops/rnn.py and torch_compat.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import CBHG, torch_uniform_init
from forwardtacotron_tpu.ops import rnn as rnn_ops
from forwardtacotron_tpu.text.symbols import phonemes

MAX_R = 20  # tacotron.py:105


class PreNet(nn.Module):
    fc1_dims: int = 256
    fc2_dims: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.fc1_dims, name='fc1')(x))
        if train and rng is not None:
            k1, rng = jax.random.split(rng)
            keep = jax.random.bernoulli(k1, 1 - self.dropout, x.shape)
            x = jnp.where(keep, x / (1 - self.dropout), 0.0)
        x = nn.relu(nn.Dense(self.fc2_dims, name='fc2')(x))
        if train and rng is not None:
            keep = jax.random.bernoulli(rng, 1 - self.dropout, x.shape)
            x = jnp.where(keep, x / (1 - self.dropout), 0.0)
        return x


class Encoder(nn.Module):
    embed_dims: int
    num_chars: int
    cbhg_channels: int
    K: int
    num_highways: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 prenet_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.embed_dims, name='embedding')(x)
        h = PreNet(name='pre_net')(h, train=train, rng=prenet_rng)
        return CBHG(K=self.K, channels=self.cbhg_channels,
                    proj_channels=[self.cbhg_channels, self.cbhg_channels],
                    num_highways=self.num_highways, name='cbhg')(h, train)


def _cell_params(module: nn.Module, name: str, n_gates: int, in_dim: int,
                 hidden: int) -> Dict[str, jnp.ndarray]:
    bound = 1.0 / (hidden ** 0.5)
    init = torch_uniform_init(bound)
    return {
        'w_ih': module.param(f'{name}_w_ih', init, (n_gates * hidden, in_dim)),
        'w_hh': module.param(f'{name}_w_hh', init, (n_gates * hidden, hidden)),
        'b_ih': module.param(f'{name}_b_ih', init, (n_gates * hidden,)),
        'b_hh': module.param(f'{name}_b_hh', init, (n_gates * hidden,)),
    }


class Tacotron(nn.Module):
    embed_dims: int = 256
    num_chars: int = len(phonemes)
    encoder_dims: int = 128
    decoder_dims: int = 256
    n_mels: int = 80
    postnet_dims: int = 128
    encoder_k: int = 16
    lstm_dims: int = 512
    postnet_k: int = 8
    num_highways: int = 4
    dropout: float = 0.5
    stop_threshold: float = -11.0
    # beyond-parity multi-speaker (matches the students' contract,
    # models/forward_tacotron.py): n_speakers == 1 adds NO parameters
    # so reference-converted checkpoints load unchanged.
    n_speakers: int = 1
    speaker_embed_dims: int = 64

    def setup(self) -> None:
        self.encoder = Encoder(self.embed_dims, self.num_chars,
                               self.encoder_dims, self.encoder_k,
                               self.num_highways, self.dropout)
        self.encoder_proj = nn.Dense(self.decoder_dims, use_bias=False)
        if self.n_speakers > 1:
            self.speaker_embedding = nn.Embed(self.n_speakers,
                                              self.speaker_embed_dims)
            # projected onto the encoder output (2*encoder_dims wide)
            self.speaker_proj = nn.Dense(2 * self.encoder_dims,
                                         use_bias=False)
        # decoder pieces (reference Decoder, tacotron.py:102-174)
        self.dec_prenet = PreNet()
        # LSA (tacotron.py:65-99)
        self.lsa_conv = nn.Conv(32, (31,), padding=((15, 15),),
                                use_bias=False)
        self.lsa_L = nn.Dense(self.decoder_dims)
        self.lsa_W = nn.Dense(self.decoder_dims)
        self.lsa_v = nn.Dense(1, use_bias=False)
        self.rnn_input = nn.Dense(self.lstm_dims)
        self.mel_proj = nn.Dense(self.n_mels * MAX_R, use_bias=False)
        self.postnet = CBHG(K=self.postnet_k, channels=self.postnet_dims,
                            proj_channels=[256, self.n_mels],
                            num_highways=self.num_highways)
        self.post_proj = nn.Dense(self.n_mels, use_bias=False)
        self._attn_rnn = _cell_params(
            self, 'attn_rnn', 3,
            self.decoder_dims + self.decoder_dims // 2, self.decoder_dims)
        self._res_rnn1 = _cell_params(self, 'res_rnn1', 4, self.lstm_dims,
                                      self.lstm_dims)
        self._res_rnn2 = _cell_params(self, 'res_rnn2', 4, self.lstm_dims,
                                      self.lstm_dims)

    def decoder_cells(self) -> Tuple[Dict, Dict, Dict]:
        return self._attn_rnn, self._res_rnn1, self._res_rnn2

    def _condition_encoder(self, encoder_seq: jnp.ndarray,
                           speaker) -> jnp.ndarray:
        """Add the projected speaker embedding to the encoder output
        (no-op when n_speakers == 1); missing ids default to 0 so
        single-speaker call sites work against multi-speaker models."""
        if self.n_speakers <= 1:
            return encoder_seq
        if speaker is None:
            speaker = jnp.zeros((encoder_seq.shape[0],), jnp.int32)
        emb = self.speaker_embedding(speaker.astype(jnp.int32))
        return encoder_seq + self.speaker_proj(emb)[:, None, :]

    def _lsa_scores(self, encoder_seq_proj: jnp.ndarray, query: jnp.ndarray,
                    cumulative: jnp.ndarray, prev_attn: jnp.ndarray
                    ) -> jnp.ndarray:
        """Location-sensitive attention (tacotron.py:81-99)."""
        processed_query = self.lsa_W(query)[:, None, :]       # (B,1,D)
        location = jnp.stack([cumulative, prev_attn], axis=-1)  # (B,T,2)
        processed_loc = self.lsa_L(self.lsa_conv(location))   # (B,T,D)
        u = self.lsa_v(jnp.tanh(processed_query + encoder_seq_proj
                                + processed_loc))[..., 0]     # (B,T)
        return jax.nn.softmax(u, axis=1)

    def _decoder_step(self, cells, encoder_seq, encoder_seq_proj,
                      prenet_out, carry, train: bool,
                      rng: Optional[jax.Array]):
        """One decoder step. `prenet_out` is the already-computed PreNet
        output for this step — with teacher forcing the PreNet has no
        recurrence, so it runs over the whole sequence as one batched
        matmul before the scan instead of per step."""
        attn_cell, rnn1_cell, rnn2_cell = cells
        (attn_h, r1_h, r1_c, r2_h, r2_c, context, cumulative,
         prev_attn) = carry

        if rng is not None:
            k_z1, k_z2 = jax.random.split(rng, 2)
        else:
            k_z1 = k_z2 = None

        attn_rnn_in = jnp.concatenate([context, prenet_out], axis=-1)
        attn_h = rnn_ops.gru_cell(attn_cell, attn_rnn_in, attn_h)

        scores = self._lsa_scores(encoder_seq_proj, attn_h, cumulative,
                                  prev_attn)
        prev_attn = scores
        cumulative = cumulative + scores

        context = jnp.einsum('bt,btc->bc', scores, encoder_seq)
        x = jnp.concatenate([context, attn_h], axis=-1)
        x = self.rnn_input(x)

        r1_h_next, r1_c = rnn_ops.lstm_cell(rnn1_cell, x, (r1_h, r1_c))
        if train and k_z1 is not None:
            m = jax.random.bernoulli(k_z1, 0.1, r1_h.shape)
            r1_h = jnp.where(m, r1_h, r1_h_next)
        else:
            r1_h = r1_h_next
        x = x + r1_h

        r2_h_next, r2_c = rnn_ops.lstm_cell(rnn2_cell, x, (r2_h, r2_c))
        if train and k_z2 is not None:
            m = jax.random.bernoulli(k_z2, 0.1, r2_h.shape)
            r2_h = jnp.where(m, r2_h, r2_h_next)
        else:
            r2_h = r2_h_next
        x = x + r2_h

        mels = self.mel_proj(x)  # (B, n_mels * MAX_R)
        carry = (attn_h, r1_h, r1_c, r2_h, r2_c, context, cumulative,
                 prev_attn)
        return mels, scores, carry

    def _init_carry(self, B: int, Tx: int, dtype=jnp.float32):
        z = lambda *s: jnp.zeros(s, dtype)
        return (z(B, self.decoder_dims), z(B, self.lstm_dims),
                z(B, self.lstm_dims), z(B, self.lstm_dims),
                z(B, self.lstm_dims), z(B, self.decoder_dims),
                z(B, Tx), z(B, Tx))

    def __call__(self, x: jnp.ndarray, m: jnp.ndarray, r: int,
                 train: bool = False,
                 rng: Optional[jax.Array] = None,
                 speaker: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Teacher-forced forward (tacotron.py:216-270).

        x (B, Tx) int tokens; m (B, T_mel, n_mels) time-major, T_mel a
        multiple of the static reduction factor r. `speaker` (B,) int
        ids condition the encoder in multi-speaker mode. Returns
        (mel_out (B, T_mel, n_mels), linear_post (B, T_mel, n_mels),
        attention (B, T_mel // r, Tx)).
        """
        B, Tx = x.shape
        T_mel = m.shape[1]
        assert T_mel % r == 0, 'mel length must be a multiple of r'
        steps = T_mel // r

        if rng is not None:
            enc_rng, dec_rng = jax.random.split(rng)
        else:
            enc_rng = dec_rng = None
        encoder_seq = self.encoder(x, train=train, prenet_rng=enc_rng)
        encoder_seq = self._condition_encoder(encoder_seq, speaker)
        encoder_seq_proj = self.encoder_proj(encoder_seq)

        cells = self.decoder_cells()

        # teacher-forced prenet inputs: go frame, then m[:, t-1] for
        # t = r, 2r, ... (tacotron.py:251); the PreNet itself runs over
        # the whole sequence in one pass (no recurrence)
        go = jnp.zeros((B, 1, self.n_mels), m.dtype)
        prev_idx = jnp.arange(1, steps) * r - 1
        prenet_seq = jnp.concatenate([go, m[:, prev_idx]], axis=1)
        if dec_rng is not None:
            pre_rng, dec_rng = jax.random.split(dec_rng)
        else:
            pre_rng = None
        prenet_out_seq = self.dec_prenet(prenet_seq, train=train,
                                         rng=pre_rng)

        if dec_rng is not None:
            step_keys = jax.random.split(dec_rng, steps)
        else:
            step_keys = jnp.zeros((steps, 2), jnp.uint32)

        def step(carry, inp):
            prenet_out, key = inp
            mels, scores, carry = self._decoder_step(
                cells, encoder_seq, encoder_seq_proj, prenet_out, carry,
                train, key if train else None)
            return carry, (mels, scores)

        carry0 = self._init_carry(B, Tx, m.dtype)
        # materialize decoder params outside lax.scan (dead code after
        # init; avoids creating flax variables inside the scan trace)
        _ = self._decoder_step(cells, encoder_seq, encoder_seq_proj,
                               prenet_out_seq[:, 0], carry0, False, None)
        _, (mels, scores) = jax.lax.scan(
            step, carry0, (jnp.swapaxes(prenet_out_seq, 0, 1), step_keys))

        # (steps, B, n_mels*MAX_R) -> (B, steps*r, n_mels)
        mels = jnp.swapaxes(mels, 0, 1)
        mels = mels.reshape(B, steps, self.n_mels, MAX_R)[..., :r]
        mel_out = jnp.swapaxes(mels, 2, 3).reshape(B, steps * r, self.n_mels)

        post = self.postnet(mel_out, train=train)
        linear = self.post_proj(post)

        attn = jnp.swapaxes(scores, 0, 1)  # (B, steps, Tx)
        return mel_out, linear, attn

    def generate(self, x: jnp.ndarray, steps: int = 2000, r: int = 1,
                 speaker: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
        """Free-running inference with the reference's stop criterion
        (all frames < stop_threshold and t > 10, tacotron.py:312).
        Returns (mel (B,steps*r? trimmed by caller), linear, attn,
        n_valid_steps)."""
        B, Tx = x.shape
        assert steps % r == 0
        n_steps = steps // r
        encoder_seq = self.encoder(x, train=False)
        encoder_seq = self._condition_encoder(encoder_seq, speaker)
        encoder_seq_proj = self.encoder_proj(encoder_seq)
        cells = self.decoder_cells()

        mel_buf = jnp.zeros((B, n_steps, self.n_mels * MAX_R))
        attn_buf = jnp.zeros((B, n_steps, Tx))

        _ = self._decoder_step(
            cells, encoder_seq, encoder_seq_proj,
            self.dec_prenet(jnp.zeros((B, self.n_mels)), train=False),
            self._init_carry(B, Tx), False, None)

        def cond(state):
            t, done, *_ = state
            return jnp.logical_and(t < n_steps, jnp.logical_not(done))

        def body(state):
            t, done, prenet_in, carry, mel_buf, attn_buf = state
            prenet_out = self.dec_prenet(prenet_in, train=False)
            mels, scores, carry = self._decoder_step(
                cells, encoder_seq, encoder_seq_proj, prenet_out, carry,
                train=False, rng=None)
            mel_buf = jax.lax.dynamic_update_slice_in_dim(
                mel_buf, mels[:, None, :], t, axis=1)
            attn_buf = jax.lax.dynamic_update_slice_in_dim(
                attn_buf, scores[:, None, :], t, axis=1)
            frames = mels.reshape(B, self.n_mels, MAX_R)[..., :r]
            prenet_in = frames[..., -1]  # last frame feeds next step
            silent = jnp.all(frames < self.stop_threshold)
            done = jnp.logical_and(silent, (t + 1) * r > 10)
            return (t + 1, done, prenet_in, carry, mel_buf, attn_buf)

        state0 = (jnp.asarray(0), jnp.asarray(False),
                  jnp.zeros((B, self.n_mels)), self._init_carry(B, Tx),
                  mel_buf, attn_buf)
        t_end, _, _, _, mel_buf, attn_buf = jax.lax.while_loop(
            cond, body, state0)

        mels = mel_buf.reshape(B, n_steps, self.n_mels, MAX_R)[..., :r]
        mel_out = jnp.swapaxes(mels, 2, 3).reshape(B, n_steps * r,
                                                   self.n_mels)
        post = self.postnet(mel_out, train=False)
        linear = self.post_proj(post)
        return mel_out, linear, attn_buf, t_end * r

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'Tacotron':
        model_config = dict(config['tacotron']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
