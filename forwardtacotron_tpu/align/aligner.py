"""Teacher-free neural aligner: text/mel encoders + monotonic
forward-sum alignment (RAD-TTS / one-TTS-aligner family).

Beyond the reference: there, phoneme durations can only come from an
autoregressive Tacotron teacher trained for ~40k steps and decoded at
batch size 1 (reference train_tacotron.py:129-175). This module learns
the text<->mel alignment directly — a pair of convolutional encoders
scores every (frame, phoneme) pair, the forward-sum loss maximizes the
likelihood of all monotonic alignment paths (a CTC-style DP expressed
as one `lax.scan`), and Viterbi decoding extracts hard durations — so
`train_forward.py` can run without ever training a teacher.

TPU-first design notes:
- Everything is static-shape and batched: the DP scans over the padded
  frame axis with per-item masking, so one jitted call aligns a whole
  bucket batch (the reference teacher is forced to bs=1 here).
- The distance matrix is one (B, T, D) x (B, N, D) matmul-shaped
  contraction on the MXU; the DP is O(T) sequential but each step is a
  cheap (B, N) vector op on the VPU.
- Viterbi backtracking also runs on device: the forward pass records
  stay/advance choices, a reverse scan walks them, and durations are a
  one-hot segment-sum — no host round-trip per utterance.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG = -1e9                     # soft -inf that is safe in f32 DP math


class _ConvStack(nn.Module):
    """Conv1D -> LayerNorm -> ReLU, n times, then a linear head."""
    dims: int
    out_dims: int
    n_convs: int
    kernel: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for _ in range(self.n_convs):
            x = nn.Conv(self.dims, (self.kernel,), padding='SAME')(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dims)(x)


def log_beta_binomial_prior(T: int, N: int, width: float) -> jnp.ndarray:
    """(T, N) log-prior favouring the diagonal: a Gaussian around
    n ~= t * N/T with std `width` phonemes. Cheap static analog of
    RAD-TTS's beta-binomial prior; it only shapes early training (the
    posterior overwhelms it once the encoders learn)."""
    t = jnp.arange(T, dtype=jnp.float32)[:, None]
    n = jnp.arange(N, dtype=jnp.float32)[None, :]
    center = (t + 0.5) * N / T
    return -0.5 * ((n - center) / width) ** 2


class Aligner(nn.Module):
    """Scores log P(phoneme n | frame t) for every pair.

    __call__(x (B,N) int32, mel (B,T,M), x_len, mel_len) ->
        log_att (B, T, N): per-frame log-softmax over REAL phonemes
        (positions >= x_len are masked to NEG before normalizing).
    """
    vocab_size: int
    n_mels: int = 80
    embed_dims: int = 128
    conv_dims: int = 128
    key_dims: int = 64
    n_text_convs: int = 3
    n_mel_convs: int = 2
    dropout: float = 0.1
    prior_width: float = 10.0    # <=0 disables the diagonal prior

    @nn.compact
    def __call__(self, x: jnp.ndarray, mel: jnp.ndarray,
                 x_len: jnp.ndarray, mel_len: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.embed_dims)(x)
        keys = _ConvStack(self.conv_dims, self.key_dims,
                          self.n_text_convs, dropout=self.dropout,
                          name='text_enc')(emb, train)
        queries = _ConvStack(self.conv_dims, self.key_dims,
                             self.n_mel_convs, dropout=self.dropout,
                             name='mel_enc')(mel, train)
        # -||q - k||^2 / sqrt(D): (B,T,N) via one MXU contraction
        # instead of materializing the (B,T,N,D) difference tensor
        qk = jnp.einsum('btd,bnd->btn', queries, keys)
        q2 = jnp.sum(queries ** 2, -1)[:, :, None]
        k2 = jnp.sum(keys ** 2, -1)[:, None, :]
        dist = (2.0 * qk - q2 - k2) / jnp.sqrt(float(self.key_dims))
        if self.prior_width > 0:
            dist = dist + log_beta_binomial_prior(
                mel.shape[1], x.shape[1], self.prior_width)
        n_mask = jnp.arange(x.shape[1])[None, :] < x_len[:, None]
        dist = jnp.where(n_mask[:, None, :], dist, NEG)
        return jax.nn.log_softmax(dist, axis=-1)


def forward_sum_loss(log_att: jnp.ndarray, x_len: jnp.ndarray,
                     mel_len: jnp.ndarray) -> jnp.ndarray:
    """Negative log-likelihood of ALL monotonic alignments.

    Paths start at phoneme 0 on frame 0, advance by {0, +1} phonemes
    per frame, and must sit on phoneme x_len-1 at frame mel_len-1
    (CTC without blanks). alpha recursion as one `lax.scan` over the
    padded frame axis; frames >= mel_len carry alpha unchanged so the
    final gather reads the true last frame. Returns the batch mean of
    -log P / mel_len (per-frame normalization keeps the magnitude
    comparable across buckets)."""
    B, T, N = log_att.shape
    alpha0 = jnp.full((B, N), NEG).at[:, 0].set(log_att[:, 0, 0])

    def step(alpha, t):
        advanced = jnp.concatenate(
            [jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1)
        new = log_att[:, t] + jnp.logaddexp(alpha, advanced)
        new = jnp.where((t < mel_len)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    final = jnp.take_along_axis(alpha, (x_len - 1)[:, None], axis=1)[:, 0]
    return jnp.mean(-final / mel_len.astype(jnp.float32))


def viterbi_durations(log_att: jnp.ndarray, x_len: jnp.ndarray,
                      mel_len: jnp.ndarray) -> jnp.ndarray:
    """Hard durations from the best monotonic path, fully on device.

    Forward max-pass records stay/advance choices per (frame,
    phoneme); a reverse scan backtracks from (mel_len-1, x_len-1); the
    visited phoneme index per frame turns into durations via a masked
    one-hot sum. Returns (B, N) int32 with sum(dur[b]) == mel_len[b].
    """
    B, T, N = log_att.shape
    alpha0 = jnp.full((B, N), NEG).at[:, 0].set(log_att[:, 0, 0])

    def fwd(alpha, t):
        advanced = jnp.concatenate(
            [jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1)
        take_adv = advanced > alpha
        new = log_att[:, t] + jnp.maximum(alpha, advanced)
        active = (t < mel_len)[:, None]
        new = jnp.where(active, new, alpha)
        return new, take_adv & active        # (B, N); False when padded

    _, choices = jax.lax.scan(fwd, alpha0, jnp.arange(1, T))  # (T-1,B,N)

    def bwd(n, take_adv_t):
        moved = jnp.take_along_axis(take_adv_t, n[:, None],
                                    axis=1)[:, 0]
        return n - moved.astype(jnp.int32), n

    n_last = x_len - 1
    # walk t = T-1 .. 1; ns[t-1] = phoneme index at frame t
    _, ns_rev = jax.lax.scan(bwd, n_last, choices, reverse=True)
    # ns_rev[i] is the phoneme at frame i+1 BEFORE stepping back...
    # scan(reverse=True) feeds choices[T-2] first and stacks outputs in
    # input order: ns_rev[t-1] = carry when processing frame t = the
    # phoneme occupied at frame t. Frame 0 is always phoneme 0.
    frame_phon = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), ns_rev.transpose(1, 0)], axis=1)
    frame_mask = jnp.arange(T)[None, :] < mel_len[:, None]
    onehot = jax.nn.one_hot(frame_phon, N, dtype=jnp.int32)
    return jnp.sum(onehot * frame_mask[:, :, None], axis=1)


def build_align_extract_step(model) -> Any:
    """One jitted device program: batch -> (durations, soft attention)
    — the aligner-path analog of the teacher's att_step
    (align/features.py:114-118), with the duration DP on device too."""

    @jax.jit
    def extract(variables, x, mel, x_len, mel_len):
        log_att = model.apply(variables, x, mel, x_len, mel_len,
                              train=False)
        durs = viterbi_durations(log_att, x_len, mel_len)
        return durs, jnp.exp(log_att)

    return extract


def aligner_from_config(config: Dict[str, Any]) -> Aligner:
    from forwardtacotron_tpu.text.symbols import phonemes
    cfg = config.get('aligner', {}).get('model', {})
    return Aligner(
        vocab_size=len(phonemes),
        n_mels=config['dsp']['num_mels'],
        embed_dims=cfg.get('embed_dims', 128),
        conv_dims=cfg.get('conv_dims', 128),
        key_dims=cfg.get('key_dims', 64),
        n_text_convs=cfg.get('n_text_convs', 3),
        n_mel_convs=cfg.get('n_mel_convs', 2),
        dropout=cfg.get('dropout', 0.1),
        prior_width=cfg.get('prior_width', 10.0))
