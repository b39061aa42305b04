"""Recurrent primitives as `lax.scan` kernels.

TPU-first formulation of the reference's cuDNN GRU/LSTM stacks
(models/common_layers.py:84,118, models/forward_tacotron.py:39,165,
models/fatchord_version.py:118-119):

- the input projection for the WHOLE sequence runs as one big matmul on
  the MXU before the scan; the scan body only carries the hidden-state
  recurrence (one (B,H)x(H,3H/4H) matmul per step);
- parameters use the torch layout (stacked gates, GRU order r|z|n with
  the "n" gate applying reset to the *hidden projection + hidden bias*;
  LSTM order i|f|g|o) so reference checkpoints convert weight-for-weight;
- variable-length sequences replicate pack_padded_sequence semantics:
  the reverse direction starts at each sequence's true end, and padded
  output positions are filled with `pad_value` like pad_packed_sequence.

Parameter pytrees: {'w_ih': (G*H, D), 'w_hh': (G*H, H), 'b_ih': (G*H,),
'b_hh': (G*H,)} with G=3 (GRU) or 4 (LSTM).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]

# lax.scan unroll factor for all RNN recurrences. Measured A/B
# (tools/scan_unroll_ab.py, v5e B=32 bf16 train step, 2026-08-21):
# separate-dir scans 40.7/41.4/38.0 ms at unroll 1/4/8; fused-dir
# scans 36.9/35.8/35.9. Default stays 1: the trainable Pallas kernel
# (kernels/birnn.py) owns the hot training path at 34-36 ms, and
# unroll's ~7% on the fallback scan doesn't justify its compile-time
# cost. Numbers in docs/benchmarks.md "SCAN_UNROLL" section.
SCAN_UNROLL = 1


def gru_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Single GRU step from *unprojected* input x (B, D)."""
    gi = x @ params['w_ih'].T + params['b_ih']
    return gru_cell_from_gi(params, gi, h)


def gru_cell_from_gi(params: Params, gi: jnp.ndarray, h: jnp.ndarray
                     ) -> jnp.ndarray:
    """GRU step from a precomputed input projection gi (B, 3H)."""
    gh = h @ params['w_hh'].T + params['b_hh']
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell_from_gi(params: Params, gi: jnp.ndarray,
                      state: Tuple[jnp.ndarray, jnp.ndarray]
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h, c = state
    gates = gi + h @ params['w_hh'].T + params['b_hh']
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell(params: Params, x: jnp.ndarray,
              state: Tuple[jnp.ndarray, jnp.ndarray]
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gi = x @ params['w_ih'].T + params['b_ih']
    return lstm_cell_from_gi(params, gi, state)


def _directional_scan(cell_from_gi, params: Params, gi: jnp.ndarray,
                      init_state, reverse: bool,
                      lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Scan a recurrence over time axis 1 of gi (B, T, G*H)."""
    B, T = gi.shape[0], gi.shape[1]
    gi_t = jnp.swapaxes(gi, 0, 1)  # (T, B, G*H)
    ts = jnp.arange(T)
    if reverse:
        gi_t = gi_t[::-1]
        ts = ts[::-1]

    def step(state, inp):
        gi_step, t = inp
        new_state = cell_from_gi(params, gi_step, state)
        if lengths is not None:
            mask = (t < lengths)[:, None]
            new_state = jax.tree.map(
                lambda new, old: jnp.where(mask, new, old), new_state, state)
        h_out = new_state[0] if isinstance(new_state, tuple) else new_state
        return new_state, h_out

    _, ys = jax.lax.scan(step, init_state, (gi_t, ts),
                         unroll=SCAN_UNROLL)
    if reverse:
        ys = ys[::-1]
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def _run(cell_from_gi, n_gates: int, params: Params, x: jnp.ndarray,
         reverse: bool, lengths: Optional[jnp.ndarray], lstm: bool
         ) -> jnp.ndarray:
    B = x.shape[0]
    H = params['w_hh'].shape[1]
    gi = x @ params['w_ih'].T + params['b_ih']  # (B, T, G*H) — one MXU pass
    if lstm:
        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    else:
        init = jnp.zeros((B, H), x.dtype)
    return _directional_scan(cell_from_gi, params, gi, init, reverse, lengths)


def gru(params: Params, x: jnp.ndarray, reverse: bool = False,
        lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Unidirectional GRU over (B, T, D) -> (B, T, H)."""
    return _run(gru_cell_from_gi, 3, params, x, reverse, lengths, lstm=False)


def lstm(params: Params, x: jnp.ndarray, reverse: bool = False,
         lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return _run(lstm_cell_from_gi, 4, params, x, reverse, lengths, lstm=True)


def _mask_outputs(y: jnp.ndarray, lengths: Optional[jnp.ndarray],
                  pad_value: float) -> jnp.ndarray:
    if lengths is None:
        return y
    T = y.shape[1]
    mask = jnp.arange(T)[None, :, None] < lengths[:, None, None]
    return jnp.where(mask, y, pad_value)


def _bidir_fused(cell_kind: str, params_fwd: Params, params_bwd: Params,
                 x: jnp.ndarray, lengths: Optional[jnp.ndarray]
                 ) -> jnp.ndarray:
    """Run BOTH directions in ONE lax.scan of T steps.

    Sequential latency dominates small-batch RNN inference on TPU
    (per-step dispatch, not FLOPs), so instead of two serialized scans
    of T steps each, the forward and backward recurrences advance
    together in one step: the per-step hidden matmul becomes a 2-group
    batched matmul (einsum over a direction axis), identical math,
    half the sequential steps."""
    B, T = x.shape[0], x.shape[1]
    H = params_fwd['w_hh'].shape[1]
    lstm_mode = cell_kind == 'lstm'

    # (2, G*H, D) stacked weights; inputs projected per direction
    gi_f = x @ params_fwd['w_ih'].T + params_fwd['b_ih']
    gi_b = x @ params_bwd['w_ih'].T + params_bwd['b_ih']
    gi = jnp.stack([jnp.swapaxes(gi_f, 0, 1),
                    jnp.swapaxes(gi_b, 0, 1)[::-1]], axis=1)  # (T,2,B,GH)

    w_hh_t = jnp.stack([params_fwd['w_hh'].T, params_bwd['w_hh'].T])
    b_hh = jnp.stack([params_fwd['b_hh'], params_bwd['b_hh']])  # (2, GH)

    ts_f = jnp.arange(T)
    ts = jnp.stack([ts_f, ts_f[::-1]], axis=1)  # (T, 2)

    def gru_step(state, inp):
        h = state  # (2, B, H)
        gi_t, t = inp  # (2, B, GH), (2,)
        gh = jnp.einsum('gbh,ghk->gbk', h, w_hh_t) + b_hh[:, None, :]
        r = jax.nn.sigmoid(gi_t[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_t[..., H:2 * H] + gh[..., H:2 * H])
        n = jnp.tanh(gi_t[..., 2 * H:] + r * gh[..., 2 * H:])
        h_new = (1.0 - z) * n + z * h
        if lengths is not None:
            mask = (t[:, None] < lengths[None, :])[..., None]
            h_new = jnp.where(mask, h_new, h)
        return h_new, h_new

    def lstm_step(state, inp):
        h, c = state
        gi_t, t = inp
        gates = gi_t + jnp.einsum('gbh,ghk->gbk', h, w_hh_t) \
            + b_hh[:, None, :]
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if lengths is not None:
            mask = (t[:, None] < lengths[None, :])[..., None]
            h_new = jnp.where(mask, h_new, h)
            c_new = jnp.where(mask, c_new, c)
        return (h_new, c_new), h_new

    if lstm_mode:
        init = (jnp.zeros((2, B, H), x.dtype), jnp.zeros((2, B, H), x.dtype))
        _, ys = jax.lax.scan(lstm_step, init, (gi, ts),
                             unroll=SCAN_UNROLL)
    else:
        init = jnp.zeros((2, B, H), x.dtype)
        _, ys = jax.lax.scan(gru_step, init, (gi, ts),
                             unroll=SCAN_UNROLL)

    y_f = jnp.swapaxes(ys[:, 0], 0, 1)          # (B, T, H)
    y_b = jnp.swapaxes(ys[::-1, 1], 0, 1)       # un-reverse
    return jnp.concatenate([y_f, y_b], axis=-1)


# Below this batch size, sequential scan latency dominates and fusing
# both directions into one scan wins (1.6x batch-1 on v5e); above it,
# the separate big-matmul scans have better MXU efficiency.
FUSE_BIDIR_MAX_BATCH = 8


def grouped_bigru(w_ih: jnp.ndarray, w_hh: jnp.ndarray, b_ih: jnp.ndarray,
                  b_hh: jnp.ndarray, x_groups: jnp.ndarray,
                  lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """G independent bidirectional GRUs advanced together in ONE scan.

    Batch-1 RNN inference on TPU is sequential-step-latency bound, so an
    ensemble of small independent BiGRUs (e.g. the three duration/pitch/
    energy SeriesPredictors, reference models/forward_tacotron.py:14-55)
    should pay for ONE scan of T steps, not 2*G of them. Groups and
    directions become a leading einsum axis of grouped matmuls; weights
    of narrower groups are zero-padded per gate block to the common H
    (zero rows/columns keep pad lanes exactly zero through the GRU
    recurrence, so valid lanes are bit-identical to separate runs).

    w_ih: (2, G, 3H, D) with dir 0 = forward, 1 = backward;
    w_hh: (2, G, 3H, H); b_ih/b_hh: (2, G, 3H); x_groups: (B, T, G, D).
    Returns (B, T, G, 2, H) — per-group [forward, backward] features.
    """
    B, T, G, _ = x_groups.shape
    H = w_hh.shape[-1]
    # whole-sequence input projections in one MXU pass per direction
    gi = jnp.einsum('btgd,cghd->tcgbh', x_groups, w_ih) \
        + b_ih[None, :, :, None, :]                      # (T, 2, G, B, 3H)
    gi = jnp.concatenate([gi[:, :1], gi[::-1, 1:]], axis=1)
    w_hh_t = jnp.swapaxes(w_hh, -1, -2)                  # (2, G, H, 3H)
    ts_f = jnp.arange(T)
    ts = jnp.stack([ts_f, ts_f[::-1]], axis=1)           # (T, 2)

    def step(h, inp):
        gi_t, t = inp                                    # (2,G,B,3H), (2,)
        gh = jnp.einsum('cgbh,cghk->cgbk', h, w_hh_t) + b_hh[:, :, None, :]
        r = jax.nn.sigmoid(gi_t[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_t[..., H:2 * H] + gh[..., H:2 * H])
        n = jnp.tanh(gi_t[..., 2 * H:] + r * gh[..., 2 * H:])
        h_new = (1.0 - z) * n + z * h
        if lengths is not None:
            mask = (t[:, None, None] < lengths[None, None, :])[..., None]
            h_new = jnp.where(mask, h_new, h)
        return h_new, h_new

    init = jnp.zeros((2, G, B, H), x_groups.dtype)
    _, ys = jax.lax.scan(step, init, (gi, ts),
                         unroll=SCAN_UNROLL)       # (T, 2, G, B, H)
    y = jnp.stack([ys[:, 0], ys[::-1, 1]], axis=3)       # (T, G, B, 2, H)
    y = jnp.transpose(y, (2, 0, 1, 3, 4))                # (B, T, G, 2, H)
    if lengths is not None:
        tmask = jnp.arange(T)[None, :, None, None, None] \
            < lengths[:, None, None, None, None]
        y = jnp.where(tmask, y, 0.0)
    return y


def pad_gru_gates(w: jnp.ndarray, h_group: int, h_common: int,
                  n_gates: int = 3) -> jnp.ndarray:
    """Zero-pad per-gate blocks of a torch-layout stacked-gate tensor
    (n_gates*h_group, ...) to (n_gates*h_common, ...)."""
    if h_group == h_common:
        return w
    w = w.reshape((n_gates, h_group) + w.shape[1:])
    pad = [(0, 0), (0, h_common - h_group)] + [(0, 0)] * (w.ndim - 2)
    w = jnp.pad(w, pad)
    return w.reshape((n_gates * h_common,) + w.shape[2:])


# The fused Pallas kernel beats the XLA scan only when the sequence is
# long enough to amortize its layout/launch overhead (measured
# crossover ~T=200-300 on v5e; prenet-sized T=128 is faster as a scan).
FAST_KERNEL_MIN_T = 256


def _fast_kernel_ok(x: jnp.ndarray, hidden: int) -> bool:
    from forwardtacotron_tpu.kernels.birnn import birnn_pallas_supported
    return (x.shape[1] >= FAST_KERNEL_MIN_T
            and birnn_pallas_supported(hidden, x.shape[0]))


# Trainable fused kernel (kernels/birnn.py birnn_train, custom_vjp):
# replaces BOTH the forward direction-scans and their backward replay
# in training-shaped calls (batch > FUSE_BIDIR_MAX_BATCH) with one
# Pallas kernel each way. Kill switch for A/B and debugging.
TRAIN_KERNEL_ENABLED = os.environ.get('FTT_NO_TRAIN_KERNEL', '') == ''


def _train_kernel_ok(x: jnp.ndarray, hidden: int) -> bool:
    from forwardtacotron_tpu.kernels.birnn import birnn_train_supported
    # Measured crossover (docs/benchmarks.md): the kernel wins at
    # B<=32 (decoder BiLSTM 15.0 vs 18.2 ms fwd+bwd) but loses badly
    # beyond (B=64: 36.0 vs 25.5; B=128: 73.1 vs 44.5) — its
    # VMEM-budget chunk collapses as b_pad grows while the scan path
    # saturates the serial-chain ceiling on its own. Dispatch by B.
    return (TRAIN_KERNEL_ENABLED and x.shape[0] <= 32
            and birnn_train_supported(hidden, x.shape[1]))


def _birnn_trainable(cell: str, params_fwd: Params, params_bwd: Params,
                     x: jnp.ndarray, lengths: Optional[jnp.ndarray]
                     ) -> jnp.ndarray:
    from forwardtacotron_tpu.kernels.birnn import birnn_train
    return birnn_train(
        cell,
        jnp.stack([params_fwd['w_ih'], params_bwd['w_ih']]),
        jnp.stack([params_fwd['w_hh'], params_bwd['w_hh']]),
        jnp.stack([params_fwd['b_ih'], params_bwd['b_ih']]),
        jnp.stack([params_fwd['b_hh'], params_bwd['b_hh']]),
        x, lengths)


def _birnn_fast(cell: str, params_fwd: Params, params_bwd: Params,
                x: jnp.ndarray, lengths: Optional[jnp.ndarray]
                ) -> jnp.ndarray:
    """Whole bidirectional recurrence in one Pallas kernel
    (kernels/birnn.py): 1.3x (LSTM 512) to 1.6x (GRU 256) over the
    fused scan at batch 1 on v5e. bf16 compute (~1e-3 output error) —
    inference only; the scan path remains the training/parity path."""
    from forwardtacotron_tpu.kernels.birnn import birnn_pallas
    w_ih = jnp.stack([params_fwd['w_ih'], params_bwd['w_ih']])[:, None]
    w_hh = jnp.stack([params_fwd['w_hh'], params_bwd['w_hh']])[:, None]
    b_ih = jnp.stack([params_fwd['b_ih'], params_bwd['b_ih']])[:, None]
    b_hh = jnp.stack([params_fwd['b_hh'], params_bwd['b_hh']])[:, None]
    y = birnn_pallas(cell, w_ih, w_hh, b_ih, b_hh, x[:, :, None, :],
                     lengths=lengths)
    return jnp.concatenate([y[:, :, 0, 0], y[:, :, 0, 1]], axis=-1)


def bigru(params_fwd: Params, params_bwd: Params, x: jnp.ndarray,
          lengths: Optional[jnp.ndarray] = None, pad_value: float = 0.0,
          fast: bool = False) -> jnp.ndarray:
    """Bidirectional GRU, output (B, T, 2H) = concat(fwd, bwd).

    Small batches run both directions fused in one scan
    (see _bidir_fused); large batches run two direction scans. With
    `lengths`, replicates torch pack_padded semantics (reverse pass
    starts at the true end; padded outputs filled with pad_value).
    `fast=True` opts into the fused Pallas kernel for long sequences
    on TPU (inference only — bf16 compute, no autodiff).
    """
    if fast and _fast_kernel_ok(x, params_fwd['w_hh'].shape[1]):
        y = _birnn_fast('gru', params_fwd, params_bwd, x, lengths)
    elif x.shape[0] <= FUSE_BIDIR_MAX_BATCH:
        y = _bidir_fused('gru', params_fwd, params_bwd, x, lengths)
    elif _train_kernel_ok(x, params_fwd['w_hh'].shape[1]):
        y = _birnn_trainable('gru', params_fwd, params_bwd, x, lengths)
    else:
        y_f = gru(params_fwd, x, reverse=False, lengths=lengths)
        y_b = gru(params_bwd, x, reverse=True, lengths=lengths)
        y = jnp.concatenate([y_f, y_b], axis=-1)
    return _mask_outputs(y, lengths, pad_value)


def bilstm(params_fwd: Params, params_bwd: Params, x: jnp.ndarray,
           lengths: Optional[jnp.ndarray] = None, pad_value: float = 0.0,
           fast: bool = False) -> jnp.ndarray:
    if fast and _fast_kernel_ok(x, params_fwd['w_hh'].shape[1]):
        y = _birnn_fast('lstm', params_fwd, params_bwd, x, lengths)
    elif x.shape[0] <= FUSE_BIDIR_MAX_BATCH:
        y = _bidir_fused('lstm', params_fwd, params_bwd, x, lengths)
    elif _train_kernel_ok(x, params_fwd['w_hh'].shape[1]):
        y = _birnn_trainable('lstm', params_fwd, params_bwd, x, lengths)
    else:
        y_f = lstm(params_fwd, x, reverse=False, lengths=lengths)
        y_b = lstm(params_bwd, x, reverse=True, lengths=lengths)
        y = jnp.concatenate([y_f, y_b], axis=-1)
    return _mask_outputs(y, lengths, pad_value)


def init_rnn_params(key: jax.Array, input_dim: int, hidden_dim: int,
                    n_gates: int, dtype=jnp.float32) -> Params:
    """Torch-style uniform(-1/sqrt(H), 1/sqrt(H)) initialization."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_dim)
    shape_ih = (n_gates * hidden_dim, input_dim)
    shape_hh = (n_gates * hidden_dim, hidden_dim)
    return {
        'w_ih': jax.random.uniform(k1, shape_ih, dtype, -bound, bound),
        'w_hh': jax.random.uniform(k2, shape_hh, dtype, -bound, bound),
        'b_ih': jax.random.uniform(k3, (n_gates * hidden_dim,), dtype,
                                   -bound, bound),
        'b_hh': jax.random.uniform(k4, (n_gates * hidden_dim,), dtype,
                                   -bound, bound),
    }
