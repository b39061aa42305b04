"""Fused bidirectional RNN Pallas kernel (LSTM / GRU, grouped).

Batch-1 mel synthesis is sequential-step-latency bound: XLA's while
loop costs ~1.4-2.0 us per scan step on v5e regardless of how small
the per-step matmuls are, so the ForwardTacotron decoder BiLSTM
(rnn_dims=512 over ~768 mel frames, reference
models/forward_tacotron.py:224-230) and the CBHG BiGRUs dominate
generate latency. This kernel runs the WHOLE recurrence in ONE
pallas_call:

- hidden-to-hidden weights for every (direction, group) live in VMEM
  for the kernel lifetime (bf16 by default, fp32 for parity tests);
- the input projections gi = x @ w_ih.T + b_ih are precomputed outside
  on the MXU as big batched matmuls and streamed HBM->VMEM in chunked
  time blocks by the Pallas pipeline;
- both directions (and all G groups of an ensemble, e.g. the three
  SeriesPredictors) advance together in each step of an in-kernel
  fori_loop: the backward stream is time-reversed OUTSIDE the kernel
  so every (direction, group) walks the same block index;
- pack_padded semantics match ops/rnn.py: per-lane lengths gate state
  updates (forward: step < len; backward stream: step >= T - len), so
  a padded static bucket computes the same valid values as exact-length
  execution.

Layout: batch lanes are padded to 8 sublanes; streamed rows are
(t_local * b_pad + lane). All feature dims must be 128-lane aligned:
H % 128 == 0 (gate blocks G*H are then aligned too).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _b_pad(b: int) -> int:
    return max(8, ((b + 7) // 8) * 8)


def _kernel(cell: str, t_total: int, n_groups: int, hidden: int,
            chunk: int, b_pad: int, compute_dtype,
            lengths_ref,        # VMEM (b_pad, 128) int32, col 0 valid
            gi_ref,             # (chunk*b_pad, 2G*GH) streamed blocks
            w_hh_ref,           # (2G*H, GH) resident
            b_hh_ref,           # (2G, GH) resident (zeros for LSTM)
            y_ref,              # (chunk*b_pad, 2G*H) out blocks
            h_ref,              # scratch (2G*b_pad, H) f32
            c_ref):             # scratch (2G*b_pad, H) f32 (LSTM)
    H = hidden
    GH = (4 if cell == 'lstm' else 3) * H
    n_dirs = 2 * n_groups

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        if cell == 'lstm':
            c_ref[:] = jnp.zeros_like(c_ref)

    len_col = lengths_ref[:, 0:1]                       # (b_pad, 1) int32
    # Mosaic dots default to single-pass bf16 multiplication even for
    # f32 operands; parity mode needs the multi-pass f32 path
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)

    def step(t, carry):
        h_all, c_all = carry                            # (2G*b_pad, H) f32
        g_t = pl.program_id(0) * chunk + t
        row = t * b_pad
        gi_all = gi_ref[pl.ds(row, b_pad), :].astype(jnp.float32)

        new_h, new_c, ys = [], [], []
        for idx in range(n_dirs):
            d = idx % 2                                  # 0 fwd, 1 bwd
            h = h_all[idx * b_pad:(idx + 1) * b_pad, :]
            gi = gi_all[:, idx * GH:(idx + 1) * GH]
            gh = jnp.dot(h.astype(compute_dtype), w_hh_ref[idx * H:
                                                           (idx + 1) * H, :],
                         preferred_element_type=jnp.float32,
                         precision=precision) \
                + b_hh_ref[idx, :]
            if cell == 'gru':
                r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
                z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
                n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
                h_n = (1.0 - z) * n + z * h
                c_n = None
            else:
                c = c_all[idx * b_pad:(idx + 1) * b_pad, :]
                gates = gi + gh
                i = jax.nn.sigmoid(gates[:, :H])
                f = jax.nn.sigmoid(gates[:, H:2 * H])
                g = jnp.tanh(gates[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(gates[:, 3 * H:])
                c_n = f * c + i * g
                h_n = o * jnp.tanh(c_n)
            if d == 0:
                mask = g_t < len_col
            else:
                # backward stream position g_t is original time
                # T-1-g_t; active iff that is < len and >= 0
                mask = jnp.logical_and(g_t >= t_total - len_col,
                                       g_t < t_total)
            h_n = jnp.where(mask, h_n, h)
            new_h.append(h_n)
            ys.append(h_n)
            if cell == 'lstm':
                new_c.append(jnp.where(mask, c_n, c))

        y_ref[pl.ds(row, b_pad), :] = jnp.concatenate(ys, axis=-1)
        h_out = jnp.concatenate(new_h, axis=0)
        c_out = jnp.concatenate(new_c, axis=0) if cell == 'lstm' else c_all
        return h_out, c_out

    carry = jax.lax.fori_loop(0, chunk, step, (h_ref[:], c_ref[:]))
    h_ref[:] = carry[0]
    if cell == 'lstm':
        c_ref[:] = carry[1]


@functools.partial(jax.jit, static_argnames=(
    'cell', 'n_groups', 'hidden', 'b_pad', 'chunk', 'compute_dtype',
    't_total'))
def _pallas_birnn(gi_flat: jnp.ndarray, w_hh: jnp.ndarray,
                  b_hh: jnp.ndarray, lengths32: jnp.ndarray,
                  cell: str, t_total: int, n_groups: int, hidden: int,
                  chunk: int, b_pad: int, compute_dtype) -> jnp.ndarray:
    """gi_flat (T_pad*b_pad, 2G*GH); returns y (T_pad*b_pad, 2G*H)."""
    T_pad = gi_flat.shape[0] // b_pad
    grid = (T_pad // chunk,)
    GH = (4 if cell == 'lstm' else 3) * hidden
    n_dirs = 2 * n_groups
    kernel = functools.partial(_kernel, cell, t_total, n_groups, hidden,
                               chunk, b_pad, compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # lengths
            pl.BlockSpec((chunk * b_pad, n_dirs * GH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # gi stream
            pl.BlockSpec((n_dirs * hidden, GH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # w_hh
            pl.BlockSpec((n_dirs, GH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # b_hh
        ],
        out_specs=pl.BlockSpec((chunk * b_pad, n_dirs * hidden),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad * b_pad, n_dirs * hidden),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_dirs * b_pad, hidden), jnp.float32),
            pltpu.VMEM((n_dirs * b_pad, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lengths32, gi_flat, w_hh, b_hh)


def birnn_pallas(cell: str, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                 b_ih: jnp.ndarray, b_hh: jnp.ndarray,
                 x_groups: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Grouped bidirectional RNN, whole recurrence in one kernel.

    Same contract as ops/rnn.py:grouped_bigru: w_ih (2, G, GH, D) with
    dir 0 = forward; w_hh (2, G, GH, H); b_ih/b_hh (2, G, GH);
    x_groups (B, T, G, D). Returns (B, T, G, 2, H) with per-group
    [forward, backward] features (valid positions match the lax.scan
    path; padded positions are zeroed when lengths are given).
    """
    B, T, G, _ = x_groups.shape
    H = w_hh.shape[-1]
    GH = w_ih.shape[-2]
    b_pad = _b_pad(B)
    chunk = 16 if compute_dtype == jnp.float32 else 32
    T_pad = ((T + chunk - 1) // chunk) * chunk

    # input projections on the MXU, b_hh folded in for LSTM
    gi = jnp.einsum('btgd,cghd->btcgh', x_groups, w_ih) \
        + b_ih[None, None]                              # (B, T, 2, G, GH)
    if cell == 'lstm':
        gi = gi + b_hh[None, None]
    # reverse the backward stream in time; feature order (g, d) to
    # match the kernel's idx = 2*g + d slicing
    gi = jnp.concatenate([gi[:, :, 0:1], gi[:, ::-1, 1:2]], axis=2)
    gi = gi.transpose(1, 0, 3, 2, 4)                    # (T, B, G, 2, GH)
    gi = gi.reshape(T, B, 2 * G * GH)
    buf = jnp.zeros((T_pad, b_pad, 2 * G * GH), compute_dtype)
    buf = buf.at[:T, :B].set(gi.astype(compute_dtype))
    gi_flat = buf.reshape(T_pad * b_pad, 2 * G * GH)

    w = jnp.swapaxes(w_hh, -1, -2)                      # (2, G, H, GH)
    w = w.transpose(1, 0, 2, 3).reshape(2 * G * H, GH).astype(compute_dtype)
    if cell == 'lstm':
        b = jnp.zeros((2 * G, GH), jnp.float32)
    else:
        b = b_hh.transpose(1, 0, 2).reshape(2 * G, GH).astype(jnp.float32)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len_buf = jnp.full((b_pad,), T, jnp.int32).at[:B].set(
        lengths.astype(jnp.int32))
    lengths32 = jnp.broadcast_to(len_buf[:, None], (b_pad, 128))

    y = _pallas_birnn(gi_flat, w, b, lengths32, cell=cell, t_total=T,
                      n_groups=G, hidden=H, chunk=chunk, b_pad=b_pad,
                      compute_dtype=compute_dtype)
    y = y.reshape(T_pad, b_pad, G, 2, H)[:T, :B]        # (T, B, G, 2, H)
    # un-reverse the backward stream
    y = jnp.stack([y[:, :, :, 0], y[::-1, :, :, 1]], axis=3)
    y = y.transpose(1, 0, 2, 3, 4)                      # (B, T, G, 2, H)
    tmask = jnp.arange(T)[None, :, None, None, None] \
        < lengths[:, None, None, None, None]
    return jnp.where(tmask, y, 0.0)


def birnn_pallas_supported(hidden: int, batch: int) -> bool:
    platform = jax.devices()[0].platform
    return (platform in ('tpu', 'axon') and hidden % 128 == 0
            and batch <= 8)
