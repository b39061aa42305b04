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
import os
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


# =====================================================================
# Trainable fused BiRNN (custom_vjp): Pallas forward with an
# activation stash + Pallas backward walking the reversed grid.
#
# Round-4 breakdown (docs/benchmarks.md "train step breakdown"): the
# B=32 bf16 train step spends ~36 of 41 ms in the recurrent stages —
# the decoder BiLSTM alone is ~20 ms — because every lax.scan step
# pays XLA's while-loop trip overhead (~1.4-2 us) around a matmul
# whose MXU time is <1 us, and the backward replays the scan. This
# kernel pair removes both scans from the training step:
#
# - forward: same recurrence as `_kernel` above but (a) batch sizes
#   beyond 8 lanes, (b) emits a per-step activation STASH alongside y
#   so the backward never recomputes gates (GRU: r,z,n,gh_n,h_prev;
#   LSTM: i,f,g,o,c_prev — 5H per direction either way);
# - backward: ONE reversed-grid Pallas walk for BOTH directions (each
#   direction's BPTT order is exactly the reverse of its forward
#   kernel-time order, so the same streamed layout serves both). Per
#   step it rebuilds the gate gradients from the stash and carries
#   dh (and dc) with pack-padded masking; its only per-step matmul is
#   dh_prev = dgates @ W_hh;
# - every WEIGHT gradient is a whole-sequence MXU matmul OUTSIDE the
#   kernels: dW_ih = dgi^T x, dW_hh = dgh^T h_prev (h_prev = y shifted
#   one step in each direction's time order), dx = dgi @ W_ih — the
#   sequential kernels only produce dgi/dgh streams.
#
# The reference's cuDNN LSTM/GRU backward
# (models/forward_tacotron.py:165, torch autograd) is the functional
# contract being matched; gradients are checked against jax.grad of
# the lax.scan path in tests/test_pallas_birnn.py.
# =====================================================================

_TRAIN_VMEM_BUDGET = 15 * 1024 * 1024  # bytes; ~16 MB/core minus slack


def _train_chunk(cell: str, hidden: int, gh: int, b_pad: int,
                 itemsize: int) -> int:
    """Largest time-chunk (per grid block) whose streamed buffers fit
    the VMEM budget next to the resident weights, double-buffered.

    Measured on v5e (decoder BiLSTM, B=32): chunk 2 -> 16.4 ms
    fwd+bwd, chunk 8 -> 15.0 ms, chunk 16 -> VMEM compile failure; so
    the formula is exact per kernel — fwd streams gi+y+stash, bwd
    streams stash+dy+dgi(+dgh only for GRU) — and the shared chunk
    (the stash block layout must agree between the two kernels) is
    the min of the two."""
    env = os.environ.get('FTT_TRAIN_KERNEL_CHUNK')
    if env:
        return max(1, int(env))
    resident = 2 * hidden * gh * itemsize          # w_hh (both dirs)
    per_t_fwd = b_pad * (2 * gh + 2 * 5 * hidden
                         + 2 * hidden) * itemsize * 2
    n_dgrad = 2 if cell == 'gru' else 1
    per_t_bwd = b_pad * (2 * 5 * hidden + 2 * hidden
                         + n_dgrad * 2 * gh) * itemsize * 2

    def fit(per_t):
        chunk = 32
        while chunk > 1 and resident + chunk * per_t > _TRAIN_VMEM_BUDGET:
            chunk //= 2
        return chunk
    return min(fit(per_t_fwd), fit(per_t_bwd))


def _kernel_train_fwd(cell: str, t_total: int, hidden: int, chunk: int,
                      b_pad: int, compute_dtype, masked: bool,
                      lengths_ref, gi_ref, w_hh_ref, b_hh_ref,
                      y_ref, stash_ref, h_ref, c_ref):
    """Forward recurrence, both directions, emitting y + stash blocks.

    Layouts (rows = t_local * b_pad + lane):
      gi_ref    (chunk*b_pad, 2*GH)   input projections (b_hh folded
                                      in for LSTM), dir-1 time-reversed
      w_hh_ref  (2*H, GH)             w_hh.T per direction, stacked
      b_hh_ref  (8, GH)               rows 0/1 valid (GRU); zeros LSTM
      y_ref     (chunk*b_pad, 2*H)    hidden state per step
      stash_ref (chunk*b_pad, 2*5H)   per-dir [r,z,n,gh_n,h_prev] /
                                      [i,f,g,o,c_prev]
    """
    H = hidden
    GH = (4 if cell == 'lstm' else 3) * H

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        if cell == 'lstm':
            c_ref[:] = jnp.zeros_like(c_ref)

    len_col = lengths_ref[:, 0:1]
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)

    # carries are PER-DIRECTION tuples and outputs store by slice:
    # a (2*b_pad, H) packed carry costs two copies (slice + concat)
    # of every state every step on the VPU
    def step(t, carry):
        h0, h1, c0, c1 = carry                      # (b_pad, H) f32
        g_t = pl.program_id(0) * chunk + t
        row = t * b_pad
        gi_all = gi_ref[pl.ds(row, b_pad), :].astype(jnp.float32)

        outs = []
        for d, (h, c) in enumerate(((h0, c0), (h1, c1))):
            gi = gi_all[:, d * GH:(d + 1) * GH]
            gh = jnp.dot(h.astype(compute_dtype),
                         w_hh_ref[d * H:(d + 1) * H, :],
                         preferred_element_type=jnp.float32,
                         precision=precision)
            if cell == 'gru':        # LSTM b_hh is folded into gi
                gh = gh + b_hh_ref[d, :]
            if not masked:
                mask = None
            elif d == 0:
                mask = g_t < len_col
            else:
                mask = jnp.logical_and(g_t >= t_total - len_col,
                                       g_t < t_total)
            if cell == 'gru':
                r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
                z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
                gh_n = gh[:, 2 * H:]
                n = jnp.tanh(gi[:, 2 * H:] + r * gh_n)
                h_n = (1.0 - z) * n + z * h
                st = (r, z, n, gh_n, h)
                c_n = c
            else:
                gates = gi + gh
                i = jax.nn.sigmoid(gates[:, :H])
                f = jax.nn.sigmoid(gates[:, H:2 * H])
                g = jnp.tanh(gates[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(gates[:, 3 * H:])
                c_n = f * c + i * g
                h_n = o * jnp.tanh(c_n)
                st = (i, f, g, o, c)
                if masked:
                    c_n = jnp.where(mask, c_n, c)
            if masked:
                h_n = jnp.where(mask, h_n, h)
            y_ref[pl.ds(row, b_pad), d * H:(d + 1) * H] = \
                h_n.astype(y_ref.dtype)
            base = d * 5 * H
            for j, s in enumerate(st):
                stash_ref[pl.ds(row, b_pad),
                          base + j * H:base + (j + 1) * H] = \
                    s.astype(stash_ref.dtype)
            outs.append((h_n, c_n))
        return outs[0][0], outs[1][0], outs[0][1], outs[1][1]

    init = (h_ref[pl.ds(0, b_pad), :], h_ref[pl.ds(b_pad, b_pad), :],
            c_ref[pl.ds(0, b_pad), :], c_ref[pl.ds(b_pad, b_pad), :])
    h0, h1, c0, c1 = jax.lax.fori_loop(0, chunk, step, init)
    h_ref[pl.ds(0, b_pad), :] = h0
    h_ref[pl.ds(b_pad, b_pad), :] = h1
    if cell == 'lstm':
        c_ref[pl.ds(0, b_pad), :] = c0
        c_ref[pl.ds(b_pad, b_pad), :] = c1


def _kernel_train_bwd(cell: str, t_total: int, hidden: int, chunk: int,
                      b_pad: int, compute_dtype, masked: bool, *refs):
    """BPTT for both directions in one reversed-grid walk.

    Each direction's backward order is the reverse of its forward
    kernel-time order, so the grid streams blocks with index_map
    i -> n_blocks-1-i and the inner loop walks t_local descending.
    Emits dgi (grad wrt input projections) and, for GRU, dgh (grad wrt
    hidden projections — they differ in the n gate where the reset
    gate multiplies only the hidden path). For LSTM dgh == dgi and
    dgh_ref is not written (the wrapper reuses dgi).

      stash_ref (chunk*b_pad, 2*5H)   from the forward kernel
      dy_ref    (chunk*b_pad, 2*H)    upstream grads, dir-1 reversed
      w_hh_ref  (2*GH, H)             torch-layout w_hh per direction
      dgi_ref   (chunk*b_pad, 2*GH)
      dgh_ref   (chunk*b_pad, 2*GH)   (GRU only — absent for LSTM)
    """
    if cell == 'gru':
        (lengths_ref, stash_ref, dy_ref, w_hh_ref,
         dgi_ref, dgh_ref, dh_ref, dc_ref) = refs
    else:
        (lengths_ref, stash_ref, dy_ref, w_hh_ref,
         dgi_ref, dh_ref, dc_ref) = refs
        dgh_ref = None
    H = hidden
    GH = (4 if cell == 'lstm' else 3) * H

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        if cell == 'lstm':
            dc_ref[:] = jnp.zeros_like(dc_ref)

    len_col = lengths_ref[:, 0:1]
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    n_blocks = t_total and (pl.num_programs(0))  # grid length

    # per-direction tuple carries + sliced stores (see the forward
    # kernel's note: packed carries cost two full-state copies a step)
    def step(k, carry):
        t = chunk - 1 - k
        dh0, dh1, dc0, dc1 = carry                  # (b_pad, H) f32
        g_t = (n_blocks - 1 - pl.program_id(0)) * chunk + t
        row = t * b_pad
        stash = stash_ref[pl.ds(row, b_pad), :].astype(jnp.float32)
        dy = dy_ref[pl.ds(row, b_pad), :].astype(jnp.float32)

        outs = []
        for d, (dh_c, dc) in enumerate(((dh0, dc0), (dh1, dc1))):
            dh = dh_c + dy[:, d * H:(d + 1) * H]
            s = stash[:, d * 5 * H:(d + 1) * 5 * H]
            if not masked:
                mask = None
            elif d == 0:
                mask = g_t < len_col
            else:
                mask = jnp.logical_and(g_t >= t_total - len_col,
                                       g_t < t_total)
            if cell == 'gru':
                r, z, n = s[:, :H], s[:, H:2 * H], s[:, 2 * H:3 * H]
                gh_n, h_prev = s[:, 3 * H:4 * H], s[:, 4 * H:]
                dn = dh * (1.0 - z)
                dz = dh * (h_prev - n)
                dh_pass = dh * z
                dpre_n = dn * (1.0 - n * n)
                dr = dpre_n * gh_n
                dpre_r = dr * r * (1.0 - r)
                dpre_z = dz * z * (1.0 - z)
                dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
                dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r],
                                      axis=-1)
                if masked:
                    dgi = jnp.where(mask, dgi, 0.0)
                    dgh = jnp.where(mask, dgh, 0.0)
                dh_prev = dh_pass + jnp.dot(
                    dgh.astype(compute_dtype),
                    w_hh_ref[d * GH:(d + 1) * GH, :],
                    preferred_element_type=jnp.float32,
                    precision=precision)
                dh_n = jnp.where(mask, dh_prev, dh) if masked \
                    else dh_prev
                dc_n = dc
                dgh_ref[pl.ds(row, b_pad), d * GH:(d + 1) * GH] = \
                    dgh.astype(dgh_ref.dtype)
            else:
                i = s[:, :H]
                f = s[:, H:2 * H]
                g = s[:, 2 * H:3 * H]
                o = s[:, 3 * H:4 * H]
                c_prev = s[:, 4 * H:]
                tanh_c = jnp.tanh(f * c_prev + i * g)
                do = dh * tanh_c
                dct = dh * o * (1.0 - tanh_c * tanh_c) + dc
                dpre = jnp.concatenate([
                    dct * g * i * (1.0 - i),
                    dct * c_prev * f * (1.0 - f),
                    dct * i * (1.0 - g * g),
                    do * o * (1.0 - o)], axis=-1)
                dgi = jnp.where(mask, dpre, 0.0) if masked else dpre
                dh_prev = jnp.dot(
                    dgi.astype(compute_dtype),
                    w_hh_ref[d * GH:(d + 1) * GH, :],
                    preferred_element_type=jnp.float32,
                    precision=precision)
                dh_n = jnp.where(mask, dh_prev, dh) if masked \
                    else dh_prev
                dc_n = jnp.where(mask, dct * f, dc) if masked \
                    else dct * f
            dgi_ref[pl.ds(row, b_pad), d * GH:(d + 1) * GH] = \
                dgi.astype(dgi_ref.dtype)
            outs.append((dh_n, dc_n))
        return outs[0][0], outs[1][0], outs[0][1], outs[1][1]

    init = (dh_ref[pl.ds(0, b_pad), :], dh_ref[pl.ds(b_pad, b_pad), :],
            dc_ref[pl.ds(0, b_pad), :], dc_ref[pl.ds(b_pad, b_pad), :])
    dh0, dh1, dc0, dc1 = jax.lax.fori_loop(0, chunk, step, init)
    dh_ref[pl.ds(0, b_pad), :] = dh0
    dh_ref[pl.ds(b_pad, b_pad), :] = dh1
    if cell == 'lstm':
        dc_ref[pl.ds(0, b_pad), :] = dc0
        dc_ref[pl.ds(b_pad, b_pad), :] = dc1


def _pack_rows(x_tbf: jnp.ndarray, T_pad: int, b_pad: int,
               dtype) -> jnp.ndarray:
    """(T, B, F) -> zero-padded (T_pad*b_pad, F) in kernel row order."""
    T, B, F = x_tbf.shape
    buf = jnp.zeros((T_pad, b_pad, F), dtype)
    buf = buf.at[:T, :B].set(x_tbf.astype(dtype))
    return buf.reshape(T_pad * b_pad, F)


def _train_fwd_call(cell: str, gi_flat, w_hh_t, b_hh_rows, lengths32,
                    t_total: int, hidden: int, chunk: int, b_pad: int,
                    compute_dtype, masked: bool):
    T_pad = gi_flat.shape[0] // b_pad
    GH = (4 if cell == 'lstm' else 3) * hidden
    kernel = functools.partial(_kernel_train_fwd, cell, t_total, hidden,
                               chunk, b_pad, compute_dtype, masked)
    return pl.pallas_call(
        kernel,
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec((b_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * b_pad, 2 * GH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hidden, GH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, GH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk * b_pad, 2 * hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * b_pad, 2 * 5 * hidden),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad * b_pad, 2 * hidden),
                                 compute_dtype),
            jax.ShapeDtypeStruct((T_pad * b_pad, 2 * 5 * hidden),
                                 compute_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * b_pad, hidden), jnp.float32),
            pltpu.VMEM((2 * b_pad, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lengths32, gi_flat, w_hh_t, b_hh_rows)


def _train_bwd_call(cell: str, stash_flat, dy_flat, w_hh_rows,
                    lengths32, t_total: int, hidden: int, chunk: int,
                    b_pad: int, compute_dtype, masked: bool):
    T_pad = stash_flat.shape[0] // b_pad
    GH = (4 if cell == 'lstm' else 3) * hidden
    n_blocks = T_pad // chunk
    rev = lambda i: (n_blocks - 1 - i, 0)  # noqa: E731
    kernel = functools.partial(_kernel_train_bwd, cell, t_total, hidden,
                               chunk, b_pad, compute_dtype, masked)
    out_specs = [pl.BlockSpec((chunk * b_pad, 2 * GH), rev,
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T_pad * b_pad, 2 * GH),
                                      compute_dtype)]
    if cell == 'gru':
        out_specs.append(pl.BlockSpec((chunk * b_pad, 2 * GH), rev,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T_pad * b_pad, 2 * GH),
                                              compute_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((b_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * b_pad, 2 * 5 * hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * b_pad, 2 * hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * GH, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2 * b_pad, hidden), jnp.float32),
            pltpu.VMEM((2 * b_pad, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lengths32, stash_flat, dy_flat, w_hh_rows)
    if cell == 'gru':
        return outs[0], outs[1]
    return outs[0], outs[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def birnn_train(cell: str, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                b_ih: jnp.ndarray, b_hh: jnp.ndarray, x: jnp.ndarray,
                lengths: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused BiRNN: (B, T, D) -> (B, T, 2H).

    w_ih (2, GH, D), w_hh (2, GH, H), b_ih/b_hh (2, GH) with dir 0 =
    forward; `lengths` (B,) int32, or None for no packing (None also
    lets the kernels drop per-step masking entirely when the time
    axis needs no padding).

    Under jax.grad the vjp pair runs: forward + backward each as ONE
    Pallas kernel, weight grads as whole-sequence matmuls (see module
    comment). NON-differentiated calls (inference at training batch
    sizes) take the plain direction scans instead — the kernel's
    per-step activation stash is pure overhead without a backward
    (measured: B=32 batched inference 1.85M -> 1.20M frames/s/chip
    when the stash-writing forward was used for inference). Computes
    in x.dtype (bf16 under mixed-precision training; f32 with HIGHEST
    matmul precision otherwise).
    """
    from forwardtacotron_tpu.ops import rnn as rnn_ops
    pf = {'w_ih': w_ih[0], 'w_hh': w_hh[0],
          'b_ih': b_ih[0], 'b_hh': b_hh[0]}
    pb = {'w_ih': w_ih[1], 'w_hh': w_hh[1],
          'b_ih': b_ih[1], 'b_hh': b_hh[1]}
    run = rnn_ops.lstm if cell == 'lstm' else rnn_ops.gru
    y_f = run(pf, x, reverse=False, lengths=lengths)
    y_b = run(pb, x, reverse=True, lengths=lengths)
    return jnp.concatenate([y_f, y_b], axis=-1)


def _birnn_train_fwd(cell, w_ih, w_hh, b_ih, b_hh, x, lengths):
    B, T, D = x.shape
    H = w_hh.shape[-1]
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    b_pad = _b_pad(B)
    GH = w_ih.shape[1]
    chunk = _train_chunk(cell, H, GH, b_pad,
                         jnp.dtype(compute_dtype).itemsize)
    T_pad = ((T + chunk - 1) // chunk) * chunk

    # input projections on the MXU; for LSTM both biases fold into gi
    gi = jnp.einsum('btd,chd->btch', x, w_ih) + b_ih[None, None]
    if cell == 'lstm':
        gi = gi + b_hh[None, None]
    # dir-1 stream reversed in time; rows (t, lane)
    gi = jnp.concatenate([gi[:, :, 0:1], gi[:, ::-1, 1:2]], axis=2)
    gi = gi.transpose(1, 0, 2, 3).reshape(T, B, 2 * GH)
    gi_flat = _pack_rows(gi, T_pad, b_pad, compute_dtype)

    w_hh_t = jnp.swapaxes(w_hh, -1, -2).reshape(2 * H, GH) \
        .astype(compute_dtype)
    b_hh_rows = jnp.zeros((8, GH), jnp.float32)
    if cell == 'gru':
        b_hh_rows = b_hh_rows.at[:2].set(b_hh.astype(jnp.float32))

    # masked=False specializes the kernels to drop the per-step
    # length compares/selects — sound only when every lane is full
    # length AND there are no T_pad padding rows
    masked = lengths is not None or T_pad != T
    len_buf = jnp.full((b_pad,), T, jnp.int32)
    if lengths is not None:
        len_buf = len_buf.at[:B].set(lengths.astype(jnp.int32))
    lengths32 = jnp.broadcast_to(len_buf[:, None], (b_pad, 128))

    y_flat, stash_flat = _train_fwd_call(
        cell, gi_flat, w_hh_t, b_hh_rows, lengths32, t_total=T,
        hidden=H, chunk=chunk, b_pad=b_pad, compute_dtype=compute_dtype,
        masked=masked)

    y = y_flat.reshape(T_pad, b_pad, 2, H)[:T, :B]      # (T, B, 2, H)
    y = jnp.stack([y[:, :, 0], y[::-1, :, 1]], axis=2)  # un-reverse bwd
    y = y.transpose(1, 0, 2, 3).reshape(B, T, 2 * H).astype(x.dtype)
    res = (w_ih, w_hh, x, lengths, stash_flat)
    return y, res


def _birnn_train_bwd(cell, res, dy):
    w_ih, w_hh, x, lengths, stash_flat = res
    B, T, D = x.shape
    H = w_hh.shape[-1]
    GH = w_ih.shape[1]
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    b_pad = _b_pad(B)
    chunk = _train_chunk(cell, H, GH, b_pad,
                         jnp.dtype(compute_dtype).itemsize)
    T_pad = stash_flat.shape[0] // b_pad

    dy = dy.reshape(B, T, 2, H)
    dy = jnp.concatenate([dy[:, :, 0:1], dy[:, ::-1, 1:2]], axis=2)
    dy = dy.transpose(1, 0, 2, 3).reshape(T, B, 2 * H)
    dy_flat = _pack_rows(dy, T_pad, b_pad, compute_dtype)

    w_hh_rows = w_hh.reshape(2 * GH, H).astype(compute_dtype)
    masked = lengths is not None or T_pad != T
    len_buf = jnp.full((b_pad,), T, jnp.int32)
    if lengths is not None:
        len_buf = len_buf.at[:B].set(lengths.astype(jnp.int32))
    lengths32 = jnp.broadcast_to(len_buf[:, None], (b_pad, 128))

    dgi_flat, dgh_flat = _train_bwd_call(
        cell, stash_flat, dy_flat, w_hh_rows, lengths32, t_total=T,
        hidden=H, chunk=chunk, b_pad=b_pad, compute_dtype=compute_dtype,
        masked=masked)

    def unpack(flat, F):
        v = flat.reshape(T_pad, b_pad, 2, F)[:T, :B]
        # dir-1 stream back to original time order
        return jnp.stack([v[:, :, 0], v[::-1, :, 1]], axis=2) \
            .transpose(1, 0, 2, 3)                       # (B, T, 2, F)

    dgi = unpack(dgi_flat, GH).astype(jnp.float32)
    dgh = dgi if cell == 'lstm' else \
        unpack(dgh_flat, GH).astype(jnp.float32)

    # dW_hh pairs each step's dgh with the PREVIOUS hidden state in
    # recurrence order. Both are summed over time, so the einsum runs
    # in KERNEL time (dir-1 stream still reversed) where "previous"
    # is simply the preceding row: GRU stashes h_prev directly
    # (slot 4); LSTM rebuilds h_t = o*tanh(c_t) elementwise from the
    # stash and shifts it one step down (h_prev[0] = 0).
    st_k = stash_flat.reshape(T_pad, b_pad, 2, 5, H)[:T, :B] \
        .astype(jnp.float32)                             # kernel time
    dgh_k = dgh_flat.reshape(T_pad, b_pad, 2, GH)[:T, :B] \
        .astype(jnp.float32) if cell == 'gru' else \
        dgi_flat.reshape(T_pad, b_pad, 2, GH)[:T, :B].astype(jnp.float32)
    if cell == 'gru':
        h_prev_k = st_k[:, :, :, 4]
    else:
        i_, f_, g_, o_, cp = (st_k[:, :, :, j] for j in range(5))
        h_all_k = o_ * jnp.tanh(f_ * cp + i_ * g_)       # h_t, kernel time
        # masked steps hold state, and the only masked->unmasked
        # transition (dir-1's pre-roll before T-len) holds the ZERO
        # initial state — zero the reconstruction there so the first
        # real step pairs with h_prev = 0, exactly like the kernel
        if lengths is not None:
            ts = jnp.arange(T)
            valid_k = jnp.stack(
                [ts[:, None] < lengths[None, :],
                 ts[:, None] >= (T - lengths)[None, :]],
                axis=2)[..., None]                       # (T, B, 2, 1)
            h_all_k = jnp.where(valid_k, h_all_k, 0.0)
        h_prev_k = jnp.concatenate(
            [jnp.zeros_like(h_all_k[:1]), h_all_k[:-1]], axis=0)

    xf = x.astype(jnp.float32)
    dw_ih = jnp.einsum('btcg,btd->cgd', dgi, xf)
    db_ih = jnp.sum(dgi, axis=(0, 1))
    dw_hh = jnp.einsum('tbcg,tbch->cgh', dgh_k, h_prev_k)
    db_hh = jnp.sum(dgh, axis=(0, 1))
    dx = jnp.einsum('btcg,cgd->btd', dgi, w_ih.astype(jnp.float32))

    import numpy as np
    dlen = None if lengths is None \
        else np.zeros(lengths.shape, jax.dtypes.float0)
    return (dw_ih.astype(w_ih.dtype), dw_hh.astype(w_hh.dtype),
            db_ih.astype(w_ih.dtype), db_hh.astype(w_hh.dtype),
            dx.astype(x.dtype), dlen)


birnn_train.defvjp(_birnn_train_fwd, _birnn_train_bwd)


def birnn_train_supported(hidden: int, seq_len: int) -> bool:
    """Gate for the trainable kernel pair: TPU backend, lane-aligned
    hidden size, and a sequence long enough that the two kernel
    launches amortize (short sequences stay on the fused scan)."""
    platform = jax.devices()[0].platform
    return (platform in ('tpu', 'axon') and hidden % 128 == 0
            and seq_len >= 64)
