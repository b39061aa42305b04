"""Fused Pallas kernel for WaveRNN autoregressive sampling.

The lax.scan sampler (models/wavernn.py:sample_scan) re-reads the GRU/FC
weights from HBM on every step through XLA's while-loop. This kernel is
the speed-of-light version for the serving path:

- ALL loop weights (both GRU gate matrices, fc1/fc2/fc3, and the
  conditioning projection) are cast to bfloat16 and pinned in VMEM for
  the kernel's whole lifetime (~10 MB);
- the per-step conditioning is streamed HBM->VMEM in its COMPACT raw
  form (mel + aux channels, lane-padded to a multiple of 128) and
  projected to the four injection points (GRU1 input, GRU2 gates,
  fc1, fc2) by one in-kernel MXU matmul per step against a
  block-structured weight — 12x less streamed bytes/VMEM than
  precomputing the projections outside, which is what lets wide folds
  (up to 128 lanes) fit on chip;
- categorical sampling runs on-chip: per-step Gumbel noise from the TPU
  PRNG + argmax, so no host or HBM round-trips inside the loop;
- hidden state (h1, h2) and the previous sample live in VMEM scratch
  persisting across grid steps (the grid walks time chunks
  sequentially).

RAW mode samples categorically over the softmax classes (lane-aligned);
MOL mode (30 = 10x{logit, mean, log_scale} outputs, utils/
distribution.py:87-123 in the reference) pads the fc3 output to 128
lanes and runs the Gumbel-max mixture pick + logistic inverse-CDF
sample on-chip with lane-iota masks.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 32         # time steps per grid block at 8 lanes
LOG_SCALE_MIN = float(np.log(1e-14))   # ops/mol.py parity


def _b_pad(b: int) -> int:
    """Sublane-aligned batch lanes (multiple of 8)."""
    return max(8, ((b + 7) // 8) * 8)


# Widest fold batch one kernel launch handles. With compact-streamed
# conditioning the VMEM budget (resident weights ~10 MB + double-
# buffered cond blocks ~1 MB + per-step f32 intermediates) admits 128
# lanes — a full MXU tile in the batch dimension.
MAX_LANES = 128


def _chunk_for(b_pad: int) -> int:
    """Steps per grid block: keep streamed-block rows (chunk * b_pad)
    ~1024 — compact cond rows are cheap, and longer chunks amortize
    block-switch overhead. Must stay a multiple of 8 (output block
    sublanes)."""
    return max(8, ((CHUNK * 32) // b_pad) // 8 * 8)


def _kernel(n_classes: int, nr_mix: int, rnn_dims: int, fc_dims: int,
            greedy: bool, compute_dtype, gate_dtype, b_pad: int, chunk: int,
            hoist_pre: bool,
            # refs:
            seed_ref,                      # SMEM (1,)
            cond_ref,                      # (chunk*B, C_pad) compact cond
            wc_ref, bc_ref,                # (C_pad, R+3H+2F), (1, R+3H+2F)
            w_x_ref,                       # (1, rnn)
            w1_ih_ref, w1_hh_ref, b1_ih_ref, b1_hh_ref,
            w2_x_ref, w2_hh_ref, b2_hh_ref,
            fc1_kx_ref, fc2_kx_ref, fc3_k_ref, fc3_b_ref,
            out_ref,                       # (chunk, B)
            h1_ref, h2_ref, x_ref,         # scratch (B, rnn)/(B, 128)
            pre_ref):                      # scratch (chunk*B, n_cond)|None
    H = rnn_dims
    F = fc_dims

    @pl.when(pl.program_id(0) == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        x_ref[:] = jnp.zeros_like(x_ref)

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    if hoist_pre:
        # conditioning projection for the WHOLE chunk in one tall MXU
        # op (M = chunk*b_pad) — removes the serial per-step matmul
        pre_ref[:] = jnp.dot(cond_ref[:], wc_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(compute_dtype)

    def gru(gi, gh, h):
        # Gate math in `gate_dtype` (defaults to the compute dtype);
        # the hidden-state update stays f32 so the AR recurrence does
        # not accumulate low-precision error.
        gi = gi.astype(gate_dtype)
        gh = gh.astype(gate_dtype)

        def sig(v):
            # manual sigmoid: jax.nn.sigmoid's lowering broadcasts an
            # f32 constant into bf16 vectors, which Mosaic rejects
            one = jnp.asarray(1.0, v.dtype)
            return one / (one + jnp.exp(-v))

        r = sig(gi[:, :H] + gh[:, :H])
        z = sig(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        z = z.astype(jnp.float32)
        return (1.0 - z) * n.astype(jnp.float32) + z * h

    def step(t, carry):
        x, h1, h2 = carry  # (B,1) f32, (B,H) f32, (B,H) f32

        row = t * b_pad
        if hoist_pre:
            pre = pre_ref[pl.ds(row, b_pad), :].astype(jnp.float32) \
                + bc_ref[0]
        else:
            c = cond_ref[pl.ds(row, b_pad), :]
            # conditioning projection: one MXU op computes all four
            # injection rows [i | gi2 | f1 | f2] from compact channels
            pre = jnp.dot(c, wc_ref[:],
                          preferred_element_type=jnp.float32) + bc_ref[0]

        xt = pre[:, :H] + x * w_x_ref[0][None, :]

        xt_b = xt.astype(compute_dtype)
        gi1 = jnp.dot(xt_b, w1_ih_ref[:],
                      preferred_element_type=jnp.float32) + b1_ih_ref[0]
        gh1 = jnp.dot(h1.astype(compute_dtype), w1_hh_ref[:],
                      preferred_element_type=jnp.float32) + b1_hh_ref[0]
        h1 = gru(gi1, gh1, h1)

        x1 = xt + h1
        gi2 = jnp.dot(x1.astype(compute_dtype), w2_x_ref[:],
                      preferred_element_type=jnp.float32) \
            + pre[:, H:4 * H]
        gh2 = jnp.dot(h2.astype(compute_dtype), w2_hh_ref[:],
                      preferred_element_type=jnp.float32) + b2_hh_ref[0]
        h2 = gru(gi2, gh2, h2)

        x2 = (x1 + h2).astype(compute_dtype)
        f1 = jax.nn.relu(
            jnp.dot(x2, fc1_kx_ref[:], preferred_element_type=jnp.float32)
            + pre[:, 4 * H:4 * H + F])
        f2 = jax.nn.relu(
            jnp.dot(f1.astype(compute_dtype), fc2_kx_ref[:],
                    preferred_element_type=jnp.float32)
            + pre[:, 4 * H + F:4 * H + 2 * F])
        logits = jnp.dot(f2.astype(compute_dtype), fc3_k_ref[:],
                         preferred_element_type=jnp.float32) + fc3_b_ref[0]

        def uniform01():
            # uint32 -> f32 is unsupported in Mosaic: drop to 24 bits,
            # go through int32 (positive range) instead
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((b_pad, n_classes)), jnp.uint32)
            bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
            return bits24.astype(jnp.float32) * (1.0 / 16777216.0)

        if nr_mix:
            # MOL: Gumbel-max mixture pick + logistic inverse-CDF sample
            # (ops/mol.py:sample_from_discretized_mix_logistic) with the
            # packed [logits | means | log_scales] layout masked by lane
            lane = jax.lax.broadcasted_iota(jnp.int32,
                                            (b_pad, n_classes), 1)
            neg = jnp.full_like(logits, -1e30)
            if greedy:
                temp = jnp.where(lane < nr_mix, logits, neg)
            else:
                u = jnp.clip(uniform01(), 1e-5, 1.0 - 1e-5)
                temp = jnp.where(lane < nr_mix, logits - jnp.log(-jnp.log(u)),
                                 neg)
            k_mix = jnp.argmax(temp, axis=-1)[:, None]
            mean = jnp.sum(jnp.where(lane == k_mix + nr_mix, logits, 0.0),
                           axis=-1)
            if greedy:
                sample = jnp.clip(mean, -1.0, 1.0)
            else:
                log_s = jnp.maximum(
                    jnp.sum(jnp.where(lane == k_mix + 2 * nr_mix,
                                      logits, 0.0), axis=-1),
                    LOG_SCALE_MIN)
                u2 = jnp.clip(uniform01(), 1e-5, 1.0 - 1e-5)
                u2c = jnp.sum(jnp.where(lane == 0, u2, 0.0), axis=-1)
                sample = jnp.clip(
                    mean + jnp.exp(log_s)
                    * (jnp.log(u2c) - jnp.log(1.0 - u2c)), -1.0, 1.0)
        else:
            if greedy:
                cls = jnp.argmax(logits, axis=-1)
            else:
                gumbel = -jnp.log(-jnp.log(uniform01() + 1e-9) + 1e-9)
                cls = jnp.argmax(logits + gumbel, axis=-1)
            sample = 2.0 * cls.astype(jnp.float32) / (n_classes - 1.0) - 1.0

        out_ref[t, :] = sample
        return sample[:, None], h1, h2

    x0 = x_ref[:, 0:1]
    carry = jax.lax.fori_loop(0, chunk, step, (x0, h1_ref[:], h2_ref[:]))
    x, h1, h2 = carry
    h1_ref[:] = h1
    h2_ref[:] = h2
    x_ref[:, 0:1] = x


@functools.partial(jax.jit, static_argnames=('n_classes', 'nr_mix',
                                             'rnn_dims', 'fc_dims',
                                             'greedy', 'compute_dtype',
                                             'gate_dtype', 'hoist_pre',
                                             'b_pad', 'chunk'))
def pallas_sample(cond: jnp.ndarray,
                  weights: Dict[str, jnp.ndarray], seed: jnp.ndarray,
                  n_classes: int, rnn_dims: int, fc_dims: int,
                  nr_mix: int = 0,
                  greedy: bool = False,
                  compute_dtype=jnp.bfloat16,
                  gate_dtype=None,
                  hoist_pre: bool = False,
                  b_pad: int = 8, chunk: int = CHUNK) -> jnp.ndarray:
    """`cond` is the compact conditioning, flattened time-major
    (T * b_pad, C_pad) with T % chunk == 0 (row t*b_pad+b = step t,
    lane b). `n_classes` is the (lane-padded) fc3 output width;
    `nr_mix` > 0 switches to MOL sampling with that many mixture
    components. Returns samples (T, b_pad) float32."""
    T = cond.shape[0] // b_pad
    assert T % chunk == 0
    grid = (T // chunk,)
    c_pad = cond.shape[1]
    n_cond = rnn_dims + 3 * rnn_dims + 2 * fc_dims

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if gate_dtype is None:
        gate_dtype = compute_dtype
    kernel = functools.partial(_kernel, n_classes, nr_mix, rnn_dims,
                               fc_dims, greedy, compute_dtype, gate_dtype,
                               b_pad, chunk, hoist_pre)
    pre_scratch = (pltpu.VMEM((chunk * b_pad, n_cond), compute_dtype)
                   if hoist_pre else
                   pltpu.VMEM((8, 128), compute_dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((chunk * b_pad, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # cond
            full((c_pad, n_cond)),                            # wc
            full((1, n_cond)),                                # bc
            full((1, rnn_dims)),                              # w_x
            full((rnn_dims, 3 * rnn_dims)),                   # w1_ih
            full((rnn_dims, 3 * rnn_dims)),                   # w1_hh
            full((1, 3 * rnn_dims)),                          # b1_ih
            full((1, 3 * rnn_dims)),                          # b1_hh
            full((rnn_dims, 3 * rnn_dims)),                   # w2_x
            full((rnn_dims, 3 * rnn_dims)),                   # w2_hh
            full((1, 3 * rnn_dims)),                          # b2_hh
            full((rnn_dims, fc_dims)),                        # fc1_kx
            full((fc_dims, fc_dims)),                         # fc2_kx
            full((fc_dims, n_classes)),                       # fc3_k
            full((1, n_classes)),                             # fc3_b
        ],
        out_specs=pl.BlockSpec((chunk, b_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, b_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_pad, rnn_dims), jnp.float32),  # h1
            pltpu.VMEM((b_pad, rnn_dims), jnp.float32),  # h2
            pltpu.VMEM((b_pad, 128), jnp.float32),       # x carry
            pre_scratch,                                 # hoisted pre
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed, cond,
      weights['wc'], weights['bc'],
      weights['w_x'], weights['w1_ih'], weights['w1_hh'],
      weights['b1_ih'], weights['b1_hh'], weights['w2_x'],
      weights['w2_hh'], weights['b2_hh'], weights['fc1_kx'],
      weights['fc2_kx'], weights['fc3_k'], weights['fc3_b'])


def sample_conditioned(model, params, mels_up: jnp.ndarray,
                       aux: jnp.ndarray, seed: jnp.ndarray,
                       greedy: bool = False,
                       compute_dtype=jnp.bfloat16,
                       gate_dtype=None,
                       hoist_pre=None) -> jnp.ndarray:
    """Traceable sampling path: compact conditioning layout, the
    block-structured conditioning weight, weight casts and the Pallas
    kernel, with no host round-trips — embeddable inside a larger
    jitted program (e.g. the fused mel->wav vocoder pipeline in
    models/wavernn.py).

    mels_up / aux: (B, T, C) arrays; seed: (1,) int32 array.
    Returns samples (B, T) float32.
    """
    rnn_dims, fc_dims = model.rnn_dims, model.fc_dims
    d = model.aux_dims
    feat = model.feat_dims
    B, T = mels_up.shape[0], mels_up.shape[1]
    if B > MAX_LANES:
        # very long utterances: process fold lanes in VMEM-sized groups
        # (each fold starts from zero state, so groups are independent;
        # the groups still live in ONE XLA program)
        parts = [sample_conditioned(model, params,
                                    mels_up[g:g + MAX_LANES],
                                    aux[g:g + MAX_LANES],
                                    seed + g, greedy=greedy,
                                    compute_dtype=compute_dtype,
                                    gate_dtype=gate_dtype)
                 for g in range(0, B, MAX_LANES)]
        return jnp.concatenate(parts, axis=0)
    if model.mode == 'MOL':
        nr_mix = model.n_classes // 3
        n_classes = 128  # lane-padded fc3 width; pad lanes masked off
    else:
        nr_mix = 0
        n_classes = model.n_classes

    b_pad = _b_pad(B)
    chunk = _chunk_for(b_pad)
    if hoist_pre is None:
        # hoisting the chunk's conditioning projection wins at narrow
        # folds; at >64 lanes its scratch overflows VMEM and loses
        hoist_pre = b_pad <= 64
    if hoist_pre:
        # the hoisted-pre scratch (chunk*b_pad, 4H+2F) must stay inside
        # the VMEM budget next to ~10 MB of resident weights
        max_rows = max(8 * 8, (3 << 20) // (2 * (4 * rnn_dims
                                                 + 2 * fc_dims)))
        while chunk > 8 and chunk * b_pad > max_rows:
            chunk -= 8

    # compact conditioning: [mels | a1 | a2 | a3 | a4], lane-padded
    c_raw = feat + 4 * d
    c_pad = max(128, ((c_raw + 127) // 128) * 128)
    cond_btc = jnp.concatenate([mels_up, aux], axis=-1)  # (B, T, c_raw)

    T_pad = ((T + chunk - 1) // chunk) * chunk
    cond = jnp.zeros((T_pad, b_pad, c_pad), compute_dtype)
    cond = cond.at[:T, :B, :c_raw].set(
        jnp.swapaxes(cond_btc, 0, 1).astype(compute_dtype))
    cond = cond.reshape(T_pad * b_pad, c_pad)

    # block-structured conditioning weight: rows are compact channels,
    # cols are the four injection points [i | gi2 | f1 | f2]
    H, F = rnn_dims, fc_dims
    n_cond = 4 * H + 2 * F
    I_k = params['I_kernel']
    wc = jnp.zeros((c_pad, n_cond), jnp.float32)
    wc = wc.at[:feat + d, :H].set(I_k[1:])
    wc = wc.at[feat + d:feat + 2 * d, H:4 * H].set(
        params['rnn2_w_ih'][:, rnn_dims:].T)
    wc = wc.at[feat + 2 * d:feat + 3 * d, 4 * H:4 * H + F].set(
        params['fc1_kernel'][rnn_dims:])
    wc = wc.at[feat + 3 * d:feat + 4 * d, 4 * H + F:].set(
        params['fc2_kernel'][fc_dims:])
    bc = jnp.concatenate([params['I_bias'], params['rnn2_b_ih'],
                          params['fc1_bias'], params['fc2_bias']])

    bf = compute_dtype
    fc3_k = params['fc3_kernel']
    fc3_b = params['fc3_bias']
    if fc3_k.shape[-1] < n_classes:  # MOL: pad fc3 to full lanes
        pad = n_classes - fc3_k.shape[-1]
        fc3_k = jnp.pad(fc3_k, ((0, 0), (0, pad)))
        fc3_b = jnp.pad(fc3_b, (0, pad))
    weights = {
        'wc': wc.astype(bf),
        'bc': bc[None, :].astype(jnp.float32),
        'w_x': I_k[0][None, :].astype(jnp.float32),
        'w1_ih': params['rnn1_w_ih'].T.astype(bf),
        'w1_hh': params['rnn1_w_hh'].T.astype(bf),
        'b1_ih': params['rnn1_b_ih'][None, :].astype(jnp.float32),
        'b1_hh': params['rnn1_b_hh'][None, :].astype(jnp.float32),
        'w2_x': params['rnn2_w_ih'][:, :rnn_dims].T.astype(bf),
        'w2_hh': params['rnn2_w_hh'].T.astype(bf),
        'b2_hh': params['rnn2_b_hh'][None, :].astype(jnp.float32),
        'fc1_kx': params['fc1_kernel'][:rnn_dims].astype(bf),
        'fc2_kx': params['fc2_kernel'][:fc_dims].astype(bf),
        'fc3_k': fc3_k.astype(bf),
        'fc3_b': fc3_b[None, :].astype(jnp.float32),
    }
    samples = pallas_sample(
        cond, weights, seed, n_classes=n_classes, rnn_dims=rnn_dims,
        fc_dims=fc_dims, nr_mix=nr_mix, greedy=greedy,
        compute_dtype=compute_dtype, gate_dtype=gate_dtype,
        hoist_pre=hoist_pre, b_pad=b_pad, chunk=chunk)
    return samples[:T, :B].T


def wavernn_sample_pallas(model, variables: Dict, mels_up: np.ndarray,
                          aux: np.ndarray, seed: int = 0,
                          greedy: bool = False,
                          compute_dtype=jnp.bfloat16) -> np.ndarray:
    """Drop-in replacement for model.sample_scan (RAW and MOL modes).

    mels_up / aux: (B, T, C). Returns samples (B, T) float32.
    """
    B, T = mels_up.shape[0], mels_up.shape[1]
    cache_key = (model, B, T, greedy, jnp.dtype(compute_dtype).name)
    run = _RUN_CACHE.get(cache_key)
    if run is None:
        run = jax.jit(functools.partial(sample_conditioned, model,
                                        greedy=greedy,
                                        compute_dtype=compute_dtype))
        _RUN_CACHE[cache_key] = run
    samples = run(variables['params'], jnp.asarray(mels_up),
                  jnp.asarray(aux), jnp.asarray([seed], jnp.int32))
    return np.asarray(samples)


_RUN_CACHE: dict = {}


def pallas_supported(model) -> bool:
    import jax as _jax
    if model.mode not in ('RAW', 'MOL'):
        return False
    if model.rnn_dims % 128 or model.fc_dims % 128:
        return False
    if model.mode == 'RAW' and model.n_classes % 128:
        return False
    if model.mode == 'MOL' and model.n_classes > 3 * 42:
        return False  # packed MOL params must fit the 128-lane fc3 pad
    platform = _jax.devices()[0].platform
    return platform in ('tpu', 'axon')
