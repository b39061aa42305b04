"""Fused Pallas kernel for WaveRNN autoregressive sampling.

The lax.scan sampler (models/wavernn.py:sample_scan) re-reads the GRU/FC
weights from HBM on every step through XLA's while-loop. This kernel is
the speed-of-light version for the serving path:

- ALL loop weights (both GRU gate matrices, fc1/fc2/fc3) are cast to
  bfloat16 and pinned in VMEM for the kernel's whole lifetime (~8 MB);
- the per-step conditioning rows (I/gi2/fc1/fc2 projections, precomputed
  on the MXU outside the kernel) are streamed HBM->VMEM in chunked
  blocks by the Pallas pipeline;
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


# Wider fold batches are processed in sequential lane groups. 64 is the
# widest group whose streamed conditioning blocks (chunk*b_pad rows of
# 3072 bf16 cols, double-buffered) + ~8 MB of resident weights fit the
# 16 MB scoped-VMEM budget; 128 lanes compile-OOMs.
MAX_LANES = 64


def _chunk_for(b_pad: int) -> int:
    """Steps per grid block: keep streamed-block rows (chunk * b_pad)
    ~256 so the double-buffered conditioning blocks stay well inside
    the 16 MB VMEM budget at any fold width (wide folds = many lanes =
    shorter chunks). Must stay a multiple of 8 (output block sublanes)."""
    return max(8, ((CHUNK * 8) // b_pad) // 8 * 8)


def _kernel(n_classes: int, nr_mix: int, rnn_dims: int, fc_dims: int,
            greedy: bool, compute_dtype, b_pad: int, chunk: int,
            # refs:
            seed_ref,                      # SMEM (1,)
            i_pre_ref, gi2_pre_ref, fc1_pre_ref, fc2_pre_ref,  # (CHUNK*B,D)
            w_x_ref,                       # (1, rnn)
            w1_ih_ref, w1_hh_ref, b1_ih_ref, b1_hh_ref,
            w2_x_ref, w2_hh_ref, b2_hh_ref,
            fc1_kx_ref, fc2_kx_ref, fc3_k_ref, fc3_b_ref,
            out_ref,                       # (CHUNK, B)
            h1_ref, h2_ref, x_ref):        # scratch (B, rnn)/(B, 128)
    H = rnn_dims

    @pl.when(pl.program_id(0) == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        x_ref[:] = jnp.zeros_like(x_ref)

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def gru(gi, gh, h):
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        return (1.0 - z) * n + z * h

    def step(t, carry):
        x, h1, h2 = carry  # (B,1) f32, (B,H) f32, (B,H) f32

        row = t * b_pad
        xt = i_pre_ref[pl.ds(row, b_pad), :].astype(jnp.float32) \
            + x * w_x_ref[0][None, :]

        xt_b = xt.astype(compute_dtype)
        gi1 = jnp.dot(xt_b, w1_ih_ref[:],
                      preferred_element_type=jnp.float32) + b1_ih_ref[0]
        gh1 = jnp.dot(h1.astype(compute_dtype), w1_hh_ref[:],
                      preferred_element_type=jnp.float32) + b1_hh_ref[0]
        h1 = gru(gi1, gh1, h1)

        x1 = xt + h1
        gi2 = jnp.dot(x1.astype(compute_dtype), w2_x_ref[:],
                      preferred_element_type=jnp.float32) \
            + gi2_pre_ref[pl.ds(row, b_pad), :].astype(jnp.float32)
        gh2 = jnp.dot(h2.astype(compute_dtype), w2_hh_ref[:],
                      preferred_element_type=jnp.float32) + b2_hh_ref[0]
        h2 = gru(gi2, gh2, h2)

        x2 = (x1 + h2).astype(compute_dtype)
        f1 = jax.nn.relu(
            jnp.dot(x2, fc1_kx_ref[:], preferred_element_type=jnp.float32)
            + fc1_pre_ref[pl.ds(row, b_pad), :].astype(jnp.float32))
        f2 = jax.nn.relu(
            jnp.dot(f1.astype(compute_dtype), fc2_kx_ref[:],
                    preferred_element_type=jnp.float32)
            + fc2_pre_ref[pl.ds(row, b_pad), :].astype(jnp.float32))
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
                                             'b_pad', 'chunk'))
def pallas_sample(i_pre: jnp.ndarray, gi2_pre: jnp.ndarray,
                  fc1_pre: jnp.ndarray, fc2_pre: jnp.ndarray,
                  weights: Dict[str, jnp.ndarray], seed: jnp.ndarray,
                  n_classes: int, rnn_dims: int, fc_dims: int,
                  nr_mix: int = 0,
                  greedy: bool = False,
                  compute_dtype=jnp.bfloat16,
                  b_pad: int = 8, chunk: int = CHUNK) -> jnp.ndarray:
    """Inputs are flattened time-major (T * b_pad, D) with
    T % CHUNK == 0 (row t*b_pad+b = step t, lane b). `n_classes` is the
    (lane-padded) fc3 output width; `nr_mix` > 0 switches to MOL
    sampling with that many mixture components. Returns samples
    (T, b_pad) float32."""
    T = i_pre.shape[0] // b_pad
    assert T % chunk == 0
    grid = (T // chunk,)

    def time_block(d):
        return pl.BlockSpec((chunk * b_pad, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, n_classes, nr_mix, rnn_dims,
                               fc_dims, greedy, compute_dtype, b_pad,
                               chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            time_block(rnn_dims),                             # i_pre
            time_block(3 * rnn_dims),                         # gi2_pre
            time_block(fc_dims),                              # fc1_pre
            time_block(fc_dims),                              # fc2_pre
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
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed, i_pre, gi2_pre, fc1_pre, fc2_pre,
      weights['w_x'], weights['w1_ih'], weights['w1_hh'],
      weights['b1_ih'], weights['b1_hh'], weights['w2_x'],
      weights['w2_hh'], weights['b2_hh'], weights['fc1_kx'],
      weights['fc2_kx'], weights['fc3_k'], weights['fc3_b'])


def sample_conditioned(model, params, mels_up: jnp.ndarray,
                       aux: jnp.ndarray, seed: jnp.ndarray,
                       greedy: bool = False,
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Traceable sampling path: conditioning precomputes, layout prep,
    weight casts and the Pallas kernel, with no host round-trips —
    embeddable inside a larger jitted program (e.g. the fused
    mel->wav vocoder pipeline in models/wavernn.py).

    mels_up / aux: (B, T, C) arrays; seed: (1,) int32 array.
    Returns samples (B, T) float32.
    """
    rnn_dims, fc_dims = model.rnn_dims, model.fc_dims
    d = model.aux_dims
    B, T = mels_up.shape[0], mels_up.shape[1]
    if B > MAX_LANES:
        # very long utterances: process fold lanes in VMEM-sized groups
        # (each fold starts from zero state, so groups are independent;
        # the groups still live in ONE XLA program)
        parts = [sample_conditioned(model, params,
                                    mels_up[g:g + MAX_LANES],
                                    aux[g:g + MAX_LANES],
                                    seed + g, greedy=greedy,
                                    compute_dtype=compute_dtype)
                 for g in range(0, B, MAX_LANES)]
        return jnp.concatenate(parts, axis=0)
    if model.mode == 'MOL':
        nr_mix = model.n_classes // 3
        n_classes = 128  # lane-padded fc3 width; pad lanes masked off
    else:
        nr_mix = 0
        n_classes = model.n_classes

    b_pad = _b_pad(B)
    a1 = aux[..., 0 * d:1 * d]
    a2 = aux[..., 1 * d:2 * d]
    a3 = aux[..., 2 * d:3 * d]
    a4 = aux[..., 3 * d:4 * d]

    I_k = params['I_kernel']
    i_pre = jnp.concatenate([mels_up, a1], axis=-1) @ I_k[1:] \
        + params['I_bias']
    gi2_pre = a2 @ params['rnn2_w_ih'][:, rnn_dims:].T \
        + params['rnn2_b_ih']
    fc1_pre = a3 @ params['fc1_kernel'][rnn_dims:] + params['fc1_bias']
    fc2_pre = a4 @ params['fc2_kernel'][fc_dims:] + params['fc2_bias']

    chunk = _chunk_for(b_pad)

    def prep(x, d_last):
        # (B, T, D) -> (T_pad * b_pad, D), T padded to the chunk
        T_pad = ((T + chunk - 1) // chunk) * chunk
        out = jnp.zeros((T_pad, b_pad, d_last), compute_dtype)
        out = out.at[:T, :B].set(
            jnp.swapaxes(x, 0, 1).astype(compute_dtype))
        return out.reshape(T_pad * b_pad, d_last)

    bf = compute_dtype
    fc3_k = params['fc3_kernel']
    fc3_b = params['fc3_bias']
    if fc3_k.shape[-1] < n_classes:  # MOL: pad fc3 to full lanes
        pad = n_classes - fc3_k.shape[-1]
        fc3_k = jnp.pad(fc3_k, ((0, 0), (0, pad)))
        fc3_b = jnp.pad(fc3_b, (0, pad))
    weights = {
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
        prep(i_pre, rnn_dims), prep(gi2_pre, 3 * rnn_dims),
        prep(fc1_pre, fc_dims), prep(fc2_pre, fc_dims),
        weights, seed, n_classes=n_classes, rnn_dims=rnn_dims,
        fc_dims=fc_dims, nr_mix=nr_mix, greedy=greedy,
        compute_dtype=compute_dtype, b_pad=b_pad, chunk=chunk)
    return samples[:T, :B].T


def wavernn_sample_pallas(model, variables: Dict, mels_up: np.ndarray,
                          aux: np.ndarray, seed: int = 0,
                          greedy: bool = False,
                          compute_dtype=jnp.bfloat16) -> np.ndarray:
    """Drop-in replacement for model.sample_scan (RAW and MOL modes).

    mels_up / aux: (B, T, C). Returns samples (B, T) float32.
    """
    B, T = mels_up.shape[0], mels_up.shape[1]
    cache_key = (id(model), B, T, greedy, jnp.dtype(compute_dtype).name)
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
