"""Discretized mixture-of-logistics loss + sampler.

Parity surface: utils/distribution.py in the reference (adapted there
from r9y9/wavenet_vocoder). Port to jnp with identical edge-case
handling; the sampler takes an explicit PRNG key instead of torch's
global generator so it can run inside jitted sampling loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LOG_SCALE_MIN = float(np.log(1e-14))


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_classes: int = 65536,
                                  log_scale_min: float = LOG_SCALE_MIN,
                                  reduce: bool = True) -> jnp.ndarray:
    """y_hat (B, T, 3*nr_mix) time-major; y (B, T) or (B, T, 1)."""
    if y.ndim == 2:
        y = y[..., None]
    nr_mix = y_hat.shape[-1] // 3

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.clip(y_hat[..., 2 * nr_mix:3 * nr_mix],
                          min=log_scale_min)

    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner_cond = (cdf_delta > 1e-5).astype(jnp.float32)
    inner_inner_out = (
        inner_inner_cond * jnp.log(jnp.clip(cdf_delta, min=1e-12))
        + (1.0 - inner_inner_cond)
        * (log_pdf_mid - np.log((num_classes - 1) / 2)))
    inner_cond = (y > 0.999).astype(jnp.float32)
    inner_out = (inner_cond * log_one_minus_cdf_min
                 + (1.0 - inner_cond) * inner_inner_out)
    cond = (y < -0.999).astype(jnp.float32)
    log_probs = cond * log_cdf_plus + (1.0 - cond) * inner_out

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    if reduce:
        return -jnp.mean(log_sum_exp(log_probs))
    return -log_sum_exp(log_probs)[..., None]


def greedy_from_discretized_mix_logistic(y: jnp.ndarray) -> jnp.ndarray:
    """Deterministic MOL 'sample': the mean of the most likely mixture
    component. Used as the reproducible trajectory for kernel parity
    tests (the stochastic sampler below is the production path)."""
    nr_mix = y.shape[-1] // 3
    argmax = jnp.argmax(y[..., :nr_mix], axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix)
    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    return jnp.clip(means, -1.0, 1.0)


def sample_from_discretized_mix_logistic(
        y: jnp.ndarray, key: jax.Array,
        log_scale_min: float = LOG_SCALE_MIN) -> jnp.ndarray:
    """y (..., 3*nr_mix) -> sample in [-1, 1] of shape (...)."""
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]

    k1, k2 = jax.random.split(key)
    temp = jax.random.uniform(k1, logit_probs.shape, minval=1e-5,
                              maxval=1.0 - 1e-5)
    temp = logit_probs - jnp.log(-jnp.log(temp))
    argmax = jnp.argmax(temp, axis=-1)

    one_hot = jax.nn.one_hot(argmax, nr_mix)
    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.clip(
        jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1),
        min=log_scale_min)
    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
