"""Fused bidirectional RNN Pallas kernel vs the lax.scan implementations.

Interpret mode on CPU validates the kernel bookkeeping (chunked grid,
scratch state carry, reversed backward stream, length masking); real-TPU
perf and bf16 behavior are exercised by bench.py / gen CLI runs.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import forwardtacotron_tpu.kernels.birnn as birnn
    if jax.devices()[0].platform == 'cpu':
        monkeypatch.setattr(
            birnn.pl, 'pallas_call',
            functools.partial(pl.pallas_call,
                              interpret=pltpu.InterpretParams()))
    yield


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)


def _dir_params(rng, gates, H, D):
    return {'w_ih': _rand(rng, gates * H, D),
            'w_hh': _rand(rng, gates * H, H),
            'b_ih': _rand(rng, gates * H),
            'b_hh': _rand(rng, gates * H)}


def _stack(pf, pb):
    return tuple(jnp.stack([pf[k], pb[k]])[:, None]
                 for k in ('w_ih', 'w_hh', 'b_ih', 'b_hh'))


@pytest.mark.parametrize('T,lens', [(16, None), (37, (37, 21))])
def test_lstm_kernel_matches_scan(T, lens):
    from forwardtacotron_tpu.kernels.birnn import birnn_pallas
    from forwardtacotron_tpu.ops.rnn import bilstm
    rng = np.random.RandomState(0)
    B, D, H = (1 if lens is None else 2), 128, 128
    pf, pb = _dir_params(rng, 4, H, D), _dir_params(rng, 4, H, D)
    x = _rand(rng, B, T, D)
    lengths = None if lens is None else jnp.asarray(lens)
    ref = bilstm(pf, pb, x, lengths=lengths, pad_value=0.0)
    w_ih, w_hh, b_ih, b_hh = _stack(pf, pb)
    y = birnn_pallas('lstm', w_ih, w_hh, b_ih, b_hh, x[:, :, None, :],
                     lengths=lengths, compute_dtype=jnp.float32)
    out = jnp.concatenate([y[:, :, 0, 0], y[:, :, 0, 1]], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grouped_gru_kernel_matches_scan():
    from forwardtacotron_tpu.kernels.birnn import birnn_pallas
    from forwardtacotron_tpu.ops.rnn import grouped_bigru
    rng = np.random.RandomState(1)
    B, T, G, D, H = 2, 41, 3, 64, 128
    GH = 3 * H
    w_ih = _rand(rng, 2, G, GH, D)
    w_hh = _rand(rng, 2, G, GH, H)
    b_ih = _rand(rng, 2, G, GH)
    b_hh = _rand(rng, 2, G, GH)
    x = _rand(rng, B, T, G, D)
    lens = jnp.asarray([41, 18])
    ref = grouped_bigru(w_ih, w_hh, b_ih, b_hh, x, lengths=lens)
    out = birnn_pallas('gru', w_ih, w_hh, b_ih, b_hh, x, lengths=lens,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_generate_fast_path_through_model(monkeypatch):
    """model.generate(fast=True) with the kernel force-enabled equals
    the scan path (tiny dims padded to the kernel's 128 alignment are
    not available, so force support and use H=128)."""
    import forwardtacotron_tpu.kernels.birnn as birnn
    import forwardtacotron_tpu.ops.rnn as rnn_ops
    monkeypatch.setattr(birnn, 'birnn_pallas_supported',
                        lambda hidden, batch: hidden % 128 == 0
                        and batch <= 8)
    monkeypatch.setattr(rnn_ops, 'FAST_KERNEL_MIN_T', 8)

    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    cfg = dict(embed_dims=32, series_embed_dims=8,
               durpred_conv_dims=16, durpred_rnn_dims=8,
               pitch_conv_dims=16, pitch_rnn_dims=8,
               energy_conv_dims=16, energy_rnn_dims=8,
               rnn_dims=128, prenet_dims=64, prenet_k=2,
               prenet_num_highways=1, postnet_dims=128, postnet_k=2,
               postnet_num_highways=1, num_chars=40, n_mels=8)
    model = ForwardTacotron(**cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(1, 39, (1, 12)), jnp.int32)
    xl = jnp.asarray([10])
    v = model.init({'params': jax.random.PRNGKey(0)}, x, 64,
                   method='generate', x_len=xl)
    slow = model.apply(v, x, 64, method='generate', x_len=xl, fast=False)
    fast = model.apply(v, x, 64, method='generate', x_len=xl, fast=True)
    ml = int(slow['mel_len'][0])
    assert ml == int(fast['mel_len'][0])
    np.testing.assert_allclose(np.asarray(fast['mel_post'])[:, :ml],
                               np.asarray(slow['mel_post'])[:, :ml],
                               atol=2e-2)  # kernel defaults to bf16


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
