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


@pytest.mark.parametrize('cell', ['gru', 'lstm'])
@pytest.mark.parametrize('T,lens', [(29, None), (64, None), (29, (29, 13))])
def test_train_kernel_value_and_grads_match_scan(cell, T, lens):
    """birnn_train (custom_vjp kernel pair) vs jax.grad THROUGH the
    lax.scan path: outputs and every parameter/input gradient must
    agree at valid positions (padded positions carry pass-through
    state in the kernel and pad_value in the scan wrapper, so the
    readout weights zero them on both sides). lens=None exercises the
    unmasked-specialized kernels when T happens to divide the chunk
    (T=64) and the padded-rows fallback when it doesn't (T=29)."""
    from forwardtacotron_tpu.kernels.birnn import birnn_train
    from forwardtacotron_tpu.ops.rnn import bigru, bilstm
    rng = np.random.RandomState(3)
    B, D, H = 2, 128, 128
    gates = 4 if cell == 'lstm' else 3
    pf = _dir_params(rng, gates, H, D)
    pb = _dir_params(rng, gates, H, D)
    x = _rand(rng, B, T, D)
    lengths = None if lens is None else jnp.asarray(lens, jnp.int32)
    lengths_full = jnp.full((B,), T, jnp.int32) if lens is None \
        else jnp.asarray(lens, jnp.int32)
    valid = (jnp.arange(T)[None, :, None]
             < lengths_full[:, None, None]).astype(jnp.float32)
    w_read = _rand(rng, B, T, 2 * H) * valid
    scan_fn = bilstm if cell == 'lstm' else bigru

    def loss_scan(pf, pb, x):
        y = scan_fn(pf, pb, x, lengths=lengths, pad_value=0.0)
        return jnp.sum(y * w_read)

    def loss_kern(pf, pb, x):
        y = birnn_train(
            cell,
            jnp.stack([pf['w_ih'], pb['w_ih']]),
            jnp.stack([pf['w_hh'], pb['w_hh']]),
            jnp.stack([pf['b_ih'], pb['b_ih']]),
            jnp.stack([pf['b_hh'], pb['b_hh']]), x, lengths)
        return jnp.sum(y * w_read)

    v1, g1 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(pf, pb, x)
    v2, g2 = jax.value_and_grad(loss_kern, argnums=(0, 1, 2))(pf, pb, x)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=2e-5, atol=1e-5)
    for t1, t2, name in zip(g1, g2, ('pf', 'pb', 'x')):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5),
            t1, t2)


def test_train_grads_through_model_kernel_vs_scan(monkeypatch):
    """Full teacher-forced ForwardTacotron loss: gradients with the
    trainable kernel routed in (decoder BiLSTM + CBHG BiGRUs at
    H=128) must match the lax.scan training path. The series
    predictors keep H=8 (not lane-aligned) so the dispatch picks the
    kernel only where supported — exercising the mixed routing the
    real train step uses."""
    import forwardtacotron_tpu.kernels.birnn as birnn
    import forwardtacotron_tpu.ops.rnn as rnn_ops
    monkeypatch.setattr(birnn, 'birnn_train_supported',
                        lambda hidden, seq_len: hidden % 128 == 0
                        and seq_len >= 8)
    monkeypatch.setattr(rnn_ops, 'FUSE_BIDIR_MAX_BATCH', 1)

    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(
        embed_dims=32, series_embed_dims=8,
        durpred_conv_dims=16, durpred_rnn_dims=8,
        pitch_conv_dims=16, pitch_rnn_dims=8,
        energy_conv_dims=16, energy_rnn_dims=8,
        rnn_dims=128, prenet_dims=128, prenet_k=2,
        prenet_num_highways=1, postnet_dims=128, postnet_k=2,
        postnet_num_highways=1, num_chars=40, n_mels=8)
    rng = np.random.RandomState(4)
    B, Tx, Tm = 2, 8, 16
    batch = {
        'x': jnp.asarray(rng.randint(1, 39, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': _rand(rng, B, Tm, 8),
        'mel_len': jnp.asarray([Tm, Tm - 4], jnp.int32),
        'dur': jnp.asarray(np.full((B, Tx), Tm // Tx, np.float32)),
        'pitch': _rand(rng, B, Tx),
        'energy': _rand(rng, B, Tx),
    }
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           train=False)

    def loss(params, use_kernel):
        monkeypatch.setattr(rnn_ops, 'TRAIN_KERNEL_ENABLED', use_kernel)
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(7)})
        return (jnp.sum(out['mel'] ** 2) + jnp.sum(out['mel_post'] ** 2)
                + jnp.sum(out['dur'] ** 2))

    v_scan, g_scan = jax.value_and_grad(
        lambda p: loss(p, False))(variables['params'])
    v_kern, g_kern = jax.value_and_grad(
        lambda p: loss(p, True))(variables['params'])
    np.testing.assert_allclose(np.asarray(v_kern), np.asarray(v_scan),
                               rtol=1e-5)
    flat_s = jax.tree_util.tree_flatten_with_path(g_scan)[0]
    flat_k = jax.tree_util.tree_flatten_with_path(g_kern)[0]
    for (path, a), (_, b) in zip(flat_s, flat_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_train_kernel_dispatch_batch_crossover(monkeypatch):
    """The trainable kernel must engage only at B <= 32: beyond that
    its VMEM-driven chunk collapses and the scan path is measurably
    faster (docs/benchmarks.md batch-crossover table)."""
    import forwardtacotron_tpu.kernels.birnn as birnn
    import forwardtacotron_tpu.ops.rnn as rnn_ops
    monkeypatch.setattr(birnn, 'birnn_train_supported',
                        lambda hidden, seq_len: True)
    monkeypatch.setattr(rnn_ops, 'TRAIN_KERNEL_ENABLED', True)
    x32 = jnp.zeros((32, 128, 8))
    x64 = jnp.zeros((64, 128, 8))
    assert rnn_ops._train_kernel_ok(x32, 128) is True
    assert rnn_ops._train_kernel_ok(x64, 128) is False
    monkeypatch.setattr(rnn_ops, 'TRAIN_KERNEL_ENABLED', False)
    assert rnn_ops._train_kernel_ok(x32, 128) is False


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
