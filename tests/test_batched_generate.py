"""Batched padded-bucket generation: per-item lengths must behave like
independent single-item runs (the masking contract of the models)."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp

TINY = {
    'embed_dims': 16, 'series_embed_dims': 8,
    'durpred_conv_dims': 8, 'durpred_rnn_dims': 4, 'durpred_dropout': 0.5,
    'pitch_conv_dims': 8, 'pitch_rnn_dims': 4, 'pitch_dropout': 0.5,
    'pitch_strength': 1.0,
    'energy_conv_dims': 8, 'energy_rnn_dims': 4, 'energy_dropout': 0.5,
    'energy_strength': 1.0,
    'rnn_dims': 12, 'prenet_dims': 8, 'prenet_k': 2, 'prenet_dropout': 0.5,
    'prenet_num_highways': 1, 'postnet_dims': 8, 'postnet_k': 2,
    'postnet_num_highways': 1, 'postnet_dropout': 0.0,
}


def test_batched_generate_equals_single():
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(num_chars=40, n_mels=6, **TINY)
    rng = np.random.RandomState(0)
    Tx = 10
    x = np.zeros((2, Tx), dtype=np.int32)
    lens = [7, 4]
    for i, l in enumerate(lens):
        x[i, :l] = rng.randint(1, 39, l)

    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.asarray(x), 32, method='generate',
                           x_len=jnp.asarray(lens))

    batched = model.apply(variables, jnp.asarray(x), 32,
                          method='generate', x_len=jnp.asarray(lens))

    for i, l in enumerate(lens):
        single = model.apply(variables, jnp.asarray(x[i:i + 1]), 32,
                             method='generate', x_len=jnp.asarray([l]))
        bl = int(batched['mel_len'][i])
        sl = int(single['mel_len'][0])
        assert bl == sl
        np.testing.assert_allclose(
            np.asarray(batched['mel_post'])[i, :bl],
            np.asarray(single['mel_post'])[0, :sl], atol=1e-5)


def test_fused_series_matches_unfused():
    """predict_series fused path (one grouped scan for dur/pitch/energy,
    mixed hidden widths) == the three separate predictor runs."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    cfg = dict(TINY)
    cfg.update(durpred_rnn_dims=4, pitch_rnn_dims=6, energy_rnn_dims=3)
    model = ForwardTacotron(num_chars=40, n_mels=6, **cfg)
    rng = np.random.RandomState(1)
    x = np.zeros((2, 12), dtype=np.int32)
    lens = [12, 8]
    for i, l in enumerate(lens):
        x[i, :l] = rng.randint(1, 39, l)
    x = jnp.asarray(x)
    xl = jnp.asarray(lens)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)
    kw = dict(alpha=1.2, pitch_scale=0.7, energy_scale=1.4, x_len=xl)
    un = model.apply(variables, x, method='predict_series', fused=False,
                     **kw)
    fu = model.apply(variables, x, method='predict_series', fused=True,
                     **kw)
    for k in un:
        np.testing.assert_allclose(np.asarray(fu[k]), np.asarray(un[k]),
                                   atol=1e-6)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
