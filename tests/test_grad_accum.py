"""Gradient accumulation and rematerialization in the fused train step.

grad_accum=K scans K micro-batches, averaging grads into ONE optimizer
update — with duplicated micro-batches and dropout off, the updated
params must bit-match a single-micro-batch step. remat=True must not
change the math (only the backward-pass memory schedule).
"""
import pytest  # noqa: E402
import numpy as np
import jax
import jax.numpy as jnp

from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
from forwardtacotron_tpu.train import common as tc

TINY = {
    'embed_dims': 16, 'series_embed_dims': 8,
    'durpred_conv_dims': 8, 'durpred_rnn_dims': 4, 'durpred_dropout': 0.0,
    'pitch_conv_dims': 8, 'pitch_rnn_dims': 4, 'pitch_dropout': 0.0,
    'pitch_strength': 1.0,
    'energy_conv_dims': 8, 'energy_rnn_dims': 4, 'energy_dropout': 0.0,
    'energy_strength': 1.0,
    'rnn_dims': 12, 'prenet_dims': 8, 'prenet_k': 2, 'prenet_dropout': 0.0,
    'prenet_num_highways': 1, 'postnet_dims': 8, 'postnet_k': 2,
    'postnet_num_highways': 1, 'postnet_dropout': 0.0,
    'n_mels': 6,
}

CFG = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
       'energy_loss_factor': 0.1, 'pitch_zoneout': 0.0,
       'energy_zoneout': 0.0}


def _micro_batch(rng, B=2, Tx=6, T=12, n_mels=6):
    dur = np.full((B, Tx), T // Tx, np.float32)
    return {
        'x': jnp.asarray(rng.randint(1, 39, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, T, n_mels), jnp.float32),
        'mel_len': jnp.asarray([T] * B, jnp.int32),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(rng.randn(B, Tx), jnp.float32),
        'energy': jnp.asarray(rng.randn(B, Tx), jnp.float32),
    }


def _setup():
    model = ForwardTacotron(num_chars=40, **TINY)
    optimizer = tc.make_optimizer(None, lr=1e-3)
    micro = _micro_batch(np.random.RandomState(0))
    state = tc.init_train_state(model, optimizer, micro,
                                jax.random.PRNGKey(0),
                                init_kwargs={'train': True})
    return model, optimizer, micro, state


def test_grad_accum_matches_single_micro_batch():
    model, optimizer, micro, state = _setup()
    # B=4 batch = the same 2-row micro-batch twice -> identical
    # per-micro grads -> accumulated average == single-micro grads
    double = jax.tree.map(
        lambda a: jnp.concatenate([a, a], axis=0), micro)

    step1 = jax.jit(tc.build_forward_train_step(model, optimizer, CFG))
    step2 = jax.jit(tc.build_forward_train_step(
        model, optimizer, dict(CFG, grad_accum=2)))

    rng = jax.random.PRNGKey(1)
    s1, m1 = step1(state, micro, rng)
    s2, m2 = step2(state, double, rng)
    assert int(s2.step) == 1
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-6)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_remat_matches_plain_step():
    model, optimizer, micro, state = _setup()
    plain = jax.jit(tc.build_forward_train_step(model, optimizer, CFG))
    remat = jax.jit(tc.build_forward_train_step(
        model, optimizer, dict(CFG, remat=True)))
    rng = jax.random.PRNGKey(2)
    s1, m1 = plain(state, micro, rng)
    s2, m2 = remat(state, micro, rng)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_grad_accum_with_remat_and_bf16_runs():
    """The three features compose: accumulated bf16 micro-steps with
    rematerialized backward, finite loss, one step."""
    model, optimizer, micro, state = _setup()
    double = jax.tree.map(
        lambda a: jnp.concatenate([a, a], axis=0), micro)
    step = jax.jit(tc.build_forward_train_step(
        model, optimizer,
        dict(CFG, grad_accum=2, remat=True, precision='bf16')))
    s, m = step(state, double, jax.random.PRNGKey(3))
    assert int(s.step) == 1
    assert np.isfinite(float(m['loss']))


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
