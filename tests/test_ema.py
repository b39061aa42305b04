"""EMA weight tracking (beyond-reference, training.ema_decay > 0):
update math, checkpoint roundtrip, and inference-time preference of the
smoothed weights."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_model_and_batch():
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    tiny = dict(embed_dims=16, series_embed_dims=8,
                durpred_conv_dims=8, durpred_rnn_dims=4,
                durpred_dropout=0.0, pitch_conv_dims=8, pitch_rnn_dims=4,
                pitch_dropout=0.0, pitch_strength=1.0, energy_conv_dims=8,
                energy_rnn_dims=4, energy_dropout=0.0, energy_strength=1.0,
                rnn_dims=16, prenet_dims=8, prenet_k=2, prenet_dropout=0.0,
                prenet_num_highways=1, postnet_dims=8, postnet_k=2,
                postnet_num_highways=1, postnet_dropout=0.0)
    model = ForwardTacotron(num_chars=30, n_mels=8, **tiny)
    rng = np.random.RandomState(0)
    B, Tx, Tm = 2, 6, 16
    batch = {
        'x': jnp.asarray(rng.randint(1, 30, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, Tm, 8), jnp.float32),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
        'dur': jnp.asarray(np.full((B, Tx), Tm // Tx, np.float32)),
        'pitch': jnp.asarray(rng.randn(B, Tx), jnp.float32),
        'energy': jnp.asarray(rng.randn(B, Tx), jnp.float32),
    }
    return model, batch


TRAIN_CFG = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
             'energy_loss_factor': 0.1, 'pitch_zoneout': 0.0,
             'energy_zoneout': 0.0, 'clip_grad_norm': 1.0,
             'ema_decay': 0.5}


def test_ema_update_math_and_state():
    from forwardtacotron_tpu.train import common as tc
    model, batch = _tiny_model_and_batch()
    opt = tc.make_optimizer(1.0, lr=1e-2)
    rng = jax.random.PRNGKey(0)
    state = tc.init_train_state(model, opt, batch, rng,
                                init_kwargs={'train': True}, with_ema=True)
    # at init the EMA equals the params
    for e, p in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step_fn = jax.jit(tc.build_forward_train_step(model, opt, TRAIN_CFG))
    p0 = jax.device_get(state.params)
    new_state, metrics = step_fn(state, batch, rng)
    assert np.isfinite(float(metrics['loss']))
    # ema_1 = d * p0 + (1-d) * p1 with d = 0.5 (ema_0 == p0)
    d = TRAIN_CFG['ema_decay']
    for e, old, new in zip(jax.tree.leaves(new_state.ema_params),
                           jax.tree.leaves(p0),
                           jax.tree.leaves(jax.device_get(
                               new_state.params))):
        np.testing.assert_allclose(
            np.asarray(e), d * np.asarray(old) + (1 - d) * np.asarray(new),
            rtol=1e-6, atol=1e-7)

    # without ema_decay the field stays None and steps still run
    state2 = tc.init_train_state(model, opt, batch, rng,
                                 init_kwargs={'train': True})
    cfg = dict(TRAIN_CFG, ema_decay=0.0)
    fn2 = jax.jit(tc.build_forward_train_step(model, opt, cfg))
    out2, _ = fn2(state2, batch, rng)
    assert out2.ema_params is None


def test_ema_checkpoint_roundtrip_and_inference_preference(tmp_path):
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.checkpoints import (load_tts_checkpoint,
                                                       restore_checkpoint,
                                                       save_checkpoint)
    from forwardtacotron_tpu.utils.files import read_config
    model, batch = _tiny_model_and_batch()
    opt = tc.make_optimizer(1.0, lr=1e-2)
    rng = jax.random.PRNGKey(0)
    state = tc.init_train_state(model, opt, batch, rng,
                                init_kwargs={'train': True}, with_ema=True)
    step_fn = jax.jit(tc.build_forward_train_step(model, opt, TRAIN_CFG))
    state, _ = step_fn(state, batch, rng)

    config = read_config('config.yaml')
    # make the embedded config rebuild THIS tiny model on load
    tiny_cfg = {k: getattr(model, k) for k in
                ('embed_dims', 'series_embed_dims', 'durpred_conv_dims',
                 'durpred_rnn_dims', 'durpred_dropout', 'pitch_conv_dims',
                 'pitch_rnn_dims', 'pitch_dropout', 'pitch_strength',
                 'energy_conv_dims', 'energy_rnn_dims', 'energy_dropout',
                 'energy_strength', 'rnn_dims', 'prenet_dims', 'prenet_k',
                 'prenet_dropout', 'prenet_num_highways', 'postnet_dims',
                 'postnet_k', 'postnet_num_highways', 'postnet_dropout')}
    config['forward_tacotron']['model'] = tiny_cfg
    config['dsp']['num_mels'] = 8
    path = tmp_path / 'ema_model.fjax'
    save_checkpoint(state.save_variables, config, path,
                    opt_state=state.opt_state, step=int(state.step))

    payload = restore_checkpoint(path)
    assert 'ema_params' in payload['model']
    # raw and ema copies differ after a step, and both round-trip
    raw = jax.tree.leaves(payload['model']['params'])[0]
    ema = jax.tree.leaves(payload['model']['ema_params'])[0]
    assert not np.allclose(np.asarray(raw), np.asarray(ema))

    _, v_ema, _, _ = load_tts_checkpoint(path)
    _, v_raw, _, _ = load_tts_checkpoint(path, use_ema=False)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(v_ema['params'])[0]), np.asarray(ema))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(v_raw['params'])[0]), np.asarray(raw))
    assert 'ema_params' not in v_ema and 'ema_params' not in v_raw

    # eval_variables serves the smoothed copy
    ev = state.eval_variables
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ev['params'])[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]))


def test_ema_state_shardings_mirror_params():
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip('needs the multi-device CPU mesh')
    model, batch = _tiny_model_and_batch()
    opt = tc.make_optimizer(1.0, lr=1e-2)
    state = tc.init_train_state(model, opt, batch, jax.random.PRNGKey(0),
                                init_kwargs={'train': True}, with_ema=True)
    mesh = pmesh.make_mesh(n_data=len(jax.devices()) // 2, n_model=2)
    sh = pmesh.state_shardings(mesh, state)
    assert jax.tree.structure(sh.ema_params) == \
        jax.tree.structure(sh.params)
    sharded = jax.device_put(state, sh)
    step_fn = jax.jit(tc.build_forward_train_step(model, opt, TRAIN_CFG))
    out, metrics = step_fn(sharded, jax.device_put(
        batch, pmesh.batch_shardings(mesh, batch)), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert out.ema_params is not None


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
