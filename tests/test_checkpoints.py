"""Checkpoint save/restore roundtrip incl. optimizer state and the
torch `.pt` conversion path."""
import numpy as np
import pytest


def test_save_restore_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state,
                                                       save_checkpoint)

    params = {'a': jnp.ones((3, 4)), 'b': {'c': jnp.arange(5.0)}}
    optimizer = tc.make_optimizer(1.0, lr=3e-4)
    opt_state = optimizer.init(params)
    cfg = {'tts_model': 'forward_tacotron', 'x': 1}

    save_checkpoint({'params': params, 'batch_stats': {}}, cfg,
                    tmp_path / 'm.fjax', opt_state=opt_state, step=123)
    payload = restore_checkpoint(tmp_path / 'm.fjax')
    assert payload['step'] == 123
    assert payload['config'] == cfg
    np.testing.assert_allclose(payload['model']['params']['a'],
                               np.ones((3, 4)))

    opt_state2 = restore_opt_state(payload, optimizer.init(params))
    flat1 = jax.tree.leaves(opt_state)
    flat2 = jax.tree.leaves(opt_state2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_torch_pt_loading(tmp_path):
    """A reference-format .pt checkpoint loads and runs."""
    torch = pytest.importorskip('torch')
    import sys
    from pathlib import Path
    if not Path('/root/reference').exists():
        pytest.skip('no reference repo')
    sys.path.insert(0, '/root/reference')
    from models.forward_tacotron import ForwardTacotron as TorchFT

    model_cfg = {
        'embed_dims': 16, 'series_embed_dims': 8,
        'durpred_conv_dims': 8, 'durpred_rnn_dims': 4,
        'durpred_dropout': 0.5,
        'pitch_conv_dims': 8, 'pitch_rnn_dims': 4, 'pitch_dropout': 0.5,
        'pitch_strength': 1.0,
        'energy_conv_dims': 8, 'energy_rnn_dims': 4, 'energy_dropout': 0.5,
        'energy_strength': 1.0,
        'rnn_dims': 8, 'prenet_dims': 8, 'prenet_k': 2,
        'postnet_num_highways': 1, 'prenet_dropout': 0.5,
        'postnet_dims': 8, 'postnet_k': 2, 'prenet_num_highways': 1,
        'postnet_dropout': 0.0,
    }
    torch.manual_seed(0)
    from forwardtacotron_tpu.text.symbols import phonemes
    tmodel = TorchFT(num_chars=len(phonemes), n_mels=8, **model_cfg)
    config = {'tts_model': 'forward_tacotron',
              'forward_tacotron': {'model': model_cfg},
              'dsp': {'num_mels': 8}}
    pt_path = tmp_path / 'ckpt.pt'
    torch.save({'model': tmodel.state_dict(), 'config': config}, pt_path)

    # note: from_config injects num_chars=len(phonemes)=120 and n_mels
    from forwardtacotron_tpu.utils.checkpoints import load_tts_checkpoint
    import jax.numpy as jnp
    model, variables, cfg2, step = load_tts_checkpoint(pt_path)
    out = model.apply(variables, jnp.ones((1, 5), jnp.int32), 16,
                      method='generate', x_len=jnp.asarray([5]))
    assert np.isfinite(np.asarray(out['mel_post'])).all()


def test_orbax_backend_roundtrip(tmp_path):
    """Orbax directory checkpoints (the multi-host format) round-trip
    variables, optimizer leaves, config, and step, and are
    auto-detected by restore_checkpoint / load_tts_checkpoint."""
    import jax.numpy as jnp
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       save_checkpoint)
    variables = {'params': {'lin': {'kernel': np.ones((3, 4), np.float32),
                                    'bias': np.zeros(4, np.float32)}}}
    opt_state = [np.full((3, 4), 2.0, np.float32), np.int32(7)]
    config = {'tts_model': 'forward_tacotron', 'lr': 1e-4}
    path = tmp_path / 'ckpt.orbax'
    save_checkpoint(variables, config, path, opt_state=opt_state, step=42)
    assert path.is_dir()
    payload = restore_checkpoint(path)
    assert payload['step'] == 42
    assert payload['config']['lr'] == 1e-4
    np.testing.assert_array_equal(
        payload['model']['params']['lin']['kernel'], np.ones((3, 4)))
    np.testing.assert_array_equal(payload['optim'][0],
                                  np.full((3, 4), 2.0))
    # overwrite in place must work (latest_model.orbax every epoch)
    save_checkpoint(variables, config, path, opt_state=opt_state, step=43)
    assert restore_checkpoint(path)['step'] == 43
