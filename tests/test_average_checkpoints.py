"""Checkpoint averaging tool: float leaves mean, int leaves kept,
mismatched models rejected, output loadable by the gen pipeline."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))

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


def _save(tmp_path, name, seed, step):
    import jax
    import jax.numpy as jnp
    import yaml
    import pathlib
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.utils.checkpoints import save_checkpoint

    config = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    config['forward_tacotron']['model'] = TINY
    model = ForwardTacotron.from_config(config)
    x = jnp.ones((1, 8), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(seed)}, x, 32,
                           method='generate', x_len=jnp.asarray([8]))
    path = tmp_path / name
    save_checkpoint(variables, config, path, step=step)
    return path, variables


def test_average_is_leafwise_mean(tmp_path):
    import jax
    from average_checkpoints import average_payloads
    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint

    p1, v1 = _save(tmp_path, 'a.fjax', seed=1, step=10)
    p2, v2 = _save(tmp_path, 'b.fjax', seed=2, step=20)
    merged = average_payloads([restore_checkpoint(p1),
                               restore_checkpoint(p2)])
    assert merged['step'] == 20
    got = jax.tree.leaves(merged['model']['params'])
    want = [np.mean([np.asarray(a), np.asarray(b)], axis=0)
            for a, b in zip(jax.tree.leaves(v1['params']),
                            jax.tree.leaves(v2['params']))]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_average_rejects_mismatched_models(tmp_path):
    from average_checkpoints import average_payloads
    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
    p1, _ = _save(tmp_path, 'a.fjax', seed=1, step=10)
    payload = restore_checkpoint(p1)
    import copy
    other = copy.deepcopy(payload)
    leaf_path = next(iter(other['model']['params']))
    other['model']['params'][leaf_path] = {'extra': np.zeros(3)}
    with pytest.raises(ValueError, match='tree structure'):
        average_payloads([payload, other])


def test_cli_writes_loadable_checkpoint(tmp_path, monkeypatch):
    import average_checkpoints
    from forwardtacotron_tpu.utils.checkpoints import load_tts_checkpoint

    p1, _ = _save(tmp_path, 'a.fjax', seed=1, step=10)
    p2, _ = _save(tmp_path, 'b.fjax', seed=2, step=20)
    out = tmp_path / 'avg.fjax'
    monkeypatch.setattr('sys.argv', [
        'average_checkpoints.py', str(p1), str(p2),
        '--output', str(out)])
    average_checkpoints.main()

    model, variables, config, step = load_tts_checkpoint(out)
    assert step == 20
    import jax.numpy as jnp
    gen = model.apply(variables, jnp.ones((1, 8), jnp.int32), 32,
                      method='generate', x_len=jnp.asarray([8]),
                      fast=False)
    assert np.isfinite(np.asarray(gen['mel_post'])).all()
