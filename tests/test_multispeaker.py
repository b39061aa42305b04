"""Multi-speaker conditioning (beyond the single-speaker reference).

Covers the full path: metadata recipe -> speaker_dict.pkl -> dataset /
collation 'speaker' field -> model conditioning — plus the invariant
that n_speakers == 1 adds NO parameters, so reference-converted
checkpoints keep loading unchanged.
"""
import pytest  # noqa: E402
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))

TINY = {
    'embed_dims': 16, 'series_embed_dims': 8,
    'durpred_conv_dims': 8, 'durpred_rnn_dims': 4, 'durpred_dropout': 0.5,
    'pitch_conv_dims': 8, 'pitch_rnn_dims': 6, 'pitch_dropout': 0.5,
    'pitch_strength': 1.0,
    'energy_conv_dims': 8, 'energy_rnn_dims': 3, 'energy_dropout': 0.5,
    'energy_strength': 1.0,
    'rnn_dims': 12, 'prenet_dims': 8, 'prenet_k': 2, 'prenet_dropout': 0.5,
    'prenet_num_highways': 1, 'postnet_dims': 8, 'postnet_k': 2,
    'postnet_num_highways': 1, 'postnet_dropout': 0.0,
    'n_mels': 6,
}

FP_TINY = {
    'durpred_dropout': 0.5, 'durpred_d_model': 8, 'durpred_n_heads': 2,
    'durpred_layers': 1, 'durpred_d_fft': 8,
    'pitch_dropout': 0.5, 'pitch_d_model': 8, 'pitch_n_heads': 2,
    'pitch_layers': 1, 'pitch_d_fft': 8,
    'energy_dropout': 0.5, 'energy_d_model': 8, 'energy_n_heads': 2,
    'energy_layers': 1, 'energy_d_fft': 8,
    'pitch_strength': 1.0, 'energy_strength': 1.0,
    'd_model': 16, 'conv1_kernel': 9, 'conv2_kernel': 1,
    'prenet_layers': 1, 'prenet_heads': 2, 'prenet_fft': 16,
    'prenet_dropout': 0.1,
    'postnet_layers': 1, 'postnet_heads': 2, 'postnet_fft': 16,
    'postnet_dropout': 0.1,
    'n_mels': 6,
}


def _text_batch(rng, B=2, Tx=10):
    x = np.zeros((B, Tx), dtype=np.int32)
    lens = [Tx, Tx - 3][:B]
    for i, l in enumerate(lens):
        x[i, :l] = rng.randint(1, 39, l)
    return jnp.asarray(x), jnp.asarray(lens)


def test_multispeaker_recipe(tmp_path):
    from forwardtacotron_tpu.text.recipes import multispeaker
    (tmp_path / 'metadata.csv').write_text(
        'a1|p240|hello there\n'
        'a2|p110|general kenobi\n'
        'a3|p240|you are bold\n', encoding='utf-8')
    text_dict, speaker_dict = multispeaker(tmp_path)
    assert text_dict['a2'].strip() == 'general kenobi'
    # dense ids in sorted speaker-name order: p110 -> 0, p240 -> 1
    assert speaker_dict == {'a1': 1, 'a2': 0, 'a3': 1}


def test_collate_carries_speaker():
    from forwardtacotron_tpu.data.dataset import collate_tts
    items = []
    for i, spk in enumerate([2, 0]):
        items.append({'item_id': i, 'mel': np.full((2, 5 + i), 1.),
                      'x': np.full(2 + i, 2.), 'mel_len': 5 + i,
                      'x_len': 2 + i, 'dur': np.full(2 + i, 3.),
                      'pitch': np.full(2 + i, 4.),
                      'energy': np.full(2 + i, 5.), 'speaker': spk})
    batch = collate_tts(items, r=1)
    assert batch['speaker'].dtype == np.int32
    assert batch['speaker'].tolist() == [2, 0]


def test_single_speaker_adds_no_params():
    """n_speakers=1 (the reference setting) must produce the exact same
    parameter tree as before the feature existed — checkpoint compat."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(num_chars=40, **TINY)
    x, xl = _text_batch(np.random.RandomState(0))
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    names = [jax.tree_util.keystr(k) for k, _ in flat]
    assert not any('speaker' in n or 'spk' in n for n in names)


def test_forward_tacotron_speaker_conditions_output():
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(num_chars=40, n_speakers=3, **TINY)
    rng = np.random.RandomState(1)
    x, xl = _text_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)

    out0 = model.apply(variables, x, 32, method='generate', x_len=xl,
                       speaker=jnp.zeros((2,), jnp.int32), fast=False)
    out1 = model.apply(variables, x, 32, method='generate', x_len=xl,
                       speaker=jnp.full((2,), 2, jnp.int32), fast=False)
    # different speaker ids select different embeddings -> different mels
    assert not np.allclose(np.asarray(out0['mel_post']),
                           np.asarray(out1['mel_post']), atol=1e-4)
    # omitted speaker defaults to id 0
    out_none = model.apply(variables, x, 32, method='generate', x_len=xl,
                           fast=False)
    np.testing.assert_allclose(np.asarray(out_none['mel_post']),
                               np.asarray(out0['mel_post']), atol=1e-6)


def test_forward_tacotron_fused_series_with_speaker():
    """The single-scan fused series path must match the three separate
    predictors when speaker conditioning is active (mixed rnn widths)."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(num_chars=40, n_speakers=4, **TINY)
    rng = np.random.RandomState(2)
    x, xl = _text_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)
    spk = jnp.asarray([3, 1], jnp.int32)
    kw = dict(alpha=1.2, pitch_scale=0.7, energy_scale=1.4, x_len=xl,
              speaker=spk)
    un = model.apply(variables, x, method='predict_series', fused=False,
                     **kw)
    fu = model.apply(variables, x, method='predict_series', fused=True,
                     **kw)
    for k in un:
        np.testing.assert_allclose(np.asarray(un[k]), np.asarray(fu[k]),
                                   atol=1e-5)


def test_forward_tacotron_multispeaker_train_step():
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model = ForwardTacotron(num_chars=40, n_speakers=3, **TINY)
    rng = np.random.RandomState(3)
    B, Tx, T = 2, 8, 16
    dur = np.ones((B, Tx), np.float32) * 2
    batch = {
        'x': jnp.asarray(rng.randint(1, 39, (B, Tx))),
        'mel': jnp.asarray(rng.randn(B, T, TINY['n_mels']),
                           dtype=jnp.float32),
        'mel_len': jnp.asarray([T, T - 4]),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(rng.randn(B, Tx), dtype=jnp.float32),
        'energy': jnp.asarray(rng.randn(B, Tx), dtype=jnp.float32),
        'speaker': jnp.asarray([0, 2], jnp.int32),
    }
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch)
    out = model.apply(variables, batch)
    assert out['mel'].shape == (B, T, TINY['n_mels'])
    assert np.isfinite(np.asarray(out['mel'])).all()


def test_fast_pitch_speaker_conditions_output():
    from forwardtacotron_tpu.models.fast_pitch import FastPitch
    model = FastPitch(num_chars=40, n_speakers=3, **FP_TINY)
    rng = np.random.RandomState(4)
    x, xl = _text_batch(rng)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)
    out0 = model.apply(variables, x, 32, method='generate', x_len=xl,
                       speaker=jnp.zeros((2,), jnp.int32))
    out1 = model.apply(variables, x, 32, method='generate', x_len=xl,
                       speaker=jnp.full((2,), 2, jnp.int32))
    assert not np.allclose(np.asarray(out0['mel_post']),
                           np.asarray(out1['mel_post']), atol=1e-4)


def test_preprocess_cli_multispeaker(tmp_path, monkeypatch):
    """`preprocess.py --metadata_format multispeaker` writes
    speaker_dict.pkl with dense ids filtered to processed items."""
    import wave
    import yaml
    import pathlib
    from forwardtacotron_tpu.utils.files import unpickle_binary

    corpus = tmp_path / 'corpus'
    corpus.mkdir()
    sr = 22050
    t = np.arange(sr // 2) / sr
    lines = []
    for i, spk in enumerate(['p2', 'p1', 'p2', 'p1']):
        tone = 0.5 * np.sin(2 * np.pi * (150 + 40 * i) * t)
        pcm = np.round(tone * 32767).astype('<i2')
        with wave.open(str(corpus / f'u{i}.wav'), 'wb') as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        lines.append(f'u{i}|{spk}|hello number {i} here')
    (corpus / 'metadata.csv').write_text('\n'.join(lines),
                                         encoding='utf-8')

    config = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    config['data_path'] = str(tmp_path / 'data')
    config['preprocessing']['n_val'] = 1
    config['preprocessing']['seed'] = 1
    cfg_path = tmp_path / 'cfg.yaml'
    cfg_path.write_text(yaml.safe_dump(config), encoding='utf-8')

    import preprocess
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr('sys.argv', [
        'preprocess.py', '--path', str(corpus), '--config', str(cfg_path),
        '--metadata_format', 'multispeaker'])
    preprocess.main()

    speaker_dict = unpickle_binary(tmp_path / 'data' / 'speaker_dict.pkl')
    # p1 -> 0, p2 -> 1 (sorted order), all four utterances covered
    assert speaker_dict == {'u0': 1, 'u1': 0, 'u2': 1, 'u3': 0}
    train = unpickle_binary(tmp_path / 'data' / 'train_dataset.pkl')
    val = unpickle_binary(tmp_path / 'data' / 'val_dataset.pkl')
    assert {i for i, _ in train + val} == set(speaker_dict)


def test_multispeaker_training_e2e(tmp_path):
    """Full ForwardTrainer run over a dataset with speaker_dict.pkl:
    batches carry 'speaker' through the jitted (and mesh-sharded, on
    the virtual 8-CPU platform) train step."""
    import pathlib
    import yaml
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.utils.files import pickle_binary
    from forwardtacotron_tpu.utils.paths import Paths
    from test_forward_trainer import TINY_MODEL, _make_dataset

    config = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    config['data_path'] = str(tmp_path / 'data')
    config['forward_tacotron']['model'] = dict(TINY_MODEL, n_speakers=3)
    config['forward_tacotron']['training']['schedule'] = ['1e-3, 3, 4']
    config['forward_tacotron']['training']['checkpoint_every'] = 1000
    config['forward_tacotron']['training']['plot_every'] = 1000
    _make_dataset(tmp_path / 'data')
    pickle_binary({str(i): i % 3 for i in range(6)},
                  tmp_path / 'data' / 'speaker_dict.pkl')

    class NullWriter:
        def add_scalar(self, *a, **k): pass
        def add_figure(self, *a, **k): pass
        def add_audio(self, *a, **k): pass

    paths = Paths(config['data_path'], 'ms_voc', 'ms_tts', base=tmp_path)
    model = ForwardTacotron.from_config(config)
    assert model.n_speakers == 3
    trainer = ForwardTrainer(paths, dsp=None, config=config,
                             writer=NullWriter())
    trainer.generate_plots = lambda *a, **k: None
    state = trainer.train(model, max_steps_override=3)
    assert int(state.step) == 3


def test_export_multispeaker_artifact(tmp_path):
    """Multi-speaker models export with a 6th (speaker) input; the
    loader detects the arity and routes the id through."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model = ForwardTacotron(num_chars=40, n_speakers=3, **TINY)
    x, xl = _text_batch(np.random.RandomState(5))
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, 32,
                           method='generate', x_len=xl)
    path = tmp_path / 'ms.ftexp'
    save_exported_tts(model, variables, path, buckets=((16, 64),))
    exported = ExportedTTS(path)
    ids = list(range(1, 9))
    mel0, _ = exported.generate(ids, speaker=0)
    mel2, _ = exported.generate(ids, speaker=2)
    assert not np.allclose(mel0, mel2, atol=1e-4)
    # matches the in-repo model path for the same speaker
    ref = model.apply(variables, jnp.asarray([ids + [0] * 8]), 64,
                      method='generate', x_len=jnp.asarray([8]),
                      speaker=jnp.asarray([2], jnp.int32), fast=False)
    ref_mel = np.asarray(ref['mel_post'])[0, :mel2.shape[1]].T
    np.testing.assert_allclose(mel2, ref_mel, atol=1e-4)


def test_dataset_pipeline_carries_speaker(tmp_path):
    """speaker_dict.pkl next to the dataset indexes flows through
    ForwardDataset + BucketBatcher into (B,) int32 batch fields."""
    from make_synthetic_dataset import make_dataset
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    from forwardtacotron_tpu.utils.files import (pickle_binary,
                                                 unpickle_binary)
    from forwardtacotron_tpu.utils.paths import Paths

    config = {'dsp': {'num_mels': 8, 'hop_length': 16, 'bits': 9}}
    paths = Paths(str(tmp_path / 'data'), 'v', 't', base=tmp_path)
    make_dataset(paths, config, n_items=5, n_val=1, seed=3)
    train = unpickle_binary(paths.data / 'train_dataset.pkl')
    val = unpickle_binary(paths.data / 'val_dataset.pkl')
    ids = sorted(i for i, _ in train + val)
    speaker_dict = {item: k % 3 for k, item in enumerate(ids)}
    pickle_binary(speaker_dict, paths.data / 'speaker_dict.pkl')

    train_set, _ = get_tts_datasets(
        paths.data, batch_size=2, r=1, model_type='forward',
        max_mel_len=None, filter_attention=False)
    batch = next(iter(train_set))
    assert batch['speaker'].shape == (2,)
    assert batch['speaker'].dtype == np.int32
    for row in range(2):
        item = batch['item_id'][row]
        assert batch['speaker'][row] == speaker_dict[item]


def test_tacotron_single_speaker_adds_no_params():
    from forwardtacotron_tpu.models.tacotron import Tacotron
    model = Tacotron(num_chars=40, n_mels=8, embed_dims=16,
                     encoder_dims=128, decoder_dims=256, postnet_dims=8,
                     encoder_k=2, lstm_dims=16, postnet_k=2,
                     num_highways=1, dropout=0.5)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(1, 39, (2, 6)), jnp.int32)
    mel = jnp.asarray(rng.randn(2, 8, 8), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, mel, 2, train=True,
                           rng=jax.random.PRNGKey(2))
    names = [jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_leaves_with_path(variables)]
    assert not any('speaker' in n for n in names)


def test_tacotron_speaker_conditions_teacher():
    """The teacher's encoder conditioning: different speaker ids give
    different teacher-forced mels and free-running generations."""
    from forwardtacotron_tpu.models.tacotron import Tacotron
    model = Tacotron(num_chars=40, n_mels=8, embed_dims=16,
                     encoder_dims=128, decoder_dims=256, postnet_dims=8,
                     encoder_k=2, lstm_dims=16, postnet_k=2,
                     num_highways=1, dropout=0.5, n_speakers=3)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randint(1, 39, (2, 6)), jnp.int32)
    mel = jnp.asarray(rng.randn(2, 8, 8), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           x, mel, 2, train=True,
                           rng=jax.random.PRNGKey(2))
    spk0 = jnp.zeros((2,), jnp.int32)
    spk2 = jnp.full((2,), 2, jnp.int32)
    _, m2_a, _ = model.apply(variables, x, mel, 2, train=False,
                             speaker=spk0)
    _, m2_b, _ = model.apply(variables, x, mel, 2, train=False,
                             speaker=spk2)
    assert not np.allclose(np.asarray(m2_a), np.asarray(m2_b),
                           atol=1e-5)
    # omitted speaker == id 0 (duration-extraction compatibility)
    _, m2_none, _ = model.apply(variables, x, mel, 2, train=False)
    np.testing.assert_allclose(np.asarray(m2_none), np.asarray(m2_a),
                               atol=1e-6)


def test_taco_train_step_with_speaker_batch():
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import (
        build_taco_train_step)
    model = Tacotron(num_chars=40, n_mels=8, embed_dims=16,
                     encoder_dims=128, decoder_dims=256, postnet_dims=8,
                     encoder_k=2, lstm_dims=16, postnet_k=2,
                     num_highways=1, dropout=0.5, n_speakers=3)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = np.random.RandomState(9)
    batch = {
        'x': jnp.asarray(rng.randint(1, 39, (2, 6)), jnp.int32),
        'mel': jnp.asarray(rng.randn(2, 8, 8), jnp.float32),
        'speaker': jnp.asarray([0, 2], jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'dropout': key},
                           batch['x'], batch['mel'], 2, train=True,
                           rng=key)
    state = tc.TrainState(params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=optimizer.init(variables['params']),
                          step=jnp.asarray(0, jnp.int32))
    step_fn = build_taco_train_step(model, optimizer, 2)
    state, (metrics, att) = step_fn(state, batch, key)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_recipe_tolerates_blank_lines(tmp_path):
    from forwardtacotron_tpu.text.recipes import multispeaker
    (tmp_path / 'metadata.csv').write_text(
        'a1|p2|hello\n\n   \na2|p1|world\n\n', encoding='utf-8')
    text_dict, speaker_dict = multispeaker(tmp_path)
    assert set(text_dict) == {'a1', 'a2'}
    assert speaker_dict == {'a1': 1, 'a2': 0}


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
