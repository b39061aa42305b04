"""End-to-end training smoke test on a tiny synthetic dataset: losses are
finite and decrease, checkpoints are written and restorable."""
import numpy as np
import pytest
import yaml


TINY_MODEL = {
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


def _make_dataset(data_dir, n_items=6, n_mels=80):
    from forwardtacotron_tpu.utils.files import pickle_binary
    rng = np.random.RandomState(0)
    for d in ('mel', 'alg', 'phon_pitch', 'phon_energy', 'quant',
              'raw_pitch', 'gta'):
        (data_dir / d).mkdir(parents=True, exist_ok=True)
    index, text_dict, att = [], {}, {}
    for i in range(n_items):
        x_len = rng.randint(4, 9)
        dur = rng.randint(1, 4, size=x_len)
        mel_len = int(dur.sum())
        np.save(data_dir / 'mel' / f'{i}.npy',
                rng.randn(n_mels, mel_len).astype(np.float32))
        np.save(data_dir / 'alg' / f'{i}.npy', dur.astype(np.int32))
        np.save(data_dir / 'phon_pitch' / f'{i}.npy',
                rng.randn(x_len).astype(np.float32))
        np.save(data_dir / 'phon_energy' / f'{i}.npy',
                rng.randn(x_len).astype(np.float32))
        text_dict[str(i)] = 'ðɛɹ wʌz ə kæt'[:x_len]
        index.append((str(i), mel_len))
        att[str(i)] = (1.0, 1.0)
    pickle_binary(text_dict, data_dir / 'text_dict.pkl')
    pickle_binary(index[:-2], data_dir / 'train_dataset.pkl')
    pickle_binary(index[-2:], data_dir / 'val_dataset.pkl')
    pickle_binary(att, data_dir / 'att_score_dict.pkl')


@pytest.fixture
def tiny_config(tmp_path):
    import pathlib
    base = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    base['data_path'] = str(tmp_path / 'data')
    base['forward_tacotron']['model'] = TINY_MODEL
    base['forward_tacotron']['training']['schedule'] = ['1e-3, 6, 4']
    base['forward_tacotron']['training']['checkpoint_every'] = 1000
    base['forward_tacotron']['training']['plot_every'] = 1000
    _make_dataset(tmp_path / 'data')
    return base, tmp_path


def test_forward_training_smoke(tiny_config):
    config, tmp_path = tiny_config
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.utils.paths import Paths
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       init_tts_model)

    class NullWriter:
        def add_scalar(self, *a, **k): pass
        def add_figure(self, *a, **k): pass
        def add_audio(self, *a, **k): pass

    paths = Paths(config['data_path'], 'test_voc', 'test_tts',
                  base=tmp_path)
    model = ForwardTacotron.from_config(config)
    trainer = ForwardTrainer(paths, dsp=None, config=config,
                             writer=NullWriter())
    trainer.generate_plots = lambda *a, **k: None
    state = trainer.train(model, max_steps_override=6)
    assert int(state.step) == 6

    ckpt = restore_checkpoint(paths.forward_checkpoints /
                              'latest_model.fjax')
    assert ckpt['step'] == 6
    assert ckpt['config']['tts_model'] == 'forward_tacotron'

    # loss is finite and the model runs eval with restored weights
    m2 = init_tts_model(ckpt['config'])
    import jax.numpy as jnp
    batch = next(iter_first(trainer, config))
    out = m2.apply(ckpt['model'], batch, train=False)
    assert np.isfinite(np.asarray(out['mel_post'])).all()


def iter_first(trainer, config):
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    import jax.numpy as jnp
    train_set, _ = get_tts_datasets(
        path=trainer.paths.data, batch_size=4, r=1, model_type='forward',
        max_mel_len=config['forward_tacotron']['training']['max_mel_len'],
        filter_attention=False)
    for batch in train_set:
        yield {k: jnp.asarray(v) for k, v in batch.items()
               if isinstance(v, np.ndarray)}
        return


def test_bf16_train_step_decreases_loss():
    """Mixed-precision (precision: bf16) training: loss decreases, BN
    stats and params stay f32, loss stays close to the f32 step."""
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train import common as tc

    model = ForwardTacotron(
        num_chars=40, n_mels=8, embed_dims=16, series_embed_dims=8,
        durpred_conv_dims=8, durpred_rnn_dims=4, pitch_conv_dims=8,
        pitch_rnn_dims=4, energy_conv_dims=8, energy_rnn_dims=4,
        rnn_dims=12, prenet_dims=8, prenet_k=2, prenet_num_highways=1,
        postnet_dims=8, postnet_k=2, postnet_num_highways=1)
    rng = np.random.RandomState(0)
    B, Tx, Tm = 4, 8, 24
    dur = np.full((B, Tx), Tm // Tx, np.float32)
    batch = {
        'x': jnp.asarray(rng.randint(1, 39, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, Tm, 8).astype(np.float32)),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
        'energy': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
    }
    cfg = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
           'energy_loss_factor': 0.1, 'precision': 'bf16'}
    key = jax.random.PRNGKey(0)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    state = tc.init_train_state(model, optimizer, batch, key,
                                init_kwargs={'train': True})
    step = jax.jit(tc.build_forward_train_step(model, optimizer, cfg))
    cfg32 = dict(cfg, precision='f32')
    step32 = jax.jit(tc.build_forward_train_step(model, optimizer, cfg32))

    _, m32 = step32(state, batch, key)
    state1, m16 = step(state, batch, key)
    assert abs(float(m16['loss']) - float(m32['loss'])) \
        < 0.05 * float(m32['loss']) + 0.05
    losses = [float(m16['loss'])]
    s = state1
    for i in range(30):
        s, m = step(s, batch, jax.random.PRNGKey(i))
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0]
    # masters stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(s.params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(s.batch_stats))


def test_top_k_tracker(tmp_path):
    from forwardtacotron_tpu.train.common import TopKTracker
    variables = {'params': {'w': np.ones(3, np.float32)}}
    t = TopKTracker(tmp_path, k=2, prefix='fw')
    assert t.update(3.0, variables, {'a': 1}, None, step=10)
    assert t.update(1.0, variables, {'a': 1}, None, step=20)
    assert t.update(2.0, variables, {'a': 1}, None, step=30)  # evicts 3.0
    assert not t.update(5.0, variables, {'a': 1}, None, step=40)
    files = sorted(p.name for p in tmp_path.glob('*.fjax'))
    assert len(files) == 2
    assert any('step20' in f for f in files)
    assert any('step30' in f for f in files)
    assert not any('step10' in f for f in files)
    # resume picks up the persisted leaderboard
    t2 = TopKTracker(tmp_path, k=2, prefix='fw')
    assert [e[1] for e in t2.entries] == [20, 30]


def test_step_trace_controller(tmp_path, monkeypatch):
    """FTT_PROFILE_DIR wires jax.profiler tracing into the step loop:
    trace starts at START, stops STEPS later, writes trace files."""
    import pathlib
    monkeypatch.setenv('FTT_PROFILE_DIR', str(tmp_path))
    monkeypatch.setenv('FTT_PROFILE_START', '2')
    monkeypatch.setenv('FTT_PROFILE_STEPS', '2')
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.utils.profiling import StepTraceController
    t = StepTraceController()
    f = jax.jit(lambda x: x * 2)
    for s in range(1, 7):
        _ = f(jnp.ones((8, 8)))
        t.tick(s)
    t.close()
    assert t._done
    files = [p for p in pathlib.Path(tmp_path).rglob('*') if p.is_file()]
    assert files, 'no trace files written'


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
