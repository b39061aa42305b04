"""WaveRNN trainer smoke test on a tiny synthetic dataset (CPU)."""
import pytest  # noqa: E402
import numpy as np
import yaml


def _make_voc_dataset(data_dir, n_items=5, n_mels=80, hop=64):
    from forwardtacotron_tpu.utils.files import pickle_binary
    rng = np.random.RandomState(0)
    for d in ('mel', 'quant', 'gta'):
        (data_dir / d).mkdir(parents=True, exist_ok=True)
    index = []
    for i in range(n_items):
        mel_len = rng.randint(30, 40)
        n_samples = mel_len * hop
        np.save(data_dir / 'mel' / f'{i}.npy',
                rng.randn(n_mels, mel_len).astype(np.float32))
        np.save(data_dir / 'quant' / f'{i}.npy',
                rng.randint(0, 2 ** 6, n_samples).astype(np.int64))
        index.append((str(i), mel_len))
    pickle_binary(index[:-1], data_dir / 'train_dataset.pkl')
    pickle_binary(index[-1:], data_dir / 'val_dataset.pkl')


def test_voc_training_smoke(tmp_path):
    import pathlib
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.train.voc_trainer import VocTrainer
    from forwardtacotron_tpu.utils.paths import Paths
    from forwardtacotron_tpu.dsp.audio import DSP

    base = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    base['data_path'] = str(tmp_path / 'data')
    base['dsp']['hop_length'] = 64
    base['dsp']['bits'] = 6
    base['vocoder']['model'].update(
        rnn_dims=16, fc_dims=12, compute_dims=8, res_out_dims=8,
        res_blocks=1, pad=2, upsample_factors=[4, 4, 4])
    base['vocoder']['training'].update(
        schedule=['1e-3, 3, 2'], seq_len=256, gen_samples_every=1000,
        checkpoint_every=1000, num_gen_samples=0)
    _make_voc_dataset(tmp_path / 'data', hop=64)

    class NullWriter:
        def add_scalar(self, *a, **k): pass
        def add_audio(self, *a, **k): pass

    paths = Paths(base['data_path'], 'tv', 'tt', base=tmp_path)
    model = WaveRNN.from_config(base)
    dsp = DSP.from_config(base)
    trainer = VocTrainer(paths, dsp=dsp, config=base, writer=NullWriter())
    state = trainer.train(model, max_steps_override=3)
    assert int(state.step) == 3

    ckpt = paths.voc_checkpoints / 'latest_model.fjax'
    assert ckpt.is_file()


def test_voc_train_step_remat_matches_plain():
    """training.remat recomputes the teacher-forced forward in backward
    without changing the math."""
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.voc_trainer import build_voc_train_step

    model = WaveRNN(rnn_dims=16, fc_dims=12, bits=6, pad=2,
                    upsample_factors=(4, 4, 4), feat_dims=8,
                    compute_dims=8, res_out_dims=8, res_blocks=1,
                    hop_length=64, sample_rate=22050, mode='RAW')
    optimizer = tc.make_optimizer(4.0, lr=1e-3)
    rng = np.random.RandomState(0)
    B, T = 2, 256
    mel_len = T // 64 + 2 * 2
    batch = {
        'x': jnp.asarray(rng.rand(B, T).astype(np.float32) * 2 - 1),
        'y': jnp.asarray(rng.randint(0, 2 ** 6, (B, T))),
        'mel': jnp.asarray(rng.randn(B, mel_len, 8).astype(np.float32)),
    }
    import jax.random as jr
    variables = model.init(jr.PRNGKey(0), batch['x'], batch['mel'],
                           train=True)

    def mk_state():
        params = jax.tree.map(jnp.array, variables['params'])
        stats = jax.tree.map(jnp.array, variables.get('batch_stats', {}))
        return tc.TrainState(params=params, batch_stats=stats,
                             opt_state=optimizer.init(params),
                             step=jnp.asarray(0, jnp.int32))

    plain = build_voc_train_step(model, optimizer, 'RAW')
    remat = build_voc_train_step(model, optimizer, 'RAW',
                                 {'remat': True})
    s1, m1 = plain(mk_state(), batch)
    s2, m2 = remat(mk_state(), batch)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
