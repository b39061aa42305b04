"""WaveRNN trainer smoke test on a tiny synthetic dataset (CPU)."""
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
