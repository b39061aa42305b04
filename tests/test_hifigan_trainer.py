"""Adversarial HiFi-GAN trainer tests (tiny synthetic data, CPU).

Covers: the GANVocCollator's frame alignment, the fused
disc-update + gen-update train step (losses finite, params change,
mel loss decreases on a learnable toy problem), checkpoint
save/restore through the trainer's formats, and the top-k retention.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forwardtacotron_tpu.models.gan_discriminators import (
    HiFiGANDiscriminators)
from forwardtacotron_tpu.models.hifigan import HiFiGANGenerator
from forwardtacotron_tpu.train.hifigan_trainer import (
    GANTrainState, build_gan_train_step, make_gan_optimizer)

TINY_GEN = {
    'resblock': '2',
    'upsample_rates': [4, 2],
    'upsample_kernel_sizes': [8, 4],
    'upsample_initial_channel': 16,
    'resblock_kernel_sizes': [3],
    'resblock_dilation_sizes': [[1, 3]],
}


def _tiny_disc():
    return HiFiGANDiscriminators(periods=(2, 3), n_scales=2)


def _wav_to_mel():
    from forwardtacotron_tpu.dsp.stft import (mel_filterbank,
                                              wav_to_mel_fn)
    basis = mel_filterbank(22050, 64, 8, 0, 8000)
    return wav_to_mel_fn(basis, 64, 8, 64)


def _state(gen, disc, rng, mel, audio):
    gen_opt = make_gan_optimizer(2e-4)
    disc_opt = make_gan_optimizer(2e-4)
    k1, k2 = jax.random.split(rng)
    gv = gen.init(k1, mel)
    dv = disc.init(k2, audio, audio)
    return (GANTrainState(
        gen_params=gv['params'], disc_params=dv['params'],
        gen_opt=gen_opt.init(gv['params']),
        disc_opt=disc_opt.init(dv['params']),
        step=jnp.asarray(0, jnp.int32)), gen_opt, disc_opt)


def test_train_step_runs_and_learns():
    gen = HiFiGANGenerator.from_config(TINY_GEN)
    disc = _tiny_disc()
    hop = gen.hop_length
    B, T = 2, 16
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, T, 8).astype(np.float32))
    # target: a tone, deterministic function of nothing — the mel loss
    # should still drop as the generator learns the bias toward it
    t = np.arange(T * hop) / 22050
    audio = np.stack([np.sin(2 * np.pi * 440 * t),
                      np.sin(2 * np.pi * 220 * t)]).astype(np.float32)
    batch = {'mel': mel, 'audio': jnp.asarray(audio * 0.3)}

    state, gen_opt, disc_opt = _state(
        gen, disc, jax.random.PRNGKey(0), mel, batch['audio'])
    step = build_gan_train_step(gen, disc, gen_opt, disc_opt,
                                _wav_to_mel())

    first_mel = None
    for i in range(12):
        state, metrics = step(state, batch)
        for k in ('disc_loss', 'gen_loss', 'gen_adv', 'gen_fm',
                  'gen_mel'):
            assert np.isfinite(float(metrics[k])), (k, metrics[k])
        if first_mel is None:
            first_mel = float(metrics['gen_mel'])
    assert int(state.step) == 12
    assert float(metrics['gen_mel']) < first_mel, \
        'mel reconstruction loss did not decrease'


def test_train_step_bf16():
    """precision: bf16 — compute in bfloat16, f32 master params;
    losses stay finite and params actually update."""
    gen = HiFiGANGenerator.from_config(TINY_GEN)
    disc = _tiny_disc()
    hop = gen.hop_length
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    audio = jnp.asarray((rng.randn(2, 12 * hop) * 0.3)
                        .astype(np.float32))
    state, go, do = _state(gen, disc, jax.random.PRNGKey(3), mel, audio)
    p0 = jax.tree.leaves(state.gen_params)[0].copy()
    step = build_gan_train_step(gen, disc, go, do, _wav_to_mel(),
                                train_cfg={'precision': 'bf16'})
    state, metrics = step(state, {'mel': mel, 'audio': audio})
    for k in ('disc_loss', 'gen_loss', 'gen_mel'):
        assert np.isfinite(float(metrics[k]))
    p1 = jax.tree.leaves(state.gen_params)[0]
    assert p1.dtype == jnp.float32          # master params stay f32
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_collator_frame_alignment():
    from forwardtacotron_tpu.data.dataset import GANVocCollator
    hop, seg = 8, 64
    rng = np.random.RandomState(0)
    n = 40
    wav = rng.randn(n * hop).astype(np.float32) * 0.5
    from forwardtacotron_tpu.dsp.audio import DSP
    labels = DSP.float_2_label(np.clip(wav, -1, 1), 16).astype(np.int64)
    mel = rng.randn(8, n).astype(np.float32)
    coll = GANVocCollator(hop, seg, voc_mode='MOL', bits=9,
                          mu_law=False,
                          rng=np.random.RandomState(1))
    out = coll([{'mel': mel, 'x': labels, 'item_id': 'a'}])
    assert out['mel'].shape == (1, seg // hop, 8)
    assert out['audio'].shape == (1, seg)
    # the audio segment must start exactly at offset*hop where offset
    # is the mel window start: recover it and check alignment
    got_mel = out['mel'][0].T                     # (n_mels, win)
    for o in range(n - seg // hop):
        if np.allclose(mel[:, o:o + seg // hop], got_mel):
            seg_want = wav[o * hop:o * hop + seg]
            np.testing.assert_allclose(out['audio'][0], seg_want,
                                       atol=2e-4)
            return
    raise AssertionError('mel window not found at any offset')


def test_checkpoint_roundtrip_and_gen_loading(tmp_path):
    from forwardtacotron_tpu.models.hifigan import load_hifigan
    from forwardtacotron_tpu.utils.checkpoints import save_checkpoint
    gen = HiFiGANGenerator.from_config(TINY_GEN)
    disc = _tiny_disc()
    hop = gen.hop_length
    mel = jnp.zeros((1, 8, 8))
    audio = jnp.zeros((1, 8 * hop))
    state, _, _ = _state(gen, disc, jax.random.PRNGKey(1), mel, audio)
    config = {'hifigan': {'model': dict(TINY_GEN)}}

    # full GAN state file and generator-only file must both load back
    # into a working generator via load_hifigan
    full = tmp_path / 'latest_model.fjax'
    save_checkpoint(state.variables, config, full, step=7)
    gonly = tmp_path / 'gen_only.fjax'
    save_checkpoint(state.generator_variables, config, gonly, step=7)
    for p in (full, gonly):
        m, variables = load_hifigan(p)
        assert m.upsample_rates == tuple(TINY_GEN['upsample_rates'])
        wav = m.apply(jax.tree.map(jnp.asarray, variables), mel)
        assert wav.shape == (1, 8 * hop)
        want = gen.apply({'params': state.gen_params}, mel)
        np.testing.assert_allclose(np.asarray(wav), np.asarray(want),
                                   atol=1e-6)


def test_trainer_e2e_tiny(tmp_path):
    """Two steps of the full HiFiGANTrainer over a synthetic on-disk
    dataset: runs the real data pipeline, schedule session, checkpoint
    write."""
    import pickle
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.train.hifigan_trainer import HiFiGANTrainer
    from forwardtacotron_tpu.utils.paths import Paths

    rng = np.random.RandomState(0)
    data = tmp_path / 'data'
    (data / 'mel').mkdir(parents=True)
    (data / 'quant').mkdir()
    hop, n_frames = 8, 80
    ids = [f'it{i}' for i in range(4)]
    for i, item in enumerate(ids):
        mel = rng.randn(8, n_frames).astype(np.float32)
        wav = (rng.randn(n_frames * hop) * 0.1).astype(np.float32)
        labels = DSP.float_2_label(np.clip(wav, -1, 1), 16)
        np.save(data / 'mel' / f'{item}.npy', mel)
        np.save(data / 'quant' / f'{item}.npy',
                labels.astype(np.int64))
    with open(data / 'train_dataset.pkl', 'wb') as f:
        pickle.dump([(i, n_frames) for i in ids[:3]], f)
    with open(data / 'val_dataset.pkl', 'wb') as f:
        pickle.dump([(i, n_frames) for i in ids[3:]], f)

    config = {
        'data_path': str(data), 'voc_model_id': 'v', 'tts_model_id': 't',
        'dsp': {'sample_rate': 22050, 'n_fft': 64, 'num_mels': 8,
                'hop_length': hop, 'win_length': 64, 'fmin': 0,
                'fmax': 8000, 'peak_norm': False,
                'trim_start_end_silence': False,
                'trim_silence_top_db': 60, 'pitch_max_freq': 600,
                'trim_long_silences': False, 'vad_window_length': 30,
                'vad_moving_average_width': 8,
                'vad_max_silence_length': 12, 'vad_sample_rate': 16000,
                'voc_mode': 'MOL', 'bits': 9, 'mu_law': False},
        'hifigan': {
            'model': dict(TINY_GEN),
            'training': {'schedule': ['2e-4, 2, 2'],
                         'checkpoint_every': 1000,
                         'gen_samples_every': 1000,
                         'num_gen_samples': 1, 'keep_top_k': 2,
                         'seg_len': 64, 'max_mel_len': 20000}},
    }
    paths = Paths(str(data), 'v', 't', base=tmp_path)
    dsp = DSP.from_config(config)
    trainer = HiFiGANTrainer(paths=paths, dsp=dsp, config=config,
                             writer=_NullWriter())
    gen = HiFiGANGenerator.from_config(TINY_GEN)
    state = trainer.train(gen, train_gta=False)
    assert int(state.step) >= 2
    assert (paths.hifigan_checkpoints / 'latest_model.fjax').is_file()


def test_melgan_generator_trains_and_loads(tmp_path):
    """generator_type: melgan runs through the same adversarial step
    and its checkpoints load back through load_hifigan."""
    from forwardtacotron_tpu.models.melgan import MelGANGenerator
    from forwardtacotron_tpu.models.hifigan import load_hifigan
    from forwardtacotron_tpu.train.hifigan_trainer import (
        make_generator, vocode_generator)
    from forwardtacotron_tpu.utils.checkpoints import save_checkpoint

    config = {'dsp': {'num_mels': 8},
              'hifigan': {'model': {'generator_type': 'melgan',
                                    'upsample_initial_channel': 16,
                                    'upsample_rates': [4, 2]}}}
    gen = make_generator(config)
    assert isinstance(gen, MelGANGenerator)
    assert gen.hop_length == 8
    disc = _tiny_disc()
    hop = gen.hop_length
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    audio = jnp.asarray((rng.randn(2, 16 * hop) * 0.3)
                        .astype(np.float32))
    state, go, do = _state(gen, disc, jax.random.PRNGKey(2), mel, audio)
    step = build_gan_train_step(gen, disc, go, do, _wav_to_mel())
    state, metrics = step(state, {'mel': mel, 'audio': audio})
    assert np.isfinite(float(metrics['gen_loss']))

    p = tmp_path / 'latest_model.fjax'
    save_checkpoint(state.variables, config, p, step=1)
    m, variables = load_hifigan(p)
    assert isinstance(m, MelGANGenerator)
    mel_np = rng.randn(8, 11).astype(np.float32)
    wav = vocode_generator(m, jax.tree.map(jnp.asarray, variables),
                           mel_np)
    assert wav.shape == (11 * hop,)


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_audio(self, *a, **k):
        pass

    def add_figure(self, *a, **k):
        pass


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
