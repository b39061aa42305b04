"""StableHLO export roundtrip (the TorchScript-export parity surface,
reference forward_tacotron.py:270-284): the exported artifact must
reproduce the live model's generate outputs without the model object."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_model():
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('config.yaml')
    m = config['forward_tacotron']['model']
    for k in list(m):
        if k.endswith(('_dims', '_k')) and isinstance(m[k], int):
            m[k] = max(4, min(m[k], 8))
    model = ForwardTacotron.from_config(config)
    batch = {'x': jnp.zeros((1, 8), jnp.int32),
             'mel': jnp.zeros((1, 16, 80)),
             'mel_len': jnp.asarray([16]),
             'dur': jnp.full((1, 8), 2.0),
             'pitch': jnp.zeros((1, 8)),
             'energy': jnp.zeros((1, 8))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # bias the duration predictor positive so random-init durations do
    # not hit the degenerate-duration floor (which would mask alpha)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = variables['params']
    params['dur_pred']['lin']['bias'] = \
        params['dur_pred']['lin']['bias'] + 3.0
    return model, variables


def test_export_roundtrip_matches_live_model(tmp_path):
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    path = tmp_path / 'tts.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)])

    ids = [5, 9, 12, 3, 7]
    exported = ExportedTTS(path)
    mel_exp, dur_exp = exported.generate(ids, alpha=1.0)

    x = np.zeros((1, 16), np.int32)
    x[0, :len(ids)] = ids
    live = model.apply(variables, jnp.asarray(x), 128,
                       x_len=jnp.asarray([len(ids)]), fast=False,
                       method='generate')
    mel_len = int(live['mel_len'][0])
    mel_live = np.asarray(live['mel_post'])[0, :mel_len].T
    assert mel_exp.shape == mel_live.shape
    np.testing.assert_allclose(mel_exp, mel_live, atol=1e-5)
    np.testing.assert_allclose(dur_exp, np.asarray(live['dur'])[0, :5],
                               atol=1e-5)


def test_export_knobs_are_runtime(tmp_path):
    """One artifact serves all alpha/pitch/energy settings."""
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    path = tmp_path / 'tts.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)])
    exported = ExportedTTS(path)
    ids = [5, 9, 12, 3, 7]
    mel_a, dur_a = exported.generate(ids, alpha=1.0)
    mel_b, dur_b = exported.generate(ids, alpha=1.5)
    # alpha > 1 = faster speech = shorter durations (reference
    # gen_forward.py --alpha semantics: 2.0 is double-time)
    assert np.sum(np.floor(dur_b + 0.5)) < np.sum(np.floor(dur_a + 0.5))
    mel_c, _ = exported.generate(ids, pitch_scale=2.0)
    lim = min(mel_a.shape[1], mel_c.shape[1])
    assert not np.allclose(mel_a[:, :lim], mel_c[:, :lim])


def test_export_fast_pitch(tmp_path):
    """Export is model-agnostic: FastPitch (no `fast` kwarg) exports
    and replays too."""
    from forwardtacotron_tpu.models.fast_pitch import FastPitch
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('config.yaml')
    config['tts_model'] = 'fast_pitch'
    m = config['fast_pitch']['model']
    for k in list(m):
        if isinstance(m[k], int) and k not in ('n_heads',
                                               'durpred_heads'):
            m[k] = max(2, min(m[k], 16))
    model = FastPitch.from_config(config)
    batch = {'x': jnp.zeros((1, 8), jnp.int32),
             'mel': jnp.zeros((1, 16, 80)),
             'mel_len': jnp.asarray([16]),
             'dur': jnp.full((1, 8), 2.0),
             'pitch': jnp.zeros((1, 8)),
             'energy': jnp.zeros((1, 8))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    path = tmp_path / 'fp.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)])
    mel, dur = ExportedTTS(path).generate([5, 9, 12, 3, 7])
    assert mel.shape[0] == 80 and mel.shape[1] > 0
    assert np.all(np.isfinite(mel))


def test_export_bucket_overflow_raises(tmp_path):
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    path = tmp_path / 'tts.ftexp'
    save_exported_tts(model, variables, path, buckets=[(8, 64)])
    exported = ExportedTTS(path)
    with pytest.raises(ValueError, match='exceeds'):
        exported.generate(list(range(1, 12)))


def test_export_with_fused_vocoder(tmp_path):
    """--voc_checkpoint export: one StableHLO program goes text->wav;
    the PCM matches vocoding the exported mel with the live
    generator."""
    from forwardtacotron_tpu.models.hifigan import HiFiGANGenerator
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    voc = HiFiGANGenerator(
        resblock='2', upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))

    path = tmp_path / 'tts_wav.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)],
                      vocoder=(voc, voc_vars))
    exported = ExportedTTS(path)
    ids = [5, 9, 12, 3, 7]
    pcm = exported.synthesize(ids)
    assert pcm.dtype == np.int16

    mel, _ = exported.generate(ids)          # (n_mels, mel_len)
    hop = voc.hop_length
    assert pcm.shape == (mel.shape[1] * hop,)
    # full-bucket vocode then trim == the artifact's fused path
    x = np.zeros((1, 16), np.int32)
    x[0, :len(ids)] = ids
    live = model.apply(variables, jnp.asarray(x), 128,
                       x_len=jnp.asarray([len(ids)]), fast=False,
                       method='generate')
    want = voc.apply(voc_vars, live['mel_post'])[0]
    want = (np.clip(np.asarray(want), -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(pcm, want[:mel.shape[1] * hop])


def test_export_without_vocoder_rejects_synthesize(tmp_path):
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    path = tmp_path / 'tts_nowav.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)])
    with pytest.raises(ValueError, match='without a vocoder'):
        ExportedTTS(path).synthesize([1, 2, 3])


def test_export_with_fused_wavernn(tmp_path):
    """WaveRNN-fused export: the COMPLETE AR pipeline (upsample, fold,
    scan sampling with a runtime seed, mu-law decode, crossfade) runs
    inside the StableHLO module — text -> int16 PCM in one program."""
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    voc = WaveRNN(rnn_dims=16, fc_dims=12, bits=6, pad=2,
                  upsample_factors=(4, 4, 16), feat_dims=80,
                  compute_dims=8, res_out_dims=8, res_blocks=1,
                  hop_length=256, sample_rate=22050, mode='RAW')
    # teacher-forced init: x length == (frames - 2*pad) * hop
    voc_vars = voc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 512)), jnp.zeros((1, 6, 80)),
                        train=False)

    path = tmp_path / 'tts_wavernn.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)],
                      vocoder=(voc, voc_vars))
    exported = ExportedTTS(path)
    assert exported.meta['vocoder'] == 'wavernn'

    ids = [5, 9, 12, 3, 7]
    pcm = exported.synthesize(ids, seed=7)
    assert pcm.dtype == np.int16
    mel, _ = exported.generate(ids)
    assert pcm.shape == ((mel.shape[1] - 1) * voc.hop_length,)
    assert np.isfinite(pcm.astype(np.float32)).all()
    assert np.abs(pcm.astype(np.int32)).max() > 0

    # the runtime seed drives the sampling noise
    again = exported.synthesize(ids, seed=7)
    np.testing.assert_array_equal(pcm, again)
    other = exported.synthesize(ids, seed=8)
    assert not np.array_equal(pcm, other)


def test_legacy_v1_artifact_still_loads(tmp_path):
    """Artifacts written under the v1 header (no meta) keep working:
    speaker presence is inferred from program arity."""
    from forwardtacotron_tpu.utils import export as ex
    model, variables = _tiny_model()
    blob = ex.export_tts_generate(model, variables, 16, 128)
    path = tmp_path / 'legacy.ftexp'
    with open(path, 'wb') as f:
        f.write(ex.MAGIC)
        f.write(np.int32(1).tobytes())
        f.write(np.int32(16).tobytes())
        f.write(np.int32(128).tobytes())
        f.write(np.int64(len(blob)).tobytes())
        f.write(blob)
    loaded = ex.ExportedTTS(path)
    assert loaded.meta is None
    mel, dur = loaded.generate([5, 9, 12])
    assert mel.shape[0] == 80 and mel.shape[1] > 0


def test_export_multispeaker_wavernn_combined(tmp_path):
    """Both optional runtime inputs together (speaker AND seed): the
    meta header drives the 7-input calling convention."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('config.yaml')
    m = config['forward_tacotron']['model']
    for k in list(m):
        if k.endswith(('_dims', '_k')) and isinstance(m[k], int):
            m[k] = max(4, min(m[k], 8))
    m['n_speakers'] = 3
    model = ForwardTacotron.from_config(config)
    x = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, 32,
                           method='generate', x_len=jnp.asarray([8]))
    # amplify the speaker table so the (random tiny) init's speaker
    # effect survives the vocoder's sampling quantization
    params = variables['params']
    params['speaker_embedding']['embedding'] = \
        params['speaker_embedding']['embedding'] * 100.0
    voc = WaveRNN(rnn_dims=16, fc_dims=12, bits=6, pad=2,
                  upsample_factors=(4, 4, 16), feat_dims=80,
                  compute_dims=8, res_out_dims=8, res_blocks=1,
                  hop_length=256, sample_rate=22050, mode='RAW')
    voc_vars = voc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 512)), jnp.zeros((1, 6, 80)),
                        train=False)

    path = tmp_path / 'ms_wr.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 64)],
                      vocoder=(voc, voc_vars))
    exported = ExportedTTS(path)
    assert exported.meta == {'multispeaker': True, 'n_speakers': 3,
                             'vocoder': 'wavernn'}
    with pytest.raises(ValueError, match='out of range'):
        exported.synthesize([3, 5], speaker=7)
    ids = [3, 5, 7, 9]
    a = exported.synthesize(ids, speaker=0, seed=1)
    b = exported.synthesize(ids, speaker=2, seed=1)
    assert a.dtype == np.int16 and len(a) > 0
    # different speakers produce different audio through the same seed
    assert len(a) != len(b) or not np.array_equal(a, b)


def test_exported_synthesize_long(tmp_path):
    """Loader-side long-input synthesis: sentence-split, per-sentence
    bucket calls, silence gaps."""
    from forwardtacotron_tpu.models.hifigan import HiFiGANGenerator
    from forwardtacotron_tpu.utils.export import (ExportedTTS,
                                                  save_exported_tts)
    model, variables = _tiny_model()
    voc = HiFiGANGenerator(
        resblock='2', upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    path = tmp_path / 'long.ftexp'
    save_exported_tts(model, variables, path, buckets=[(16, 128)],
                      vocoder=(voc, voc_vars))
    exported = ExportedTTS(path)

    def tokenize(sentence):   # toy front-end: stable ids per char
        return [1 + (ord(c) % 37) for c in sentence][:12]

    pcm = exported.synthesize_long('One two. Three four! Five.',
                                   tokenize, sample_rate=22050,
                                   gap_ms=50.0)
    parts = [exported.synthesize(tokenize(s))
             for s in ('One two.', 'Three four!', 'Five.')]
    gap = int(22050 * 50.0 / 1000.0)
    assert len(pcm) == sum(len(p) for p in parts) + 2 * gap


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
