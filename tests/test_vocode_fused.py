"""The fused single-dispatch vocoder program (models/wavernn.vocode)
must match the stepwise generate_wav pipeline: same fold, sampling
trajectory (same PRNG key), mu-law decode, crossfade and fade-out —
only f32-on-device vs f64-on-host rounding may differ."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp

from forwardtacotron_tpu.models.wavernn import (
    WaveRNN, generate_wav, vocode, xfade_and_unfold, xfade_unfold_device)

TINY = dict(rnn_dims=16, fc_dims=12, bits=6, pad=2,
            upsample_factors=(2, 2), feat_dims=10, compute_dims=8,
            res_out_dims=8, res_blocks=2, hop_length=4, sample_rate=1000,
            mode='RAW')


def test_xfade_unfold_device_matches_host():
    rng = np.random.RandomState(0)
    for num_folds, target, overlap in [(4, 10, 2), (3, 32, 8), (1, 20, 4)]:
        y = rng.randn(num_folds, target + 2 * overlap).astype(np.float64)
        ref = xfade_and_unfold(y.copy(), target, overlap)
        dev = np.asarray(xfade_unfold_device(jnp.asarray(y, jnp.float32),
                                             overlap))
        assert dev.shape == ref.shape
        np.testing.assert_allclose(dev, ref, atol=1e-5)


def _parity(mode):
    cfg = dict(TINY, mode=mode)
    model = WaveRNN(**cfg)
    rng = np.random.RandomState(1)
    n_frames = 60  # wave_len = 236 >= 20*hop fade region
    mel = rng.randn(cfg['feat_dims'], n_frames).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, cfg['feat_dims'])))

    kw = dict(target=40, overlap=8, seed=7, use_pallas=False)
    step = generate_wav(model, variables, mel, batched=True, fused=False,
                        **kw)
    fused = vocode(model, variables, mel, **kw)
    assert fused.shape == step.shape
    np.testing.assert_allclose(fused, step, atol=2e-4)


def test_vocode_matches_stepwise_raw():
    _parity('RAW')


def test_vocode_pcm16_is_quantized_f32():
    """pcm16=True converts on device; output must equal the f32
    program's result quantized to int16 (same trajectory, same fades).
    save_wav must write int16 input verbatim."""
    model = WaveRNN(**TINY)
    rng = np.random.RandomState(2)
    mel = rng.randn(TINY['feat_dims'], 60).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, TINY['feat_dims'])))
    kw = dict(target=40, overlap=8, seed=7, use_pallas=False)
    f32 = vocode(model, variables, mel, **kw)
    pcm = vocode(model, variables, mel, pcm16=True, **kw)
    assert pcm.dtype == np.int16
    want = (np.clip(f32, -1.0, 1.0) * 32767.0).astype(np.int16)
    # identical program modulo the final cast -> at most 1 LSB apart
    assert np.max(np.abs(pcm.astype(np.int32)
                         - want.astype(np.int32))) <= 1

    import tempfile
    from pathlib import Path
    from scipy.io import wavfile
    from forwardtacotron_tpu.dsp.audio import DSP
    dsp = DSP(num_mels=10, sample_rate=1000, hop_length=4, win_length=8,
              n_fft=16, fmin=0, fmax=500, bits=6, mu_law=True,
              peak_norm=False, trim_long_silences=False,
              pitch_max_freq=400, trim_start_end_silence=False,
              trim_silence_top_db=60, vad_sample_rate=8000,
              vad_window_length=30, vad_moving_average_width=8,
              vad_max_silence_length=12, voc_mode='RAW')
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / 'x.wav'
        dsp.save_wav(pcm, p)
        sr, back = wavfile.read(str(p))
        assert back.dtype == np.int16
        np.testing.assert_array_equal(back, pcm)


def test_vocode_matches_stepwise_mol():
    _parity('MOL')


def test_vocode_batch_matches_single_calls():
    """Lane-packed batched vocoding must equal per-utterance vocode
    calls in greedy mode (lanes are independent; same fold geometry
    because each row is padded to the common frame bucket)."""
    from forwardtacotron_tpu.models.wavernn import vocode_batch
    model = WaveRNN(**TINY)
    rng = np.random.RandomState(3)
    mels = [rng.randn(TINY['feat_dims'], 60).astype(np.float32) * 0.3,
            rng.randn(TINY['feat_dims'], 44).astype(np.float32) * 0.3]
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, TINY['feat_dims'])))
    kw = dict(target=40, overlap=8, seed=7, greedy=True,
              use_pallas=False)
    outs = vocode_batch(model, variables, mels, frame_bucket=4, **kw)
    assert len(outs) == 2
    for mel, got in zip(mels, outs):
        # single-utterance call on the bucket-padded mel (same fold
        # geometry as inside the batch)
        t_pad = ((mel.shape[1] + 3) // 4) * 4
        mel_p = np.zeros((mel.shape[0], t_pad), np.float32)
        mel_p[:, :mel.shape[1]] = mel
        want = vocode(model, variables, mel_p, **kw)
        wave_len = (mel.shape[1] - 1) * TINY['hop_length']
        assert got.shape == (wave_len,)
        np.testing.assert_allclose(got, want[:wave_len], atol=2e-4)


def test_vocode_batch_pcm16():
    from forwardtacotron_tpu.models.wavernn import vocode_batch
    model = WaveRNN(**TINY)
    rng = np.random.RandomState(4)
    mels = [rng.randn(TINY['feat_dims'], 40).astype(np.float32) * 0.3]
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, TINY['feat_dims'])))
    outs = vocode_batch(model, variables, mels, target=40, overlap=8,
                        use_pallas=False, pcm16=True)
    assert outs[0].dtype == np.int16
    assert outs[0].shape == ((40 - 1) * TINY['hop_length'],)


def test_vocode_batch_sharded_over_mesh():
    """vocode_batch(mesh=...) shards the utterance batch across the
    mesh's data axis via shard_map; greedy outputs must be EXACTLY the
    unsharded program's (lanes are independent, no collectives in the
    pipeline). Also covers utterance-count padding (3 utterances on a
    4-way axis)."""
    from forwardtacotron_tpu.models.wavernn import vocode_batch
    from forwardtacotron_tpu.parallel.mesh import make_mesh

    model = WaveRNN(**TINY)
    rng = np.random.RandomState(5)
    mels = [rng.randn(TINY['feat_dims'], n).astype(np.float32) * 0.3
            for n in (60, 44, 52)]
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, TINY['feat_dims'])))
    kw = dict(target=40, overlap=8, seed=7, greedy=True,
              use_pallas=False, frame_bucket=4)
    want = vocode_batch(model, variables, mels, **kw)

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    got = vocode_batch(model, variables, mels, mesh=mesh, **kw)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-4)

    # sampled mode still runs and yields the right shapes/dtypes
    kw_s = dict(kw, greedy=False, pcm16=True)
    outs = vocode_batch(model, variables, mels, mesh=mesh, **kw_s)
    for mel, o in zip(mels, outs):
        assert o.dtype == np.int16
        assert o.shape == ((mel.shape[1] - 1) * TINY['hop_length'],)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
