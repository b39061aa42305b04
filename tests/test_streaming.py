"""Streaming synthesis: incremental chunk emission must reproduce the
one-shot generate_wav bookkeeping exactly (fold/crossfade/fade-out)."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp


TINY = dict(rnn_dims=16, fc_dims=16, bits=8, pad=2,
            upsample_factors=(2, 2), feat_dims=10, compute_dims=8,
            res_out_dims=8, res_blocks=1, hop_length=4, sample_rate=1000,
            mode='RAW')


def test_stream_fold_groups_equals_xfade_unfold():
    from forwardtacotron_tpu.models.streaming import stream_fold_groups
    from forwardtacotron_tpu.models.wavernn import xfade_and_unfold
    rng = np.random.RandomState(0)
    target, overlap, num_folds = 40, 8, 7
    y = rng.randn(num_folds, target + 2 * overlap)

    ref = xfade_and_unfold(y.copy(), target, overlap)

    def groups():
        for g0 in range(0, num_folds, 3):
            yield y[g0:g0 + 3]

    streamed = np.concatenate(list(stream_fold_groups(groups(), target,
                                                      overlap)))
    assert streamed.shape == ref.shape
    np.testing.assert_allclose(streamed, ref, atol=1e-12)


def test_stream_wav_concat_equals_generate_wav():
    """Greedy (deterministic) streaming == one-shot generate_wav."""
    from forwardtacotron_tpu.models.streaming import stream_wav
    from forwardtacotron_tpu.models.wavernn import WaveRNN, generate_wav

    model = WaveRNN(**TINY)
    rng = np.random.RandomState(1)
    mel = rng.randn(60, TINY['feat_dims']).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)),
                           jnp.asarray(mel[None, :12]))

    target, overlap = 24, 8

    def greedy_sample(m, a, s):
        return np.asarray(model.apply(variables, m, a,
                                      jax.random.PRNGKey(0),
                                      method='sample_scan', greedy=True))

    chunks = list(stream_wav(model, variables, mel, target=target,
                             overlap=overlap, group=2,
                             sample_fn=greedy_sample))
    assert len(chunks) > 1, 'expected multiple streamed chunks'
    streamed = np.concatenate(chunks)

    # one-shot reference with the same deterministic sampler
    from forwardtacotron_tpu.models import wavernn as wr
    orig = wr.WaveRNN.sample_scan

    def patched(self, mels_up, aux, key, greedy=False, weights_dtype=None):
        return orig(self, mels_up, aux, jax.random.PRNGKey(0), greedy=True,
                    weights_dtype=jnp.float32)
    wr.WaveRNN.sample_scan = patched
    try:
        ref = generate_wav(model, variables, mel, batched=True,
                           target=target, overlap=overlap,
                           use_pallas=False)
    finally:
        wr.WaveRNN.sample_scan = orig

    assert streamed.shape == ref.shape
    np.testing.assert_allclose(streamed, ref, atol=1e-6)


def test_stream_wav_group_bounds_memory():
    """Every yielded chunk is bounded by group size (no full-utterance
    buffering)."""
    from forwardtacotron_tpu.models.streaming import stream_wav
    from forwardtacotron_tpu.models.wavernn import WaveRNN

    model = WaveRNN(**TINY)
    rng = np.random.RandomState(2)
    mel = rng.randn(80, TINY['feat_dims']).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)),
                           jnp.asarray(mel[None, :12]))
    target, overlap, group = 24, 8, 2

    def fake_sample(m, a, s):
        return np.zeros((m.shape[0], m.shape[1]), np.float32)

    max_chunk = group * (target + overlap)
    for chunk in stream_wav(model, variables, mel, target=target,
                            overlap=overlap, group=group,
                            sample_fn=fake_sample, mu_law=False):
        assert len(chunk) <= max_chunk


def test_write_wav_streaming(tmp_path):
    import wave as wave_mod
    from forwardtacotron_tpu.models.streaming import write_wav_streaming
    chunks = [np.linspace(-1, 1, 100), np.linspace(1, -1, 50)]
    n = write_wav_streaming(iter(chunks), tmp_path / 's.wav', 8000)
    assert n == 150
    with wave_mod.open(str(tmp_path / 's.wav')) as w:
        assert w.getnframes() == 150
        assert w.getframerate() == 8000
        data = np.frombuffer(w.readframes(150), dtype='<i2')
    assert data[0] == -32767 and abs(int(data[99])) >= 32700


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
