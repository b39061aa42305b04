"""Native C++ audio IO library vs the numpy/scipy reference paths."""
import numpy as np
import pytest

from forwardtacotron_tpu.utils import native_audio


pytestmark = pytest.mark.skipif(
    not (native_audio.available() or native_audio.build()),
    reason='native library not built and no compiler available')


def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr // 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = tmp_path / 'x.wav'
    native_audio.write_wav(path, y, sr)
    y2, sr2 = native_audio.read_wav(path)
    assert sr2 == sr
    assert len(y2) == len(y)
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_read_matches_scipy(tmp_path):
    from scipy.io import wavfile
    sr = 16000
    y = (np.random.RandomState(0).uniform(-0.8, 0.8, 4000)
         .astype(np.float32))
    path = tmp_path / 's.wav'
    wavfile.write(str(path), sr, (y * 32767).astype(np.int16))
    y2, sr2 = native_audio.read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_resample(tmp_path):
    from scipy.io import wavfile
    sr = 44100
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    path = tmp_path / 'r.wav'
    wavfile.write(str(path), sr, (y * 32767).astype(np.int16))
    y2, sr2 = native_audio.read_wav(path, target_sr=22050)
    assert sr2 == 22050
    assert abs(len(y2) - 22050) <= 2
    # still a 440 Hz tone: count zero crossings
    zc = np.sum(np.abs(np.diff(np.sign(y2)))) / 2
    assert abs(zc - 880) < 20


def test_mu_law_matches_python():
    from forwardtacotron_tpu.dsp.audio import DSP
    y = np.linspace(-1, 1, 513).astype(np.float32)
    ours = native_audio.encode_mu_law(y, 512)
    ref = DSP.encode_mu_law(y, 512).astype(np.int32)
    np.testing.assert_array_equal(ours, ref)


def test_float_to_label_matches_python():
    from forwardtacotron_tpu.dsp.audio import DSP
    y = np.linspace(-1, 1, 257).astype(np.float32)
    ours = native_audio.float_to_label(y, 9)
    ref = DSP.float_2_label(y, 9).astype(np.int32)
    np.testing.assert_array_equal(ours, ref)


def test_peak_normalize():
    y = np.array([0.5, -2.0, 1.0], dtype=np.float32)
    peak = native_audio.peak_normalize(y)
    assert peak == 2.0
    np.testing.assert_allclose(y, [0.25, -1.0, 0.5])
