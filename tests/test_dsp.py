"""DSP numerical tests.

torch.stft(center=True, pad_mode='reflect', periodic hann) implements the
same STFT contract as librosa 0.7.2's stft used by the reference
(utils/dsp.py:72-77), so it serves as the parity oracle here.
"""
import numpy as np

import jax.numpy as jnp


def _chirp(n=10000, sr=22050):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * (220 + 400 * t) * t)
            + 0.2 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)


def test_stft_matches_torch():
    import torch
    from forwardtacotron_tpu.dsp.stft import stft
    y = _chirp()
    n_fft, hop, win = 1024, 256, 1024
    ours = np.asarray(stft(jnp.asarray(y), n_fft, hop, win))
    ref = torch.stft(torch.tensor(y), n_fft=n_fft, hop_length=hop,
                     win_length=win,
                     window=torch.hann_window(win, periodic=True),
                     center=True, pad_mode='reflect',
                     return_complex=True).numpy()
    # ref layout (freq, time) -> ours (time, freq)
    assert ours.shape == ref.T.shape
    np.testing.assert_allclose(np.abs(ours), np.abs(ref).T,
                               rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    from forwardtacotron_tpu.dsp.stft import mel_filterbank
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support, triangles overlap, band-limited to fmax
    assert np.all(fb.sum(axis=1) > 0)
    freqs = np.linspace(0, 11025, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].max() <= 8000 + 50
    # slaney normalization: equal-area-ish filters (peak * width ~ 2)
    peaks = fb.max(axis=1)
    assert np.all(peaks > 0)


def test_wav_to_mel_layout_and_range():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    import pathlib
    cfg = read_config(pathlib.Path(__file__).parent.parent / 'config.yaml')
    dsp = DSP.from_config(cfg)
    y = _chirp()
    mel = dsp.wav_to_mel(y)
    assert mel.shape[0] == 80
    assert mel.shape[1] == 1 + len(y) // 256
    assert mel.min() >= np.log(1e-5) - 1e-5
    assert np.isfinite(mel).all()


def test_istft_roundtrip():
    from forwardtacotron_tpu.dsp.stft import stft, istft
    y = _chirp(8192)
    spec = stft(jnp.asarray(y), 1024, 256, 1024)
    rec = np.asarray(istft(spec, 1024, 256, 1024, length=len(y)))
    np.testing.assert_allclose(rec, y, atol=1e-3)


def test_griffinlim_reconstructs_tone():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    import pathlib
    cfg = read_config(pathlib.Path(__file__).parent.parent / 'config.yaml')
    dsp = DSP.from_config(cfg)
    y = _chirp(8192)
    mel = dsp.wav_to_mel(y)
    wav = dsp.griffinlim(mel)
    # resynthesized audio must produce a similar mel back (coarse check)
    mel2 = dsp.wav_to_mel(wav[:8192])
    err = np.abs(mel[:, 2:28] - mel2[:, 2:28]).mean()
    assert err < 1.0, f'GL mel L1 too high: {err}'


def test_mu_law_roundtrip():
    from forwardtacotron_tpu.dsp.audio import DSP
    y = np.linspace(-1, 1, 101).astype(np.float32)
    enc = DSP.encode_mu_law(y, mu=2 ** 9)
    assert enc.min() >= 0 and enc.max() <= 2 ** 9 - 1
    dec = DSP.decode_mu_law(enc, mu=2 ** 9, from_labels=True)
    np.testing.assert_allclose(dec, y, atol=2e-2)


def test_label_float_roundtrip():
    from forwardtacotron_tpu.dsp.audio import DSP
    y = np.linspace(-1, 1, 33).astype(np.float32)
    lab = DSP.float_2_label(y, bits=9)
    rec = DSP.label_2_float(lab, bits=9)
    np.testing.assert_allclose(rec, y, atol=1e-6)


def test_pitch_estimation_on_tones():
    from forwardtacotron_tpu.dsp.pitch import extract_pitch
    sr, hop = 22050, 256
    t = np.arange(sr) / sr
    for f in [110.0, 220.0, 440.0]:
        y = np.sin(2 * np.pi * f * t).astype(np.float32)
        f0 = extract_pitch(y, sr, hop)
        assert f0.shape[0] == 1 + len(y) // hop
        mid = f0[10:-10]
        voiced = mid[mid > 0]
        assert len(voiced) > 0.9 * len(mid)
        assert abs(np.median(voiced) - f) < 0.05 * f


def test_pitch_silence_is_unvoiced():
    from forwardtacotron_tpu.dsp.pitch import extract_pitch
    y = np.zeros(22050, dtype=np.float32)
    f0 = extract_pitch(y, 22050, 256)
    assert np.all(f0 == 0)


def test_trim_silence():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    import pathlib
    cfg = read_config(pathlib.Path(__file__).parent.parent / 'config.yaml')
    dsp = DSP.from_config(cfg)
    sig = _chirp(11025)
    y = np.concatenate([np.zeros(5000, np.float32), sig,
                        np.zeros(5000, np.float32)])
    trimmed = dsp.trim_silence(y)
    assert len(trimmed) < len(y)
    assert len(trimmed) >= len(sig) - 2048
