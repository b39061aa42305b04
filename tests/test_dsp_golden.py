"""Hermetic DSP golden-file gate (the in-repo analog of the
reference's tests/test_dsp.py:18-25 + tests/resources/test_mel.npy).

Fixtures (committed, generated ONCE by tools/make_dsp_goldens.py):
  golden_speech.wav — deterministic speech-like signal (known F0)
  golden_mel.npy    — log-mel via an independent implementation of the
                      reference DSP contract (torch.stft + fresh
                      float64 slaney filterbank + clip(1e-5)+log)
  golden_f0.npy     — the TRUE per-frame F0 of the synthesized signal
                      (ground truth by construction; pyworld/dio is not
                      in this image, and dio itself only estimates this)

These tests pin the full `wav_to_mel` chain (STFT centering/padding,
slaney filterbank, log-normalize; reference utils/dsp.py:71-110) and
`estimate_f0` against stored goldens — not against torch at runtime.
"""
import pathlib

import numpy as np
import pytest

RES = pathlib.Path(__file__).parent / 'resources'
ROOT = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope='module')
def dsp():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    return DSP.from_config(read_config(ROOT / 'config.yaml'))


@pytest.fixture(scope='module')
def golden_wav(dsp):
    return dsp.load_wav(RES / 'golden_speech.wav')


def test_load_wav_exact_pcm(golden_wav):
    """The load path (native audio_io.cc or the scipy fallback) must
    return the exact 16-bit PCM samples scaled by 1/32768."""
    import wave
    with wave.open(str(RES / 'golden_speech.wav'), 'rb') as w:
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype='<i2')
    assert golden_wav.shape == raw.shape
    np.testing.assert_allclose(golden_wav, raw.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_wav_to_mel_matches_golden(dsp, golden_wav):
    golden = np.load(RES / 'golden_mel.npy')
    mel = dsp.wav_to_mel(golden_wav)
    assert mel.shape == golden.shape
    # float32 XLA pipeline vs float64 oracle: atol in log-mel units
    np.testing.assert_allclose(mel, golden, atol=2e-3)
    assert float(np.mean(np.abs(mel - golden))) < 2e-4


def test_wav_to_mel_bucketed_matches_golden(dsp, golden_wav):
    golden = np.load(RES / 'golden_mel.npy')
    mel = dsp.wav_to_mel_bucketed(golden_wav)
    assert mel.shape == golden.shape
    np.testing.assert_allclose(mel, golden, atol=2e-3)


def test_estimate_f0_matches_true_contour(dsp, golden_wav):
    from forwardtacotron_tpu.dsp.pitch import extract_pitch
    true_f0 = np.load(RES / 'golden_f0.npy')
    f0 = extract_pitch(golden_wav, dsp.sample_rate, dsp.hop_length)
    n = min(len(f0), len(true_f0))
    f0, true_f0 = f0[:n], true_f0[:n]

    # voiced interior frames (skip 2-frame boundaries where the window
    # straddles a voicing transition and any estimator is ill-defined)
    voiced = true_f0 > 0
    interior = voiced.copy()
    for s in (1, 2):
        interior &= np.roll(voiced, s) & np.roll(voiced, -s)

    est_voiced = f0[interior] > 0
    assert est_voiced.mean() > 0.9, 'voiced recall too low'
    rel_err = np.abs(f0[interior][est_voiced]
                     - true_f0[interior][est_voiced]) \
        / true_f0[interior][est_voiced]
    assert np.median(rel_err) < 0.01, f'median F0 error {np.median(rel_err)}'
    assert np.mean(rel_err < 0.05) > 0.95, 'too many >5% F0 errors'

    # silence/noise must not produce pitch: frames at least 2 frames
    # away from any voiced frame
    far_unvoiced = ~voiced
    for s in (1, 2):
        far_unvoiced &= ~np.roll(voiced, s) & ~np.roll(voiced, -s)
    assert (f0[far_unvoiced] > 0).mean() < 0.1, 'pitch hallucinated'


def test_f0_quantified_bound():
    """Round-4 deviation bound (PARITY.md #3): the NAC tracker's
    agreement with the fixture's constructed ground truth AND with an
    independent float64 YIN oracle (tools/f0_bound.py), pinned as a
    regression. Floors chosen just under the measured values
    (1.000 / 3.1 cents vs truth; 0.902 / 10.4 cents vs YIN)."""
    import sys
    sys.path.insert(0, str(ROOT / 'tools'))
    from f0_bound import run
    out = run()
    nt = out['nac_vs_truth']
    assert nt['vuv_agreement'] >= 0.99, nt
    assert nt['cents_rmse_voiced'] <= 5.0, nt
    ny = out['nac_vs_yin']
    assert ny['vuv_agreement'] >= 0.85, ny
    assert ny['cents_rmse_voiced'] <= 20.0, ny
    # the independent oracle itself stays sane against truth (guards
    # against the oracle silently degrading and masking a regression)
    yt = out['yin_vs_truth']
    assert yt['cents_rmse_voiced'] <= 20.0, yt
