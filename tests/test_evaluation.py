"""Objective evaluation metrics (evaluation.py + tools/eval_tts.py):
MCD-DTW, F0 RMSE/VDE, duration accuracy.

The reference has no counterpart (its only quality proxy is the mel-L1
in /root/reference/trainer/voc_trainer.py:160-202); these tests pin the
metric definitions instead: zero on identical inputs, monotone in
noise, DTW absorbing time warps, and F0 cent errors matching music
theory on synthetic tones.
"""
import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from forwardtacotron_tpu import evaluation as ev

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _rand_mel(t, m=80, seed=0):
    return np.random.RandomState(seed).randn(t, m).astype(np.float32)


# --------------------------------------------------------------- DTW core

def test_dtw_identity_cost_is_diagonal():
    t = 16
    cost = 1.0 - np.eye(t)
    path = ev.dtw_path(cost)
    assert path.shape == (t, 2)
    np.testing.assert_array_equal(path[:, 0], np.arange(t))
    np.testing.assert_array_equal(path[:, 1], np.arange(t))


def test_dtw_matches_naive_dp():
    """The vectorized cummin row recurrence equals the classic
    three-way cell DP on random costs."""
    rs = np.random.RandomState(3)
    cost = rs.rand(23, 31)
    ta, tb = cost.shape
    d = np.full((ta, tb), np.inf)
    d[0] = np.cumsum(cost[0])
    for i in range(1, ta):
        for j in range(tb):
            best = d[i - 1, j]
            if j > 0:
                best = min(best, d[i - 1, j - 1], d[i, j - 1])
            d[i, j] = cost[i, j] + best
    path = ev.dtw_path(cost)
    # path cost equals the DP optimum
    path_cost = float(np.sum(cost[path[:, 0], path[:, 1]]))
    assert path_cost == pytest.approx(d[-1, -1], rel=1e-9)
    # path is monotone with steps in {(0,1),(1,0),(1,1)}
    steps = np.diff(path, axis=0)
    assert np.all(steps >= 0) and np.all(steps.max(axis=1) == 1)


# ------------------------------------------------------------------- MCD

def test_mcd_zero_on_identical():
    mel = _rand_mel(50)
    m, path = ev.mcd_dtw(mel, mel)
    assert m['mcd_db'] == pytest.approx(0.0, abs=1e-5)
    assert m['dtw_path_len'] == 50


def test_mcd_monotone_in_noise():
    mel = _rand_mel(60)
    rs = np.random.RandomState(1)
    noise = rs.randn(*mel.shape).astype(np.float32)
    vals = [ev.mcd_dtw(mel, mel + s * noise)[0]['mcd_db']
            for s in (0.01, 0.1, 0.5)]
    assert vals[0] < vals[1] < vals[2]
    assert vals[0] > 0


def test_mcd_dtw_absorbs_time_stretch():
    """A frame-doubled (half-speed) copy aligns at near-zero MCD via
    DTW; the same comparison without alignment (1:1 truncation) is
    far off."""
    mel = _rand_mel(40)
    stretched = np.repeat(mel, 2, axis=0)
    aligned = ev.mcd_dtw(mel, stretched)[0]['mcd_db']
    naive = ev.mcd_dtw(mel, stretched,
                       path=np.stack([np.arange(40)] * 2, 1))[0]['mcd_db']
    assert aligned == pytest.approx(0.0, abs=1e-5)
    assert naive > 1.0


def test_eval_mel_pair_accepts_reference_layout():
    mel = _rand_mel(64)  # (T, 80)
    m = ev.eval_mel_pair(mel.T, mel)  # (80, T) vs (T, 80)
    assert m['mcd_db'] == pytest.approx(0.0, abs=1e-5)


def test_eval_mel_pair_short_clip_layout():
    """Clips shorter than n_mels frames must not be mis-transposed:
    the known channel count disambiguates, not the smaller axis."""
    mel = _rand_mel(20)  # (20, 80): T < n_mels
    m = ev.eval_mel_pair(mel, mel.T)
    assert m['frames_ref'] == 20 and m['frames_syn'] == 20
    assert m['mcd_db'] == pytest.approx(0.0, abs=1e-5)


# -------------------------------------------------------------------- F0

def test_f0_rmse_cents_on_detuned_tracks():
    """220 Hz vs 246.94 Hz (A3 vs B3) = 200 cents."""
    f0a = np.full(100, 220.0)
    f0b = np.full(100, 246.94)
    m = ev.f0_metrics(f0a, f0b)
    assert m['f0_rmse_cents'] == pytest.approx(200.0, abs=1.0)
    assert m['f0_rmse_hz'] == pytest.approx(26.94, abs=0.1)
    assert m['vde'] == 0.0


def test_f0_vde_counts_voicing_disagreement():
    f0a = np.array([100.0] * 50 + [0.0] * 50)
    f0b = np.array([100.0] * 75 + [0.0] * 25)
    m = ev.f0_metrics(f0a, f0b)
    assert m['vde'] == pytest.approx(0.25)
    assert m['co_voiced_frames'] == 50
    assert m['f0_rmse_hz'] == pytest.approx(0.0, abs=1e-9)


def test_f0_all_unvoiced_yields_nan_rmse():
    m = ev.f0_metrics(np.zeros(10), np.zeros(10))
    assert np.isnan(m['f0_rmse_hz'])
    assert m['vde'] == 0.0


# -------------------------------------------------------------- durations

def test_duration_metrics():
    pred = np.array([2.0, 3.0, 5.0, 4.0])
    tgt = np.array([2.0, 4.0, 5.0, 4.0])
    m = ev.duration_metrics(pred, tgt)
    assert m['dur_exact_acc'] == pytest.approx(0.75)
    assert m['dur_mae_frames'] == pytest.approx(0.25)
    assert m['dur_total_rel_err'] == pytest.approx(1.0 / 15.0)


# ------------------------------------------------- wav-level + CLI driver

def _tone(freq, seconds, sr=22050, seed=0):
    t = np.arange(int(seconds * sr)) / sr
    rs = np.random.RandomState(seed)
    return (0.5 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rs.randn(len(t))).astype(np.float32)


def test_eval_wav_pair_identical_is_zero():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    dsp = DSP.from_config(read_config(str(ROOT / 'config.yaml')))
    wav = _tone(220.0, 0.6)
    m = ev.eval_wav_pair(wav, wav, dsp)
    assert m['mcd_db'] == pytest.approx(0.0, abs=1e-4)
    assert m['vde'] == 0.0
    assert m['f0_rmse_hz'] == pytest.approx(0.0, abs=1e-6)
    assert m['co_voiced_frames'] > 10


def test_eval_wav_pair_detects_pitch_shift():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    dsp = DSP.from_config(read_config(str(ROOT / 'config.yaml')))
    m = ev.eval_wav_pair(_tone(220.0, 0.6), _tone(246.94, 0.6), dsp)
    assert m['f0_rmse_cents'] == pytest.approx(200.0, abs=15.0)


def test_eval_tts_cli_wav_mode(tmp_path):
    from scipy.io import wavfile
    ref_dir, gen_dir = tmp_path / 'ref', tmp_path / 'gen'
    ref_dir.mkdir(), gen_dir.mkdir()
    for name, detune in (('a', 1.0), ('b', 1.02)):
        wav = _tone(200.0, 0.5)
        wavfile.write(str(ref_dir / f'{name}.wav'), 22050,
                      (wav * 32767).astype(np.int16))
        wav2 = _tone(200.0 * detune, 0.5, seed=1)
        wavfile.write(str(gen_dir / f'{name}.wav'), 22050,
                      (wav2 * 32767).astype(np.int16))
    (gen_dir / 'unpaired.wav').write_bytes(b'')  # must be skipped
    report = tmp_path / 'report.json'
    proc = subprocess.run(
        [sys.executable, str(ROOT / 'tools' / 'eval_tts.py'),
         '--gen_dir', str(gen_dir), '--ref_dir', str(ref_dir),
         '--config', str(ROOT / 'config.yaml'), '--json', str(report)],
        capture_output=True, text=True, cwd=str(ROOT),
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
             'PYTHONPATH': str(ROOT), 'HOME': '/tmp'}, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line['metric'] == 'mcd_db' and np.isfinite(line['value'])
    assert line['extra']['n_files'] == 2
    full = json.loads(report.read_text())
    assert set(full['per_file']) == {'a', 'b'}


def test_eval_tts_cli_mel_mode(tmp_path):
    ref_dir, gen_dir = tmp_path / 'ref', tmp_path / 'gen'
    ref_dir.mkdir(), gen_dir.mkdir()
    mel = _rand_mel(48)
    np.save(ref_dir / 'u1.npy', mel.T)          # reference layout
    np.save(gen_dir / 'u1.npy', mel + 0.05)     # time-major
    proc = subprocess.run(
        [sys.executable, str(ROOT / 'tools' / 'eval_tts.py'),
         '--gen_dir', str(gen_dir), '--ref_dir', str(ref_dir), '--mels'],
        capture_output=True, text=True, cwd=str(ROOT),
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
             'PYTHONPATH': str(ROOT), 'HOME': '/tmp'}, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert 0 < line['value'] < 10.0


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
