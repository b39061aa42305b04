"""Quantified F0-tracker deviation bound (round-4 VERDICT item 8).

The preprocessing F0 tracker (dsp/pitch.py, normalized-autocorrelation)
deliberately deviates from the reference's WORLD-dio
(/root/reference/preprocess.py:79-80 — pyworld is not in this image;
PARITY.md deviation #3). The claim used to be qualitative; this tool
measures it against two independent anchors on the committed speech
fixture (tests/resources/golden_speech.wav):

  1. TRUTH — the constructed contour (tests/resources/golden_f0.npy):
     the fixture is synthesized with a known F0, so this is exact
     ground truth, a bar even dio can only approximate;
  2. YIN — an independent float64 implementation of de Cheveigné &
     Kawahara (2002) written HERE (difference function -> cumulative
     mean normalized difference -> absolute threshold -> parabolic
     interpolation), sharing no code with dsp/pitch.py.

Reported per pair: voiced/unvoiced decision agreement rate and cents
RMSE over commonly-voiced frames. The measured bounds are recorded in
PARITY.md and pinned by tests/test_dsp_golden.py::test_f0_bound_*.

    python tools/f0_bound.py          # prints one JSON object
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))
RES = _ROOT / 'tests' / 'resources'


def yin_f0(y: np.ndarray, sample_rate: int, hop_length: int,
           win_length: int = 1024, f0_floor: float = 71.0,
           f0_ceil: float = 800.0, threshold: float = 0.15) -> np.ndarray:
    """Frame-wise YIN in float64. Returns per-frame F0, 0 = unvoiced.

    Centered framing matching dsp/pitch.py's frame grid (reflect pad
    win//2, 1 + len//hop frames) so contours align index-for-index."""
    y = np.asarray(y, np.float64)
    pad = win_length // 2
    yp = np.pad(y, (pad, pad), mode='reflect')
    n_frames = 1 + len(y) // hop_length
    tau_min = max(int(sample_rate / f0_ceil), 2)
    tau_max = min(int(np.ceil(sample_rate / f0_floor)), win_length // 2)

    out = np.zeros(n_frames)
    for t in range(n_frames):
        frame = yp[t * hop_length: t * hop_length + win_length]
        if len(frame) < win_length:
            break
        w = win_length // 2
        x = frame
        # YIN difference function d(tau) = sum_{j<w} (x[j]-x[j+tau])^2
        # via the cross-correlation identity, with the cross term
        # restricted to the SAME w-sample window as the energy terms:
        # c(tau) = sum_{j<w} x[j] x[j+tau] = irfft(conj(X1) * X)[tau]
        n_fft = 2 * win_length
        x1 = np.zeros(win_length)
        x1[:w] = x[:w]
        cross = np.fft.irfft(np.conj(np.fft.rfft(x1, n_fft))
                             * np.fft.rfft(x, n_fft), n_fft)[:w + 1]
        csum = np.concatenate([[0.0], np.cumsum(x * x)])
        e0 = csum[w] - csum[0]
        e_tau = csum[np.arange(w + 1) + w] - csum[np.arange(w + 1)]
        d = e0 + e_tau - 2.0 * cross
        d = np.maximum(d, 0.0)
        # cumulative mean normalized difference
        cmndf = np.ones(w + 1)
        run = np.cumsum(d[1:])
        cmndf[1:] = d[1:] * np.arange(1, w + 1) / np.maximum(run, 1e-12)
        # absolute threshold: first tau in range dipping below
        tau = 0
        for k in range(tau_min, min(tau_max + 1, w)):
            if cmndf[k] < threshold:
                while k + 1 < w and cmndf[k + 1] < cmndf[k]:
                    k += 1
                tau = k
                break
        if tau == 0:
            # fallback: global minimum if it is convincing
            k = int(np.argmin(cmndf[tau_min:tau_max + 1])) + tau_min
            if cmndf[k] < 2 * threshold:
                tau = k
        if tau <= 0:
            continue
        # parabolic interpolation around tau
        if 1 <= tau < w - 1:
            a, b, c = d[tau - 1], d[tau], d[tau + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            shift = float(np.clip(shift, -1.0, 1.0))
        else:
            shift = 0.0
        out[t] = sample_rate / (tau + shift)
    return out


def cents_rmse(f_a: np.ndarray, f_b: np.ndarray) -> float:
    cents = 1200.0 * np.log2(f_a / f_b)
    return float(np.sqrt(np.mean(cents ** 2)))


def compare(f_a: np.ndarray, f_b: np.ndarray, skip_edges: int = 2):
    """V/UV agreement + cents RMSE between two aligned contours,
    excluding frames within `skip_edges` of a voicing transition in
    either contour (windowed estimators are ill-defined there)."""
    n = min(len(f_a), len(f_b))
    f_a, f_b = f_a[:n], f_b[:n]
    va, vb = f_a > 0, f_b > 0
    stable = np.ones(n, bool)
    for v in (va, vb):
        for s in range(1, skip_edges + 1):
            stable &= (np.roll(v, s) == v) & (np.roll(v, -s) == v)
    agree = float(np.mean(va[stable] == vb[stable]))
    both = stable & va & vb
    rmse = cents_rmse(f_a[both], f_b[both]) if both.any() else float('nan')
    return {'vuv_agreement': round(agree, 4),
            'cents_rmse_voiced': round(rmse, 2),
            'n_frames': int(n), 'n_stable': int(stable.sum()),
            'n_both_voiced': int(both.sum())}


def run() -> dict:
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.dsp.pitch import extract_pitch
    from forwardtacotron_tpu.utils.files import read_config

    dsp = DSP.from_config(read_config(_ROOT / 'config.yaml'))
    y = dsp.load_wav(RES / 'golden_speech.wav')
    truth = np.load(RES / 'golden_f0.npy')
    nac = np.asarray(extract_pitch(y, dsp.sample_rate, dsp.hop_length))
    yin = yin_f0(np.asarray(y), dsp.sample_rate, dsp.hop_length)
    return {
        'nac_vs_truth': compare(nac, truth),
        'yin_vs_truth': compare(yin, truth),
        'nac_vs_yin': compare(nac, yin),
    }


if __name__ == '__main__':
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    print(json.dumps(run(), indent=2))
