"""Generate the hermetic DSP golden fixtures (run ONCE, outputs are
committed).

The reference pins `wav_to_mel` against a stored golden computed from
the librosa example clip (reference tests/test_dsp.py:18-25 +
tests/resources/test_mel.npy). That clip and librosa are not in this
image, so this script builds the in-repo analog from first principles:

1. `tests/resources/golden_speech.wav` — a deterministic speech-like
   signal (voiced harmonic segments with a known F0 contour + vibrato,
   an unvoiced fricative-like noise burst, soft formant resonances,
   edge silence), written as 16-bit PCM via the stdlib `wave` module
   (no repo code in the loop).
2. `tests/resources/golden_mel.npy` — the log-mel of that wav computed
   by an INDEPENDENT implementation of the reference's DSP contract
   (librosa 0.7.2 semantics, reference utils/dsp.py:71-110): STFT via
   torch.stft (center=True, reflect pad, periodic hann), a
   freshly-written float64 slaney mel filterbank, then the reference's
   clip(1e-5)+log normalize. Committed as data, it stays a fixed
   oracle even if either implementation drifts.
3. `tests/resources/golden_f0.npy` — the TRUE per-frame F0 contour of
   the synthesized signal (0 where unvoiced/silent), frame rate =
   hop_length. This is ground truth by construction — a stronger
   anchor for the pitch estimator than a WORLD-dio golden (pyworld is
   also not in this image; dio itself only estimates this contour).

Config values mirror config.yaml's dsp section (22050 Hz, n_fft 1024,
hop 256, win 1024, 80 mels, fmin 0, fmax 8000).
"""
from __future__ import annotations

import pathlib
import wave

import numpy as np

SR = 22050
N_FFT = 1024
HOP = 256
WIN = 1024
N_MELS = 80
FMIN, FMAX = 0.0, 8000.0

OUT = pathlib.Path(__file__).resolve().parent.parent / 'tests' / 'resources'


def synth_speech(duration: float = 1.3):
    """Deterministic speech-like waveform + per-sample F0 (0=unvoiced)."""
    n = int(duration * SR)
    t = np.arange(n) / SR
    rng = np.random.RandomState(1234)

    # F0 contour: 120 -> 190 Hz glide with 5.5 Hz vibrato
    f0 = 120.0 + 70.0 * (t / duration) + 4.0 * np.sin(2 * np.pi * 5.5 * t)

    # segmentation: silence | voiced | unvoiced noise | voiced | silence
    def seg(a, b):
        return (t >= a) & (t < b)
    voiced = seg(0.08, 0.55) | seg(0.75, 1.2)
    unvoiced = seg(0.57, 0.73)

    # harmonic source with 1/k tilt, phase-accumulated for the glide
    phase = 2 * np.pi * np.cumsum(f0) / SR
    y = np.zeros(n)
    for k in range(1, 40):
        if 120.0 * k > SR / 2 - 200:
            break
        y += np.sin(k * phase) / k
    # soft "formants": resonant comb via two modulated gains
    freqs = np.fft.rfftfreq(n, 1 / SR)
    Y = np.fft.rfft(y * voiced)
    formant = (1.0
               + 2.0 * np.exp(-0.5 * ((freqs - 700) / 250) ** 2)
               + 1.2 * np.exp(-0.5 * ((freqs - 1800) / 350) ** 2))
    y = np.fft.irfft(Y * formant, n)

    # unvoiced fricative: high-passed noise
    noise = rng.randn(n)
    N = np.fft.rfft(noise * unvoiced)
    N *= np.clip((freqs - 2000) / 4000, 0, 1)
    y = y + 0.25 * np.fft.irfft(N, n)

    # amplitude envelope with 20 ms edge fades per segment
    env = (voiced | unvoiced).astype(np.float64)
    k = int(0.02 * SR)
    env = np.convolve(env, np.ones(k) / k, mode='same')
    y *= env
    y = 0.6 * y / np.max(np.abs(y))

    f0_true = np.where(voiced, f0, 0.0)
    return y.astype(np.float64), f0_true


def slaney_mel_fb():
    """Independently-written slaney filterbank (librosa semantics):
    linear-below-1kHz / log-above mel scale, triangular filters,
    2/(band width) area normalization. float64."""
    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        m = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        m = np.where(log_region,
                     15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                     / (np.log(6.4) / 27.0),
                     m)
        return m

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region,
                     1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)),
                     f)
        return f

    mels = np.linspace(hz_to_mel(FMIN), hz_to_mel(FMAX), N_MELS + 2)
    hz = mel_to_hz(mels)
    fft_freqs = np.linspace(0, SR / 2.0, 1 + N_FFT // 2)
    fb = np.zeros((N_MELS, len(fft_freqs)))
    for i in range(N_MELS):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        lower = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        upper = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
        fb[i] *= 2.0 / (hi - lo)
    return fb


def reference_mel(y: np.ndarray) -> np.ndarray:
    """Reference wav_to_mel semantics (utils/dsp.py:71-110) via torch."""
    import torch
    spec = torch.stft(torch.tensor(y, dtype=torch.float64),
                      n_fft=N_FFT, hop_length=HOP, win_length=WIN,
                      window=torch.hann_window(WIN, periodic=True,
                                               dtype=torch.float64),
                      center=True, pad_mode='reflect',
                      return_complex=True)
    mag = spec.abs().numpy()                     # (freq, frames)
    mel = slaney_mel_fb() @ mag                  # (n_mels, frames)
    return np.log(np.clip(mel, a_min=1e-5, a_max=None))


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    y, f0 = synth_speech()

    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype('<i2')
    with wave.open(str(OUT / 'golden_speech.wav'), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())

    # the mel golden is computed from the EXACT samples the wav stores
    y_q = pcm.astype(np.float64) / 32768.0
    mel = reference_mel(y_q).astype(np.float32)
    np.save(OUT / 'golden_mel.npy', mel)

    # per-frame true F0 at the mel frame rate (frame i ~ sample i*hop)
    n_frames = mel.shape[1]
    idx = np.minimum(np.arange(n_frames) * HOP, len(f0) - 1)
    np.save(OUT / 'golden_f0.npy', f0[idx].astype(np.float32))

    print(f'wrote {OUT}/golden_speech.wav ({len(pcm)} samples), '
          f'golden_mel.npy {mel.shape}, golden_f0.npy ({n_frames},)')


if __name__ == '__main__':
    main()
