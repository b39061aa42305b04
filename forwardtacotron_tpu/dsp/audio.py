"""The DSP facade: config-driven audio feature pipeline.

Parity surface: the `DSP` class in the reference (utils/dsp.py:12-161) —
same constructor fields (from config['dsp']), same method names
(load_wav/save_wav/wav_to_mel/griffinlim/normalize/denormalize/
trim_silence/trim_long_silences/label_2_float/float_2_label/
encode_mu_law/decode_mu_law). Compute is XLA (dsp/stft.py,
dsp/griffinlim.py); host IO uses the stdlib/scipy instead of
librosa/soundfile. Mel output keeps the reference layout (n_mels, T).
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.dsp import stft as _stft
from forwardtacotron_tpu.dsp import griffinlim as _gl


class DSP:

    def __init__(self,
                 num_mels: int,
                 sample_rate: int,
                 hop_length: int,
                 win_length: int,
                 n_fft: int,
                 fmin: float,
                 fmax: float,
                 peak_norm: bool,
                 trim_start_end_silence: bool,
                 trim_silence_top_db: int,
                 pitch_max_freq: int,
                 trim_long_silences: bool,
                 vad_sample_rate: int,
                 vad_window_length: float,
                 vad_moving_average_width: float,
                 vad_max_silence_length: int,
                 bits: int,
                 mu_law: bool,
                 voc_mode: str,
                 ) -> None:
        self.n_mels = num_mels
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_fft = n_fft
        self.fmin = fmin
        self.fmax = fmax

        self.should_peak_norm = peak_norm
        self.should_trim_start_end_silence = trim_start_end_silence
        self.should_trim_long_silences = trim_long_silences
        self.trim_silence_top_db = trim_silence_top_db
        self.pitch_max_freq = pitch_max_freq

        self.vad_sample_rate = vad_sample_rate
        self.vad_window_length = vad_window_length
        self.vad_moving_average_width = vad_moving_average_width
        self.vad_max_silence_length = vad_max_silence_length

        self.bits = bits
        self.mu_law = mu_law
        self.voc_mode = voc_mode

        self.mel_basis = _stft.mel_filterbank(
            sample_rate, n_fft, num_mels, fmin, fmax)
        self._wav_to_mel = _stft.wav_to_mel_fn(
            self.mel_basis, n_fft, hop_length, win_length)
        self._wav_to_mel_raw = _stft.wav_to_mel_fn(
            self.mel_basis, n_fft, hop_length, win_length, normalize=False)
        self._wav_to_mel_nocenter = _stft.wav_to_mel_fn(
            self.mel_basis, n_fft, hop_length, win_length, center=False)
        self._mel_to_wav = _gl.mel_to_wav_fn(
            self.mel_basis, n_fft, hop_length, win_length)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'DSP':
        return DSP(**config['dsp'])

    # ------------------------------------------------------------- host IO
    def load_wav(self, path: Union[str, Path]) -> np.ndarray:
        from forwardtacotron_tpu.utils import native_audio
        if native_audio.available():
            wav, _ = native_audio.read_wav(path, target_sr=self.sample_rate)
            return wav
        from scipy.io import wavfile
        sr, wav = wavfile.read(str(path))
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        elif wav.dtype == np.uint8:
            wav = (wav.astype(np.float32) - 128.0) / 128.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if sr != self.sample_rate:
            from scipy.signal import resample_poly
            g = math.gcd(int(self.sample_rate), int(sr))
            wav = resample_poly(wav, self.sample_rate // g, sr // g
                                ).astype(np.float32)
        return wav

    def save_wav(self, wav: np.ndarray, path: Union[str, Path]) -> None:
        wav = np.asarray(wav)
        if wav.dtype == np.int16:  # already PCM (e.g. vocode(pcm16=True))
            from scipy.io import wavfile
            wavfile.write(str(path), self.sample_rate, wav)
            return
        wav = wav.astype(np.float32)
        from forwardtacotron_tpu.utils import native_audio
        if native_audio.available():
            native_audio.write_wav(path, wav, self.sample_rate)
            return
        from scipy.io import wavfile
        wav = np.clip(wav, -1.0, 1.0)
        wavfile.write(str(path), self.sample_rate,
                      (wav * 32767).astype(np.int16))

    # --------------------------------------------------------- XLA compute
    def wav_to_mel(self, y: np.ndarray, normalize: bool = True) -> np.ndarray:
        """Log-mel spectrogram, layout (n_mels, T) like the reference."""
        fn = self._wav_to_mel if normalize else self._wav_to_mel_raw
        mel = fn(jnp.asarray(y, dtype=jnp.float32))
        return np.asarray(mel).T if mel.ndim == 2 else np.asarray(mel)

    def wav_to_mel_bucketed(self, y: np.ndarray,
                            bucket_multiple: int = 16384) -> np.ndarray:
        """Log-mel of one utterance with jit-stable shapes: the exact
        librosa-style centered reflect padding happens host-side around
        the true signal, then the signal is zero-padded to a length
        ladder so the on-device STFT compiles once per bucket instead of
        once per wav length. Returns (n_mels, T) with the exact frame
        count and values of `wav_to_mel`."""
        y = np.asarray(y, dtype=np.float32)
        true_frames = 1 + len(y) // self.hop_length
        pad = self.n_fft // 2
        y_p = np.pad(y, (pad, pad), mode='reflect')
        bucket = int(np.ceil(len(y_p) / bucket_multiple)) * bucket_multiple
        y_p = np.pad(y_p, (0, bucket - len(y_p)))
        mel = self._wav_to_mel_nocenter(jnp.asarray(y_p))
        return np.asarray(mel[:true_frames]).T

    def wav_to_mel_batch(self, y: jnp.ndarray) -> jnp.ndarray:
        """Batched on-device variant, time-major (B, T, n_mels)."""
        return self._wav_to_mel(y)

    def griffinlim(self, mel: np.ndarray, n_iter: int = 32,
                   seed: int = 0) -> np.ndarray:
        """mel in reference layout (n_mels, T) or time-major (T, n_mels)."""
        mel = np.asarray(mel)
        if mel.shape[0] == self.n_mels and mel.shape[-1] != self.n_mels:
            mel = mel.T
        key = jax.random.PRNGKey(seed)
        wav = self._mel_to_wav(jnp.asarray(mel, dtype=jnp.float32), key)
        return np.asarray(wav)

    def normalize(self, mel: np.ndarray) -> np.ndarray:
        return np.log(np.clip(mel, a_min=1e-5, a_max=None))

    def denormalize(self, mel: np.ndarray) -> np.ndarray:
        return np.exp(mel)

    # ------------------------------------------------------------ trimming
    def trim_silence(self, wav: np.ndarray) -> np.ndarray:
        """librosa.effects.trim equivalent (frame_length=2048, hop=512):
        drop leading/trailing frames more than top_db below peak RMS."""
        frame_length, hop = 2048, 512
        if len(wav) < frame_length:
            return wav
        n_frames = 1 + (len(wav) - frame_length) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(frame_length)[None, :])
        rms = np.sqrt(np.mean(np.square(wav[idx]), axis=1))
        ref = np.max(rms)
        db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(ref, 1e-10))
        keep = np.where(db > -self.trim_silence_top_db)[0]
        if len(keep) == 0:
            return wav[:0]
        start = keep[0] * hop
        end = min(len(wav), (keep[-1] + 1) * hop + frame_length)
        return wav[start:end]

    def trim_long_silences(self, wav: np.ndarray) -> np.ndarray:
        from forwardtacotron_tpu.dsp.vad import trim_long_silences
        return trim_long_silences(
            wav, sample_rate=self.sample_rate,
            vad_sample_rate=self.vad_sample_rate,
            window_length_ms=self.vad_window_length,
            moving_average_width=self.vad_moving_average_width,
            max_silence_length=self.vad_max_silence_length)

    # --------------------------------------------------------- quantizers
    @staticmethod
    def label_2_float(x, bits: float):
        return 2 * x / (2 ** bits - 1.0) - 1.0

    @staticmethod
    def float_2_label(x, bits: float):
        peak = np.abs(x).max() if isinstance(x, np.ndarray) else jnp.abs(x).max()
        assert peak <= 1.0, f'Expected waveform in [-1, 1], peak was {peak}'
        x = (x + 1.0) * (2 ** bits - 1) / 2
        return x.clip(0, 2 ** bits - 1)

    @staticmethod
    def encode_mu_law(x, mu: float):
        mod = jnp if isinstance(x, jnp.ndarray) else np
        mu = mu - 1
        fx = mod.sign(x) * mod.log(1 + mu * mod.abs(x)) / mod.log(1 + mu)
        return mod.floor((fx + 1) / 2 * mu + 0.5)

    @staticmethod
    def decode_mu_law(y, mu: float, from_labels: bool = True):
        mod = jnp if isinstance(y, jnp.ndarray) else np
        if from_labels:
            y = DSP.label_2_float(y, math.log2(mu))
        mu = mu - 1
        return mod.sign(y) / mu * ((1 + mu) ** mod.abs(y) - 1)
