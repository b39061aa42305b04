"""Non-ideal wavs through the preprocessing pipeline (VERDICT round-1
item 9): stereo, mismatched sample rate, clipped, near-silent, corrupt
and empty files. The reference fans each file through
Preprocessor._convert_file (reference preprocess.py:41-99) with no
corrupt-file guard; here a bad file is skipped with a log line and the
run continues."""
import struct
import wave
from pathlib import Path

import numpy as np
import pytest


SR = 22050


def _write_wav(path, data, sr=SR, channels=1):
    data = np.asarray(data)
    pcm = np.clip(np.round(data * 32767.0), -32768, 32767).astype('<i2')
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _tone(n, sr=SR, f=220.0, amp=0.5):
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * f * t)


@pytest.fixture()
def dsp():
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.utils.files import read_config
    cfg = read_config(Path(__file__).parent.parent / 'config.yaml')
    cfg['dsp']['trim_start_end_silence'] = False
    return DSP.from_config(cfg)


def test_load_stereo_downmixes(dsp, tmp_path):
    left, right = _tone(SR // 2, amp=0.8), _tone(SR // 2, amp=0.2)
    inter = np.empty(SR, dtype=np.float64)
    inter[0::2], inter[1::2] = left, right
    _write_wav(tmp_path / 's.wav', inter, channels=2)
    y = dsp.load_wav(tmp_path / 's.wav')
    assert y.ndim == 1 and len(y) == SR // 2
    # downmix = mean of channels -> amplitude ~0.5
    assert 0.4 < np.abs(y).max() < 0.6


def test_load_resamples_mismatched_rate(dsp, tmp_path):
    _write_wav(tmp_path / 'r.wav', _tone(44100, sr=44100), sr=44100)
    y = dsp.load_wav(tmp_path / 'r.wav')
    assert abs(len(y) - SR) <= 2            # 1 s at 22050
    # the tone survives resampling: dominant frequency ~220 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * SR / len(y)
    assert abs(peak_hz - 220.0) < 5.0


def test_process_all_skips_bad_files_and_keeps_going(dsp, tmp_path,
                                                     capsys):
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.utils.paths import Paths
    from preprocess import process_all

    wav_dir = tmp_path / 'wavs'
    wav_dir.mkdir()
    good = _tone(SR)
    _write_wav(wav_dir / 'good.wav', good)
    _write_wav(wav_dir / 'clipped.wav', 3.0 * _tone(SR))  # clips at 1.0
    _write_wav(wav_dir / 'quiet.wav', 1e-4 * _tone(SR))
    _write_wav(wav_dir / 'stereo.wav',
               np.repeat(_tone(SR // 2), 2), channels=2)
    _write_wav(wav_dir / 'fast.wav', _tone(44100, sr=44100), sr=44100)
    _write_wav(wav_dir / 'empty.wav', np.zeros(0))
    (wav_dir / 'corrupt.wav').write_bytes(
        b'RIFF' + struct.pack('<I', 10) + b'WAVEjunk')

    paths = Paths(tmp_path / 'data', 'voc_id', 'tts_id')
    cleaner = Cleaner('english_cleaners', use_phonemes=False,
                      lang='en-us')
    ids = ['good', 'clipped', 'quiet', 'stereo', 'fast', 'empty',
           'corrupt']
    text_dict = {i: 'hello world' for i in ids}
    wav_files = sorted(wav_dir.glob('*.wav'))

    dataset, cleaned = process_all(paths, dsp, cleaner, text_dict,
                                   wav_files, n_workers=2)
    done_ids = {d[0] for d in dataset}
    # every decodable file survives; corrupt + empty are skipped
    assert done_ids == {'good', 'clipped', 'quiet', 'stereo', 'fast'}
    out = capsys.readouterr().out
    assert 'corrupt.wav' in out
    assert 'empty.wav' in out

    # artifacts exist and are finite, with consistent frame counts
    for wav_id in done_ids:
        mel = np.load(paths.mel / f'{wav_id}.npy')
        quant = np.load(paths.quant / f'{wav_id}.npy')
        pitch = np.load(paths.raw_pitch / f'{wav_id}.npy')
        assert mel.shape[0] == dsp.n_mels
        assert np.isfinite(mel).all()
        assert mel.shape[1] == len(pitch)
        assert len(quant) > 0
    # clipped input was peak-normalized before quantization
    q = np.load(paths.quant / 'clipped.npy')
    assert q.min() >= 0 and q.max() < 2 ** dsp.bits
    # resampled file is ~1 s => ~87 frames at hop 256
    mel_fast = np.load(paths.mel / 'fast.npy')
    assert abs(mel_fast.shape[1] - (1 + SR // dsp.hop_length)) <= 2
