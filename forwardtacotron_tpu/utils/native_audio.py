"""ctypes binding for the native audio IO library (native/audio_io.cc).

Replaces the reference's C library dependencies for host audio work
(libsndfile/soundfile writes, librosa load — SURVEY.md §2.4) with this
framework's own C++ code. Falls back to scipy/numpy implementations when
the shared object is not built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import math
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent.parent.parent / 'native' / \
    'libftt_audio.so'
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    c_char_p, c_i32, c_i64 = ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64
    f32_p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    i32_p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')

    lib.wav_num_frames.argtypes = [c_char_p]
    lib.wav_num_frames.restype = c_i64
    lib.wav_sample_rate.argtypes = [c_char_p]
    lib.wav_sample_rate.restype = c_i32
    lib.wav_read_float.argtypes = [c_char_p, f32_p, c_i64]
    lib.wav_read_float.restype = c_i64
    lib.wav_write_pcm16.argtypes = [c_char_p, f32_p, c_i64, c_i32]
    lib.wav_write_pcm16.restype = ctypes.c_int
    lib.resample_linear.argtypes = [f32_p, c_i64, c_i32, c_i32, f32_p]
    lib.resample_linear.restype = c_i64
    lib.encode_mu_law.argtypes = [f32_p, c_i64, c_i32, i32_p]
    lib.encode_mu_law.restype = None
    lib.float_to_label.argtypes = [f32_p, c_i64, c_i32, i32_p]
    lib.float_to_label.restype = None
    lib.peak_normalize.argtypes = [f32_p, c_i64, ctypes.c_int]
    lib.peak_normalize.restype = ctypes.c_float
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(verbose: bool = False) -> bool:
    """Compile the shared library in place (requires g++)."""
    import subprocess
    try:
        subprocess.run(['make', '-C', str(_LIB_PATH.parent)],
                       check=True, capture_output=not verbose)
        global _lib
        _lib = None
        return _load() is not None
    except Exception as e:
        if verbose:
            print(f'native build failed: {e}')
        return False


def read_wav(path, target_sr: Optional[int] = None
             ) -> Tuple[np.ndarray, int]:
    """Decode a wav to float32 mono [-1, 1], optionally resampled."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native audio library not built')
    path_b = str(path).encode()
    n = lib.wav_num_frames(path_b)
    sr = lib.wav_sample_rate(path_b)
    if n < 0 or sr < 0:
        raise IOError(f'cannot decode wav: {path}')
    out = np.empty(n, dtype=np.float32)
    got = lib.wav_read_float(path_b, out, n)
    if got != n:
        raise IOError(f'short read on wav: {path}')
    if target_sr is not None and target_sr != sr:
        m = int(math.floor(n * target_sr / sr))
        res = np.empty(m + 1, dtype=np.float32)
        m = lib.resample_linear(out, n, sr, target_sr, res)
        out, sr = res[:m].copy(), target_sr
    return out, sr


def write_wav(path, data: np.ndarray, sample_rate: int) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError('native audio library not built')
    data = np.ascontiguousarray(data, dtype=np.float32)
    rc = lib.wav_write_pcm16(str(path).encode(), data, len(data),
                             sample_rate)
    if rc != 0:
        raise IOError(f'cannot write wav: {path}')


def encode_mu_law(x: np.ndarray, mu: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(len(x), dtype=np.int32)
    lib.encode_mu_law(x, len(x), mu, out)
    return out


def float_to_label(x: np.ndarray, bits: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(len(x), dtype=np.int32)
    lib.float_to_label(x, len(x), bits, out)
    return out


def peak_normalize(x: np.ndarray, always: bool = False) -> float:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    return float(lib.peak_normalize(x, len(x), int(always)))
