"""ctypes binding for the native mel-batch loader
(native/batch_loader.cc).

The reference gets parallel batch collation from PyTorch DataLoader
worker processes (reference utils/dataset.py:134-199); this framework's
equivalent is a small C++ library that mmaps the float32 (n_mels, T)
.npy mel files of a batch and writes them transposed + padded into the
final (B, max_t, n_mels) array with a worker-thread pool — one pass
instead of numpy's load/pad/stack/transpose/astype chain. Falls back to
the numpy path when the shared object is not built (`make -C native`)
or a file fails validation.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent.parent.parent / 'native' / \
    'libftt_loader.so'
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or not _LIB_PATH.exists():
        return None
    try:
        return _load_unchecked()
    except (OSError, AttributeError):
        # Incompatible prebuilt binary (wrong arch/OS) or a stale .so
        # missing a symbol: fall back to the numpy path permanently.
        _load_failed = True
        return None


def _load_unchecked() -> ctypes.CDLL:
    global _lib
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ftt_load_mel_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
        ctypes.c_int32,
    ]
    lib.ftt_load_mel_batch.restype = ctypes.c_int
    i64_arr = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    lib.ftt_npy_lengths.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.c_char_p, i64_arr, ctypes.c_int32]
    lib.ftt_npy_lengths.restype = ctypes.c_int
    lib.ftt_load_mel_windows.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, i64_arr,
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
        ctypes.c_int32]
    lib.ftt_load_mel_windows.restype = ctypes.c_int
    lib.ftt_load_i64_windows.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, i64_arr,
        ctypes.c_int64, i64_arr, ctypes.c_int32]
    lib.ftt_load_i64_windows.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _n_threads(n_items: int) -> int:
    env = os.environ.get('FTT_LOADER_THREADS')
    if env:
        return max(1, int(env))
    return max(1, min(8, os.cpu_count() or 1, n_items))


def load_mel_batch(paths: Sequence[Path], max_t: int, n_mels: int,
                   fill: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load a batch of (n_mels, T) float32 .npy files as one
    (B, max_t, n_mels) float32 array padded with `fill`, plus the int
    lengths. Returns None when the native library is unavailable or any
    file fails validation (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, max_t, n_mels), dtype=np.float32)
    lens = np.empty(n, dtype=np.int32)
    encoded = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    rc = lib.ftt_load_mel_batch(arr, n, out, max_t, n_mels,
                                ctypes.c_float(fill), lens,
                                _n_threads(n))
    if rc != 0:
        return None
    return out, lens.astype(np.int64)


def _encode(paths: Sequence[Path]) -> 'ctypes.Array':
    encoded = [str(p).encode() for p in paths]
    return (ctypes.c_char_p * len(paths))(*encoded)


def npy_lengths(paths: Sequence[Path],
                descr: str = '<f4') -> Optional[np.ndarray]:
    """Last-dimension length of each .npy via a native header peek
    (f32 2-D -> T; i8 1-D -> n). None on unavailability/mismatch."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(len(paths), dtype=np.int64)
    rc = lib.ftt_npy_lengths(_encode(paths), len(paths), descr.encode(),
                             out, _n_threads(len(paths)))
    return None if rc != 0 else out


def load_mel_windows(paths: Sequence[Path], starts: Sequence[int],
                     win: int, n_mels: int) -> Optional[np.ndarray]:
    """Column windows [start, start+win) of (n_mels, T) float32 .npy
    files, returned time-major (B, win, n_mels) — reads only the
    window, not the file."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, win, n_mels), dtype=np.float32)
    starts_arr = np.ascontiguousarray(starts, dtype=np.int64)
    rc = lib.ftt_load_mel_windows(_encode(paths), n, starts_arr, win,
                                  n_mels, out, _n_threads(n))
    return None if rc != 0 else out


def load_i64_windows(paths: Sequence[Path], starts: Sequence[int],
                     count: int) -> Optional[np.ndarray]:
    """Element windows [start, start+count) of 1-D int64 .npy files
    (the quantized waveform labels) as a (B, count) array."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, count), dtype=np.int64)
    starts_arr = np.ascontiguousarray(starts, dtype=np.int64)
    rc = lib.ftt_load_i64_windows(_encode(paths), n, starts_arr, count,
                                  out, _n_threads(n))
    return None if rc != 0 else out
