"""Native C++ batch loader (native/batch_loader.cc): bit-equality with
the numpy collation path, validation fallbacks, and the ctypes surface.

Reference context: the reference's parallel collation comes from
PyTorch DataLoader workers (utils/dataset.py:134-199); this framework
replaces it with a first-party C++ library. These tests pin that the
fast path is a pure optimization — identical batches, graceful
fallback.
"""
import os
import pathlib
import pickle

import numpy as np
import pytest

from forwardtacotron_tpu.data import native_loader
from forwardtacotron_tpu.data.dataset import MEL_PAD, get_tts_datasets


def _make_dataset(tmp_path, n_items=12, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    base = pathlib.Path(tmp_path) / 'data'
    for d in ('mel', 'alg', 'phon_pitch', 'phon_energy'):
        (base / d).mkdir(parents=True)
    items = []
    text = {}
    for i in range(n_items):
        iid = f'u{i:03d}'
        T = int(rng.integers(40, 120))
        n_tok = int(rng.integers(8, 24))
        np.save(base / 'mel' / f'{iid}.npy',
                rng.standard_normal((n_mels, T)).astype(np.float32))
        dur = rng.multinomial(T, np.ones(n_tok) / n_tok).astype(np.float32)
        np.save(base / 'alg' / f'{iid}.npy', dur)
        np.save(base / 'phon_pitch' / f'{iid}.npy',
                rng.standard_normal(n_tok).astype(np.float32))
        np.save(base / 'phon_energy' / f'{iid}.npy',
                rng.standard_normal(n_tok).astype(np.float32))
        items.append((iid, T))
        text[iid] = 'hello world ' * (n_tok // 2 + 1)
    with open(base / 'train_dataset.pkl', 'wb') as f:
        pickle.dump(items, f)
    with open(base / 'val_dataset.pkl', 'wb') as f:
        pickle.dump(items[:2], f)
    with open(base / 'text_dict.pkl', 'wb') as f:
        pickle.dump(text, f)
    return base


@pytest.mark.skipif(not native_loader.available(),
                    reason='libftt_loader.so not built')
def test_load_mel_batch_matches_numpy(tmp_path):
    base = _make_dataset(tmp_path)
    rng = np.random.default_rng(1)
    paths = sorted((base / 'mel').iterdir())
    max_t = 160
    out = native_loader.load_mel_batch(paths, max_t, 80, MEL_PAD)
    assert out is not None
    mel, lens = out
    assert mel.shape == (len(paths), max_t, 80)
    for i, p in enumerate(paths):
        ref = np.load(str(p))
        assert lens[i] == ref.shape[-1]
        np.testing.assert_array_equal(mel[i, :lens[i]], ref.T)
        assert np.all(mel[i, lens[i]:] == np.float32(MEL_PAD))
    del rng


@pytest.mark.skipif(not native_loader.available(),
                    reason='libftt_loader.so not built')
@pytest.mark.parametrize('model_type', ['tacotron', 'forward'])
def test_bucket_batcher_native_equals_python(tmp_path, model_type):
    base = _make_dataset(tmp_path, n_items=10)
    kwargs = dict(batch_size=4, r=3, max_mel_len=None,
                  filter_attention=False, model_type=model_type,
                  mel_multiple=64)
    train_a, _ = get_tts_datasets(base, **kwargs)
    os.environ['FTT_NATIVE_LOADER'] = '0'
    try:
        train_b, _ = get_tts_datasets(base, **kwargs)
        batches_a = list(train_a)
        batches_b = list(train_b)
    finally:
        del os.environ['FTT_NATIVE_LOADER']
    assert len(batches_a) == len(batches_b) > 0
    for a, b in zip(batches_a, batches_b):
        assert a['item_id'] == b['item_id']
        assert a['n_real'] == b['n_real']
        for k in a:
            if k in ('item_id', 'n_real'):
                continue
            assert a[k].dtype == b[k].dtype, k
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.skipif(not native_loader.available(),
                    reason='libftt_loader.so not built')
def test_voc_batcher_native_equals_python(tmp_path):
    from forwardtacotron_tpu.data.dataset import get_vocoder_datasets
    rng = np.random.default_rng(7)
    base = pathlib.Path(tmp_path) / 'data'
    (base / 'mel').mkdir(parents=True)
    (base / 'quant').mkdir()
    hop, seq_len = 64, 512
    items = []
    for i in range(8):
        iid = f'v{i:03d}'
        T = int(rng.integers(40, 90))
        np.save(base / 'mel' / f'{iid}.npy',
                rng.standard_normal((80, T)).astype(np.float32))
        np.save(base / 'quant' / f'{iid}.npy',
                rng.integers(0, 512, T * hop).astype(np.int64))
        items.append((iid, T))
    with open(base / 'train_dataset.pkl', 'wb') as f:
        pickle.dump(items, f)
    with open(base / 'val_dataset.pkl', 'wb') as f:
        pickle.dump(items[:4], f)

    from forwardtacotron_tpu.data.dataset import (VocBatcher, VocCollator,
                                                  VocoderDataset)

    def build_seeded():
        ds = VocoderDataset(base, [i for i, _ in items])
        coll = VocCollator(hop, 2, seq_len, 'RAW', 9,
                           rng=np.random.RandomState(123))
        return VocBatcher(ds, 4, coll, shuffle=True, seed=5)

    batches_a = list(build_seeded())
    os.environ['FTT_NATIVE_LOADER'] = '0'
    try:
        batches_b = list(build_seeded())
        _, val_b, _ = get_vocoder_datasets(
            base, batch_size=4, train_gta=False, max_mel_len=10_000,
            hop_length=hop, voc_pad=2, voc_seq_len=seq_len,
            voc_mode='RAW', bits=9, num_gen_samples=1)
    finally:
        del os.environ['FTT_NATIVE_LOADER']
    _, val_a, _ = get_vocoder_datasets(
        base, batch_size=4, train_gta=False, max_mel_len=10_000,
        hop_length=hop, voc_pad=2, voc_seq_len=seq_len,
        voc_mode='RAW', bits=9, num_gen_samples=1)
    assert len(batches_a) == len(batches_b) > 0
    for a, b in zip(batches_a, batches_b):
        for k in ('mel', 'x', 'y'):
            assert a[k].dtype == b[k].dtype, k
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # fixed-seed val batches identical across paths (dataset.py:70-72
    # reference semantics)
    assert len(val_a) == len(val_b) > 0
    for a, b in zip(val_a, val_b):
        for k in ('mel', 'x', 'y'):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f'val {k}')


@pytest.mark.skipif(not native_loader.available(),
                    reason='libftt_loader.so not built')
def test_window_readers_match_numpy(tmp_path):
    rng = np.random.default_rng(3)
    p2 = pathlib.Path(tmp_path) / 'two.npy'
    arr2 = rng.standard_normal((80, 50)).astype(np.float32)
    np.save(p2, arr2)
    win = native_loader.load_mel_windows([p2, p2], [5, 44], 6, 80)
    assert win is not None
    np.testing.assert_array_equal(win[0], arr2[:, 5:11].T)
    np.testing.assert_array_equal(win[1], arr2[:, 44:50].T)
    # out-of-range start refuses
    assert native_loader.load_mel_windows([p2], [45], 6, 80) is None
    assert native_loader.load_mel_windows([p2], [-1], 6, 80) is None

    p1 = pathlib.Path(tmp_path) / 'one.npy'
    arr1 = rng.integers(0, 512, 400).astype(np.int64)
    np.save(p1, arr1)
    w = native_loader.load_i64_windows([p1], [17], 100)
    assert w is not None
    np.testing.assert_array_equal(w[0], arr1[17:117])
    assert native_loader.load_i64_windows([p1], [301], 100) is None

    lens = native_loader.npy_lengths([p2], '<f4')
    assert lens is not None and lens[0] == 50
    lens1 = native_loader.npy_lengths([p1], '<i8')
    assert lens1 is not None and lens1[0] == 400
    assert native_loader.npy_lengths([p1], '<f4') is None


@pytest.mark.skipif(not native_loader.available(),
                    reason='libftt_loader.so not built')
def test_validation_fallback(tmp_path):
    # a non-f4 / wrong-shape / truncated file must fail cleanly (None),
    # never return garbage
    p64 = pathlib.Path(tmp_path) / 'f64.npy'
    np.save(p64, np.zeros((80, 10), dtype=np.float64))
    assert native_loader.load_mel_batch([p64], 16, 80, 0.0) is None

    pshape = pathlib.Path(tmp_path) / 'shape.npy'
    np.save(pshape, np.zeros((40, 10), dtype=np.float32))
    assert native_loader.load_mel_batch([pshape], 16, 80, 0.0) is None

    pover = pathlib.Path(tmp_path) / 'over.npy'
    np.save(pover, np.zeros((80, 32), dtype=np.float32))
    # T exceeds the bucket: must refuse rather than truncate
    assert native_loader.load_mel_batch([pover], 16, 80, 0.0) is None

    trunc = pathlib.Path(tmp_path) / 'trunc.npy'
    good = pathlib.Path(tmp_path) / 'good.npy'
    np.save(good, np.ones((80, 8), dtype=np.float32))
    trunc.write_bytes(good.read_bytes()[:200])
    assert native_loader.load_mel_batch([trunc], 16, 80, 0.0) is None

    missing = pathlib.Path(tmp_path) / 'nope.npy'
    assert native_loader.load_mel_batch([missing], 16, 80, 0.0) is None


def test_incompatible_library_falls_back_permanently(tmp_path,
                                                     monkeypatch):
    """A stale/incompatible .so (wrong arch, missing symbol) must not
    crash loading — _load returns None, marks the failure sticky, and
    callers take the numpy path."""
    bogus = tmp_path / 'libftt_loader.so'
    bogus.write_bytes(b'\x7fELF not actually a library')
    monkeypatch.setattr(native_loader, '_LIB_PATH', bogus)
    monkeypatch.setattr(native_loader, '_lib', None)
    monkeypatch.setattr(native_loader, '_load_failed', False)
    assert native_loader._load() is None
    assert native_loader._load_failed is True
    # sticky: no retry even though the path still exists
    assert native_loader._load() is None
    # API surface degrades to the fallback contract
    assert native_loader.npy_lengths([bogus]) is None
