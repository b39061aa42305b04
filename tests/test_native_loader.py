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
