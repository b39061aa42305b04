"""Data pipeline tests (modeled on the reference's tests/test_collate_tts.py
and tests/test_forward_dataset.py; mel here is time-major (B, T, n_mels))."""
import numpy as np

from forwardtacotron_tpu.data.dataset import (BucketBatcher, ForwardDataset,
                                              collate_tts)
from forwardtacotron_tpu.text.tokenizer import Tokenizer


def _items():
    return [
        {'item_id': 0, 'mel': np.full((2, 5), 1.), 'x': np.full(2, 2.),
         'mel_len': 5, 'x_len': 2, 'dur': np.full(2, 3.),
         'pitch': np.full(2, 4.), 'energy': np.full(2, 5.)},
        {'item_id': 1, 'mel': np.full((2, 6), 1.), 'x': np.full(3, 2.),
         'mel_len': 6, 'x_len': 3, 'dur': np.full(3, 3.),
         'pitch': np.full(3, 4.), 'energy': np.full(3, 5.)},
    ]


def test_collate_tts():
    batch = collate_tts(_items(), r=1)
    assert batch['item_id'] == [0, 1]
    # max mel 6 + 1 = 7; time-major (B, 7, 2)
    assert batch['mel'].shape == (2, 7, 2)
    assert np.allclose(batch['mel'][0].sum(axis=1),
                       [2., 2., 2., 2., 2., -11.5129 * 2, -11.5129 * 2])
    assert np.allclose(batch['mel'][1].sum(axis=1),
                       [2., 2., 2., 2., 2., 2., -11.5129 * 2])
    assert batch['x_len'].tolist() == [2, 3]
    assert batch['mel_len'].tolist() == [5, 6]
    assert batch['x'][0].tolist() == [2, 2, 0]
    assert batch['x'][1].tolist() == [2, 2, 2]
    assert batch['dur'][0].tolist() == [3., 3., 0.]
    assert batch['pitch'][1].tolist() == [4., 4., 4.]
    assert batch['energy'][0].tolist() == [5., 5., 0.]


def test_collate_tts_r_rounding():
    batch = collate_tts(_items(), r=5)
    assert batch['mel'].shape[1] % 5 == 0
    assert batch['mel'].shape[1] == 10


def test_forward_dataset_and_buckets(tmp_path):
    text_dict = {'0': 'a', '1': 'bc'}
    data_dir = tmp_path / 'data'
    for d in ('mel', 'alg', 'phon_pitch', 'phon_energy'):
        (data_dir / d).mkdir(parents=True)
    mels = [np.full((2, 2), 1.), np.full((2, 3), 2.)]
    durs = [np.full(1, 2), np.full(2, 3)]
    pitches = [np.full(1, 5.), np.full(2, 6.)]
    energies = [np.full(1, 6.), np.full(2, 7.)]
    for i in range(2):
        np.save(data_dir / 'mel' / f'{i}.npy', mels[i])
        np.save(data_dir / 'alg' / f'{i}.npy', durs[i])
        np.save(data_dir / 'phon_pitch' / f'{i}.npy', pitches[i])
        np.save(data_dir / 'phon_energy' / f'{i}.npy', energies[i])

    ds = ForwardDataset(path=data_dir, dataset_ids=['0', '1'],
                        text_dict=text_dict, tokenizer=Tokenizer())
    data = [ds[i] for i in range(len(ds))]
    np.testing.assert_allclose(data[0]['mel'], mels[0])
    np.testing.assert_allclose(data[1]['dur'], durs[1])
    np.testing.assert_allclose(data[0]['pitch'], pitches[0])
    np.testing.assert_allclose(data[1]['energy'], energies[1])
    assert data[0]['x_len'] == 1 and data[1]['x_len'] == 2
    assert data[0]['mel_len'] == 2 and data[1]['mel_len'] == 3

    batcher = BucketBatcher(ds, batch_size=2, mel_multiple=8, x_multiple=4)
    batches = list(batcher)
    assert len(batches) == 1
    b = batches[0]
    assert b['mel'].shape == (2, 8, 2)   # bucket-rounded, time-major
    assert b['x'].shape == (2, 4)
    assert b['n_real'] == 2


def test_bucket_batcher_static_shapes(tmp_path):
    """Every batch from one bucket must have identical shapes (jit cache)."""
    rng = np.random.RandomState(0)
    data_dir = tmp_path / 'data'
    for d in ('mel', 'alg', 'phon_pitch', 'phon_energy'):
        (data_dir / d).mkdir(parents=True)
    text_dict = {}
    ids = []
    for i in range(13):
        mel_len = rng.randint(4, 40)
        x_len = rng.randint(2, 8)
        np.save(data_dir / 'mel' / f'{i}.npy', rng.randn(2, mel_len))
        np.save(data_dir / 'alg' / f'{i}.npy', np.ones(x_len))
        np.save(data_dir / 'phon_pitch' / f'{i}.npy', np.ones(x_len))
        np.save(data_dir / 'phon_energy' / f'{i}.npy', np.ones(x_len))
        text_dict[str(i)] = 'ab cdef'[:x_len]
        ids.append(str(i))
    ds = ForwardDataset(path=data_dir, dataset_ids=ids,
                        text_dict=text_dict, tokenizer=Tokenizer())
    batcher = BucketBatcher(ds, batch_size=4, mel_multiple=16, x_multiple=8)
    shapes = {}
    n_items = 0
    for b in batcher:
        key = b['mel'].shape[1]
        shapes.setdefault(key, set()).add(
            (b['x'].shape, b['mel'].shape, b['dur'].shape))
        assert b['mel'].shape[0] == 4
        n_items += b['n_real']
    assert n_items == 13
    for variants in shapes.values():
        assert len(variants) == 1


def test_prefetcher_preserves_order_and_propagates_errors():
    from forwardtacotron_tpu.data.dataset import Prefetcher
    items = list(range(20))
    assert list(Prefetcher(items, depth=3)) == items
    assert len(Prefetcher(items)) == 20

    def gen():
        yield 1
        yield 2
        raise ValueError('boom')

    import pytest
    out = []
    with pytest.raises(ValueError, match='boom'):
        for x in Prefetcher(gen(), depth=1):
            out.append(x)
    assert out == [1, 2]


def test_gan_voc_collator_short_clips_padded():
    """Clips shorter than one training window are repeat-padded (not
    crashed on) and empty clips are dropped with the batch shape kept
    rectangular (advisor finding: np.stack ValueError mid-epoch)."""
    import numpy as np
    from forwardtacotron_tpu.data.dataset import GANVocCollator

    hop, seg = 64, 512          # win = 8 frames
    coll = GANVocCollator(hop_length=hop, seg_len=seg, voc_mode='RAW',
                          bits=9, mu_law=True,
                          rng=np.random.RandomState(0))
    rng = np.random.RandomState(1)

    def item(frames):
        return {'mel': rng.randn(80, frames).astype(np.float32),
                'x': rng.randint(0, 512, size=(frames * hop,))}

    batch = [item(3), item(40), item(8), item(0)]
    out = coll(batch)
    assert out['mel'].shape == (4, 8, 80)
    assert out['audio'].shape == (4, seg)
    assert np.isfinite(out['audio']).all()

    import pytest
    with pytest.raises(ValueError):
        coll([item(0), item(0)])
