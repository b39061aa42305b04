"""The synthetic-dataset tool writes a layout the data pipeline
actually consumes (invariants: durations sum to frames, quant length,
series lengths match token counts)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))


def test_layout_and_invariants(tmp_path):
    from make_synthetic_dataset import make_dataset
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.files import unpickle_binary
    from forwardtacotron_tpu.utils.paths import Paths

    config = {'dsp': {'num_mels': 8, 'hop_length': 16, 'bits': 9}}
    paths = Paths(str(tmp_path / 'data'), 'v', 't', base=tmp_path)
    n = make_dataset(paths, config, n_items=5, n_val=1, seed=3)
    assert n == 5

    text_dict = unpickle_binary(paths.data / 'text_dict.pkl')
    train = unpickle_binary(paths.data / 'train_dataset.pkl')
    val = unpickle_binary(paths.data / 'val_dataset.pkl')
    assert len(train) == 4 and len(val) == 1
    tok = Tokenizer()
    for item_id, n_frames in train + val:
        mel = np.load(paths.mel / f'{item_id}.npy')
        dur = np.load(paths.alg / f'{item_id}.npy')
        quant = np.load(paths.quant / f'{item_id}.npy')
        x_len = len(tok(text_dict[item_id]))
        assert mel.shape == (8, n_frames)
        assert int(dur.sum()) == n_frames and (dur >= 1).all()
        assert len(dur) == x_len
        assert len(quant) == n_frames * 16
        assert np.load(paths.phon_pitch / f'{item_id}.npy').shape \
            == (x_len,)

    # the TTS data pipeline consumes it directly
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    train_set, val_set = get_tts_datasets(
        paths.data, batch_size=2, r=1, model_type='forward',
        max_mel_len=None, filter_attention=False)
    batch = next(iter(train_set))
    assert batch['mel'].shape[0] == 2
    assert batch['dur'].sum() > 0
