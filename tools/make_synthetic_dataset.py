"""Synthesize a tiny on-disk dataset so every training CLI can be
driven end to end without LJSpeech (e.g. in a zero-egress image).

Writes the exact layout preprocess.py produces (reference
utils/paths.py:11-18): data/{mel,quant,raw_pitch,alg,phon_pitch,
phon_energy}/<id>.npy plus the pkl indexes (text_dict, train/val
datasets, att_score_dict), with shape/consistency invariants the
real pipeline guarantees (durations sum to mel frames, quant length
= frames * hop, phoneme series match token counts).

    python tools/make_synthetic_dataset.py [--items 10] [--config FILE]

Then: train_tacotron.py / train_forward.py / train_wavernn.py /
train_hifigan.py / gen_forward.py all run against it.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))

SENTENCES = [
    'hello there world', 'a quick brown fox jumps', 'testing one two',
    'synthesized tiny data', 'the teacher aligns phonemes',
    'forward tacotron on tpu', 'pitch and energy values',
    'wave rnn vocoder sample', 'short utterance here',
    'final validation item', 'more items for larger runs',
    'the birch canoe slid', 'glue the sheet down',
    'depth of a well', 'a rare chicken dish', 'rice in round bowls',
]


def make_dataset(paths, config, n_items: int = 10, n_val: int = 2,
                 seed: int = 0, min_frames: int = 40,
                 max_frames: int = 90) -> int:
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.files import pickle_binary

    n_mels = config['dsp']['num_mels']
    hop = config['dsp']['hop_length']
    bits = config['dsp']['bits']
    rng = np.random.RandomState(seed)
    tok = Tokenizer()

    dataset, text_dict = [], {}
    for i in range(n_items):
        text = SENTENCES[i % len(SENTENCES)]
        item_id = f'syn{i:03d}'
        n_frames = rng.randint(min_frames, max_frames)
        x_len = len(tok(text))
        mel = (rng.randn(n_mels, n_frames) * 1.5 - 6).astype(np.float32)
        np.save(paths.mel / f'{item_id}.npy', mel)
        quant = rng.randint(0, 2 ** bits,
                            n_frames * hop).astype(np.int64)
        np.save(paths.quant / f'{item_id}.npy', quant)
        pitch = np.abs(rng.randn(n_frames) * 60 + 120).astype(np.float32)
        np.save(paths.raw_pitch / f'{item_id}.npy', pitch)
        # durations: positive ints summing exactly to n_frames
        dur = rng.multinomial(n_frames - x_len,
                              np.ones(x_len) / x_len) + 1
        assert int(dur.sum()) == n_frames
        np.save(paths.alg / f'{item_id}.npy', dur.astype(np.float32))
        np.save(paths.phon_pitch / f'{item_id}.npy',
                rng.randn(x_len).astype(np.float32))
        np.save(paths.phon_energy / f'{item_id}.npy',
                np.abs(rng.randn(x_len)).astype(np.float32) + 1)
        text_dict[item_id] = text
        dataset.append((item_id, n_frames))

    pickle_binary(text_dict, paths.data / 'text_dict.pkl')
    pickle_binary(dataset[n_val:], paths.data / 'train_dataset.pkl')
    pickle_binary(dataset[:n_val], paths.data / 'val_dataset.pkl')
    att_scores = {i: (1.0, 1.0) for i, _ in dataset}
    pickle_binary(att_scores, paths.data / 'att_score_dict.pkl')
    return len(dataset)


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Create a tiny synthetic dataset for e2e runs')
    parser.add_argument('--items', type=int, default=10)
    parser.add_argument('--n_val', type=int, default=2)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--config', metavar='FILE', default='config.yaml')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    config = read_config(args.config)
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])
    n = make_dataset(paths, config, n_items=args.items,
                     n_val=args.n_val, seed=args.seed)
    print(f'wrote {n} items under {paths.data}')


if __name__ == '__main__':
    main()
