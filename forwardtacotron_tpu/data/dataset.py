"""Datasets, collation and static-shape bucket batching.

Parity surface: utils/dataset.py in the reference (TacoDataset /
ForwardDataset / VocoderDataset field contracts, collate_tts padding
semantics incl. the -11.5129 mel pad and r-rounding, attention filtering,
VocCollator random windows). The torch DataLoader + BinnedLengthSampler
are replaced by `BucketBatcher`: items are grouped by mel length into a
fixed ladder of padded (T_text, T_mel) shapes, so the jitted train step
compiles once per bucket instead of once per ragged batch shape — the
TPU-native answer to the sampler's pad-waste reduction
(dataset.py:318-347).

All arrays are numpy host-side; mel is stored on disk in the reference
layout (n_mels, T) and transposed to time-major (T, n_mels) here.
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from forwardtacotron_tpu.utils.files import unpickle_binary
from forwardtacotron_tpu.text.tokenizer import Tokenizer

MEL_PAD = -11.5129


def filter_max_len(dataset: List[tuple], max_mel_len: Optional[int]
                   ) -> List[tuple]:
    if max_mel_len is None:
        return dataset
    return [(i, l) for i, l in dataset if l <= max_mel_len]


def filter_bad_attentions(dataset: List[tuple],
                          attention_score_dict: Dict[str, tuple],
                          min_alignment: float,
                          min_sharpness: float) -> List[tuple]:
    out = []
    for item_id, mel_len in dataset:
        align_score, sharp_score = attention_score_dict[item_id]
        if align_score > min_alignment and sharp_score > min_sharpness:
            out.append((item_id, mel_len))
    return out


class TacoDataset:

    def __init__(self, path: Path, dataset_ids: Sequence[str],
                 text_dict: Dict[str, str], tokenizer: Tokenizer,
                 speaker_dict: Optional[Dict[str, int]] = None) -> None:
        self.path = Path(path)
        self.metadata = list(dataset_ids)
        self.text_dict = text_dict
        self.tokenizer = tokenizer
        # multi-speaker: {item_id: speaker index}; None adds no fields
        self.speaker_dict = speaker_dict
        self._light_cache: Dict[int, Dict] = {}

    def __getitem__(self, index: int) -> Dict:
        item_id = self.metadata[index]
        x = self.tokenizer(self.text_dict[item_id])
        mel = np.load(str(self.path / 'mel' / f'{item_id}.npy'))
        out = {'x': np.asarray(x, dtype=np.int64), 'mel': mel,
               'item_id': item_id, 'mel_len': mel.shape[-1],
               'x_len': len(x)}
        if self.speaker_dict is not None:
            out['speaker'] = int(self.speaker_dict.get(item_id, 0))
        return out

    def light_item(self, index: int) -> Dict:
        """Everything but the mel (the native batch loader reads mels
        directly into the padded batch buffer). Cached: tokens are a
        few hundred bytes per item and epochs revisit every item."""
        cached = self._light_cache.get(index)
        if cached is None:
            item_id = self.metadata[index]
            x = self.tokenizer(self.text_dict[item_id])
            cached = {'x': np.asarray(x, dtype=np.int64),
                      'item_id': item_id, 'x_len': len(x)}
            if self.speaker_dict is not None:
                cached['speaker'] = int(
                    self.speaker_dict.get(item_id, 0))
            self._light_cache[index] = cached
        return cached

    def __len__(self) -> int:
        return len(self.metadata)


class ForwardDataset:

    def __init__(self, path: Path, dataset_ids: Sequence[str],
                 text_dict: Dict[str, str], tokenizer: Tokenizer,
                 speaker_dict: Optional[Dict[str, int]] = None) -> None:
        self.path = Path(path)
        self.metadata = list(dataset_ids)
        self.text_dict = text_dict
        self.tokenizer = tokenizer
        # beyond-parity multi-speaker: {item_id: speaker index}; None
        # (single-speaker corpora) adds no fields to the items
        self.speaker_dict = speaker_dict
        self._light_cache: Dict[int, Dict] = {}

    def __getitem__(self, index: int) -> Dict:
        item_id = self.metadata[index]
        x = self.tokenizer(self.text_dict[item_id])
        mel = np.load(str(self.path / 'mel' / f'{item_id}.npy'))
        dur = np.load(str(self.path / 'alg' / f'{item_id}.npy'))
        pitch = np.load(str(self.path / 'phon_pitch' / f'{item_id}.npy'))
        energy = np.load(str(self.path / 'phon_energy' / f'{item_id}.npy'))
        out = {'x': np.asarray(x, dtype=np.int64), 'mel': mel,
               'item_id': item_id, 'x_len': len(x),
               'mel_len': mel.shape[-1], 'dur': dur, 'pitch': pitch,
               'energy': energy}
        if self.speaker_dict is not None:
            out['speaker'] = int(self.speaker_dict.get(item_id, 0))
        return out

    def light_item(self, index: int) -> Dict:
        """Everything but the mel (the native batch loader reads mels
        directly into the padded batch buffer). Cached: tokens + the
        three per-phoneme series are ~1-2 KB per item and epochs
        revisit every item — np.load's per-call header parsing costs
        more than the data."""
        cached = self._light_cache.get(index)
        if cached is None:
            item_id = self.metadata[index]
            x = self.tokenizer(self.text_dict[item_id])
            dur = np.load(str(self.path / 'alg' / f'{item_id}.npy'))
            pitch = np.load(
                str(self.path / 'phon_pitch' / f'{item_id}.npy'))
            energy = np.load(
                str(self.path / 'phon_energy' / f'{item_id}.npy'))
            cached = {'x': np.asarray(x, dtype=np.int64),
                      'item_id': item_id, 'x_len': len(x), 'dur': dur,
                      'pitch': pitch, 'energy': energy}
            if self.speaker_dict is not None:
                cached['speaker'] = int(self.speaker_dict.get(item_id, 0))
            self._light_cache[index] = cached
        return cached

    def __len__(self) -> int:
        return len(self.metadata)


def pad1d(x, max_len: int) -> np.ndarray:
    return np.pad(x, (0, max_len - len(x)), mode='constant')


def pad2d(x, max_len: int) -> np.ndarray:
    return np.pad(x, ((0, 0), (0, max_len - x.shape[-1])),
                  constant_values=MEL_PAD, mode='constant')


def collate_tts(batch: List[Dict], r: int,
                pad_to: Optional[Tuple[int, int]] = None) -> Dict:
    """Pad and stack a list of items. Semantics match the reference
    collate_tts (dataset.py:282-315): text zero-padded, mel padded with
    -11.5129 to max_len+1 rounded up to a multiple of r. `pad_to`
    optionally forces static (T_text, T_mel) bucket shapes (both still
    r-rounded). Mel is returned time-major (B, T, n_mels)."""
    x_len = np.asarray([b['x_len'] for b in batch], dtype=np.int64)
    mel_lens = np.asarray([b['mel_len'] for b in batch], dtype=np.int64)

    max_x_len = int(x_len.max()) if pad_to is None else pad_to[0]
    max_spec_len = (int(mel_lens.max()) + 1) if pad_to is None else pad_to[1]
    if max_spec_len % r != 0:
        max_spec_len += r - max_spec_len % r

    text = np.stack([pad1d(b['x'], max_x_len) for b in batch]).astype(np.int64)
    mel = np.stack([pad2d(b['mel'], max_spec_len) for b in batch])
    mel = mel.transpose(0, 2, 1).astype(np.float32)

    out = {'x': text, 'mel': mel,
           'item_id': [b['item_id'] for b in batch],
           'x_len': x_len, 'mel_len': mel_lens}
    for key in ('dur', 'pitch', 'energy'):
        if key in batch[0]:
            out[key] = np.stack(
                [pad1d(b[key][:max_x_len], max_x_len) for b in batch]
            ).astype(np.float32)
    if 'speaker' in batch[0]:
        out['speaker'] = np.asarray([b['speaker'] for b in batch],
                                    dtype=np.int32)
    return out


def _epoch_seed(seed: int, epoch: int, batch: int = -1) -> int:
    """Deterministic per-(epoch[, batch]) RNG seed. Plain integer
    mixing (no hash()) so the value is stable across processes
    regardless of PYTHONHASHSEED."""
    v = (seed * 1_000_003 + epoch) * 1_000_003 + (batch + 1)
    return v % (2 ** 31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BucketBatcher:
    """Length-bucketed batch iterator with static padded shapes.

    Items are assigned to buckets by mel length (ladder of multiples of
    `mel_multiple`); each bucket's text pad is the bucket's own max,
    rounded to `x_multiple`. Yields reference-collated numpy batches of
    identical shape within a bucket, shuffled across and within buckets.
    Incomplete tail batches are padded by repeating items (so shapes stay
    static) with `n_real` marking how many rows are genuine.
    """

    def __init__(self, dataset, batch_size: int, r: int = 1,
                 mel_multiple: int = 128, x_multiple: int = 16,
                 seed: int = 42, drop_last: bool = False,
                 shuffle: bool = True) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.r = r
        self.mel_multiple = mel_multiple
        self.x_multiple = x_multiple
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0  # next epoch yielded by plain iter()
        self._n_mels: Optional[int] = None

        # metadata pass: mel_len per item (cheap: from dataset index)
        self.buckets: Dict[int, List[int]] = {}
        self.x_pad: Dict[int, int] = {}
        for idx in range(len(dataset)):
            item_id = dataset.metadata[idx]
            mel_len = self._mel_len(dataset, idx)
            x_len = len(dataset.tokenizer(dataset.text_dict[item_id]))
            b = _round_up(mel_len + 1, mel_multiple)
            self.buckets.setdefault(b, []).append(idx)
            self.x_pad[b] = max(self.x_pad.get(b, 1), x_len)
        for b in self.x_pad:
            self.x_pad[b] = _round_up(self.x_pad[b], x_multiple)

    @staticmethod
    def _mel_len(dataset, idx: int) -> int:
        item_id = dataset.metadata[idx]
        mel = np.load(str(dataset.path / 'mel' / f'{item_id}.npy'),
                      mmap_mode='r')
        return mel.shape[-1]

    def __len__(self) -> int:
        n = 0
        for idxs in self.buckets.values():
            if self.drop_last:
                n += len(idxs) // self.batch_size
            else:
                n += (len(idxs) + self.batch_size - 1) // self.batch_size
        return n

    def first_batch(self) -> Optional[Dict]:
        if not self.buckets:
            return None
        b = min(self.buckets)
        idxs = self.buckets[b][:self.batch_size]
        return self._make_batch(b, idxs)

    def _make_batch(self, bucket: int, idxs: List[int]) -> Dict:
        n_real = len(idxs)
        while len(idxs) < self.batch_size:
            idxs = idxs + idxs[:self.batch_size - len(idxs)]
        idxs = idxs[:self.batch_size]
        batch = self._make_batch_native(bucket, idxs)
        if batch is None:
            items = [self.dataset[i] for i in idxs]
            batch = collate_tts(items, self.r,
                                pad_to=(self.x_pad[bucket], bucket))
        batch['n_real'] = n_real
        return batch

    def _make_batch_native(self, bucket: int,
                           idxs: List[int]) -> Optional[Dict]:
        """Fast path: assemble the padded mel block with the native
        C++ loader (native/batch_loader.cc) — identical output to
        collate_tts, verified by tests/test_native_loader.py. Returns
        None (numpy fallback) when the .so is absent, disabled via
        FTT_NATIVE_LOADER=0, or any file fails validation."""
        import os
        if os.environ.get('FTT_NATIVE_LOADER') == '0':
            return None
        ds = self.dataset
        if not (hasattr(ds, 'path') and hasattr(ds, 'light_item')):
            return None
        from forwardtacotron_tpu.data import native_loader
        if not native_loader.available():
            return None
        ids = [ds.metadata[i] for i in idxs]
        paths = [ds.path / 'mel' / f'{iid}.npy' for iid in ids]
        if self._n_mels is None:
            self._n_mels = int(np.load(str(paths[0]),
                                       mmap_mode='r').shape[0])
        max_spec = bucket
        if max_spec % self.r != 0:
            max_spec += self.r - max_spec % self.r
        loaded = native_loader.load_mel_batch(
            paths, max_spec, self._n_mels, MEL_PAD)
        if loaded is None:
            return None
        mel, mel_lens = loaded
        items = [ds.light_item(i) for i in idxs]
        max_x_len = self.x_pad[bucket]
        text = np.stack([pad1d(b['x'], max_x_len)
                         for b in items]).astype(np.int64)
        out = {'x': text, 'mel': mel,
               'item_id': [b['item_id'] for b in items],
               'x_len': np.asarray([b['x_len'] for b in items],
                                   dtype=np.int64),
               'mel_len': mel_lens}
        for key in ('dur', 'pitch', 'energy'):
            if key in items[0]:
                out[key] = np.stack(
                    [pad1d(b[key][:max_x_len], max_x_len) for b in items]
                ).astype(np.float32)
        if 'speaker' in items[0]:
            out['speaker'] = np.asarray([b['speaker'] for b in items],
                                        dtype=np.int32)
        return out

    def epoch_plan(self, epoch: int) -> List[tuple]:
        """The batch plan for one epoch as a pure function of
        (seed, epoch): shuffling never consumes mutable RNG state, so a
        resumed run replays the exact data order of an uninterrupted
        one (the torch DistributedSampler.set_epoch idiom). Returns
        [(bucket, [item idx, ...]), ...]."""
        rng = random.Random(_epoch_seed(self.seed, epoch))
        plan = []
        for bucket, idxs in self.buckets.items():
            idxs = list(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i:i + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    continue
                plan.append((bucket, chunk))
        if self.shuffle:
            rng.shuffle(plan)
        return plan

    def batches(self, epoch: int, start: int = 0):
        """Yield epoch `epoch`'s batches from position `start` — the
        mid-epoch resume entry point used by the trainers."""
        for bucket, chunk in self.epoch_plan(epoch)[start:]:
            yield self._make_batch(bucket, chunk)

    def __iter__(self):
        epoch, self._epoch = self._epoch, self._epoch + 1
        return self.batches(epoch)


def get_tts_datasets(path: Path, batch_size: int, r: int,
                     max_mel_len: Optional[int],
                     filter_attention: bool = True,
                     filter_min_alignment: float = 0.5,
                     filter_min_sharpness: float = 0.9,
                     model_type: str = 'tacotron',
                     mel_multiple: int = 128
                     ) -> Tuple[BucketBatcher, BucketBatcher]:
    """Reference get_tts_datasets (dataset.py:134-199), returning
    BucketBatchers instead of DataLoaders."""
    path = Path(path)
    tokenizer = Tokenizer()
    train_data = unpickle_binary(path / 'train_dataset.pkl')
    val_data = unpickle_binary(path / 'val_dataset.pkl')
    text_dict = unpickle_binary(path / 'text_dict.pkl')

    train_data = filter_max_len(train_data, max_mel_len)
    val_data = filter_max_len(val_data, max_mel_len)
    train_len_original = len(train_data)

    if model_type == 'forward' and filter_attention:
        att_score_dict = unpickle_binary(path / 'att_score_dict.pkl')
        train_data = filter_bad_attentions(train_data, att_score_dict,
                                           filter_min_alignment,
                                           filter_min_sharpness)
        val_data = filter_bad_attentions(val_data, att_score_dict,
                                         filter_min_alignment,
                                         filter_min_sharpness)
        print(f'Using {len(train_data)} train files. Filtered '
              f'{train_len_original - len(train_data)} files due to bad '
              f'attention!')

    train_ids = [i for i, _ in train_data]
    val_ids = [i for i, _ in val_data]

    ds_cls = TacoDataset if model_type == 'tacotron' else ForwardDataset
    if model_type not in ('tacotron', 'forward'):
        raise ValueError(f'Unknown model: {model_type}, must be either '
                         f'[tacotron, forward]!')
    extra = {}
    # beyond-parity multi-speaker: preprocess writes speaker_dict.pkl
    # for corpora with a speaker column; batches then carry a (B,)
    # 'speaker' field the models (teacher and students) condition on.
    spk_path = path / 'speaker_dict.pkl'
    if spk_path.exists():
        extra['speaker_dict'] = unpickle_binary(spk_path)
    train_dataset = ds_cls(path=path, dataset_ids=train_ids,
                           text_dict=text_dict, tokenizer=tokenizer, **extra)
    val_dataset = ds_cls(path=path, dataset_ids=val_ids,
                         text_dict=text_dict, tokenizer=tokenizer, **extra)

    train_set = BucketBatcher(train_dataset, batch_size, r=r,
                              mel_multiple=mel_multiple, shuffle=True)
    val_set = BucketBatcher(val_dataset, batch_size, r=r,
                            mel_multiple=mel_multiple, shuffle=False)
    return train_set, val_set


# ---------------------------------------------------------------- vocoder

class VocoderDataset:

    def __init__(self, path: Path, dataset_ids: Sequence[str],
                 train_gta: bool = False) -> None:
        self.metadata = list(dataset_ids)
        self.mel_path = Path(path) / ('gta' if train_gta else 'mel')
        self.quant_path = Path(path) / 'quant'
        self._len_cache: Dict[int, int] = {}

    def __getitem__(self, index: int) -> Dict:
        item_id = self.metadata[index]
        mel = np.load(str(self.mel_path / f'{item_id}.npy'))
        x = np.load(str(self.quant_path / f'{item_id}.npy'))
        return {'mel': mel, 'x': x, 'item_id': item_id}

    def prime_len_cache(self) -> None:
        """Batch-fill the length cache with one threaded native header
        sweep (native_loader.npy_lengths) — avoids a sequential
        per-file numpy header parse on the first epoch. No-op when the
        native library is unavailable (mel_len falls back per file)."""
        from . import native_loader
        missing = [i for i in range(len(self.metadata))
                   if i not in self._len_cache]
        if not missing:
            return
        lens = native_loader.npy_lengths(
            [self.mel_path / f'{self.metadata[i]}.npy' for i in missing])
        if lens is None:
            return
        for i, length in zip(missing, lens):
            self._len_cache[i] = int(length)

    def mel_len(self, index: int) -> int:
        """True on-disk frame count (header-only read, cached) — GTA
        mels can differ from the pkl-index lengths, so read the file."""
        length = self._len_cache.get(index)
        if length is None:
            item_id = self.metadata[index]
            length = int(np.load(str(self.mel_path / f'{item_id}.npy'),
                                 mmap_mode='r').shape[-1])
            self._len_cache[index] = length
        return length

    def __len__(self) -> int:
        return len(self.metadata)


class VocCollator:
    """Random mel window + aligned waveform slice (dataset.py:86-126)."""

    def __init__(self, hop_length: int, voc_pad: int, voc_seq_len: int,
                 voc_mode: str, bits: int,
                 rng: Optional[np.random.RandomState] = None) -> None:
        self.hop_length = hop_length
        self.voc_pad = voc_pad
        self.voc_seq_len = voc_seq_len
        self.voc_mode = voc_mode
        self.bits = bits
        self.rng = rng or np.random.RandomState()
        self._n_mels: Optional[int] = None

    def __call__(self, batch: List[Dict]) -> Dict[str, np.ndarray]:
        from forwardtacotron_tpu.dsp.audio import DSP
        mel_win = self.voc_seq_len // self.hop_length + 2 * self.voc_pad
        max_offsets = [b['mel'].shape[-1] - 2 - (mel_win + 2 * self.voc_pad)
                       for b in batch]
        mel_offsets = [self.rng.randint(0, o) for o in max_offsets]
        sig_offsets = [(o + self.voc_pad) * self.hop_length
                       for o in mel_offsets]

        mels = np.stack([b['mel'][:, mel_offsets[i]:mel_offsets[i] + mel_win]
                         for i, b in enumerate(batch)]).astype(np.float32)
        labels = np.stack(
            [b['x'][sig_offsets[i]:sig_offsets[i] + self.voc_seq_len + 1]
             for i, b in enumerate(batch)]).astype(np.int64)

        x = labels[:, :self.voc_seq_len]
        y = labels[:, 1:]
        bits = 16 if self.voc_mode == 'MOL' else self.bits
        x = DSP.label_2_float(x.astype(np.float32), bits)
        if self.voc_mode == 'MOL':
            y = DSP.label_2_float(y.astype(np.float32), bits)
        # mel time-major for the model
        return {'mel': mels.transpose(0, 2, 1), 'x': x, 'y': y}

    def collate_native(self, mel_paths: List[Path],
                       quant_paths: List[Path],
                       mel_lens: List[int]) -> Dict[str, np.ndarray]:
        """Same batch as __call__ but reading ONLY the random windows
        through the native loader (native/batch_loader.cc) instead of
        whole files. The rng draws happen once, in the same order as
        __call__, and are reused by the numpy fallback — so the
        fixed-seed val batches are identical on every path."""
        from forwardtacotron_tpu.data import native_loader
        from forwardtacotron_tpu.dsp.audio import DSP
        mel_win = self.voc_seq_len // self.hop_length + 2 * self.voc_pad
        max_offsets = [l - 2 - (mel_win + 2 * self.voc_pad)
                       for l in mel_lens]
        mel_offsets = [self.rng.randint(0, o) for o in max_offsets]
        sig_offsets = [(o + self.voc_pad) * self.hop_length
                       for o in mel_offsets]
        if self._n_mels is None:
            self._n_mels = int(np.load(str(mel_paths[0]),
                                       mmap_mode='r').shape[0])

        mels = native_loader.load_mel_windows(mel_paths, mel_offsets,
                                              mel_win, self._n_mels)
        if mels is None:  # numpy fallback with the SAME offsets
            mels = np.stack(
                [np.load(str(p))[:, o:o + mel_win].T
                 for p, o in zip(mel_paths, mel_offsets)]
            ).astype(np.float32)
        labels = native_loader.load_i64_windows(
            quant_paths, sig_offsets, self.voc_seq_len + 1)
        if labels is None:
            labels = np.stack(
                [np.load(str(p))[s:s + self.voc_seq_len + 1]
                 for p, s in zip(quant_paths, sig_offsets)]
            ).astype(np.int64)

        x = labels[:, :self.voc_seq_len]
        y = labels[:, 1:]
        bits = 16 if self.voc_mode == 'MOL' else self.bits
        x = DSP.label_2_float(x.astype(np.float32), bits)
        if self.voc_mode == 'MOL':
            y = DSP.label_2_float(y.astype(np.float32), bits)
        return {'mel': mels, 'x': x, 'y': y}


class VocBatcher:

    def __init__(self, dataset: VocoderDataset, batch_size: int,
                 collator: VocCollator, shuffle: bool = True,
                 seed: int = 42) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.collator = collator
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0  # next epoch yielded by plain iter()
        # fixed-rng collators (val sets) keep their injected rng; the
        # train path reseeds per batch for mid-epoch exact resume
        self._reseed_collator = shuffle

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def epoch_plan(self, epoch: int) -> List[List[int]]:
        """Item-index chunks for one epoch, a pure function of
        (seed, epoch) — see BucketBatcher.epoch_plan."""
        idxs = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(_epoch_seed(self.seed, epoch)).shuffle(idxs)
        return [idxs[i:i + self.batch_size]
                for i in range(0, len(idxs) - self.batch_size + 1,
                               self.batch_size)]

    def batches(self, epoch: int, start: int = 0):
        """Yield epoch `epoch`'s batches from position `start`. The
        collator's random window offsets are reseeded per (epoch,
        batch index) so a resumed run draws the exact crops an
        uninterrupted one would."""
        import os
        use_native = (os.environ.get('FTT_NATIVE_LOADER') != '0'
                      and hasattr(self.collator, 'collate_native')
                      and hasattr(self.dataset, 'mel_len'))
        if use_native and hasattr(self.dataset, 'prime_len_cache'):
            self.dataset.prime_len_cache()
        for b, chunk in enumerate(self.epoch_plan(epoch)[start:], start):
            if self._reseed_collator:
                self.collator.rng = np.random.RandomState(
                    _epoch_seed(self.seed, epoch, b))
            if use_native:
                ds = self.dataset
                ids = [ds.metadata[j] for j in chunk]
                yield self.collator.collate_native(
                    [ds.mel_path / f'{x}.npy' for x in ids],
                    [ds.quant_path / f'{x}.npy' for x in ids],
                    [ds.mel_len(j) for j in chunk])
            else:
                items = [self.dataset[j] for j in chunk]
                yield self.collator(items)

    def __iter__(self):
        epoch, self._epoch = self._epoch, self._epoch + 1
        return self.batches(epoch)


def get_vocoder_datasets(path: Path, batch_size: int, train_gta: bool,
                         max_mel_len: int, hop_length: int, voc_pad: int,
                         voc_seq_len: int, voc_mode: str, bits: int,
                         num_gen_samples: int):
    """Reference get_vocoder_datasets (dataset.py:35-83)."""
    path = Path(path)
    train_data = unpickle_binary(path / 'train_dataset.pkl')
    val_data = unpickle_binary(path / 'val_dataset.pkl')
    train_ids = [i for i, l in filter_max_len(train_data, max_mel_len)]
    val_ids = [i for i, l in filter_max_len(val_data, max_mel_len)]
    train_dataset = VocoderDataset(path, train_ids, train_gta)
    val_dataset = VocoderDataset(path, val_ids, train_gta)

    train_collator = VocCollator(hop_length, voc_pad, voc_seq_len,
                                 voc_mode, bits)
    train_set = VocBatcher(train_dataset, batch_size, train_collator,
                           shuffle=True)

    # fixed-seed val batches (reference seeds numpy at dataset.py:70-72)
    val_collator = VocCollator(hop_length, voc_pad, voc_seq_len, voc_mode,
                               bits, rng=np.random.RandomState(42))
    val_set = list(VocBatcher(val_dataset, batch_size, val_collator,
                              shuffle=False))

    val_set_samples = [val_dataset[i]
                       for i in range(min(num_gen_samples, len(val_dataset)))]
    return train_set, val_set, val_set_samples


class GANVocCollator:
    """Frame-aligned (mel window, float audio segment) pairs for
    adversarial vocoder training (models/hifigan.py +
    models/gan_discriminators.py).

    Unlike VocCollator there is no shift-by-one label pair and no
    conditioning pad: the generator consumes `seg_len // hop` mel
    frames and must output exactly `seg_len` samples. Audio is decoded
    from the on-disk quant labels (mu-law for RAW preprocessing,
    linear labels otherwise) — preprocess with `voc_mode: MOL`
    (16-bit linear) for lossless GAN targets.
    """

    def __init__(self, hop_length: int, seg_len: int, voc_mode: str,
                 bits: int, mu_law: bool,
                 rng: Optional[np.random.RandomState] = None) -> None:
        assert seg_len % hop_length == 0, \
            f'seg_len {seg_len} must be a multiple of hop {hop_length}'
        self.hop_length = hop_length
        self.seg_len = seg_len
        self.voc_mode = voc_mode
        self.bits = bits
        self.mu_law = mu_law
        self.rng = rng or np.random.RandomState()

    def __call__(self, batch: List[Dict]) -> Dict[str, np.ndarray]:
        from forwardtacotron_tpu.dsp.audio import DSP
        win = self.seg_len // self.hop_length
        mels, audios = [], []
        for b in batch:
            mel, x = b['mel'], b['x']
            t = min(mel.shape[-1], len(x) // self.hop_length)
            if t == 0:
                continue  # unusable clip (no full frame); drop
            if t <= win:
                # clip shorter than one training window: repeat-pad so
                # the stack below stays rectangular (short clips would
                # otherwise crash training mid-epoch)
                reps = -(-(win + 1) // t)
                mel = np.tile(mel[:, :t], (1, reps))
                x = np.tile(x[:t * self.hop_length], reps)
                t = win + 1
            max_off = max(t - win - 1, 1)
            o = self.rng.randint(0, max_off)
            mels.append(mel[:, o:o + win])
            seg = x[o * self.hop_length:
                    o * self.hop_length + self.seg_len]
            bits = 16 if self.voc_mode == 'MOL' else self.bits
            if self.mu_law and self.voc_mode != 'MOL':
                audio = DSP.decode_mu_law(seg, 2 ** bits,
                                          from_labels=True)
            else:
                audio = DSP.label_2_float(seg.astype(np.float32), bits)
            audios.append(audio)
        if not mels:
            raise ValueError('GANVocCollator: every clip in the batch '
                             'was empty (no full mel frame)')
        n_real = len(mels)
        while len(mels) < len(batch):  # keep the batch shape jit-stable
            i = len(mels) % n_real
            mels.append(mels[i])
            audios.append(audios[i])
        return {'mel': np.stack(mels).astype(np.float32)
                .transpose(0, 2, 1),
                'audio': np.stack(audios).astype(np.float32)}


def get_gan_vocoder_datasets(path: Path, batch_size: int,
                             train_gta: bool, max_mel_len: int,
                             hop_length: int, seg_len: int,
                             voc_mode: str, bits: int, mu_law: bool,
                             num_gen_samples: int):
    """(mel window, audio segment) train/val sets for GAN vocoder
    training, over the same on-disk layout as get_vocoder_datasets."""
    path = Path(path)
    train_data = unpickle_binary(path / 'train_dataset.pkl')
    val_data = unpickle_binary(path / 'val_dataset.pkl')
    train_ids = [i for i, l in filter_max_len(train_data, max_mel_len)]
    val_ids = [i for i, l in filter_max_len(val_data, max_mel_len)]
    train_dataset = VocoderDataset(path, train_ids, train_gta)
    val_dataset = VocoderDataset(path, val_ids, train_gta)

    train_collator = GANVocCollator(hop_length, seg_len, voc_mode, bits,
                                    mu_law)
    train_set = VocBatcher(train_dataset, batch_size, train_collator,
                           shuffle=True)
    val_collator = GANVocCollator(hop_length, seg_len, voc_mode, bits,
                                  mu_law, rng=np.random.RandomState(42))
    val_set = list(VocBatcher(val_dataset, batch_size, val_collator,
                              shuffle=False))
    val_set_samples = [val_dataset[i]
                       for i in range(min(num_gen_samples,
                                          len(val_dataset)))]
    return train_set, val_set, val_set_samples


class Prefetcher:
    """Bounded background-thread prefetch over a batch iterable.

    The batchers above load per-item `.npy` files and collate on the
    host; on a machine where host cores are scarce relative to the
    accelerator, that work would otherwise serialize with the device
    step (the reference hides it behind torch DataLoader workers,
    utils/dataset.py:166-170). Wrapping an epoch's iterator keeps
    `depth` batches in flight on one daemon thread, overlapping disk
    IO + collation with device compute. Exceptions propagate to the
    consumer; iteration order is unchanged.
    """

    _DONE = object()

    def __init__(self, iterable, depth: int = 2) -> None:
        self.iterable = iterable
        self.depth = depth

    def __len__(self) -> int:
        return len(self.iterable)

    def __iter__(self):
        import queue
        import threading

        q: 'queue.Queue' = queue.Queue(maxsize=self.depth)

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # re-raised on the main thread
                q.put(e)
                return
            q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
