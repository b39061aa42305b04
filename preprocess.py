"""Dataset preprocessing CLI.

CLI contract matches the reference preprocess.py (`--path`,
`--num_workers`, `--config`): extracts per-utterance log-mel, quantized
waveform and frame-level pitch into data/{mel,quant,raw_pitch}, cleans
text, and writes the {train,val}_dataset.pkl / text_dict.pkl indexes with
the same seeded split (Random(42), n_val, val sorted longest-first).

TPU-native difference: the DSP runs as batched XLA (STFT/mel + the
autocorrelation F0 estimator replace librosa/pyworld) — utterances are
packed into padded batches and processed on-device; host workers only
decode wavs and write npys.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from random import Random
from typing import Dict, List, Tuple

import numpy as np

from forwardtacotron_tpu.dsp.audio import DSP
from forwardtacotron_tpu.text.cleaners import Cleaner
from forwardtacotron_tpu.text.recipes import ljspeech, multispeaker
from forwardtacotron_tpu.utils.display import progbar, simple_table, stream
from forwardtacotron_tpu.utils.files import get_files, pickle_binary, \
    read_config
from forwardtacotron_tpu.utils.paths import Paths


def valid_n_workers(num: str) -> int:
    n = int(num)
    if n < 1:
        raise argparse.ArgumentTypeError(
            f'{num!r} must be an integer greater than 0')
    return n


def featurize(dsp: DSP, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """trimmed wav -> (log-mel (n_mels, T), quantized wave, frame pitch).
    Mirrors Preprocessor._convert_file (reference preprocess.py:51-91);
    mel/F0 run on the accelerator."""
    mel = dsp.wav_to_mel_bucketed(y)

    from forwardtacotron_tpu.dsp.pitch import extract_pitch_bucketed
    pitch = extract_pitch_bucketed(y, dsp.sample_rate, dsp.hop_length)

    if dsp.voc_mode == 'RAW':
        quant = dsp.encode_mu_law(y, mu=2 ** dsp.bits) if dsp.mu_law \
            else dsp.float_2_label(y, bits=dsp.bits)
    elif dsp.voc_mode == 'MOL':
        quant = dsp.float_2_label(y, bits=16)
    else:
        raise ValueError(f'Unexpected voc mode {dsp.voc_mode}, '
                         f'should be either RAW or MOL.')
    return (mel.astype(np.float32), np.asarray(quant).astype(np.int64),
            pitch.astype(np.float32))


def convert_file(dsp: DSP, path: Path) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Single-file convenience path (load + trim + featurize)."""
    y = dsp.load_wav(path)
    if dsp.should_trim_long_silences:
        y = dsp.trim_long_silences(y)
    if dsp.should_trim_start_end_silence:
        y = dsp.trim_silence(y)
    peak = np.abs(y).max() if len(y) else 1.0
    if dsp.should_peak_norm or peak > 1.0:
        y = y / peak
    return featurize(dsp, y)


def process_all(paths: Paths, dsp: DSP, cleaner: Cleaner,
                text_dict: Dict[str, str], wav_files: List[Path],
                n_workers: int = 1) -> Tuple[list, list]:
    """Pipelined preprocessing: host worker threads decode/trim wavs and
    write npys while the TPU computes mel/F0 for the previous files —
    the reference's multiprocessing fan-out (preprocess.py:129-139)
    reshaped around a single accelerator."""
    import concurrent.futures as cf

    def load(path: Path):
        y = dsp.load_wav(path)
        if dsp.should_trim_long_silences:
            y = dsp.trim_long_silences(y)
        if dsp.should_trim_start_end_silence:
            y = dsp.trim_silence(y)
        peak = np.abs(y).max() if len(y) else 1.0
        if dsp.should_peak_norm or peak > 1.0:
            y = y / peak
        return y

    def bounded_loaded():
        """Sliding-window prefetch (Executor.map would eagerly submit —
        and decode — every file at once). A file that fails to decode
        is skipped with a log line, like the featurize guard below —
        one corrupt wav must not kill a whole preprocessing run."""
        from collections import deque
        window = max(2 * n_workers, 2)
        pending = deque()
        it = iter(wav_files)

        def drain(p, fut):
            try:
                return p, fut.result()
            except Exception as e:
                print(f'\nFailed to load {p}: {e}')
                return None

        with cf.ThreadPoolExecutor(max_workers=max(n_workers, 1)) as pool:
            for path in it:
                pending.append((path, pool.submit(load, path)))
                if len(pending) >= window:
                    item = drain(*pending.popleft())
                    if item is not None:
                        yield item
            while pending:
                item = drain(*pending.popleft())
                if item is not None:
                    yield item

    dataset, cleaned_texts = [], []
    for i, (path, y) in enumerate(bounded_loaded(), 1):
        wav_id = path.stem
        if len(y) < dsp.hop_length:   # empty/all-silence after trims
            print(f'\nSkipping {path}: too short after trimming '
                  f'({len(y)} samples)')
            continue
        try:
            mel, quant, pitch = featurize(dsp, y)
        except Exception as e:  # corrupt file: skip, keep going
            print(f'\nFailed to process {path}: {e}')
            continue
        np.save(paths.mel / f'{wav_id}.npy', mel, allow_pickle=False)
        np.save(paths.quant / f'{wav_id}.npy', quant, allow_pickle=False)
        np.save(paths.raw_pitch / f'{wav_id}.npy', pitch,
                allow_pickle=False)
        text = cleaner(text_dict[wav_id])
        dataset.append((wav_id, mel.shape[-1]))
        cleaned_texts.append((wav_id, text))
        stream(f'{progbar(i, len(wav_files))} {i}/{len(wav_files)} ')
    return dataset, cleaned_texts


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Preprocessing for WaveRNN and Tacotron')
    parser.add_argument('--path', '-p', help='directly point to dataset path')
    parser.add_argument('--num_workers', '-w', metavar='N',
                        type=valid_n_workers, default=1,
                        help='worker processes for wav decoding')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    parser.add_argument('--metadata_format', default='ljspeech',
                        choices=['ljspeech', 'multispeaker'],
                        help='Metadata csv layout: ljspeech (id|...|text) '
                             'or multispeaker (id|speaker|text). The '
                             'latter also writes speaker_dict.pkl; set '
                             'n_speakers in the model config to match.')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    config = read_config(args.config)
    wav_files = get_files(args.path, '.wav')
    wav_ids = {w.stem for w in wav_files}
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])
    print(f'\n{len(wav_files)} .wav files found in "{args.path}"')
    assert len(wav_files) > 0, f'Found no wav files in {args.path}, exiting.'

    speaker_dict = None
    if args.metadata_format == 'multispeaker':
        text_dict, speaker_dict = multispeaker(args.path)
    else:
        text_dict = ljspeech(args.path)
    min_len = config['preprocessing']['min_text_len']
    text_dict = {item_id: text for item_id, text in text_dict.items()
                 if item_id in wav_ids and len(text) > min_len}
    wav_files = [w for w in wav_files if w.stem in text_dict]
    print(f'Using {len(wav_files)} wav files that are indexed in '
          f'metafile.\n')

    dsp = DSP.from_config(config)
    cleaner = Cleaner.from_config(config)

    simple_table([
        ('Sample Rate', dsp.sample_rate),
        ('Bit Depth', dsp.bits),
        ('Mu Law', dsp.mu_law),
        ('Hop Length', dsp.hop_length),
        ('Num Validation', config['preprocessing']['n_val']),
    ])

    dataset, cleaned_texts = process_all(paths, dsp, cleaner, text_dict,
                                         wav_files,
                                         n_workers=args.num_workers)

    dataset.sort()
    random = Random(config['preprocessing'].get('seed', 42))
    random.shuffle(dataset)
    n_val = config['preprocessing']['n_val']
    train_dataset = dataset[n_val:]
    val_dataset = dataset[:n_val]
    val_dataset.sort(key=lambda d: -d[1])
    if val_dataset:
        print(f'First val sample: {val_dataset[0][0]}')

    pickle_binary({i: t for i, t in cleaned_texts},
                  paths.data / 'text_dict.pkl')
    pickle_binary(train_dataset, paths.data / 'train_dataset.pkl')
    pickle_binary(val_dataset, paths.data / 'val_dataset.pkl')
    if speaker_dict is not None:
        used = {i for i, _ in cleaned_texts}
        speaker_dict = {i: s for i, s in speaker_dict.items() if i in used}
        pickle_binary(speaker_dict, paths.data / 'speaker_dict.pkl')
        n_spk = len(set(speaker_dict.values()))
        print(f'\n{n_spk} speakers -> speaker_dict.pkl; set '
              f'n_speakers: {n_spk} in the model config section.')

    print('\n\nCompleted. Ready to run "python train_tacotron.py" or '
          '"python train_wavernn.py".\n')


if __name__ == '__main__':
    main()
