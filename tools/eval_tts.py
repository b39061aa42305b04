"""Objective TTS evaluation over paired audio (or mel) directories.

    python tools/eval_tts.py --gen_dir out/ --ref_dir gt/
    python tools/eval_tts.py --gen_dir gta/ --ref_dir data/mel/ --mels
    python tools/eval_tts.py ... --json report.json

Pairs files by basename (`.wav` in audio mode, `.npy` in --mels mode),
computes per-file metrics with forwardtacotron_tpu/evaluation.py —
MCD-DTW (dB), F0 RMSE (Hz / cents over co-voiced frames), voicing
decision error — prints a table plus one JSON summary line, and
optionally writes the full per-file report.

The reference repo has no such harness (its only quality proxy is the
vocoder trainer's mel-L1, /root/reference/trainer/voc_trainer.py:160-202);
use this to track synthesis quality across training runs or to compare
vocoders on the same sentences.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))


def _pairs(gen_dir: pathlib.Path, ref_dir: pathlib.Path, ext: str):
    gen = {p.stem: p for p in gen_dir.glob(f'*{ext}')}
    ref = {p.stem: p for p in ref_dir.glob(f'*{ext}')}
    common = sorted(set(gen) & set(ref))
    missing = sorted(set(gen) ^ set(ref))
    return [(name, ref[name], gen[name]) for name in common], missing


def _load_wav(path: pathlib.Path, expect_sr: int) -> np.ndarray:
    from scipy.io import wavfile
    sr, wav = wavfile.read(str(path))
    if sr != expect_sr:
        raise ValueError(f'{path}: sample rate {sr} != config {expect_sr} '
                         '(resample first, e.g. via preprocess.py)')
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32767.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483647.0
    else:
        wav = wav.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    return wav


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description='Objective TTS evaluation: MCD-DTW + F0 metrics')
    parser.add_argument('--gen_dir', required=True,
                        help='directory of synthesized .wav (or .npy mel)')
    parser.add_argument('--ref_dir', required=True,
                        help='directory of ground-truth .wav (or .npy mel)')
    parser.add_argument('--mels', action='store_true',
                        help='inputs are .npy log-mel spectrograms '
                             '((T, n_mels) or the reference (n_mels, T)) '
                             '- skips F0 metrics')
    parser.add_argument('--config', default='config.yaml',
                        help='config for DSP params (audio mode)')
    parser.add_argument('--n_mcc', type=int, default=13,
                        help='cepstral order for MCD (default 13)')
    parser.add_argument('--n_mels', type=int, default=80,
                        help='mel channel count for layout detection '
                             'in --mels mode (default 80)')
    parser.add_argument('--json', default=None,
                        help='write the full per-file report here')
    parser.add_argument('--limit', type=int, default=0,
                        help='evaluate at most N pairs (0 = all)')
    args = parser.parse_args(argv)

    from forwardtacotron_tpu import evaluation as ev

    gen_dir, ref_dir = pathlib.Path(args.gen_dir), pathlib.Path(args.ref_dir)
    ext = '.npy' if args.mels else '.wav'
    pairs, missing = _pairs(gen_dir, ref_dir, ext)
    if missing:
        print(f'# {len(missing)} unpaired file(s) skipped: '
              f'{", ".join(missing[:5])}{"..." if len(missing) > 5 else ""}',
              file=sys.stderr)
    if not pairs:
        print(f'no {ext} pairs found between {gen_dir} and {ref_dir}',
              file=sys.stderr)
        return 2
    if args.limit:
        pairs = pairs[:args.limit]

    dsp = None
    if not args.mels:
        from forwardtacotron_tpu.dsp.audio import DSP
        from forwardtacotron_tpu.utils.files import read_config
        dsp = DSP.from_config(read_config(args.config))

    per_file = {}
    for name, ref_path, gen_path in pairs:
        if args.mels:
            m = ev.eval_mel_pair(np.load(ref_path), np.load(gen_path),
                                 n_mcc=args.n_mcc, n_mels=args.n_mels)
        else:
            m = ev.eval_wav_pair(_load_wav(ref_path, dsp.sample_rate),
                                 _load_wav(gen_path, dsp.sample_rate),
                                 dsp, n_mcc=args.n_mcc)
        per_file[name] = m
        cols = f'mcd {m["mcd_db"]:7.3f} dB'
        if 'f0_rmse_hz' in m and np.isfinite(m['f0_rmse_hz']):
            cols += (f'  f0 {m["f0_rmse_hz"]:6.1f} Hz '
                     f'({m["f0_rmse_cents"]:6.1f} c)  vde {m["vde"]:.3f}')
        print(f'{name:24s} {cols}', file=sys.stderr)

    summary = ev.summarize(per_file)
    summary['n_files'] = len(per_file)
    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(
            {'summary': summary, 'per_file': per_file}, indent=2))
    print(json.dumps({'metric': 'mcd_db', 'value': summary['mcd_db'],
                      'unit': 'dB', 'extra': summary}))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
