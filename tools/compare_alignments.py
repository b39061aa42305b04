"""Compare two duration-alignment directories (e.g. Tacotron-teacher
vs the teacher-free neural aligner) item by item.

The reference has exactly one way to produce `alg/*.npy` (the AR
teacher, reference train_tacotron.py); this framework has two
(`train_tacotron.py` and `train_aligner.py`), so this tool quantifies
how much they agree — per-phoneme duration metrics
(evaluation.duration_metrics) plus frame-level alignment accuracy with
a ±1-frame boundary tolerance (boundary jitter of one frame is
inaudible at 11.6 ms hop; systematic disagreement is not).

    python tools/compare_alignments.py --a data_teacher/alg \
        --b data_aligner/alg [--json]

Exit code 0 always; output is one human table or one JSON object.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def frame_indices(dur: np.ndarray) -> np.ndarray:
    """Frame -> phoneme index map of a duration vector."""
    return np.repeat(np.arange(dur.shape[0]), dur.astype(np.int64))


def compare_pair(dur_a: np.ndarray, dur_b: np.ndarray) -> dict:
    """Metrics for one utterance: duration MAE/exact plus frame-level
    agreement. Total lengths may differ (different extraction runs),
    so frame accuracy is computed over the common prefix length."""
    from forwardtacotron_tpu.evaluation import duration_metrics
    m = {}
    if dur_a.shape == dur_b.shape:
        m.update(duration_metrics(dur_b, dur_a))
    fa, fb = frame_indices(dur_a), frame_indices(dur_b)
    n = min(len(fa), len(fb))
    if n > 0:
        diff = np.abs(fa[:n].astype(np.int64) - fb[:n].astype(np.int64))
        m['frame_acc'] = float(np.mean(diff == 0))
        m['frame_acc_tol1'] = float(np.mean(diff <= 1))
    m['len_rel_diff'] = (abs(len(fa) - len(fb))
                         / max(len(fa), len(fb), 1))
    return m


def compare_dirs(dir_a: Path, dir_b: Path) -> dict:
    ids_a = {p.stem for p in dir_a.glob('*.npy')}
    ids_b = {p.stem for p in dir_b.glob('*.npy')}
    common = sorted(ids_a & ids_b)
    per_item = {}
    for item in common:
        dur_a = np.load(dir_a / f'{item}.npy').astype(np.int64)
        dur_b = np.load(dir_b / f'{item}.npy').astype(np.int64)
        per_item[item] = compare_pair(dur_a, dur_b)
    keys = sorted({k for m in per_item.values() for k in m})
    agg = {k: float(np.mean([m[k] for m in per_item.values() if k in m]))
           for k in keys}
    return {
        'n_common': len(common),
        'n_only_a': len(ids_a - ids_b),
        'n_only_b': len(ids_b - ids_a),
        'mean': agg,
        'items': per_item,
    }


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Compare two alignment (alg/) directories')
    parser.add_argument('--a', required=True, metavar='DIR',
                        help='first alg/ directory (e.g. teacher)')
    parser.add_argument('--b', required=True, metavar='DIR',
                        help='second alg/ directory (e.g. aligner)')
    parser.add_argument('--json', action='store_true',
                        help='emit one JSON object instead of a table')
    args = parser.parse_args()

    result = compare_dirs(Path(args.a), Path(args.b))
    if args.json:
        print(json.dumps(result))
        return
    from forwardtacotron_tpu.utils.display import simple_table
    rows = [('items compared', result['n_common']),
            ('only in --a', result['n_only_a']),
            ('only in --b', result['n_only_b'])]
    rows += [(k, f'{v:.4f}') for k, v in result['mean'].items()]
    simple_table(rows)


if __name__ == '__main__':
    main()
