"""Alignment-comparison tool: pair metrics, directory aggregation, and
the CLI surface (table + JSON modes)."""
import pytest  # noqa: E402
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent.parent


def test_compare_pair_identical_and_shifted():
    from tools.compare_alignments import compare_pair
    a = np.array([3, 4, 2, 5], np.int64)
    m = compare_pair(a, a.copy())
    assert m['frame_acc'] == 1.0 and m['frame_acc_tol1'] == 1.0
    assert m['dur_exact_acc'] == 1.0 and m['dur_mae_frames'] == 0.0
    assert m['len_rel_diff'] == 0.0

    # one frame moved across one boundary: tol-1 stays perfect
    b = np.array([4, 3, 2, 5], np.int64)
    m = compare_pair(a, b)
    assert m['frame_acc'] < 1.0
    assert m['frame_acc_tol1'] == 1.0
    assert m['dur_mae_frames'] == 0.5


def test_compare_pair_length_mismatch():
    from tools.compare_alignments import compare_pair
    a = np.array([3, 4, 2], np.int64)          # 9 frames
    b = np.array([3, 4, 2, 3], np.int64)       # 12 frames, extra phoneme
    m = compare_pair(a, b)
    assert 'dur_exact_acc' not in m            # shapes differ: skipped
    assert m['frame_acc'] == 1.0               # common prefix agrees
    assert abs(m['len_rel_diff'] - 3 / 12) < 1e-9


def test_compare_dirs_and_cli(tmp_path):
    dir_a = tmp_path / 'a'
    dir_b = tmp_path / 'b'
    dir_a.mkdir(), dir_b.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        d = rng.randint(1, 6, size=8).astype(np.int64)
        np.save(dir_a / f'it{i}.npy', d)
        np.save(dir_b / f'it{i}.npy', d)
    np.save(dir_a / 'only_a.npy', np.ones(3, np.int64))

    from tools.compare_alignments import compare_dirs
    res = compare_dirs(dir_a, dir_b)
    assert res['n_common'] == 4
    assert res['n_only_a'] == 1 and res['n_only_b'] == 0
    assert res['mean']['frame_acc'] == 1.0

    r = subprocess.run(
        [sys.executable, str(ROOT / 'tools/compare_alignments.py'),
         '--a', str(dir_a), '--b', str(dir_b), '--json'],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed['n_common'] == 4
    assert parsed['mean']['dur_mae_frames'] == 0.0

    r = subprocess.run(
        [sys.executable, str(ROOT / 'tools/compare_alignments.py'),
         '--a', str(dir_a), '--b', str(dir_b)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert 'items compared' in r.stdout


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
