"""Duration extraction: the vectorized DP must find paths with the same
total cost as the reference's scipy Dijkstra formulation, and durations
must sum to mel_len with monotone coverage."""
import numpy as np
import pytest

from forwardtacotron_tpu.align.duration import (
    extract_durations_per_count, extract_durations_with_dp)


def _dijkstra_reference(att, mel_len):
    """Reference algorithm (duration_extraction.py:54-87) re-run with
    scipy for test comparison only."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    mat = 1.0 - att[:mel_len, :]
    rows, cols = mat.shape
    row_ind, col_ind, data = [], [], []

    def node(i, j):
        return cols * i + j

    for i in range(rows):
        for j in range(cols):
            if j < cols - 1:
                row_ind.append(node(i, j))
                col_ind.append(node(i, j + 1))
                data.append(mat[i, j + 1])
            if i < rows - 1:
                row_ind.append(node(i, j))
                col_ind.append(node(i + 1, j))
                data.append(mat[i + 1, j])
            if i < rows - 1 and j < cols - 1:
                row_ind.append(node(i, j))
                col_ind.append(node(i + 1, j + 1))
                data.append(mat[i + 1, j + 1])
    adj = coo_matrix((data, (row_ind, col_ind)),
                     shape=(rows * cols, rows * cols)).tocsr()
    dist, pred = dijkstra(csgraph=adj, directed=True, indices=0,
                          return_predecessors=True)
    path = []
    p = pred[-1]
    while p != 0:
        path.append(p)
        p = pred[p]
    path.reverse()
    path = [0] + path + [dist.size - 1]
    mel_text = {}
    durations = np.zeros(att.shape[1], dtype=np.int32)
    for n in path:
        i, j = n // cols, n % cols
        mel_text[i] = j
    for j in mel_text.values():
        durations[j] += 1
    return durations, float(dist[-1])


def _path_cost(att, durations, mel_len):
    """Total (1 - att) cost of the monotone path implied by durations
    (rightmost-j-per-row node set)."""
    mat = 1.0 - att[:mel_len, :]
    cost = 0.0
    i = 0
    prev_j = 0
    for j, d in enumerate(durations):
        for _ in range(int(d)):
            cost += mat[i, j]
            # moving right within a row visits intermediate cells
            if i > 0 or j > 0:
                pass
            i += 1
    return cost


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_dp_matches_dijkstra_cost(seed):
    rng = np.random.RandomState(seed)
    T, N = 30, 8
    # diagonal-ish attention with noise (realistic teacher output)
    att = rng.rand(T, N).astype(np.float32) * 0.3
    for i in range(T):
        j = int(i / T * N)
        att[i, j] += 0.7
    att /= att.sum(axis=1, keepdims=True)

    ours = extract_durations_with_dp(N, att, T)
    ref, ref_cost = _dijkstra_reference(att, T)

    assert ours.sum() == T
    assert ref.sum() == T
    # same optimal path cost (tie-broken paths may differ slightly)
    np.testing.assert_allclose(ours, ref)


def test_dp_degenerate_single_phoneme():
    att = np.ones((5, 1), dtype=np.float32)
    durs = extract_durations_with_dp(1, att, 5)
    assert durs.tolist() == [5]


def test_dp_monotone_sharp_attention():
    """Perfectly sharp diagonal attention -> exact durations."""
    T, N = 12, 4
    att = np.full((T, N), 1e-3, dtype=np.float32)
    true_durs = [2, 4, 3, 3]
    i = 0
    for j, d in enumerate(true_durs):
        att[i:i + d, j] = 1.0
        i += d
    durs = extract_durations_with_dp(N, att, T)
    assert durs.tolist() == true_durs


def test_per_count():
    T, N = 10, 3
    att = np.zeros((T, N), dtype=np.float32)
    att[:3, 0] = 1
    att[3:7, 1] = 1
    att[7:, 2] = 1
    seq = np.zeros(N)
    durs = extract_durations_per_count(seq, att, T)
    assert durs.tolist() == [3, 4, 3]


def test_attention_score():
    import jax.numpy as jnp
    from forwardtacotron_tpu.align.metrics import attention_score
    T, N = 8, 4
    att = np.full((1, T, N), 1e-6, dtype=np.float32)
    for i in range(T):
        att[0, i, min(i // 2, N - 1)] = 0.9
    loc, sharp = attention_score(jnp.asarray(att), jnp.asarray([T]), r=1)
    assert float(loc[0]) == 1.0
    assert abs(float(sharp[0]) - 0.9) < 1e-6
