"""Duration extraction from attention matrices.

The reference builds a (T_mel x T_text)-node graph and runs scipy's
Dijkstra over it (utils/duration_extraction.py:16-87). The lattice only
has right / down / diag-down-right edges, so the shortest path is a
simple dynamic program — and the within-row recursion can be collapsed
into a prefix-min (cumsum trick), making each DP row fully vectorized:

    dist[i, j] = cost[i, j] + min(dist[i, j-1], dist[i-1, j],
                                  dist[i-1, j-1])
    =>  with c = cumsum(cost[i]), base = min(dist[i-1], shift(dist[i-1])):
        dist[i, j] = c[j] + min_{k<=j}(base[k] - c[k-1])

The whole DP runs as one `lax.scan` over mel frames with a
`lax.associative_scan` prefix-min per row — O(T·N) work, no sequential
inner loop, batchable over utterances. The backtrace (O(T+N)) runs
host-side in numpy. Path costs are verified equal to scipy Dijkstra in
tests; tie-breaking between equal-cost monotone paths may differ, which
the reference's own duration-sum sanity check tolerates
(train_tacotron.py:162-163).

`extract_durations_per_count` (the argmax fallback) is ported as-is.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _dp_forward(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cost (T, N) -> (dist (T, N), choice (T, N) int8).

    choice encodes the predecessor of (i, j): 0 = left (i, j-1),
    1 = up (i-1, j), 2 = diag (i-1, j-1). Row 0 is all-left.
    """
    T, N = cost.shape
    big = jnp.float32(1e30)

    row0 = jnp.cumsum(cost[0])

    def row_step(prev_dist, cost_row):
        up = prev_dist
        diag = jnp.concatenate([jnp.array([big]), prev_dist[:-1]])
        base = jnp.minimum(up, diag)

        c = jnp.cumsum(cost_row)
        c_shift = jnp.concatenate([jnp.array([0.0]), c[:-1]])
        # dist[j] = c[j] + min_{k<=j}(base[k] - c_shift[k])
        keys = base - c_shift
        prefix = jax.lax.associative_scan(jnp.minimum, keys)
        dist = c + prefix

        # entered this row at column j (vertical/diag move) iff the min
        # was achieved at k == j; otherwise we came from the left.
        entered_here = dist >= base + cost_row - 1e-6
        from_left = jnp.logical_not(entered_here)
        choice = jnp.where(from_left, 0,
                           jnp.where(diag <= up, 2, 1)).astype(jnp.int8)
        # stay consistent: when from_left is impossible at j=0
        choice = choice.at[0].set(jnp.where(diag[0] <= up[0], 2, 1))
        return dist, (dist, choice)

    last, (dists, choices) = jax.lax.scan(row_step, row0, cost[1:])
    dists = jnp.concatenate([row0[None], dists], axis=0)
    choices = jnp.concatenate(
        [jnp.zeros((1, N), jnp.int8), choices], axis=0)
    return dists, choices


def extract_durations_with_dp(seq_len: int, att: np.ndarray,
                              mel_len: int) -> np.ndarray:
    """Shortest monotone path through (1 - att) -> per-phoneme durations.

    Same contract as the reference's extract_durations_with_dijkstra
    (duration_extraction.py:54-87): att (T_mel_padded, N), uses the first
    mel_len rows; durations sum to mel_len.
    """
    att = np.asarray(att, dtype=np.float32)
    cost = 1.0 - att[:mel_len, :seq_len]
    T, N = cost.shape
    if T == 0 or N == 0:
        return np.zeros(seq_len, dtype=np.int32)

    _, choices = _dp_forward(jnp.asarray(cost))
    choices = np.asarray(choices)

    # One duration count per mel row: the rightmost text index visited in
    # that row (the reference's mel_text dict semantics,
    # duration_extraction.py:76-86). During backtrace, the first node we
    # see in each row is exactly its rightmost.
    durations = np.zeros(seq_len, dtype=np.int32)
    i, j = T - 1, N - 1
    durations[j] += 1  # exit node of the last row
    while i > 0:
        c = choices[i, j]
        if c == 0 and j > 0:       # left move within row i
            j -= 1
        elif c == 1:               # vertical: row i-1 exits at same j
            i -= 1
            durations[j] += 1
        else:                      # diagonal
            i -= 1
            j = max(j - 1, 0)
            durations[j] += 1
    assert durations.sum() == mel_len, \
        f'durations sum {durations.sum()} != mel_len {mel_len}'
    return durations


def extract_durations_with_dijkstra(seq: np.ndarray, att: np.ndarray,
                                    mel_len: int) -> np.ndarray:
    """Name-compatible wrapper (the DP *is* the Dijkstra result here)."""
    seq_len = int(np.shape(seq)[0])
    return extract_durations_with_dp(seq_len, att, mel_len)


def extract_durations_per_count(seq: np.ndarray, att: np.ndarray,
                                mel_len: int) -> np.ndarray:
    """Argmax peak counting with jump smoothing
    (duration_extraction.py:90-101)."""
    argmax = np.argmax(att[:, :], axis=1)
    durations = np.zeros(np.shape(seq)[0], dtype=np.int32)
    for j in range(1, argmax.shape[0]):
        if abs(int(argmax[j]) - int(argmax[j - 1])) > 10:
            argmax[j] = argmax[j - 1]
    count = np.bincount(argmax[:mel_len])
    durations[:len(count)] = count[:len(count)]
    return durations
