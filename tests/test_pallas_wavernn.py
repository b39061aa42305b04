"""Fused Pallas WaveRNN sampler vs the lax.scan sampler.

Runs in TPU-interpret mode on CPU so the kernel logic (loop hoisting,
scratch-carried hidden state across grid chunks, sampling) is validated
everywhere; the real-TPU timing happens in bench.py.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


TINY = dict(rnn_dims=128, fc_dims=128, bits=9, pad=2,
            upsample_factors=(2, 2), feat_dims=10, compute_dims=8,
            res_out_dims=8, res_blocks=1, hop_length=4, sample_rate=1000,
            mode='RAW')


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    if jax.devices()[0].platform == 'cpu':
        monkeypatch.setattr(
            pl, 'pallas_call',
            functools.partial(pl.pallas_call,
                              interpret=pltpu.InterpretParams()))
    yield


def _setup():
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    model = WaveRNN(**TINY)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, 36, TINY['feat_dims'])
                      .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)), mel)
    mels_up, aux = model.apply(variables, mel, method='upsample_cond')
    return model, variables, np.asarray(mels_up), np.asarray(aux)


def test_greedy_trajectory_matches_scan():
    """fp32 kernel in greedy mode must track the scan's greedy trajectory
    (identical math modulo accumulation order)."""
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        wavernn_sample_pallas)
    model, variables, mels_up, aux = _setup()

    ref = np.asarray(model.apply(variables, jnp.asarray(mels_up),
                                 jnp.asarray(aux), jax.random.PRNGKey(0),
                                 method='sample_scan', greedy=True,
                                 weights_dtype=jnp.float32))
    out = wavernn_sample_pallas(model, variables, mels_up, aux,
                                greedy=True, compute_dtype=jnp.float32)
    agreement = float(np.mean(out == ref))
    assert agreement > 0.95, f'greedy agreement only {agreement:.2f}'


def test_sampling_mode_runs_and_is_in_range():
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        wavernn_sample_pallas)
    model, variables, mels_up, aux = _setup()
    out = wavernn_sample_pallas(model, variables, mels_up, aux, seed=7)
    assert out.shape == (1, mels_up.shape[1])
    assert np.all(np.abs(out) <= 1.0)
    assert out.std() > 0  # actually sampling, not constant


def test_chunk_boundary_state_carries():
    """Hidden state must persist across grid chunks: a greedy run over
    2 chunks equals a scan greedy run (which has no chunking)."""
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        CHUNK, wavernn_sample_pallas)
    model, variables, mels_up, aux = _setup()
    T = mels_up.shape[1]
    assert T > CHUNK, 'test needs at least 2 chunks'
    ref = np.asarray(model.apply(variables, jnp.asarray(mels_up),
                                 jnp.asarray(aux), jax.random.PRNGKey(0),
                                 method='sample_scan', greedy=True,
                                 weights_dtype=jnp.float32))
    out = wavernn_sample_pallas(model, variables, mels_up, aux,
                                greedy=True, compute_dtype=jnp.float32)
    # specifically check steps around the chunk boundary
    lo, hi = CHUNK - 4, min(CHUNK + 4, T)
    agreement = float(np.mean(out[:, lo:hi] == ref[:, lo:hi]))
    assert agreement > 0.9, f'boundary agreement {agreement:.2f}'


def test_lane_grouping_matches_single_launch(monkeypatch):
    """B > MAX_LANES folds are processed in sequential VMEM-sized lane
    groups; each fold starts from zero state, so grouped greedy output
    must equal the single-launch greedy output exactly."""
    import jax.numpy as jnp
    from forwardtacotron_tpu.kernels import wavernn_sample as ws
    model, variables, mels_up, aux = _setup()
    mels4 = np.concatenate([mels_up] * 4, axis=0)
    aux4 = np.concatenate([aux] * 4, axis=0)
    ref = ws.wavernn_sample_pallas(model, variables, mels4, aux4,
                                   greedy=True,
                                   compute_dtype=jnp.float32)
    ws._RUN_CACHE.clear()  # grouped run must recompile, not reuse
    monkeypatch.setattr(ws, 'MAX_LANES', 2)
    out = ws.wavernn_sample_pallas(model, variables, mels4, aux4,
                                   greedy=True,
                                   compute_dtype=jnp.float32)
    ws._RUN_CACHE.clear()
    agreement = float(np.mean(out == ref))
    assert agreement > 0.95, f'grouped agreement only {agreement:.2f}'


def _setup_mol():
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    cfg = dict(TINY)
    cfg['mode'] = 'MOL'
    model = WaveRNN(**cfg)
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(1, 36, cfg['feat_dims'])
                      .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)), mel)
    mels_up, aux = model.apply(variables, mel, method='upsample_cond')
    return model, variables, np.asarray(mels_up), np.asarray(aux)


def test_mol_greedy_trajectory_matches_scan():
    """MOL-mode fp32 kernel in greedy mode (argmax mixture, mean value)
    must track the scan's greedy MOL trajectory."""
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        wavernn_sample_pallas)
    model, variables, mels_up, aux = _setup_mol()
    ref = np.asarray(model.apply(variables, jnp.asarray(mels_up),
                                 jnp.asarray(aux), jax.random.PRNGKey(0),
                                 method='sample_scan', greedy=True,
                                 weights_dtype=jnp.float32))
    out = wavernn_sample_pallas(model, variables, mels_up, aux,
                                greedy=True, compute_dtype=jnp.float32)
    agreement = float(np.mean(np.abs(out - ref) < 1e-3))
    assert agreement > 0.95, f'MOL greedy agreement only {agreement:.2f}'


def test_mol_sampling_mode_runs_and_is_in_range():
    from forwardtacotron_tpu.kernels.wavernn_sample import (
        wavernn_sample_pallas)
    model, variables, mels_up, aux = _setup_mol()
    out = wavernn_sample_pallas(model, variables, mels_up, aux, seed=3)
    assert out.shape == (1, mels_up.shape[1])
    assert np.all(np.abs(out) <= 1.0)
    if jax.devices()[0].platform != 'cpu':
        # interpret mode's prng_random_bits returns zeros, so the
        # logistic noise is degenerate on CPU; randomness is asserted
        # on real TPU only
        assert out.std() > 0


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
