"""Discretized mixture-of-logistics loss parity vs the reference torch
implementation (utils/distribution.py), plus sampler sanity."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = Path('/root/reference')


@pytest.mark.skipif(not REFERENCE.exists(), reason='no reference repo')
def test_mol_loss_matches_reference():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from utils.distribution import discretized_mix_logistic_loss as ref_loss
    from forwardtacotron_tpu.ops.mol import discretized_mix_logistic_loss

    rng = np.random.RandomState(0)
    B, T, nr_mix = 2, 11, 10
    y_hat = rng.randn(B, T, 3 * nr_mix).astype(np.float32)
    y = rng.uniform(-1, 1, (B, T, 1)).astype(np.float32)
    # exercise the edge cases too
    y[0, 0, 0] = -0.9999
    y[0, 1, 0] = 0.9999

    # reference signature: y_hat (B, C, T) after its internal permute of
    # (B, T, C) input — it calls permute(0,2,1) first, so feed (B, T, C)
    with torch.no_grad():
        ref = ref_loss(torch.tensor(y_hat), torch.tensor(y))
    ours = discretized_mix_logistic_loss(jnp.asarray(y_hat),
                                         jnp.asarray(y))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_mol_sampler_statistics():
    from forwardtacotron_tpu.ops.mol import (
        sample_from_discretized_mix_logistic)
    nr_mix = 5
    y = np.zeros((1, 4000, 3 * nr_mix), dtype=np.float32)
    y[..., nr_mix:2 * nr_mix] = 0.3          # all means at 0.3
    y[..., 2 * nr_mix:] = np.log(0.01)       # small scale
    s = np.asarray(sample_from_discretized_mix_logistic(
        jnp.asarray(y), jax.random.PRNGKey(0)))
    assert abs(float(s.mean()) - 0.3) < 0.01
    assert float(s.std()) < 0.1
    assert np.all(np.abs(s) <= 1.0)


def test_phoneme_pitch_energy_and_normalize():
    from forwardtacotron_tpu.align.features import (normalize_values,
                                                    phoneme_pitch_energy)
    dur = np.array([2, 3, 1], dtype=np.int32)
    T = int(dur.sum())
    mel = np.log(np.full((4, T), 0.5, dtype=np.float32))
    pitch = np.array([100.0, 0.0, 200.0, 210.0, 900.0, 150.0],
                     dtype=np.float32)
    p, e = phoneme_pitch_energy(dur, mel, pitch, pitch_max_freq=600)
    # phoneme 0: frames [100, 0] -> nonzero mean = 100
    # phoneme 1: frames [200, 210, 900] -> 900 filtered -> 205
    # phoneme 2: [150]
    np.testing.assert_allclose(p, [100.0, 205.0, 150.0])
    np.testing.assert_allclose(e, np.full(3, np.sqrt(4 * 0.25)), rtol=1e-5)

    vals = [('a', np.array([1.0, 0.0, 3.0], dtype=np.float32)),
            ('b', np.array([2.0, 2.0], dtype=np.float32))]
    mean, std = normalize_values(vals)
    assert abs(mean - 2.0) < 1e-6
    # zeros stay zero after normalization
    assert vals[0][1][1] == 0.0
    nz = np.concatenate([vals[0][1][[0, 2]], vals[1][1]])
    assert abs(nz.mean()) < 1e-6
