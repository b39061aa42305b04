"""The fused single-dispatch vocoder program (models/wavernn.vocode)
must match the stepwise generate_wav pipeline: same fold, sampling
trajectory (same PRNG key), mu-law decode, crossfade and fade-out —
only f32-on-device vs f64-on-host rounding may differ."""
import numpy as np

import jax
import jax.numpy as jnp

from forwardtacotron_tpu.models.wavernn import (
    WaveRNN, generate_wav, vocode, xfade_and_unfold, xfade_unfold_device)

TINY = dict(rnn_dims=16, fc_dims=12, bits=6, pad=2,
            upsample_factors=(2, 2), feat_dims=10, compute_dims=8,
            res_out_dims=8, res_blocks=2, hop_length=4, sample_rate=1000,
            mode='RAW')


def test_xfade_unfold_device_matches_host():
    rng = np.random.RandomState(0)
    for num_folds, target, overlap in [(4, 10, 2), (3, 32, 8), (1, 20, 4)]:
        y = rng.randn(num_folds, target + 2 * overlap).astype(np.float64)
        ref = xfade_and_unfold(y.copy(), target, overlap)
        dev = np.asarray(xfade_unfold_device(jnp.asarray(y, jnp.float32),
                                             overlap))
        assert dev.shape == ref.shape
        np.testing.assert_allclose(dev, ref, atol=1e-5)


def _parity(mode):
    cfg = dict(TINY, mode=mode)
    model = WaveRNN(**cfg)
    rng = np.random.RandomState(1)
    n_frames = 60  # wave_len = 236 >= 20*hop fade region
    mel = rng.randn(cfg['feat_dims'], n_frames).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                           jnp.zeros((1, 8, cfg['feat_dims'])))

    kw = dict(target=40, overlap=8, seed=7, use_pallas=False)
    step = generate_wav(model, variables, mel, batched=True, fused=False,
                        **kw)
    fused = vocode(model, variables, mel, **kw)
    assert fused.shape == step.shape
    np.testing.assert_allclose(fused, step, atol=2e-4)


def test_vocode_matches_stepwise_raw():
    _parity('RAW')


def test_vocode_matches_stepwise_mol():
    _parity('MOL')
