"""WaveRNN MOL mode: training loss + scan sampling end to end (the
RAW path is covered by the parity and Pallas tests)."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp

TINY = dict(rnn_dims=16, fc_dims=12, bits=9, pad=2,
            upsample_factors=(2, 2), feat_dims=10, compute_dims=8,
            res_out_dims=8, res_blocks=1, hop_length=4, sample_rate=1000,
            mode='MOL')


def test_mol_training_and_sampling():
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.voc_trainer import build_voc_train_step

    model = WaveRNN(**TINY)
    assert model.n_classes == 30  # 10 mixtures x 3 params
    rng = np.random.RandomState(0)
    B, T_win = 2, 10
    hop = 4
    T_seq = (T_win - 2 * TINY['pad']) * hop
    mel = jnp.asarray(rng.randn(B, T_win, 10).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (B, T_seq)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (B, T_seq)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), x, mel)
    optimizer = tc.make_optimizer(4.0, lr=1e-3)
    state = tc.TrainState(params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=optimizer.init(variables['params']),
                          step=jnp.asarray(0, jnp.int32))
    step_fn = build_voc_train_step(model, optimizer, 'MOL')
    losses = []
    batch = {'x': x, 'mel': mel, 'y': y}
    for _ in range(3):
        state, m = step_fn(state, batch)
        losses.append(float(m['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    # MOL sampling through the scan (pallas is RAW-only by design)
    mels_up, aux = model.apply(state.variables, mel,
                               method='upsample_cond')
    samples = model.apply(state.variables, mels_up, aux,
                          jax.random.PRNGKey(1), method='sample_scan')
    s = np.asarray(samples)
    assert s.shape == (B, T_seq)
    assert np.all(np.abs(s) <= 1.0)
    assert s.std() > 0


def test_generate_wav_mol_path():
    from forwardtacotron_tpu.models.wavernn import WaveRNN, generate_wav
    model = WaveRNN(**TINY)
    rng = np.random.RandomState(1)
    mel = rng.randn(10, 24).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 80)),
                           jnp.asarray(mel.T[None][:, :24]))
    wav = generate_wav(model, variables, mel, batched=True, target=40,
                       overlap=8, mu_law=True)  # mu_law ignored in MOL
    assert np.isfinite(wav).all()
    assert len(wav) == (24 - 1) * 4


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
