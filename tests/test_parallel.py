"""Multi-device sharding tests on the virtual 8-device CPU mesh:
mesh construction, sharding rules, sharded train step execution, and
data-parallel loss equivalence vs single-device."""
import pytest  # noqa: E402
import numpy as np

import jax
import jax.numpy as jnp


TINY_MODEL = {
    'embed_dims': 16, 'series_embed_dims': 8,
    'durpred_conv_dims': 8, 'durpred_rnn_dims': 4, 'durpred_dropout': 0.0,
    'pitch_conv_dims': 8, 'pitch_rnn_dims': 4, 'pitch_dropout': 0.0,
    'pitch_strength': 1.0,
    'energy_conv_dims': 8, 'energy_rnn_dims': 4, 'energy_dropout': 0.0,
    'energy_strength': 1.0,
    'rnn_dims': 16, 'prenet_dims': 8, 'prenet_k': 2, 'prenet_dropout': 0.0,
    'prenet_num_highways': 1, 'postnet_dims': 8, 'postnet_k': 2,
    'postnet_num_highways': 1, 'postnet_dropout': 0.0,
}
TRAIN_CFG = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
             'energy_loss_factor': 0.1, 'pitch_zoneout': 0.0,
             'energy_zoneout': 0.0, 'clip_grad_norm': 1.0}


def _batch(B=8, Tx=6, Tm=16, n_mels=8, seed=0):
    rng = np.random.RandomState(seed)
    dur = np.full((B, Tx), Tm // Tx, dtype=np.float32)
    return {
        'x': jnp.asarray(rng.randint(1, 30, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, Tm, n_mels).astype(np.float32)),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
        'energy': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
    }


def test_mesh_construction():
    from forwardtacotron_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    mesh = make_mesh()  # defaults: all devices on data
    assert mesh.shape['data'] == len(jax.devices())


def test_sharded_train_step_matches_single_device():
    """The same train step on a (4, 2) mesh and on one device must give
    the same loss and parameter update (GSPMD is semantics-preserving)."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc

    model = ForwardTacotron(num_chars=30, n_mels=8, **TINY_MODEL)
    optimizer = tc.make_optimizer(TRAIN_CFG['clip_grad_norm'], lr=1e-3)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    state = tc.init_train_state(model, optimizer, batch, rng,
                                init_kwargs={'train': True})
    step_fn = tc.build_forward_train_step(model, optimizer, TRAIN_CFG)

    # single device
    s1, m1 = jax.jit(step_fn)(state, batch, rng)
    loss1 = float(m1['loss'])

    # sharded over (4, 2) mesh
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state_sh = pmesh.state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, batch)
    state2 = jax.device_put(state, state_sh)
    batch2 = jax.device_put(batch, batch_sh)
    s2, m2 = jax.jit(step_fn, in_shardings=(state_sh, batch_sh, None))(
        state2, batch2, rng)
    loss2 = float(m2['loss'])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4)
    # updated params equal
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_param_sharding_rules():
    from forwardtacotron_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    params = {
        'dense': {'kernel': np.zeros((16, 32)), 'bias': np.zeros(32)},
        'rnn': {'w_ih': np.zeros((48, 16)), 'b_ih': np.zeros(48)},
        'odd': {'kernel': np.zeros((5, 7))},
    }
    sh = pmesh.param_shardings(mesh, params)
    assert 'model' in str(sh['dense']['kernel'].spec)
    assert 'model' in str(sh['rnn']['w_ih'].spec)
    assert sh['odd']['kernel'].spec == jax.sharding.PartitionSpec()


def test_host_local_batch_to_global_single_process():
    """host_local_batch_to_global == plain sharded device_put at one
    process (the multi-host feed path must be a no-op locally)."""
    import jax
    from forwardtacotron_tpu.parallel.mesh import (batch_shardings,
                                                   make_mesh)
    from forwardtacotron_tpu.parallel.distributed import (
        host_local_batch_to_global, process_slice)
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    rng = np.random.RandomState(0)
    batch = {'x': rng.randint(0, 9, (8, 5)).astype(np.int32),
             'mel': rng.randn(8, 12, 4).astype(np.float32),
             'scalar_like': rng.randn(3).astype(np.float32)}  # B=3: repl
    global_b = host_local_batch_to_global(mesh, batch)
    ref = jax.device_put(batch, batch_shardings(mesh, batch))
    for k in batch:
        np.testing.assert_array_equal(np.asarray(global_b[k]),
                                      np.asarray(ref[k]))
        assert global_b[k].sharding == ref[k].sharding, k
    assert process_slice(8) == slice(0, 8)


def test_maybe_initialize_noop_without_config(monkeypatch):
    from forwardtacotron_tpu.parallel.distributed import maybe_initialize
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    monkeypatch.delenv('COORDINATOR_ADDRESS', raising=False)
    assert maybe_initialize({}) is False
    assert maybe_initialize(None) is False


def test_sharded_taco_train_step_matches_single_device():
    """The teacher's train step under a (4, 2) mesh matches one device:
    the LSA decoder scan, BN stats, and dropout rngs are all
    sharding-invariant under GSPMD."""
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import build_taco_train_step

    model = Tacotron(num_chars=30, n_mels=8, embed_dims=16,
                     encoder_dims=128, decoder_dims=256, postnet_dims=8,
                     encoder_k=2, lstm_dims=32, postnet_k=2,
                     num_highways=1, dropout=0.0, stop_threshold=-11.0)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    r = 2
    rngs = np.random.RandomState(0)
    B, Tx, Tm = 8, 5, 8
    batch = {
        'x': jnp.asarray(rngs.randint(1, 29, (B, Tx)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, Tm, 8).astype(np.float32)),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
    }
    variables = model.init({'params': rng, 'dropout': rng},
                           batch['x'], batch['mel'], r, train=True,
                           rng=rng)

    def fresh_state():
        return tc.TrainState(
            params=jax.tree.map(jnp.array, variables['params']),
            batch_stats=jax.tree.map(
                jnp.array, variables.get('batch_stats', {})),
            opt_state=optimizer.init(variables['params']),
            step=jnp.asarray(0, jnp.int32))

    step_fn = build_taco_train_step(model, optimizer, r)
    s1, (m1, att1) = step_fn(fresh_state(), batch, rng)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state2 = jax.device_put(fresh_state(),
                            pmesh.state_shardings(mesh, fresh_state()))
    batch2 = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
    s2, (m2, att2) = step_fn(state2, batch2, rng)

    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(att1), np.asarray(att2),
                               atol=1e-5)
    # atol: Adam's eps-normalized update amplifies GSPMD reduction-order
    # float differences (~1e-7 in grads) to ~3e-5 in params
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_voc_train_step_matches_single_device():
    """The WaveRNN CE train step under a data-parallel mesh matches the
    single-device result (upsample convs + GRU scans under GSPMD)."""
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.voc_trainer import build_voc_train_step

    model = WaveRNN(rnn_dims=16, fc_dims=12, bits=6, pad=2,
                    upsample_factors=(4, 4), feat_dims=8,
                    compute_dims=8, res_out_dims=8, res_blocks=1,
                    hop_length=16, sample_rate=22050, mode='RAW')
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rngs = np.random.RandomState(0)
    B, frames, hop = 8, 4, 16
    seq_len = frames * hop
    batch = {
        'x': jnp.asarray(rngs.rand(B, seq_len).astype(np.float32)),
        'mel': jnp.asarray(
            rngs.randn(B, frames + 2 * model.pad, 8).astype(np.float32)),
        'y': jnp.asarray(rngs.randint(0, 2 ** 6, (B, seq_len)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch['x'], batch['mel'],
                           train=True)

    def fresh_state():
        return tc.TrainState(
            params=jax.tree.map(jnp.array, variables['params']),
            batch_stats=jax.tree.map(
                jnp.array, variables.get('batch_stats', {})),
            opt_state=optimizer.init(variables['params']),
            step=jnp.asarray(0, jnp.int32))

    step_fn = build_voc_train_step(model, optimizer, 'RAW')
    s1, m1 = step_fn(fresh_state(), batch)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state2 = jax.device_put(fresh_state(),
                            pmesh.state_shardings(mesh, fresh_state()))
    batch2 = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
    s2, m2 = step_fn(state2, batch2)

    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_gan_train_step():
    """The adversarial HiFi-GAN step executes under a ('data','model')
    mesh with both param trees sharded and the batch split over
    'data', matching the single-device result."""
    from forwardtacotron_tpu.models.gan_discriminators import (
        HiFiGANDiscriminators)
    from forwardtacotron_tpu.models.hifigan import HiFiGANGenerator
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train.hifigan_trainer import (
        GANTrainState, build_gan_train_step, make_gan_optimizer)
    from forwardtacotron_tpu.dsp.stft import (mel_filterbank,
                                              wav_to_mel_fn)

    gen = HiFiGANGenerator(
        resblock='2', upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    disc = HiFiGANDiscriminators(periods=(2,), n_scales=1)
    hop = gen.hop_length
    B, T = 8, 8
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, T, 8).astype(np.float32))
    audio = jnp.asarray((rng.randn(B, T * hop) * 0.2).astype(np.float32))
    basis = mel_filterbank(22050, 64, 8, 0, 8000)
    w2m = wav_to_mel_fn(basis, 64, 8, 64)

    go, do = make_gan_optimizer(), make_gan_optimizer()
    gv = gen.init(jax.random.PRNGKey(0), mel[:1])
    dv = disc.init(jax.random.PRNGKey(1), audio[:1], audio[:1])

    def fresh_state():
        return GANTrainState(
            gen_params=jax.tree.map(jnp.array, gv['params']),
            disc_params=jax.tree.map(jnp.array, dv['params']),
            gen_opt=go.init(gv['params']),
            disc_opt=do.init(dv['params']),
            step=jnp.asarray(0, jnp.int32))

    step_fn = build_gan_train_step(gen, disc, go, do, w2m)
    _, want = step_fn(fresh_state(), {'mel': mel, 'audio': audio})

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state = fresh_state()
    state = jax.device_put(state, pmesh.gan_state_shardings(mesh, state))
    batch = {'mel': mel, 'audio': audio}
    batch = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
    new_state, got = step_fn(state, batch)
    assert int(new_state.step) == 1
    for k in ('disc_loss', 'gen_loss', 'gen_mel'):
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=2e-4), k


FP_TINY = {
    # NOTE (tolerance): the FastPitch test below allows atol=5e-4 on
    # updated params — Adam's step-1 update is ~lr*m/sqrt(v), so for
    # near-zero attention grads the cross-shard f32 reduction order
    # shifts single elements by up to ~2e-4 of the 1e-3 step while the
    # loss matches to 1e-6. Real sharding bugs are orders larger.
    'durpred_dropout': 0.0, 'durpred_d_model': 8, 'durpred_n_heads': 2,
    'durpred_layers': 1, 'durpred_d_fft': 8,
    'pitch_dropout': 0.0, 'pitch_d_model': 8, 'pitch_n_heads': 2,
    'pitch_layers': 1, 'pitch_d_fft': 8,
    'energy_dropout': 0.0, 'energy_d_model': 8, 'energy_n_heads': 2,
    'energy_layers': 1, 'energy_d_fft': 8,
    'pitch_strength': 1.0, 'energy_strength': 1.0,
    'd_model': 16, 'conv1_kernel': 9, 'conv2_kernel': 1,
    'prenet_layers': 1, 'prenet_heads': 2, 'prenet_fft': 16,
    'prenet_dropout': 0.0,
    'postnet_layers': 1, 'postnet_heads': 2, 'postnet_fft': 16,
    'postnet_dropout': 0.0,
}


def test_sharded_fast_pitch_train_step_matches_single_device():
    """FastPitch (packed-qkv attention, LayerNorm) under the (4, 2)
    DP+TP mesh: loss and updates match the single-device step."""
    from forwardtacotron_tpu.models.fast_pitch import FastPitch
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc

    model = FastPitch(num_chars=30, n_mels=8, **FP_TINY)
    optimizer = tc.make_optimizer(TRAIN_CFG['clip_grad_norm'], lr=1e-3)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    state = tc.init_train_state(model, optimizer, batch, rng,
                                init_kwargs={'train': True})
    step_fn = tc.build_forward_train_step(model, optimizer, TRAIN_CFG)

    s1, m1 = jax.jit(step_fn)(state, batch, rng)
    loss1 = float(m1['loss'])

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state_sh = pmesh.state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, batch)
    state2 = jax.device_put(state, state_sh)
    batch2 = jax.device_put(batch, batch_sh)
    s2, m2 = jax.jit(step_fn, in_shardings=(state_sh, batch_sh, None))(
        state2, batch2, rng)
    loss2 = float(m2['loss'])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


def test_sharded_aligner_train_step_matches_single_device():
    """The teacher-free aligner's train step under the (4, 2) DP+TP
    mesh: the forward-sum DP scan and pairwise-score contraction are
    sharding-invariant; loss and updated params match one device."""
    from forwardtacotron_tpu.align.aligner import Aligner
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.aligner_trainer import (
        build_aligner_train_step)

    rngs = np.random.RandomState(0)
    B, N, T, M, vocab = 8, 6, 20, 8, 12
    model = Aligner(vocab_size=vocab, n_mels=M, embed_dims=16,
                    conv_dims=16, key_dims=8, n_text_convs=1,
                    n_mel_convs=1, dropout=0.0, prior_width=6.0)
    batch = {
        'x': jnp.asarray(rngs.randint(1, vocab, (B, N)), jnp.int32),
        'mel': jnp.asarray(rngs.randn(B, T, M).astype(np.float32)),
        'x_len': jnp.asarray([N, N, 4, N, 5, N, N, 3], jnp.int32),
        'mel_len': jnp.asarray([T, 12, 9, T, 11, 15, T, 8], jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    variables = model.init({'params': rng, 'dropout': rng}, batch['x'],
                           batch['mel'], batch['x_len'],
                           batch['mel_len'], train=True)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)

    def fresh_state():
        return tc.TrainState(
            params=jax.tree.map(jnp.array, variables['params']),
            batch_stats={},
            opt_state=optimizer.init(variables['params']),
            step=jnp.asarray(0, jnp.int32))

    step_fn = build_aligner_train_step(model, optimizer)
    s1, m1 = jax.jit(step_fn)(fresh_state(), batch, rng)
    loss1 = float(m1['loss'])

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    state_sh = pmesh.state_shardings(mesh, fresh_state())
    batch_sh = pmesh.batch_shardings(mesh, batch)
    state2 = jax.device_put(fresh_state(), state_sh)
    batch2 = jax.device_put(batch, batch_sh)
    s2, m2 = jax.jit(step_fn, in_shardings=(state_sh, batch_sh, None))(
        state2, batch2, rng)
    loss2 = float(m2['loss'])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
