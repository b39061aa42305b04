"""Teacher-free neural aligner tests: forward-sum loss against brute
force, Viterbi duration extraction, and end-to-end learning of a known
synthetic alignment."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forwardtacotron_tpu.align.aligner import (Aligner, forward_sum_loss,
                                               viterbi_durations)


def _monotonic_paths(T, N):
    """All frame->phoneme paths: start at 0, step {0,+1}, end at N-1."""
    for steps in itertools.product([0, 1], repeat=T - 1):
        path = np.cumsum((0,) + steps)
        if path[-1] == N - 1 and path.max() < N:
            yield path


def test_forward_sum_matches_brute_force():
    rng = np.random.RandomState(0)
    T, N = 5, 3
    logits = rng.randn(1, T, N).astype(np.float32)
    log_att = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    loss = forward_sum_loss(log_att, jnp.asarray([N]), jnp.asarray([T]))

    la = np.asarray(log_att)[0]
    path_scores = [sum(la[t, n] for t, n in enumerate(p))
                   for p in _monotonic_paths(T, N)]
    want = -np.logaddexp.reduce(path_scores) / T
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_forward_sum_respects_lengths():
    """Padded frames/phonemes must not change the likelihood: computing
    on a padded buffer equals computing on the exact-size buffer."""
    rng = np.random.RandomState(1)
    T, N, Tp, Np = 6, 4, 10, 7
    logits = rng.randn(1, Tp, Np).astype(np.float32)
    mask = np.full((1, 1, Np), False)
    mask[..., :N] = True
    la_pad = jax.nn.log_softmax(
        jnp.where(jnp.asarray(mask), jnp.asarray(logits), -1e9), axis=-1)
    la_exact = jax.nn.log_softmax(jnp.asarray(logits[:, :T, :N]), axis=-1)
    a = forward_sum_loss(la_pad, jnp.asarray([N]), jnp.asarray([T]))
    b = forward_sum_loss(la_exact, jnp.asarray([N]), jnp.asarray([T]))
    # same per-frame-normalized NLL up to the (identical) softmax mass
    # the padded positions remove (they are -1e9 ~ 0 probability)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_viterbi_recovers_planted_path():
    """Plant a high-probability monotonic path; Viterbi must return its
    durations exactly, per batch item, with sum(dur) == mel_len."""
    rng = np.random.RandomState(2)
    B, T, N = 3, 24, 5
    true_durs = np.array([[4, 6, 5, 5, 4],
                          [10, 2, 8, 2, 2],
                          [1, 1, 1, 1, 16]], np.int32)
    mel_len = true_durs.sum(1)                      # all 24 here
    logits = rng.randn(B, T, N).astype(np.float32) * 0.1
    for b in range(B):
        t = 0
        for n, d in enumerate(true_durs[b]):
            for _ in range(d):
                logits[b, t, n] += 8.0
                t += 1
    log_att = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    durs = viterbi_durations(log_att, jnp.asarray([N] * B),
                             jnp.asarray(mel_len))
    np.testing.assert_array_equal(np.asarray(durs), true_durs)


def test_viterbi_masked_batch_matches_single():
    """Batched extraction with heterogeneous lengths == one-by-one on
    exact-size buffers (the static-shape masking contract)."""
    rng = np.random.RandomState(3)
    B, Tp, Np = 4, 32, 8
    x_len = np.array([8, 5, 3, 7])
    mel_len = np.array([32, 20, 11, 26])
    logits = rng.randn(B, Tp, Np).astype(np.float32)
    n_mask = np.arange(Np)[None, None, :] < x_len[:, None, None]
    la = jax.nn.log_softmax(
        jnp.where(jnp.asarray(n_mask), jnp.asarray(logits), -1e9), -1)
    batched = np.asarray(viterbi_durations(
        la, jnp.asarray(x_len), jnp.asarray(mel_len)))
    assert (batched.sum(1) == mel_len).all()
    for b in range(B):
        la_b = jax.nn.log_softmax(
            jnp.asarray(logits[b:b + 1, :mel_len[b], :x_len[b]]), -1)
        single = np.asarray(viterbi_durations(
            la_b, jnp.asarray([x_len[b]]), jnp.asarray([mel_len[b]])))
        np.testing.assert_array_equal(batched[b, :x_len[b]], single[0])
        assert batched[b, x_len[b]:].sum() == 0


def _synthetic_batch(rng, B, N, T, M, vocab, sig=None):
    """mel = per-phoneme signature vector repeated dur times + noise —
    a dataset whose true alignment is known by construction. Pass a
    shared `sig` to draw many batches from the same phoneme inventory
    (needed so the aligner must learn content matching rather than
    memorize one batch)."""
    if sig is None:
        sig = rng.randn(vocab, M).astype(np.float32)
    x = rng.randint(1, vocab, (B, N)).astype(np.int32)
    durs = rng.randint(2, 7, (B, N)).astype(np.int32)
    # trim/grow the last phoneme so every item fills T exactly
    for b in range(B):
        durs[b, -1] += T - durs[b].sum()
        while durs[b, -1] <= 0:          # steal from the largest
            durs[b, np.argmax(durs[b, :-1])] -= 1
            durs[b, -1] += 1
    mel = np.zeros((B, T, M), np.float32)
    for b in range(B):
        t = 0
        for n in range(N):
            for _ in range(durs[b, n]):
                mel[b, t] = sig[x[b, n]]
                t += 1
    mel += rng.randn(B, T, M).astype(np.float32) * 0.1
    return x, mel, durs


def test_aligner_learns_synthetic_alignment():
    """Train on a stream of fresh batches from one phoneme inventory,
    then check the alignment on HELD-OUT items. Fresh data every step
    matters: on a single fixed batch the forward-sum loss happily
    memorizes a degenerate path (all frames on one phoneme), which is
    exactly the collapse real-data diversity prevents."""
    import optax
    rng = np.random.RandomState(0)
    B, N, T, M, vocab = 16, 6, 30, 16, 12
    sig = rng.randn(vocab, M).astype(np.float32)
    x_len = jnp.asarray([N] * B)
    mel_len = jnp.asarray([T] * B)

    model = Aligner(vocab_size=vocab, n_mels=M, embed_dims=32,
                    conv_dims=32, key_dims=16, n_text_convs=2,
                    n_mel_convs=1, dropout=0.0, prior_width=6.0)
    x0, mel0, _ = _synthetic_batch(rng, B, N, T, M, vocab, sig)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                           jnp.asarray(mel0), x_len, mel_len)
    opt = optax.adam(5e-3)
    opt_state = opt.init(variables['params'])

    @jax.jit
    def step(params, opt_state, x, mel):
        def loss_fn(p):
            la = model.apply({'params': p}, x, mel, x_len, mel_len)
            return forward_sum_loss(la, x_len, mel_len)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables['params']
    first = None
    for i in range(200):
        x, mel, _ = _synthetic_batch(rng, B, N, T, M, vocab, sig)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(mel))
        if first is None:
            first = float(loss)
    assert float(loss) < first, 'forward-sum loss did not decrease'

    # held-out batch: content matching must generalize
    x, mel, true_durs = _synthetic_batch(
        np.random.RandomState(123), B, N, T, M, vocab, sig)
    la = model.apply({'params': params}, jnp.asarray(x),
                     jnp.asarray(mel), x_len, mel_len)
    durs = np.asarray(viterbi_durations(la, x_len, mel_len))
    assert (durs.sum(1) == T).all()
    # Frame-level accuracy of the recovered alignment. Exact accuracy
    # saturates ~0.85 because the mel encoder's 3-tap conv smears the
    # two frames at each phoneme boundary — a ±1-frame jitter that is
    # inherent, not a bug — so the load-bearing assertions are the
    # tolerance-1 accuracy and the mean duration error.
    def frames(d):
        return np.repeat(np.arange(d.shape[-1]), d)
    exact = np.mean([
        (frames(durs[b]) == frames(true_durs[b])).mean()
        for b in range(B)])
    tol1 = np.mean([
        (np.abs(frames(durs[b]) - frames(true_durs[b])) <= 1).mean()
        for b in range(B)])
    dur_l1 = np.abs(durs - true_durs).mean()
    assert exact > 0.7, f'exact frame accuracy too low: {exact:.3f}'
    assert tol1 > 0.95, f'tol-1 frame accuracy too low: {tol1:.3f}'
    assert dur_l1 < 1.5, f'mean duration error too high: {dur_l1:.2f}'


def test_extract_step_and_scores_shapes():
    from forwardtacotron_tpu.align.aligner import build_align_extract_step
    from forwardtacotron_tpu.align.metrics import attention_score
    rng = np.random.RandomState(0)
    B, N, T, M, vocab = 2, 5, 20, 8, 10
    model = Aligner(vocab_size=vocab, n_mels=M, embed_dims=16,
                    conv_dims=16, key_dims=8, n_text_convs=1,
                    n_mel_convs=1, dropout=0.0)
    x = jnp.asarray(rng.randint(1, vocab, (B, N)), jnp.int32)
    mel = jnp.asarray(rng.randn(B, T, M), jnp.float32)
    x_len = jnp.asarray([N, 3])
    mel_len = jnp.asarray([T, 12])
    variables = model.init(jax.random.PRNGKey(0), x, mel, x_len, mel_len)
    extract = build_align_extract_step(model)
    durs, att = extract(variables, x, mel, x_len, mel_len)
    assert durs.shape == (B, N) and att.shape == (B, T, N)
    assert int(durs[0].sum()) == T and int(durs[1].sum()) == 12
    assert np.asarray(durs)[1, 3:].sum() == 0
    align_s, sharp_s = attention_score(att, mel_len, r=1)
    assert np.isfinite(np.asarray(align_s)).all()
    assert np.isfinite(np.asarray(sharp_s)).all()


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
