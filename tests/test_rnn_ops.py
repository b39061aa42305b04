"""GRU/LSTM scan kernels vs torch cuDNN-layout RNNs (the parity oracle
for checkpoint conversion: same stacked-gate weight layout)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')


def _torch_gru_params(tg, suffix=''):
    return {
        'w_ih': jnp.asarray(getattr(tg, f'weight_ih_l0{suffix}').detach().numpy()),
        'w_hh': jnp.asarray(getattr(tg, f'weight_hh_l0{suffix}').detach().numpy()),
        'b_ih': jnp.asarray(getattr(tg, f'bias_ih_l0{suffix}').detach().numpy()),
        'b_hh': jnp.asarray(getattr(tg, f'bias_hh_l0{suffix}').detach().numpy()),
    }


def test_gru_matches_torch():
    from forwardtacotron_tpu.ops.rnn import gru
    torch.manual_seed(0)
    B, T, D, H = 3, 11, 8, 16
    tg = torch.nn.GRU(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    ref, _ = tg(x)
    ours = gru(_torch_gru_params(tg), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-5)


@pytest.mark.parametrize('B', [2, 12])  # fused (<=8) and separate paths
def test_bigru_matches_torch(B):
    from forwardtacotron_tpu.ops.rnn import bigru
    torch.manual_seed(1)
    T, D, H = 9, 6, 12
    tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    ref, _ = tg(x)
    ours = bigru(_torch_gru_params(tg), _torch_gru_params(tg, '_reverse'),
                 jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-5)


@pytest.mark.parametrize('B', [3, 12])
def test_bilstm_packed_matches_torch(B):
    """Masked bidirectional LSTM == torch pack_padded/pad_packed path
    (the ForwardTacotron decoder main net, forward_tacotron.py:224-230),
    on both the fused (B<=8) and separate-scan (B>8) paths."""
    from forwardtacotron_tpu.ops.rnn import bilstm
    torch.manual_seed(2)
    T, D, H = 10, 5, 7
    tl = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    lengths = torch.tensor(([10, 7, 4] * 4)[:B])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lengths, batch_first=True, enforce_sorted=False)
    out, _ = tl(packed)
    ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, padding_value=-11.5129, batch_first=True, total_length=T)
    params_f = {
        'w_ih': jnp.asarray(tl.weight_ih_l0.detach().numpy()),
        'w_hh': jnp.asarray(tl.weight_hh_l0.detach().numpy()),
        'b_ih': jnp.asarray(tl.bias_ih_l0.detach().numpy()),
        'b_hh': jnp.asarray(tl.bias_hh_l0.detach().numpy()),
    }
    params_b = {
        'w_ih': jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy()),
        'w_hh': jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy()),
        'b_ih': jnp.asarray(tl.bias_ih_l0_reverse.detach().numpy()),
        'b_hh': jnp.asarray(tl.bias_hh_l0_reverse.detach().numpy()),
    }
    ours = bilstm(params_f, params_b, jnp.asarray(x.numpy()),
                  lengths=jnp.asarray(lengths.numpy()), pad_value=-11.5129)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-5)


def test_length_regulator_matches_reference_semantics():
    from forwardtacotron_tpu.ops.length_regulator import length_regulate
    B, T, C = 2, 4, 3
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, C).astype(np.float32)
    dur = np.array([[1.2, 0.0, 2.6, 1.0],
                    [-0.5, 3.49, 0.51, 0.4]], dtype=np.float32)

    # reference semantics (common_layers.py:12-19)
    def torch_ref(x, dur):
        import torch as th
        d = th.tensor(dur.copy())
        d[d < 0] = 0.
        out = []
        for i in range(x.shape[0]):
            out.append(th.repeat_interleave(th.tensor(x[i]),
                                            (d[i] + 0.5).long(), dim=0))
        return torch.nn.utils.rnn.pad_sequence(out, padding_value=0.,
                                               batch_first=True).numpy()

    ref = torch_ref(x, dur)
    max_t = 8
    ours, total = length_regulate(jnp.asarray(x), jnp.asarray(dur), max_t)
    ours = np.asarray(ours)
    assert total.tolist() == [1 + 0 + 3 + 1, 0 + 3 + 1 + 0]
    np.testing.assert_allclose(ours[:, :ref.shape[1]], ref, atol=1e-6)
    assert np.all(ours[:, ref.shape[1]:] == 0)


def test_length_regulate_custom_vjp_matches_gather_autodiff():
    """The round-5 custom_vjp (backward as a one-hot MXU matmul
    instead of XLA's serialized scatter-add) must produce the same
    x-gradient as plain autodiff through the gather, and zero duration
    cotangent (rounding is non-differentiable, like the reference's
    repeat_interleave)."""
    from forwardtacotron_tpu.ops.length_regulator import length_regulate
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    dur = jnp.asarray([[2., 1., 0., 3., 1.], [1., 1., 1., 1., 1.]])
    w = jnp.asarray(rng.randn(2, 9, 3).astype(np.float32))

    def plain(x):
        d = jnp.maximum(dur, 0.0)
        reps = jnp.floor(d + 0.5).astype(jnp.int32)
        ends = jnp.cumsum(reps, axis=1)
        fi = jnp.arange(9, dtype=jnp.int32)
        idx = jax.vmap(
            lambda e: jnp.searchsorted(e, fi, side='right'))(ends)
        idx = jnp.minimum(idx, x.shape[1] - 1)
        out = jnp.take_along_axis(x, idx[..., None], axis=1)
        valid = fi[None, :] < ends[:, -1][:, None]
        return jnp.where(valid[..., None], out, 0.0)

    g_new = jax.grad(lambda x: jnp.sum(length_regulate(x, dur, 9)[0]
                                       * w))(x)
    g_old = jax.grad(lambda x: jnp.sum(plain(x) * w))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-6)
    g_dur = jax.grad(lambda d: jnp.sum(length_regulate(x, d, 9)[0]
                                       * w))(dur)
    assert float(jnp.max(jnp.abs(g_dur))) == 0.0


def test_masked_l1_matches_reference():
    import torch as th
    from forwardtacotron_tpu.ops.masking import masked_l1
    th.manual_seed(3)
    B, T, C = 2, 6, 4
    x = th.randn(B, C, T)   # reference layout (B, C, T)
    t = th.randn(B, C, T)
    lens = th.tensor([6, 3])

    # reference MaskedL1 (trainer/common.py:69-92)
    seq_range = th.arange(0, T).unsqueeze(0).expand(B, T)
    mask = (seq_range < lens.unsqueeze(1)).float().unsqueeze(1).expand_as(x)
    ref = th.nn.functional.l1_loss(x * mask, t * mask, reduction='sum') / mask.sum()

    ours = masked_l1(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                     jnp.asarray(t.numpy().transpose(0, 2, 1)),
                     jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_grouped_bigru_matches_torch():
    """3 independent BiGRUs with DIFFERENT hidden sizes advanced in one
    grouped scan (the fused SeriesPredictor ensemble) must match three
    separate torch packed BiGRUs on the valid lanes."""
    from forwardtacotron_tpu.ops.rnn import grouped_bigru, pad_gru_gates
    torch.manual_seed(3)
    B, T, D = 2, 9, 6
    hs = [4, 8, 5]
    H = max(hs)
    x = torch.randn(B, T, D)
    lengths = torch.tensor([9, 5])

    refs, w_ih, w_hh, b_ih, b_hh = [], [], [], [], []
    for hg in hs:
        tg = torch.nn.GRU(D, hg, batch_first=True, bidirectional=True)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, lengths, batch_first=True, enforce_sorted=False)
        out, _ = tg(packed)
        ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=T)
        refs.append(ref.detach().numpy())
        for lst, key, pad_cols in [(w_ih, 'weight_ih_l0', False),
                                   (w_hh, 'weight_hh_l0', True),
                                   (b_ih, 'bias_ih_l0', False),
                                   (b_hh, 'bias_hh_l0', False)]:
            pair = []
            for suffix in ['', '_reverse']:
                w = jnp.asarray(getattr(tg, key + suffix).detach().numpy())
                w = pad_gru_gates(w, hg, H)
                if pad_cols and hg != H:
                    w = jnp.pad(w, ((0, 0), (0, H - hg)))
                pair.append(w)
            lst.append(pair)

    def stack(lst, d):
        return jnp.stack([lst[g][d] for g in range(3)])

    xg = jnp.broadcast_to(jnp.asarray(x.numpy())[:, :, None, :], (B, T, 3, D))
    y = grouped_bigru(
        jnp.stack([stack(w_ih, 0), stack(w_ih, 1)]),
        jnp.stack([stack(w_hh, 0), stack(w_hh, 1)]),
        jnp.stack([stack(b_ih, 0), stack(b_ih, 1)]),
        jnp.stack([stack(b_hh, 0), stack(b_hh, 1)]),
        xg, lengths=jnp.asarray(lengths.numpy()))
    for g, hg in enumerate(hs):
        ours = np.concatenate([np.asarray(y[:, :, g, 0, :hg]),
                               np.asarray(y[:, :, g, 1, :hg])], axis=-1)
        np.testing.assert_allclose(ours, refs[g], atol=1e-5)
