"""End-to-end numerical parity of the JAX ForwardTacotron vs the
reference torch implementation (random init, converted weights, eval
mode). This is the checkpoint-compatibility gate: if these pass, any
reference `.pt` checkpoint will produce matching mels here.

Skipped when the reference repo is not mounted.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path('/root/reference')
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference repo not available')

TINY_CFG = {
    'embed_dims': 32,
    'series_embed_dims': 8,
    'durpred_conv_dims': 16,
    'durpred_rnn_dims': 8,
    'durpred_dropout': 0.5,
    'pitch_conv_dims': 16,
    'pitch_rnn_dims': 12,
    'pitch_dropout': 0.5,
    'pitch_strength': 1.0,
    'energy_conv_dims': 16,
    'energy_rnn_dims': 8,
    'energy_dropout': 0.5,
    'energy_strength': 1.0,
    'rnn_dims': 24,
    'prenet_dims': 16,
    'prenet_k': 4,
    'postnet_num_highways': 2,
    'prenet_dropout': 0.5,
    'postnet_dims': 16,
    'postnet_k': 3,
    'prenet_num_highways': 2,
    'postnet_dropout': 0.0,
    'n_mels': 10,
}


@pytest.fixture(scope='module')
def models():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    torch.manual_seed(0)
    tmodel = TorchFT(num_chars=120, **TINY_CFG)
    tmodel.eval()
    # randomize running stats so BN conversion is actually exercised
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron)
    jmodel = ForwardTacotron(num_chars=120, **TINY_CFG)
    variables, step = convert_forward_tacotron(tmodel.state_dict(), TINY_CFG)
    return tmodel, jmodel, variables


def test_training_forward_parity(models):
    import torch
    import jax.numpy as jnp
    tmodel, jmodel, variables = models

    rng = np.random.RandomState(1)
    B, Tx = 2, 7
    x = rng.randint(1, 119, size=(B, Tx))
    dur = np.array([[2, 1, 3, 1, 2, 1, 2], [1, 2, 2, 1, 0, 0, 0]],
                   dtype=np.float32)
    mel_lens = dur.sum(axis=1).astype(np.int32)
    T_mel = int(mel_lens.max())
    mel = rng.randn(B, TINY_CFG['n_mels'], T_mel).astype(np.float32)
    pitch = rng.randn(B, Tx).astype(np.float32)
    energy = rng.randn(B, Tx).astype(np.float32)

    tbatch = {
        'x': torch.tensor(x, dtype=torch.long),
        'mel': torch.tensor(mel),
        'mel_len': torch.tensor(mel_lens, dtype=torch.long),
        'dur': torch.tensor(dur),
        'pitch': torch.tensor(pitch),
        'energy': torch.tensor(energy),
    }
    with torch.no_grad():
        tout = tmodel(tbatch)

    jbatch = {
        'x': jnp.asarray(x, dtype=jnp.int32),
        'mel': jnp.asarray(mel.transpose(0, 2, 1)),
        'mel_len': jnp.asarray(mel_lens),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(pitch),
        'energy': jnp.asarray(energy),
    }
    jout = jmodel.apply(variables, jbatch, train=False)

    np.testing.assert_allclose(np.asarray(jout['dur']),
                               tout['dur'].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout['pitch']),
                               tout['pitch'].numpy()[:, 0, :], atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout['energy']),
                               tout['energy'].numpy()[:, 0, :], atol=1e-5)
    # mel outputs: reference returns (B, n_mels, T); ours (B, T, n_mels)
    np.testing.assert_allclose(np.asarray(jout['mel']).transpose(0, 2, 1),
                               tout['mel'].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jout['mel_post']).transpose(0, 2, 1),
        tout['mel_post'].numpy(), atol=1e-4)


def test_generate_parity_padded_bucket(models):
    """Padded static-bucket inference must equal the reference's
    exact-length generate for all valid frames (mel L1 < 1e-3 gate from
    BASELINE.json, tested at tiny scale)."""
    import torch
    import jax.numpy as jnp
    tmodel, jmodel, variables = models

    rng = np.random.RandomState(2)
    Tx_true = 9
    x_true = rng.randint(1, 119, size=(1, Tx_true))

    with torch.no_grad():
        tgen = tmodel.generate(torch.tensor(x_true, dtype=torch.long))
    t_mel_post = tgen['mel_post'].numpy()[0]  # (n_mels, T_true)
    t_len = t_mel_post.shape[1]

    # padded bucket: text padded to 16, mel bucket 64
    Tx_pad = 16
    x_pad = np.zeros((1, Tx_pad), dtype=np.int32)
    x_pad[0, :Tx_true] = x_true
    jgen = jmodel.apply(variables, jnp.asarray(x_pad), 64,
                        method='generate',
                        x_len=jnp.asarray([Tx_true]))
    j_len = int(jgen['mel_len'][0])
    assert j_len == t_len, f'generated lengths differ: {j_len} vs {t_len}'
    j_mel_post = np.asarray(jgen['mel_post'])[0, :j_len].T
    err = np.abs(j_mel_post - t_mel_post).mean()
    assert err < 1e-3, f'generate mel L1 vs reference: {err}'
    np.testing.assert_allclose(j_mel_post, t_mel_post, atol=1e-3)
