"""FastPitch parity vs the torch reference (eval mode, converted weights):
teacher-forced forward and padded-bucket generate."""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path('/root/reference')
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference repo not available')

TINY_CFG = {
    'durpred_dropout': 0.5, 'durpred_d_model': 8, 'durpred_n_heads': 2,
    'durpred_layers': 1, 'durpred_d_fft': 8,
    'pitch_dropout': 0.5, 'pitch_d_model': 8, 'pitch_n_heads': 2,
    'pitch_layers': 1, 'pitch_d_fft': 8,
    'energy_dropout': 0.5, 'energy_d_model': 8, 'energy_n_heads': 2,
    'energy_layers': 1, 'energy_d_fft': 8,
    'pitch_strength': 1.0, 'energy_strength': 1.0,
    'd_model': 16, 'conv1_kernel': 9, 'conv2_kernel': 1,
    'prenet_layers': 2, 'prenet_heads': 2, 'prenet_fft': 16,
    'prenet_dropout': 0.1,
    'postnet_layers': 2, 'postnet_heads': 2, 'postnet_fft': 16,
    'postnet_dropout': 0.1,
    'n_mels': 6,
}


@pytest.fixture(scope='module')
def models():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.fast_pitch import FastPitch as TorchFP
    from forwardtacotron_tpu.models.fast_pitch import FastPitch
    from forwardtacotron_tpu.models.torch_compat import convert_fast_pitch

    torch.manual_seed(0)
    tmodel = TorchFP(num_chars=50, **TINY_CFG)
    tmodel.eval()
    jmodel = FastPitch(num_chars=50, **TINY_CFG)
    variables, _ = convert_fast_pitch(tmodel.state_dict(), TINY_CFG)
    return tmodel, jmodel, variables


def test_fast_pitch_forward_parity(models):
    import torch
    import jax.numpy as jnp
    tmodel, jmodel, variables = models
    rng = np.random.RandomState(1)
    B, Tx = 2, 6
    x = rng.randint(1, 49, size=(B, Tx))
    x[1, 4:] = 0  # padded item
    dur = np.array([[2, 1, 2, 1, 1, 1], [2, 2, 1, 0, 0, 0]],
                   dtype=np.float32)
    mel_lens = dur.sum(axis=1).astype(np.int32)
    T_mel = int(mel_lens.max())
    mel = rng.randn(B, TINY_CFG['n_mels'], T_mel).astype(np.float32)
    pitch = rng.randn(B, Tx).astype(np.float32)
    energy = rng.randn(B, Tx).astype(np.float32)

    with torch.no_grad():
        tout = tmodel({'x': torch.tensor(x, dtype=torch.long),
                       'mel': torch.tensor(mel),
                       'mel_len': torch.tensor(mel_lens, dtype=torch.long),
                       'dur': torch.tensor(dur),
                       'pitch': torch.tensor(pitch),
                       'energy': torch.tensor(energy)})

    jout = jmodel.apply(variables, {
        'x': jnp.asarray(x, jnp.int32),
        'mel': jnp.asarray(mel.transpose(0, 2, 1)),
        'mel_len': jnp.asarray(mel_lens),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(pitch),
        'energy': jnp.asarray(energy)}, train=False)

    np.testing.assert_allclose(np.asarray(jout['dur']),
                               tout['dur'].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout['pitch']),
                               tout['pitch'].numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout['energy']),
                               tout['energy'].numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout['mel']).transpose(0, 2, 1),
                               tout['mel'].numpy(), atol=1e-4)


def test_fast_pitch_generate_parity(models):
    import torch
    import jax.numpy as jnp
    tmodel, jmodel, variables = models
    rng = np.random.RandomState(2)
    Tx_true = 7
    x_true = rng.randint(1, 49, size=(1, Tx_true))
    with torch.no_grad():
        tgen = tmodel.generate(torch.tensor(x_true, dtype=torch.long))
    t_mel = tgen['mel_post'].numpy()[0]
    t_len = t_mel.shape[1]

    Tx_pad = 12
    x_pad = np.zeros((1, Tx_pad), dtype=np.int32)
    x_pad[0, :Tx_true] = x_true
    jgen = jmodel.apply(variables, jnp.asarray(x_pad), 32,
                        method='generate', x_len=jnp.asarray([Tx_true]))
    j_len = int(jgen['mel_len'][0])
    assert j_len == t_len
    j_mel = np.asarray(jgen['mel_post'])[0, :j_len].T
    err = np.abs(j_mel - t_mel).mean()
    assert err < 1e-3, f'fastpitch generate mel L1: {err}'
