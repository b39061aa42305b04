"""DeepMind coarse/fine WaveRNN: shape/consistency tests + parity of the
teacher-forced cell vs the torch reference."""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path('/root/reference')

CFG = dict(hidden_size=32, quantisation=16)


def test_generate_shapes_and_signal_roundtrip():
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.deepmind_wavernn import (
        DeepMindWaveRNN, combine_signal, split_signal)
    model = DeepMindWaveRNN(**CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                           jnp.zeros((1, model.hidden_size)),
                           jnp.zeros((1, 1)))
    coarse, fine = model.apply(variables, 20, jax.random.PRNGKey(1),
                               method='generate')
    assert coarse.shape == (1, 20) and fine.shape == (1, 20)
    assert int(coarse.max()) < CFG['quantisation']

    sig = np.linspace(-1, 1, 17)
    c, f = split_signal(sig)
    rec = combine_signal(c, f)
    np.testing.assert_allclose(rec, sig, atol=1e-4)


@pytest.mark.skipif(not REFERENCE.exists(), reason='no reference repo')
def test_cell_parity_vs_torch():
    import torch
    import jax.numpy as jnp
    sys.path.insert(0, str(REFERENCE))
    from models.deepmind_version import WaveRNN as TorchDM
    from forwardtacotron_tpu.models.deepmind_wavernn import DeepMindWaveRNN

    torch.manual_seed(0)
    tmodel = TorchDM(hidden_size=CFG['hidden_size'],
                     quantisation=CFG['quantisation'])
    tmodel.eval()

    def t2j(name):
        return jnp.asarray(dict(tmodel.named_parameters())[name]
                           .detach().numpy())

    params = {
        'R': {'kernel': t2j('R.weight').T},
        'O1': {'kernel': t2j('O1.weight').T, 'bias': t2j('O1.bias')},
        'O2': {'kernel': t2j('O2.weight').T, 'bias': t2j('O2.bias')},
        'O3': {'kernel': t2j('O3.weight').T, 'bias': t2j('O3.bias')},
        'O4': {'kernel': t2j('O4.weight').T, 'bias': t2j('O4.bias')},
        'I_coarse': {'kernel': t2j('I_coarse.weight').T},
        'I_fine': {'kernel': t2j('I_fine.weight').T},
        'bias_u': t2j('bias_u'),
        'bias_r': t2j('bias_r'),
        'bias_e': t2j('bias_e'),
    }
    rng = np.random.RandomState(0)
    B = 3
    prev_y = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
    hidden = rng.randn(B, CFG['hidden_size']).astype(np.float32)
    cur_c = rng.uniform(-1, 1, (B, 1)).astype(np.float32)

    with torch.no_grad():
        t_c, t_f, t_h = tmodel(torch.tensor(prev_y), torch.tensor(hidden),
                               torch.tensor(cur_c))

    jmodel = DeepMindWaveRNN(**CFG)
    j_c, j_f, j_h = jmodel.apply({'params': params}, jnp.asarray(prev_y),
                                 jnp.asarray(hidden), jnp.asarray(cur_c))
    np.testing.assert_allclose(np.asarray(j_c), t_c.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_f), t_f.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=1e-5)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
