"""Reverse checkpoint export (models/torch_export.py): flax variables ->
reference-format torch `.pt`.

The strongest possible gate, run against the ACTUAL reference modules:
for each architecture, take a random-init reference torch model,
convert its state_dict into flax variables with the (parity-proven)
forward converters, export those variables back with torch_export, and
require (a) `load_state_dict(..., strict=True)` on the reference module
succeeds — proving the full key set incl. buffers — and (b) every
tensor round-trips bit-exactly. If these pass, any model trained in
this framework deploys on the reference runtime unchanged
(/root/reference/gen_forward.py:19-38 loads it like its own file).

Skipped when the reference repo is not mounted.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path('/root/reference')
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference repo not available')

from tests.test_forward_tacotron_parity import TINY_CFG as FWD_CFG
from tests.test_fast_pitch_parity import TINY_CFG as FP_CFG
from tests.test_tacotron_parity import TINY_CFG as TACO_CFG
from tests.test_wavernn_parity import TINY as VOC_CFG, _stub_audio_deps


def _randomize_bn(tmodel):
    import torch
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)


def _assert_state_dicts_equal(sd0, sd1):
    import torch
    assert set(sd0.keys()) == set(sd1.keys())
    for k in sd0:
        a, b = sd0[k], sd1[k]
        assert a.shape == b.shape, k
        assert a.dtype == b.dtype, k
        assert torch.equal(a, b), f'tensor mismatch at {k}'


def test_forward_tacotron_export_round_trip():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron)
    from forwardtacotron_tpu.models.torch_export import (
        export_forward_tacotron)

    torch.manual_seed(0)
    tmodel = TorchFT(num_chars=120, **FWD_CFG)
    _randomize_bn(tmodel)
    with torch.no_grad():
        tmodel.step += 123
    sd0 = tmodel.state_dict()

    variables, step = convert_forward_tacotron(sd0, FWD_CFG)
    assert step == 123
    sd1 = export_forward_tacotron(variables, FWD_CFG, step=step)
    tmodel.load_state_dict(sd1)  # strict: full key set incl. buffers
    _assert_state_dicts_equal(sd0, sd1)


def test_fast_pitch_export_round_trip():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.fast_pitch import FastPitch as TorchFP
    from forwardtacotron_tpu.models.torch_compat import convert_fast_pitch
    from forwardtacotron_tpu.models.torch_export import export_fast_pitch

    torch.manual_seed(1)
    tmodel = TorchFP(num_chars=120, **FP_CFG)
    with torch.no_grad():
        tmodel.step += 7
    sd0 = tmodel.state_dict()

    variables, step = convert_fast_pitch(sd0, FP_CFG)
    assert step == 7
    sd1 = export_fast_pitch(variables, FP_CFG, step=step)
    tmodel.load_state_dict(sd1)
    # includes the recomputed positional-encoding buffers ('...pe')
    _assert_state_dicts_equal(sd0, sd1)


def test_tacotron_export_round_trip():
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.tacotron import Tacotron as TorchTaco
    from forwardtacotron_tpu.models.torch_compat import convert_tacotron
    from forwardtacotron_tpu.models.torch_export import export_tacotron

    torch.manual_seed(2)
    tmodel = TorchTaco(num_chars=40, n_mels=80, **TACO_CFG)
    _randomize_bn(tmodel)
    tmodel.r = 2
    with torch.no_grad():
        tmodel.step += 55
    sd0 = tmodel.state_dict()

    variables, step = convert_tacotron(sd0, TACO_CFG)
    assert step == 55
    sd1 = export_tacotron(variables, TACO_CFG, step=step, r=2)
    tmodel.load_state_dict(sd1)
    _assert_state_dicts_equal(sd0, sd1)


def test_wavernn_export_round_trip():
    import torch
    _stub_audio_deps()
    sys.path.insert(0, str(REFERENCE))
    from models.fatchord_version import WaveRNN as TorchWaveRNN
    from forwardtacotron_tpu.models.torch_compat import convert_wavernn
    from forwardtacotron_tpu.models.torch_export import export_wavernn

    torch.manual_seed(3)
    cfg = dict(VOC_CFG)
    cfg['upsample_factors'] = list(cfg['upsample_factors'])
    tmodel = TorchWaveRNN(**cfg)
    _randomize_bn(tmodel)
    with torch.no_grad():
        tmodel.step += 999
    sd0 = tmodel.state_dict()

    variables, step = convert_wavernn(sd0, cfg)
    assert step == 999
    sd1 = export_wavernn(variables, cfg, step=step)
    tmodel.load_state_dict(sd1)
    _assert_state_dicts_equal(sd0, sd1)


def test_save_torch_checkpoint_end_to_end(tmp_path):
    """Full circle through the file format: our `.fjax`-style payload ->
    reference `.pt` -> back in through our own torch-aware loader, with
    family auto-detection."""
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    import jax
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron, load_torch_forward_checkpoint)
    from forwardtacotron_tpu.models.torch_export import (
        detect_family, save_torch_checkpoint)

    torch.manual_seed(4)
    tmodel = TorchFT(num_chars=120, **FWD_CFG)
    _randomize_bn(tmodel)
    variables, _ = convert_forward_tacotron(tmodel.state_dict(), FWD_CFG)
    assert detect_family(variables) == 'forward_tacotron'

    config = {'tts_model': 'forward_tacotron',
              'forward_tacotron': {'model': dict(FWD_CFG)}}
    out = tmp_path / 'exported.pt'
    family = save_torch_checkpoint(variables, config, out, step=42)
    assert family == 'forward_tacotron'

    payload = torch.load(out, map_location='cpu', weights_only=False)
    assert set(payload.keys()) == {'model', 'optim', 'config'}
    assert payload['config']['tts_model'] == 'forward_tacotron'
    tmodel.load_state_dict(payload['model'])
    assert tmodel.get_step() == 42

    # and our own .pt loader accepts the exported file
    variables2, config2, step2 = load_torch_forward_checkpoint(out)
    assert step2 == 42
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(variables2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multispeaker_export_rejected():
    from forwardtacotron_tpu.models.torch_export import (
        export_forward_tacotron)
    variables = {'params': {'speaker_embedding': {'embedding':
                                                  np.zeros((2, 4))}},
                 'batch_stats': {}}
    with pytest.raises(ValueError, match='multi-speaker'):
        export_forward_tacotron(variables, {}, step=0)


def test_ema_weights_selected(tmp_path):
    """use_ema=True exports the smoothed copy when present."""
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron)
    from forwardtacotron_tpu.models.torch_export import (
        export_forward_tacotron)
    import jax

    torch.manual_seed(5)
    tmodel = TorchFT(num_chars=120, **FWD_CFG)
    variables, _ = convert_forward_tacotron(tmodel.state_dict(), FWD_CFG)
    ema = jax.tree.map(lambda x: np.asarray(x) * 0.5, variables['params'])
    variables['ema_params'] = ema

    sd_ema = export_forward_tacotron(variables, FWD_CFG, step=0,
                                     use_ema=True)
    sd_raw = export_forward_tacotron(variables, FWD_CFG, step=0,
                                     use_ema=False)
    w_ema = sd_ema['lin.weight'].numpy()
    w_raw = sd_raw['lin.weight'].numpy()
    np.testing.assert_allclose(w_ema, w_raw * 0.5, rtol=1e-6)


def test_hifigan_export_official_format(tmp_path):
    """TPU-side HiFi-GAN params -> the OFFICIAL weight-normed
    {'generator': sd} file: strict-loads into a weight-normed torch
    generator and reproduces identical audio."""
    import torch
    from tests.test_hifigan import TINY, _TorchGenerator
    from forwardtacotron_tpu.models.hifigan import (HiFiGANGenerator,
                                                    convert_hifigan_generator)
    from forwardtacotron_tpu.models.torch_export import (
        detect_family, export_hifigan_generator, save_hifigan_checkpoint)
    import jax
    import jax.numpy as jnp

    torch.manual_seed(6)
    n_mels = 12
    tmodel = _TorchGenerator(TINY, n_mels=n_mels).eval()
    model = HiFiGANGenerator.from_config(TINY)
    sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_hifigan_generator(sd0, model)
    assert detect_family(variables) == 'hifigan'

    sd1 = export_hifigan_generator(variables, model)
    tmodel2 = _TorchGenerator(TINY, n_mels=n_mels).eval()
    tmodel2.load_state_dict(sd1)  # strict: full weight-norm key set

    mel = np.random.RandomState(7).randn(1, n_mels, 9).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel))[:, 0].numpy()
        got = tmodel2(torch.from_numpy(mel))[:, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)

    # file-format circle: write the official file, read it back through
    # our own official-format loader
    import json
    p = tmp_path / 'g_02500000'
    save_hifigan_checkpoint(variables, model, p)
    payload = torch.load(p, map_location='cpu', weights_only=False)
    assert set(payload.keys()) == {'generator'}
    with open(tmp_path / 'config.json', 'w') as f:
        json.dump(dict(TINY, num_mels=n_mels), f)
    from forwardtacotron_tpu.models.hifigan import load_hifigan
    model2, variables2 = load_hifigan(p)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(variables2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_export_torch_cli(tmp_path):
    """tools/export_torch.py end to end as a subprocess: tiny .fjax in,
    reference-format .pt out, auto-detected family."""
    import subprocess
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron)
    from forwardtacotron_tpu.utils.checkpoints import save_checkpoint

    torch.manual_seed(8)
    tmodel = TorchFT(num_chars=120, **FWD_CFG)
    variables, _ = convert_forward_tacotron(tmodel.state_dict(), FWD_CFG)
    config = {'tts_model': 'forward_tacotron',
              'forward_tacotron': {'model': dict(FWD_CFG)}}
    ck = tmp_path / 'tiny.fjax'
    save_checkpoint(variables, config, ck, step=11)

    repo = Path(__file__).parent.parent
    out = tmp_path / 'tiny.pt'
    proc = subprocess.run(
        [sys.executable, str(repo / 'tools' / 'export_torch.py'),
         '--checkpoint', str(ck), '--out', str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert 'forward_tacotron' in proc.stdout
    payload = torch.load(out, map_location='cpu', weights_only=False)
    tmodel.load_state_dict(payload['model'])
    assert tmodel.get_step() == 11
