"""verify_pretrained.py exercised end-to-end with synthetic-made `.pt`
checkpoints (the published forward_step90k.pt / wave_step575k.pt are
not fetchable in a zero-egress image; this proves the gate machinery
so the real files can be validated the day they're available)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path('/root/reference')
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference repo not available')

TTS_CFG = {
    'embed_dims': 16, 'series_embed_dims': 8,
    'durpred_conv_dims': 8, 'durpred_rnn_dims': 4, 'durpred_dropout': 0.5,
    'pitch_conv_dims': 8, 'pitch_rnn_dims': 4, 'pitch_dropout': 0.5,
    'pitch_strength': 1.0,
    'energy_conv_dims': 8, 'energy_rnn_dims': 4, 'energy_dropout': 0.5,
    'energy_strength': 1.0,
    'rnn_dims': 8, 'prenet_dims': 8, 'prenet_k': 2,
    'postnet_num_highways': 1, 'prenet_dropout': 0.5,
    'postnet_dims': 8, 'postnet_k': 2, 'prenet_num_highways': 1,
    'postnet_dropout': 0.0,
}

DSP_CFG = {'sample_rate': 22050, 'n_fft': 256, 'num_mels': 20,
           'hop_length': 64, 'win_length': 256, 'fmin': 0, 'fmax': 8000,
           'peak_norm': False, 'trim_start_end_silence': False,
           'trim_silence_top_db': 60, 'pitch_max_freq': 600,
           'trim_long_silences': False, 'vad_window_length': 30,
           'vad_moving_average_width': 8, 'vad_max_silence_length': 12,
           'vad_sample_rate': 16000, 'voc_mode': 'RAW', 'bits': 9,
           'mu_law': True}


@pytest.fixture(scope='module')
def tts_pt(tmp_path_factory):
    import torch
    sys.path.insert(0, str(REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT

    config = {
        'tts_model': 'forward_tacotron',
        'forward_tacotron': {'model': dict(TTS_CFG)},
        'dsp': dict(DSP_CFG),
        'preprocessing': {'language': 'en-us',
                          'cleaner_name': 'english_cleaners',
                          'use_phonemes': True},
    }
    torch.manual_seed(0)
    tmodel = TorchFT.from_config(config)   # mutates model cfg like train
    tmodel.eval()
    # random init predicts ~0 durations; bias them positive so the
    # degenerate-duration path isn't what we're measuring
    tmodel.dur_pred.lin.bias.data.fill_(3.0)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    p = tmp_path_factory.mktemp('verify') / 'forward_step90k.pt'
    torch.save({'model': tmodel.state_dict(), 'config': config,
                'optim': None}, str(p))
    return str(p)


@pytest.fixture(scope='module')
def voc_pt(tmp_path_factory):
    import torch
    sys.path.insert(0, str(REFERENCE))
    import verify_pretrained as vp
    vp._stub_reference_audio_deps()
    from models.fatchord_version import WaveRNN as TorchWaveRNN

    config = {
        'dsp': dict(DSP_CFG, num_mels=10, hop_length=4),
        'vocoder': {'model': {
            'rnn_dims': 16, 'fc_dims': 12, 'pad': 2,
            'upsample_factors': [2, 2], 'compute_dims': 8,
            'res_out_dims': 8, 'res_blocks': 2, 'mode': 'RAW'}},
    }
    torch.manual_seed(0)
    cfg = dict(config['vocoder']['model'])
    cfg.update(bits=config['dsp']['bits'],
               feat_dims=config['dsp']['num_mels'],
               hop_length=config['dsp']['hop_length'],
               sample_rate=config['dsp']['sample_rate'])
    tmodel = TorchWaveRNN(**cfg)
    tmodel.eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    p = tmp_path_factory.mktemp('verify_voc') / 'wave_step575k.pt'
    torch.save({'model': tmodel.state_dict(), 'config': config,
                'optim': None}, str(p))
    return str(p)


def test_verify_tts_gate_passes_on_converted_checkpoint(tts_pt):
    import verify_pretrained as vp
    out = vp.verify_tts(tts_pt, str(REFERENCE),
                        ['Hello world.', 'A longer test sentence, '
                         'with punctuation!'], threshold=1e-3)
    assert out['tts_lengths_match'], out
    assert out['tts_mel_l1'] < 1e-3, out
    assert out['tts_pass'], out


def test_verify_voc_gate_passes_on_converted_checkpoint(voc_pt):
    import verify_pretrained as vp
    out = vp.verify_voc(voc_pt, str(REFERENCE), threshold=1e-3)
    assert out['voc_logits_max_diff'] < 1e-3, out
    assert out['voc_pass'], out


def test_cli_end_to_end(tts_pt):
    import os
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)  # keep the subprocess off TPU
    proc = subprocess.run(
        [sys.executable, 'verify_pretrained.py', '--checkpoint', tts_pt,
         '--reference', str(REFERENCE)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(Path(__file__).parent.parent))
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload['pass'] is True
    assert payload['tts_mel_l1'] < 1e-3
