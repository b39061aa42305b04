"""Teacher-free pipeline CLI test: preprocess -> train_aligner ->
train_forward, no Tacotron teacher anywhere. The aligner must produce
the same artifact contract the teacher does (alg/ + att_score_dict.pkl
+ phon_pitch/ + phon_energy/) so the forward student trains unchanged.
"""
import pytest  # noqa: E402
import wave
from pathlib import Path

import numpy as np
import yaml

from tests.test_pipeline_e2e import (TEXTS, _run, _tiny_config,
                                     _write_speechlike_wav)


def test_aligner_pipeline_cli(tmp_path):
    sr = 22050
    corpus = tmp_path / 'corpus'
    wavs = corpus / 'wavs'
    wavs.mkdir(parents=True)
    with open(corpus / 'metadata.csv', 'w') as f:
        for i, text in enumerate(TEXTS):
            item = f'syn{i:03d}'
            _write_speechlike_wav(wavs / f'{item}.wav', sr,
                                  seconds=0.45 + 0.05 * i,
                                  f0=110 + 15 * i, seed=i)
            f.write(f'{item}|{text}|{text}\n')

    config = _tiny_config(tmp_path)
    cfg = yaml.safe_load(open(config))
    cfg['aligner'] = {
        'model': {'embed_dims': 16, 'conv_dims': 16, 'key_dims': 8,
                  'n_text_convs': 1, 'n_mel_convs': 1, 'dropout': 0.0,
                  'prior_width': 10.0},
        'training': {'schedule': ['1e-3, 4, 4'], 'max_mel_len': 1250,
                     'clip_grad_norm': 1.0, 'checkpoint_every': 4},
    }
    yaml.safe_dump(cfg, open(config, 'w'))
    data = tmp_path / 'data'

    _run(tmp_path, 'preprocess.py', '--path', str(corpus),
         '--config', str(config))

    # aligner trains a few steps, then extracts the full artifact set
    _run(tmp_path, 'train_aligner.py', '--config', str(config))
    ckpt = (tmp_path / 'checkpoints' / 'ljspeech_tts.aligner'
            / 'latest_model.fjax')
    assert ckpt.is_file()
    assert (data / 'att_score_dict.pkl').is_file()
    for item in ('syn000', 'syn007'):
        dur = np.load(data / 'alg' / f'{item}.npy')
        mel = np.load(data / 'mel' / f'{item}.npy')
        pitch = np.load(data / 'phon_pitch' / f'{item}.npy')
        energy = np.load(data / 'phon_energy' / f'{item}.npy')
        assert int(dur.sum()) == mel.shape[-1]     # student invariant
        assert (dur >= 0).all()
        assert pitch.shape == dur.shape == energy.shape
        assert np.isfinite(pitch).all() and np.isfinite(energy).all()

    # --force_align re-extracts from the checkpoint without retraining
    _run(tmp_path, 'train_aligner.py', '--config', str(config),
         '--force_align')

    # the forward student consumes the aligner's features unchanged
    _run(tmp_path, 'train_forward.py', '--config', str(config))
    fwd = (tmp_path / 'checkpoints' / 'ljspeech_tts.forward'
           / 'latest_model.fjax')
    assert fwd.is_file()

    # and synthesis works off the student checkpoint
    _run(tmp_path, 'gen_forward.py', '--config', str(config),
         '--input_text', 'hello world', 'griffinlim')
    outs = list((tmp_path / 'model_outputs').glob('*.wav'))
    assert len(outs) == 1
    with wave.open(str(outs[0]), 'rb') as f:
        assert f.getnframes() > 1000


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
