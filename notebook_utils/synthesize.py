"""One-class inference API (parity: notebook_utils/synthesize.py in the
reference). Combines a TTS checkpoint with WaveRNN / Griffin-Lim
vocoders; the torch.hub MelGAN path is replaced by mel export (no
network access in the TPU image) — pass voc_model='melgan' to get the
mel array to feed an external MelGAN."""
from __future__ import annotations

from typing import Optional

import numpy as np

from forwardtacotron_tpu.dsp.audio import DSP
from forwardtacotron_tpu.text.cleaners import Cleaner
from forwardtacotron_tpu.text.tokenizer import Tokenizer
from forwardtacotron_tpu.utils.checkpoints import (load_tts_checkpoint,
                                                   load_voc_checkpoint)


class Synthesizer:

    def __init__(self, tts_path: str, voc_path: Optional[str] = None,
                 hifigan_path: Optional[str] = None,
                 melgan_path: Optional[str] = None):
        self.tts_model, self.tts_variables, tts_config, _ = \
            load_tts_checkpoint(tts_path)
        self.voc_model = self.voc_variables = None
        if voc_path is not None:
            self.voc_model, self.voc_variables, _, _ = \
                load_voc_checkpoint(voc_path)
        self.hifigan_model = self.hifigan_variables = None
        if hifigan_path is not None:
            from forwardtacotron_tpu.models.hifigan import load_hifigan
            self.hifigan_model, self.hifigan_variables = \
                load_hifigan(hifigan_path)
        self.melgan_model = self.melgan_variables = None
        if melgan_path is not None:
            from forwardtacotron_tpu.models.melgan import load_melgan
            self.melgan_model, self.melgan_variables = \
                load_melgan(melgan_path)
        self.cleaner = Cleaner.from_config(tts_config)
        self.tokenizer = Tokenizer()
        self.dsp = DSP.from_config(tts_config)

    def __call__(self, text: str, voc_model: str = 'griffinlim',
                 alpha: float = 1.0, pitch_scale: float = 1.0,
                 energy_scale: float = 1.0, speaker: int = 0) -> np.ndarray:
        from gen_forward import synthesize
        ids = self.tokenizer(self.cleaner(text))
        mel_post, _ = synthesize(self.tts_model, self.tts_variables, ids,
                                 alpha, pitch_scale,
                                 energy_scale=energy_scale, speaker=speaker)
        if voc_model == 'griffinlim':
            return self.dsp.griffinlim(mel_post, n_iter=32)
        if voc_model == 'wavernn':
            assert self.voc_model is not None, 'no WaveRNN loaded'
            from forwardtacotron_tpu.models.wavernn import generate_wav
            return generate_wav(self.voc_model, self.voc_variables,
                                mel_post, batched=True, target=None,
                                overlap=550, mu_law=self.dsp.mu_law)
        if voc_model == 'hifigan' and self.hifigan_model is not None:
            from forwardtacotron_tpu.models.hifigan import vocode_hifigan
            return vocode_hifigan(self.hifigan_model,
                                  self.hifigan_variables, mel_post)
        if voc_model == 'melgan' and self.melgan_model is not None:
            from forwardtacotron_tpu.models.melgan import vocode_melgan
            return vocode_melgan(self.melgan_model,
                                 self.melgan_variables, mel_post)
        return mel_post  # 'melgan'/'hifigan' w/o generator: export mel
