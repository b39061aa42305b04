"""Canonical on-disk layout.

Parity surface: utils/paths.py:5-46 in the reference. The data
sub-directories (quant/mel/gta/alg/raw_pitch/phon_pitch/phon_energy) and
checkpoint directories are kept identical so preprocessed datasets are
drop-in compatible. Checkpoints use the `.fjax` suffix (flax pytrees)
instead of torch `.pt`, but live in the same directories.
"""
from __future__ import annotations

import os
from pathlib import Path


class Paths:

    def __init__(self, data_path: str, voc_id: str, tts_id: str,
                 base: str | Path | None = None) -> None:
        if base is None:
            # FTT_BASE relocates checkpoints/ and model_output/ (the
            # dirs rooted at the repo by default) without touching the
            # CLI surface — used by hermetic tests and deployments that
            # keep the install dir read-only.
            base = os.environ.get('FTT_BASE') or None
        self.base = Path(base).expanduser().resolve() if base is not None \
            else Path(__file__).parent.parent.parent.expanduser().resolve()

        self.data = Path(data_path).expanduser().resolve()
        self.quant = self.data / 'quant'
        self.mel = self.data / 'mel'
        self.gta = self.data / 'gta'
        self.alg = self.data / 'alg'
        self.raw_pitch = self.data / 'raw_pitch'
        self.phon_pitch = self.data / 'phon_pitch'
        self.phon_energy = self.data / 'phon_energy'

        self.model_output = self.base / 'model_output'

        self.voc_checkpoints = self.base / 'checkpoints' / f'{voc_id}.wavernn'
        self.voc_top_k = self.voc_checkpoints / 'top_k_models'
        self.voc_log = self.voc_checkpoints / 'logs'

        self.taco_checkpoints = self.base / 'checkpoints' / f'{tts_id}.tacotron'
        self.taco_top_k = self.taco_checkpoints / 'top_k_models'
        self.taco_log = self.taco_checkpoints / 'logs'

        self.forward_checkpoints = self.base / 'checkpoints' / f'{tts_id}.forward'
        self.forward_top_k = self.forward_checkpoints / 'top_k_models'
        self.forward_log = self.forward_checkpoints / 'logs'

        # beyond the reference: the adversarial HiFi-GAN vocoder trainer
        self.hifigan_checkpoints = self.base / 'checkpoints' / f'{voc_id}.hifigan'
        self.hifigan_top_k = self.hifigan_checkpoints / 'top_k_models'
        self.hifigan_log = self.hifigan_checkpoints / 'logs'

        # beyond the reference: the teacher-free neural aligner
        self.aligner_checkpoints = (self.base / 'checkpoints'
                                    / f'{tts_id}.aligner')
        self.aligner_log = self.aligner_checkpoints / 'logs'

        self.create_paths()

    def create_paths(self) -> None:
        for p in [self.data, self.quant, self.mel, self.gta, self.alg,
                  self.raw_pitch, self.phon_pitch, self.phon_energy,
                  self.voc_checkpoints, self.voc_top_k, self.voc_log,
                  self.taco_checkpoints, self.taco_top_k, self.taco_log,
                  self.forward_checkpoints, self.forward_top_k,
                  self.forward_log, self.hifigan_checkpoints,
                  self.hifigan_top_k, self.hifigan_log,
                  self.aligner_checkpoints, self.aligner_log]:
            os.makedirs(p, exist_ok=True)
