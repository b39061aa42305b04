"""Validate published reference checkpoints against the mel-L1 gate.

BASELINE.json's parity gate: converted reference checkpoints
(README.md:133-134 `forward_step90k.pt` / `wave_step575k.pt`) must
produce mels within L1 < 1e-3 of the reference torch implementation on
the same token ids. The converters are bit-parity-tested against
random-init reference models (tests/test_forward_tacotron_parity.py,
tests/test_wavernn_parity.py); this script closes the loop on the REAL
published weights the day they are available (the build image has zero
egress, so they cannot be fetched here).

Usage:
  python verify_pretrained.py --checkpoint forward_step90k.pt \
      [--voc_checkpoint wave_step575k.pt] [--sentences sentences.txt] \
      [--reference /root/reference] [--threshold 1e-3]

What it does:
  1. converts the torch `.pt` through this framework's loaders
     (utils/checkpoints.py load_tts_checkpoint / load_voc_checkpoint);
  2. rebuilds the reference torch model from the same file (the
     reference repo must be importable, --reference path);
  3. tokenizes each test sentence ONCE with the frozen symbol table
     (identical ids both sides, sidestepping espeak availability) and
     synthesizes mels with both implementations;
  4. reports per-sentence and aggregate mel L1 and the PASS/FAIL gate;
  5. for the vocoder: teacher-forced forward parity (deterministic
     logits max-abs-diff — sampling is stochastic, so logits are the
     meaningful gate).

Exit code 0 iff every gate passes. Prints one JSON line at the end.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

DEFAULT_SENTENCES = [
    'President Trump met with other leaders at the Group of twenty '
    'conference.',
    'Scientists at the CERN laboratory say they have discovered a new '
    'particle.',
    'The Senate\'s bill to repeal and replace the Affordable Care Act '
    'is now imperiled.',
]


def _load_sentences(path):
    if path is None:
        return DEFAULT_SENTENCES
    lines = Path(path).read_text().splitlines()
    return [ln.strip() for ln in lines if ln.strip()]


def _stub_reference_audio_deps():
    """The reference's utils/dsp.py imports librosa/webrtcvad/soundfile,
    which may be absent; the model classes only need the namespaces."""
    import types
    if not hasattr(np, 'cumproduct'):      # removed in numpy 2.x
        np.cumproduct = np.cumprod
    for name in ('librosa', 'webrtcvad', 'soundfile'):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == 'librosa':
                    mod.load = None
                    mod.stft = None
                sys.modules[name] = mod


def verify_tts(checkpoint: str, reference: str, sentences,
               threshold: float) -> dict:
    import torch
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.checkpoints import load_tts_checkpoint
    # our repo root must shadow the reference repo (both have a
    # gen_forward.py); import ours before the reference goes on the path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from gen_forward import synthesize

    model, variables, config, step = load_tts_checkpoint(checkpoint)

    sys.path.insert(1, str(reference))
    model_type = config.get('tts_model', 'forward_tacotron')
    if model_type == 'forward_tacotron':
        from models.forward_tacotron import ForwardTacotron as TorchModel
    else:
        from models.fast_pitch import FastPitch as TorchModel
    tmodel = TorchModel.from_checkpoint(checkpoint)
    tmodel.eval()

    cleaner = Cleaner.from_config(config)
    tokenizer = Tokenizer()

    results = []
    for text in sentences:
        ids = tokenizer(cleaner(text))
        x_t = torch.tensor(ids, dtype=torch.long).unsqueeze(0)
        with torch.no_grad():
            ref = tmodel.generate(x_t)
        ref_mel = np.asarray(ref['mel_post'].squeeze(0).cpu())  # (M, T)

        our_mel, _dur = synthesize(model, variables, ids, alpha=1.0,
                                   amp=1.0)
        t = min(ref_mel.shape[-1], our_mel.shape[-1])
        l1 = float(np.mean(np.abs(ref_mel[:, :t] - our_mel[:, :t])))
        results.append({'text': text[:48], 'mel_l1': l1,
                        'ref_frames': int(ref_mel.shape[-1]),
                        'our_frames': int(our_mel.shape[-1])})

    agg = float(np.mean([r['mel_l1'] for r in results]))
    len_ok = all(r['ref_frames'] == r['our_frames'] for r in results)
    return {'tts_step': step, 'sentences': results, 'tts_mel_l1': agg,
            'tts_lengths_match': len_ok,
            'tts_pass': bool(agg < threshold and len_ok)}


def verify_voc(voc_checkpoint: str, reference: str,
               threshold: float) -> dict:
    import torch
    from forwardtacotron_tpu.utils.checkpoints import load_voc_checkpoint

    model, variables, config, step = load_voc_checkpoint(voc_checkpoint)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    sys.path.insert(1, str(reference))
    _stub_reference_audio_deps()
    from models.fatchord_version import WaveRNN as TorchWaveRNN
    ckpt = torch.load(voc_checkpoint, map_location='cpu',
                      weights_only=False)
    tmodel = TorchWaveRNN.from_config(ckpt['config'])
    tmodel.load_state_dict(ckpt['model'])
    tmodel.eval()

    # teacher-forced forward logits: deterministic parity surface
    rng = np.random.RandomState(0)
    frames = 12
    hop = model.hop_length
    n_samples = (frames - 2 * model.pad) * hop
    mel = rng.randn(1, model.feat_dims, frames).astype(np.float32) * 2 - 8
    x = rng.uniform(-1, 1, size=(1, n_samples)).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.tensor(x),
                            torch.tensor(mel)).numpy()

    import jax.numpy as jnp
    ours = np.asarray(model.apply(
        variables, jnp.asarray(x), jnp.asarray(mel.transpose(0, 2, 1))))
    diff = float(np.max(np.abs(ours - ref_logits)))
    return {'voc_step': step, 'voc_logits_max_diff': diff,
            'voc_pass': bool(diff < threshold)}


def main() -> None:
    p = argparse.ArgumentParser(
        description='Verify published reference checkpoints (mel-L1 gate)')
    p.add_argument('--checkpoint', type=str, default=None,
                   help='reference TTS .pt (e.g. forward_step90k.pt)')
    p.add_argument('--voc_checkpoint', type=str, default=None,
                   help='reference WaveRNN .pt (e.g. wave_step575k.pt)')
    p.add_argument('--sentences', type=str, default=None,
                   help='text file, one test sentence per line')
    p.add_argument('--reference', type=str, default='/root/reference',
                   help='path to the reference repo (torch implementation)')
    p.add_argument('--threshold', type=float, default=1e-3,
                   help='mel-L1 / logits gate (BASELINE.json: 1e-3)')
    args = p.parse_args()
    if not args.checkpoint and not args.voc_checkpoint:
        p.error('need --checkpoint and/or --voc_checkpoint')
    if not Path(args.reference).exists():
        p.error(f'reference repo not found at {args.reference}')

    out = {'threshold': args.threshold}
    ok = True
    if args.checkpoint:
        out.update(verify_tts(args.checkpoint, args.reference,
                              _load_sentences(args.sentences),
                              args.threshold))
        ok &= out['tts_pass']
    if args.voc_checkpoint:
        out.update(verify_voc(args.voc_checkpoint, args.reference,
                              args.threshold))
        ok &= out['voc_pass']
    out['pass'] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
