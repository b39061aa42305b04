"""Checkpoint inspector: model type, step, parameter counts, and the
embedded config — for any `.fjax`/`.orbax` checkpoint (TTS, WaveRNN,
GAN) or `.ftexp` export artifact.

    python tools/model_info.py checkpoints/ljspeech_tts.forward/latest_model.fjax
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _count(tree) -> int:
    import jax
    import numpy as np
    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree.leaves(tree))


def describe_checkpoint(path: str) -> dict:
    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
    payload = restore_checkpoint(path)
    params = payload['model'].get('params', payload['model'])
    info = {
        'path': str(path),
        'format': payload.get('format', 'unknown'),
        'step': payload.get('step'),
        'tts_model': payload.get('config', {}).get('tts_model'),
        'param_count': _count(params),
        'has_optim': payload.get('optim') is not None,
        'has_ema': payload['model'].get('ema_params') is not None,
        'param_roots': sorted(params)[:12] if hasattr(params, 'keys')
        else None,
    }
    spk = None
    for section in ('forward_tacotron', 'fast_pitch'):
        model_cfg = payload.get('config', {}).get(section, {})
        if isinstance(model_cfg, dict):
            spk = model_cfg.get('model', {}).get('n_speakers', spk)
    if spk:
        info['n_speakers'] = spk
    return info


def describe_artifact(path: str) -> dict:
    from forwardtacotron_tpu.utils.export import ExportedTTS
    exported = ExportedTTS(path)
    return {
        'path': str(path),
        'format': 'ftexp (StableHLO artifact)',
        'meta': exported.meta,
        'buckets': sorted(exported.buckets),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description='Inspect a checkpoint '
                                                 'or export artifact')
    parser.add_argument('path')
    parser.add_argument('--config', action='store_true',
                        help='also dump the embedded config yaml')
    args = parser.parse_args()

    if Path(args.path).suffix == '.ftexp':
        info = describe_artifact(args.path)
        payload = None
    else:
        info = describe_checkpoint(args.path)
        from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
        payload = restore_checkpoint(args.path) if args.config else None

    width = max(len(k) for k in info)
    for k, v in info.items():
        print(f'{k:<{width}}  {v}')
    if payload is not None:
        import yaml
        print('\n--- embedded config ---')
        yaml.safe_dump(payload['config'], sys.stdout,
                       default_flow_style=False)


if __name__ == '__main__':
    main()
