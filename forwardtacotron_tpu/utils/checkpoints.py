"""Checkpoint save/restore.

Parity surface: utils/checkpoints.py:12-40 in the reference — one file
holding {'model', 'optim', 'config'} plus the training step, with the
config embedded so inference scripts can rebuild models without the yaml
(gen_forward.py:19-27). Here 'model' is the flax variables pytree
({params, batch_stats}) and 'optim' the optax state leaves; arrays are
device_get numpy, serialized with pickle into a single `.fjax` file.

`load_tts_checkpoint` also accepts reference torch `.pt` files and
converts them on the fly (models/torch_compat.py), so pretrained
reference checkpoints are drop-in.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Tuple, Union

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(variables: Dict[str, Any],
                    config: Dict[str, Any],
                    path: Union[str, Path],
                    opt_state: Any = None,
                    step: int = 0) -> None:
    payload = {
        'model': _to_numpy(variables),
        'optim': None if opt_state is None else jax.tree.flatten(
            _to_numpy(opt_state))[0],
        'config': config,
        'step': int(step),
        'format': 'forwardtacotron_tpu.v1',
    }
    path = Path(path)
    tmp = path.with_suffix(path.suffix + '.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    tmp.replace(path)


def restore_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    with open(str(path), 'rb') as f:
        return pickle.load(f)


def restore_opt_state(payload: Dict[str, Any], opt_state_template):
    """Rebuild an optax state pytree from stored leaves."""
    if payload.get('optim') is None:
        return opt_state_template
    leaves, treedef = jax.tree.flatten(opt_state_template)
    restored = payload['optim']
    if len(restored) != len(leaves):
        raise ValueError('Optimizer state in checkpoint does not match '
                         f'({len(restored)} vs {len(leaves)} leaves)')
    cast = [np.asarray(r).astype(np.asarray(l).dtype).reshape(np.shape(l))
            for r, l in zip(restored, leaves)]
    return jax.tree.unflatten(treedef, cast)


def init_tts_model(config: Dict[str, Any]):
    """Model registry dispatch (reference utils/checkpoints.py:32-40)."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    model_type = config.get('tts_model', 'forward_tacotron')
    if model_type == 'forward_tacotron':
        return ForwardTacotron.from_config(config)
    if model_type == 'fast_pitch':
        from forwardtacotron_tpu.models.fast_pitch import FastPitch
        return FastPitch.from_config(config)
    raise ValueError(f'Model type not supported: {model_type}')


def load_tts_checkpoint(path: Union[str, Path]
                        ) -> Tuple[Any, Dict[str, Any], Dict[str, Any], int]:
    """Universal TTS checkpoint loader -> (model, variables, config, step).

    Accepts this framework's `.fjax` pickles and reference torch `.pt`
    checkpoints (converted via torch_compat).
    """
    path = Path(path)
    if path.suffix == '.pt':
        import torch
        checkpoint = torch.load(str(path), map_location='cpu',
                                weights_only=False)
        config = checkpoint['config']
        model_type = config.get('tts_model', 'forward_tacotron')
        if model_type == 'forward_tacotron':
            from forwardtacotron_tpu.models.torch_compat import (
                convert_forward_tacotron)
            variables, step = convert_forward_tacotron(
                checkpoint['model'], config['forward_tacotron']['model'])
        elif model_type == 'fast_pitch':
            from forwardtacotron_tpu.models.torch_compat import (
                convert_fast_pitch)
            variables, step = convert_fast_pitch(
                checkpoint['model'], config['fast_pitch']['model'])
        else:
            raise ValueError(f'Cannot convert model type: {model_type}')
    else:
        payload = restore_checkpoint(path)
        config = payload['config']
        variables = payload['model']
        step = payload.get('step', 0)
    model = init_tts_model(config)
    return model, variables, config, step


def load_voc_checkpoint(path: Union[str, Path]
                        ) -> Tuple[Any, Dict[str, Any], Dict[str, Any], int]:
    """WaveRNN checkpoint loader -> (model, variables, config, step);
    accepts `.fjax` and reference torch `.pt`."""
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    path = Path(path)
    if path.suffix == '.pt':
        import torch
        from forwardtacotron_tpu.models.torch_compat import convert_wavernn
        checkpoint = torch.load(str(path), map_location='cpu',
                                weights_only=False)
        config = checkpoint['config']
        variables, step = convert_wavernn(checkpoint['model'],
                                          config['vocoder']['model'])
    else:
        payload = restore_checkpoint(path)
        config = payload['config']
        variables = payload['model']
        step = payload.get('step', 0)
    model = WaveRNN.from_config(config)
    return model, variables, config, step
