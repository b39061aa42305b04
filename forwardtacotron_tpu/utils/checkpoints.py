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
                    step: int = 0,
                    backend: str = None) -> None:
    """backend: 'pickle' (default, one `.fjax` file) or 'orbax'
    (a checkpoint DIRECTORY via orbax.checkpoint — the multi-host-safe
    format: every host writes its own shards and restore can lay
    arrays out on a mesh). Auto-selected from the path suffix:
    `.orbax` -> orbax."""
    path = Path(path)
    if backend is None:
        backend = 'orbax' if path.suffix == '.orbax' else 'pickle'
    payload = {
        'model': _to_numpy(variables),
        'optim': None if opt_state is None else jax.tree.flatten(
            _to_numpy(opt_state))[0],
        'config': config,
        'step': int(step),
        'format': 'forwardtacotron_tpu.v1',
    }
    if backend == 'orbax':
        import orbax.checkpoint as ocp
        path = path.absolute()
        arrays = {'model': payload['model']}
        if payload['optim'] is not None:
            arrays['optim'] = payload['optim']
        ckptr = ocp.StandardCheckpointer()
        state_dir = path / 'state'
        if state_dir.exists():
            import shutil
            shutil.rmtree(state_dir)
        ckptr.save(state_dir, arrays)
        ckptr.wait_until_finished()
        with open(path / 'meta.pkl', 'wb') as f:
            pickle.dump({'config': config, 'step': payload['step'],
                         'format': payload['format'],
                         'has_optim': payload['optim'] is not None}, f)
        return
    tmp = path.with_suffix(path.suffix + '.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    tmp.replace(path)


def restore_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    path = Path(path)
    if path.is_dir():  # orbax checkpoint directory
        import orbax.checkpoint as ocp
        with open(path / 'meta.pkl', 'rb') as f:
            meta = pickle.load(f)
        ckptr = ocp.StandardCheckpointer()
        arrays = ckptr.restore((path / 'state').absolute())
        return {'model': arrays['model'],
                'optim': arrays.get('optim'),
                'config': meta['config'], 'step': meta['step'],
                'format': meta['format']}
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


def load_tts_checkpoint(path: Union[str, Path], use_ema: bool = True
                        ) -> Tuple[Any, Dict[str, Any], Dict[str, Any], int]:
    """Universal TTS checkpoint loader -> (model, variables, config, step).

    Accepts this framework's `.fjax` pickles and reference torch `.pt`
    checkpoints (converted via torch_compat). When the checkpoint
    carries EMA weights (training.ema_decay > 0) they are served by
    default — pass use_ema=False for the raw training weights.
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
        ema = variables.pop('ema_params', None) if isinstance(
            variables, dict) else None
        if use_ema and ema is not None:
            variables = dict(variables, params=ema)
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
