"""Device mesh + sharding rules for multi-chip scaling.

The reference has no distributed training at all (SURVEY.md §2.2: single
process, single device). The TPU-native upgrade path is GSPMD: build a
('data', 'model') `jax.sharding.Mesh`, annotate the batch over 'data'
(pure DP) and the widest parameter matrices over 'model' (TP), jit the
whole train step, and let XLA insert the collectives over ICI.

Tensor-parallel rules (applied when the axis divides evenly):
- Dense/Conv kernels: shard the output-feature (last) axis;
- RNN packed gate matrices w_ih/w_hh (G*H, D): shard the gate axis
  (first); biases follow their matrix's sharded axis;
- embeddings: shard the feature axis;
- batch_stats and scalars: replicated.
GSPMD propagation handles every activation in between.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model == n, \
        f'mesh {n_data}x{n_model} does not match {n} devices'
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=('data', 'model'))


def mesh_from_config(config: Dict[str, Any], devices=None) -> Mesh:
    mesh_cfg = config.get('tpu', {}).get('mesh', {})
    return make_mesh(n_data=mesh_cfg.get('data', -1),
                     n_model=mesh_cfg.get('model', 1), devices=devices)


def _param_spec(path: tuple, leaf, n_model: int) -> P:
    names = [str(getattr(p, 'key', getattr(p, 'name', p))) for p in path]
    shape = np.shape(leaf)
    if n_model <= 1 or len(shape) == 0:
        return P()
    last = names[-1] if names else ''
    if last in ('w_ih', 'w_hh') and shape[0] % n_model == 0:
        return P('model')  # shard packed gates
    if last in ('b_ih', 'b_hh') and shape[0] % n_model == 0:
        return P('model')
    if last in ('kernel', 'embedding') and shape[-1] % n_model == 0 \
            and shape[-1] >= 2 * n_model:
        return P(*([None] * (len(shape) - 1) + ['model']))
    if last == 'bias' and shape[-1] % n_model == 0 \
            and shape[-1] >= 2 * n_model:
        return P('model')
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding pytree for a params pytree under the TP rules."""
    n_model = mesh.shape.get('model', 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_spec(path, leaf, n_model)),
        params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicated_shardings(mesh: Mesh, tree) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def batch_shardings(mesh: Mesh, batch) -> Any:
    """Shard every batch array's leading (batch) axis over 'data'.
    Arrays whose batch dim doesn't divide the data axis are replicated
    (e.g. tiny smoke-test batches on a large mesh)."""
    n_data = mesh.shape.get('data', 1)

    def spec(leaf):
        if np.ndim(leaf) == 0 or np.shape(leaf)[0] % n_data != 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*(['data'] + [None] * (np.ndim(leaf) - 1))))
    return jax.tree.map(spec, batch)


def opt_shardings(mesh: Mesh, opt_state, p_sh) -> Any:
    """Optimizer-state shardings mirroring a params sharding tree:
    Adam/AdamW mu/nu live under .../mu/<param path>, so any suffix of
    an opt leaf's path that matches a param path inherits its sharding;
    everything else (counts, hyperparams) is replicated."""
    flat_params = {tuple(str(getattr(p, 'key', p)) for p in path): sh
                   for path, sh in
                   jax.tree_util.tree_flatten_with_path(p_sh)[0]}

    def opt_spec(path, leaf):
        names = tuple(str(getattr(p, 'key', getattr(p, 'name', p)))
                      for p in path)
        for start in range(len(names)):
            if names[start:] in flat_params:
                return flat_params[names[start:]]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(opt_spec, opt_state)


def state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for a TrainState: params TP rules, opt_state mirrors
    params where shapes match, everything else replicated."""
    from forwardtacotron_tpu.train.common import TrainState
    p_sh = param_shardings(mesh, state.params)
    return TrainState(
        params=p_sh,
        batch_stats=replicated_shardings(mesh, state.batch_stats),
        opt_state=opt_shardings(mesh, state.opt_state, p_sh),
        step=NamedSharding(mesh, P()),
        # EMA weights mirror the param shardings (same tree)
        ema_params=None if state.ema_params is None else p_sh)


def gan_state_shardings(mesh: Mesh, state) -> Any:
    """Shardings for a GANTrainState (train/hifigan_trainer.py): both
    param trees under the TP rules, both optimizer states mirroring
    their params, step replicated."""
    from forwardtacotron_tpu.train.hifigan_trainer import GANTrainState
    g_sh = param_shardings(mesh, state.gen_params)
    d_sh = param_shardings(mesh, state.disc_params)
    return GANTrainState(
        gen_params=g_sh,
        disc_params=d_sh,
        gen_opt=opt_shardings(mesh, state.gen_opt, g_sh),
        disc_opt=opt_shardings(mesh, state.disc_opt, d_sh),
        step=NamedSharding(mesh, P()))
