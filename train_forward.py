"""ForwardTacotron / FastPitch training CLI.

Contract matches the reference train_forward.py (`--force_gta`,
`--config`): requires alignments (data/alg) from the Tacotron teacher,
trains per the config schedule, resumes from latest_model if present;
`--force_gta` dumps ground-truth-aligned postnet mels to data/gta.
"""
from __future__ import annotations

import argparse
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np


def try_get_git_hash() -> Optional[str]:
    try:
        return subprocess.check_output(
            ['git', 'rev-parse', 'HEAD']).decode('ascii').strip()
    except Exception as e:
        print(f'Could not retrieve git hash! {e}')
        return None


def create_gta_features(model, state, train_set, val_set,
                        save_path: Path) -> None:
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.utils.display import progbar, stream

    @jax.jit
    def gta_step(variables, batch):
        return model.apply(variables, batch, train=False)['mel_post']

    iters = len(train_set) + len(val_set)
    i = 0
    for batcher in (train_set, val_set):
        for batch in batcher:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            gta = np.asarray(gta_step(state.variables, jbatch))
            n_real = batch.get('n_real', gta.shape[0])
            for j in range(n_real):
                item_id = batch['item_id'][j]
                mel_len = int(batch['mel_len'][j])
                np.save(str(save_path / f'{item_id}.npy'),
                        gta[j, :mel_len].T.astype(np.float32),
                        allow_pickle=False)
            i += 1
            stream(f'{progbar(i, iters)} {i}/{iters} Batches ')


def main() -> None:
    parser = argparse.ArgumentParser(description='Train ForwardTacotron TTS')
    parser.add_argument('--force_gta', '-g', action='store_true',
                        help='Force the model to create GTA features')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    args = parser.parse_args()

    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.utils.checkpoints import (init_tts_model,
                                                       restore_checkpoint,
                                                       restore_opt_state)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    config = read_config(args.config)
    # multi-host runs (TPU pods / DCN): bring up the distributed
    # runtime before any device use so jax.devices() spans the pod
    from forwardtacotron_tpu.parallel.distributed import maybe_initialize
    maybe_initialize(config)
    if 'git_hash' not in config or config['git_hash'] is None:
        config['git_hash'] = try_get_git_hash()
    dsp = DSP.from_config(config)
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])

    assert len(os.listdir(paths.alg)) > 0, \
        (f'Could not find alignment files in {paths.alg}, please predict '
         f'alignments first with python train_tacotron.py --force_align!')

    import jax
    model = init_tts_model(config)
    print(f'Initialized tts model: {type(model).__name__}')

    state = None
    latest = paths.forward_checkpoints / 'latest_model.fjax'
    if latest.is_file():
        payload = restore_checkpoint(latest)
        model_type = config.get('tts_model', 'forward_tacotron')
        train_cfg = config[model_type]['training']
        optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm'))
        opt_state = optimizer.init(payload['model']['params'])
        opt_state = restore_opt_state(payload, opt_state)
        # resume EMA tracking: stored weights if present, else seed from
        # the raw params when ema_decay was just turned on. When
        # ema_decay is now 0/unset, drop any stored EMA tree — the step
        # would never update it, and eval/checkpoints/serving would
        # otherwise keep using the frozen resume-time snapshot.
        ema = payload['model'].get('ema_params')
        if float(train_cfg.get('ema_decay', 0) or 0) <= 0:
            ema = None
        elif ema is None:
            # seed from raw params — as a copy, so the donated train
            # step never sees the same buffer twice
            import numpy as np
            ema = jax.tree.map(np.array, payload['model']['params'])
        state = tc.TrainState(
            params=payload['model']['params'],
            batch_stats=payload['model'].get('batch_stats', {}),
            opt_state=opt_state,
            step=jax.numpy.asarray(payload['step'], jax.numpy.int32),
            ema_params=ema)
        print(f'Restored model with step {payload["step"]}')

    trainer = ForwardTrainer(paths=paths, dsp=dsp, config=config)

    if args.force_gta:
        assert state is not None, 'Need a trained model for GTA features'
        print('Creating Ground Truth Aligned Dataset...\n')
        from forwardtacotron_tpu.data.dataset import get_tts_datasets
        train_set, val_set = get_tts_datasets(
            paths.data, 8, r=1, model_type='forward',
            filter_attention=False, max_mel_len=None)
        create_gta_features(model, state, train_set, val_set, paths.gta)
        print('\n\nYou can now train WaveRNN on GTA features - use '
              'python train_wavernn.py --gta\n')
    else:
        trainer.train(model, state=state)


if __name__ == '__main__':
    main()
