"""WaveRNN vocoder training CLI (contract: reference train_wavernn.py,
`--gta` and `--config` flags; asserts upsample factorization)."""
from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description='Train WaveRNN Vocoder')
    parser.add_argument('--gta', '-g', action='store_true',
                        help='train wavernn on GTA features')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.models.wavernn import WaveRNN
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.voc_trainer import VocTrainer
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    config = read_config(args.config)
    # multi-host runs (TPU pods / DCN): bring up the distributed
    # runtime before any device use so jax.devices() spans the pod
    from forwardtacotron_tpu.parallel.distributed import maybe_initialize
    maybe_initialize(config)
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])
    print('\nInitialising Model...\n')
    voc_model = WaveRNN.from_config(config)
    dsp = DSP.from_config(config)
    assert np.cumprod(
        config['vocoder']['model']['upsample_factors'])[-1] == \
        dsp.hop_length, 'upsample_factors must factorise hop_length'

    state = None
    latest = paths.voc_checkpoints / 'latest_model.fjax'
    if latest.is_file():
        payload = restore_checkpoint(latest)
        train_cfg = config['vocoder']['training']
        optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm'))
        opt_state = optimizer.init(payload['model']['params'])
        opt_state = restore_opt_state(payload, opt_state)
        state = tc.TrainState(
            params=payload['model']['params'],
            batch_stats=payload['model'].get('batch_stats', {}),
            opt_state=opt_state,
            step=jnp.asarray(payload['step'], jnp.int32))
        print(f'Restored model with step {payload["step"]}')

    voc_trainer = VocTrainer(paths=paths, dsp=dsp, config=config)
    voc_trainer.train(voc_model, state=state, train_gta=args.gta)


if __name__ == '__main__':
    main()
