"""Tacotron teacher training CLI.

Contract matches the reference train_tacotron.py: plain run trains per
schedule then automatically creates alignment features; `--force_gta`
dumps teacher-forced mels; `--force_align` re-extracts durations +
attention scores + phoneme pitch/energy; `--extract_pitch` only
recomputes phoneme pitch/energy.
"""
from __future__ import annotations

import argparse


def _load_state(paths, config, optimizer):
    import jax.numpy as jnp
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    latest = paths.taco_checkpoints / 'latest_model.fjax'
    if not latest.is_file():
        return None
    payload = restore_checkpoint(latest)
    opt_state = optimizer.init(payload['model']['params'])
    opt_state = restore_opt_state(payload, opt_state)
    print(f'Restored model with step {payload["step"]}')
    return tc.TrainState(params=payload['model']['params'],
                         batch_stats=payload['model'].get('batch_stats', {}),
                         opt_state=opt_state,
                         step=jnp.asarray(payload['step'], jnp.int32))


def main() -> None:
    parser = argparse.ArgumentParser(description='Train Tacotron TTS')
    parser.add_argument('--force_gta', '-g', action='store_true',
                        help='Force the model to create GTA features')
    parser.add_argument('--force_align', '-a', action='store_true',
                        help='Force the model to create attention '
                             'alignment features')
    parser.add_argument('--extract_pitch', '-p', action='store_true',
                        help='Extracts phoneme-pitch values only')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from forwardtacotron_tpu.align.features import (create_align_features,
                                                    create_gta_features,
                                                    extract_pitch_energy)
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.taco_trainer import TacoTrainer
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    config = read_config(args.config)
    # multi-host runs (TPU pods / DCN): bring up the distributed
    # runtime before any device use so jax.devices() spans the pod
    from forwardtacotron_tpu.parallel.distributed import maybe_initialize
    maybe_initialize(config)
    dsp = DSP.from_config(config)
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])

    if args.extract_pitch:
        print('Extracting Pitch and Energy Values...')
        extract_pitch_energy(paths, save_path_pitch=paths.phon_pitch,
                             save_path_energy=paths.phon_energy,
                             pitch_max_freq=dsp.pitch_max_freq)
        print('\n\nYou can now train ForwardTacotron - use '
              'python train_forward.py\n')
        return

    print('\nInitialising Tacotron Model...\n')
    model = Tacotron.from_config(config)
    train_cfg = config['tacotron']['training']
    optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm'))
    state = _load_state(paths, config, optimizer)

    if args.force_gta:
        assert state is not None, 'Train the teacher first'
        print('Creating Ground Truth Aligned Dataset...\n')
        train_set, val_set = get_tts_datasets(
            paths.data, 8, 1, max_mel_len=train_cfg['max_mel_len'],
            filter_attention=False)
        create_gta_features(model, state, train_set, val_set, paths.gta,
                            r=1)
        print('\n\nYou can now train WaveRNN on GTA features - use '
              'python train_wavernn.py --gta\n')
    elif args.force_align:
        assert state is not None, 'Train the teacher first'
        print('Creating Attention Alignments and Pitch Values...')
        train_set, val_set = get_tts_datasets(
            paths.data, 8, 1, max_mel_len=None, filter_attention=False)
        create_align_features(model, state, train_set, val_set, paths,
                              config, pitch_max_freq=dsp.pitch_max_freq)
        print('\n\nYou can now train ForwardTacotron - use '
              'python train_forward.py\n')
    else:
        trainer = TacoTrainer(paths, dsp=dsp, config=config)
        state = trainer.train(model, state=state)
        if tc.preempted():
            print('Preempted mid-training — latest_model saved; rerun '
                  'to resume (alignment extraction deferred).')
            return
        print('Creating Attention Alignments and Pitch Values...')
        train_set, val_set = get_tts_datasets(
            paths.data, 8, 1, max_mel_len=None, filter_attention=False)
        create_align_features(model, state, train_set, val_set, paths,
                              config, pitch_max_freq=dsp.pitch_max_freq)
        print('\n\nYou can now train ForwardTacotron - use '
              'python train_forward.py\n')


if __name__ == '__main__':
    main()
