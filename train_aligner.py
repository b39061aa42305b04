"""Teacher-free aligner training CLI (beyond the reference).

The reference can only obtain phoneme durations by training the AR
Tacotron teacher through its full schedule (reference
train_tacotron.py). This CLI trains the non-autoregressive neural
aligner (align/aligner.py: forward-sum loss + on-device Viterbi)
instead — minutes, not hours — and writes the identical artifacts
(`alg/*.npy`, `att_score_dict.pkl`, `phon_pitch/`, `phon_energy/`), so
`train_forward.py` runs unchanged afterwards:

    python preprocess.py --path <dataset>
    python train_aligner.py          # instead of train_tacotron.py
    python train_forward.py

`--force_align` re-extracts features from an existing aligner
checkpoint without retraining.
"""
from __future__ import annotations

import argparse


def _load_state(paths, optimizer):
    import jax.numpy as jnp
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    latest = paths.aligner_checkpoints / 'latest_model.fjax'
    if not latest.is_file():
        return None
    payload = restore_checkpoint(latest)
    opt_state = optimizer.init(payload['model']['params'])
    opt_state = restore_opt_state(payload, opt_state)
    print(f'Restored aligner with step {payload["step"]}')
    return tc.TrainState(params=payload['model']['params'],
                         batch_stats={}, opt_state=opt_state,
                         step=jnp.asarray(payload['step'], jnp.int32))


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Train the teacher-free neural aligner')
    parser.add_argument('--force_align', '-a', action='store_true',
                        help='Extract durations/pitch/energy from the '
                             'existing aligner checkpoint, no training')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from forwardtacotron_tpu.align.aligner import aligner_from_config
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.parallel.distributed import maybe_initialize
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.aligner_trainer import (
        AlignerTrainer, create_align_features_from_aligner)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    config = read_config(args.config)
    maybe_initialize(config)
    dsp = DSP.from_config(config)
    paths = Paths(config['data_path'], config['voc_model_id'],
                  config['tts_model_id'])

    print('\nInitialising Aligner Model...\n')
    model = aligner_from_config(config)
    train_cfg = config.get('aligner', {}).get('training', {})
    optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm', 1.0))
    state = _load_state(paths, optimizer)

    if not args.force_align:
        trainer = AlignerTrainer(paths, config=config)
        state = trainer.train(model, state=state)
        if tc.preempted():
            print('Preempted mid-training — latest_model saved; rerun '
                  'to resume (alignment extraction deferred).')
            return
    else:
        assert state is not None, 'Train the aligner first'

    print('Creating Attention Alignments and Pitch Values...')
    train_set, val_set = get_tts_datasets(
        paths.data, 8, 1, max_mel_len=None, filter_attention=False)
    create_align_features_from_aligner(
        model, state, train_set, val_set, paths, config,
        pitch_max_freq=dsp.pitch_max_freq)
    print('\n\nYou can now train ForwardTacotron - use '
          'python train_forward.py\n')


if __name__ == '__main__':
    main()
