"""Adversarial HiFi-GAN vocoder training CLI (beyond the reference,
which points at an external HiFi-GAN repo for its best-quality
samples). Same flag contract as train_wavernn.py: `--gta` trains on
the student's ground-truth-aligned mels, `--config` selects the yaml.
"""
from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Train the HiFi-GAN vocoder (generator + MPD/MSD '
                    'discriminators)')
    parser.add_argument('--gta', '-g', action='store_true',
                        help='train on GTA features from the student')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='The config containing all hyperparams.')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.train.hifigan_trainer import (
        GANTrainState, HiFiGANTrainer, make_gan_optimizer,
        make_generator)
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
    print('\nInitialising GAN vocoder...\n')
    gen = make_generator(config)
    dsp = DSP.from_config(config)
    assert gen.hop_length == dsp.hop_length, \
        'generator upsample_rates must factorise dsp.hop_length'

    state = None
    latest = paths.hifigan_checkpoints / 'latest_model.fjax'
    if latest.is_file():
        payload = restore_checkpoint(latest)
        params = payload['model']['params']
        gen_opt = make_gan_optimizer().init(params['generator'])
        disc_opt = make_gan_optimizer().init(params['discriminator'])
        if payload.get('optim') is not None:
            gen_opt, disc_opt = restore_opt_state(payload,
                                                  (gen_opt, disc_opt))
        state = GANTrainState(
            gen_params=params['generator'],
            disc_params=params['discriminator'],
            gen_opt=gen_opt, disc_opt=disc_opt,
            step=jnp.asarray(payload['step'], jnp.int32))
        print(f'Restored model with step {payload["step"]}')

    trainer = HiFiGANTrainer(paths=paths, dsp=dsp, config=config)
    trainer.train(gen, state=state, train_gta=args.gta)


if __name__ == '__main__':
    main()
