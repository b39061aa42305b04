"""Tacotron teacher generation CLI (contract: reference gen_tacotron.py —
free-running synthesis from the teacher with the same vocoder
subcommands)."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description='TTS Generator (Tacotron)')
    parser.add_argument('--input_text', '-i', default=None, type=str)
    parser.add_argument('--checkpoint', type=str, default=None,
                        help='path to .fjax tacotron checkpoint')
    parser.add_argument('--config', metavar='FILE', default='config.yaml')
    parser.add_argument('--speaker', type=int, default=0,
                        help='Speaker id for multi-speaker teachers '
                             '(ignored by single-speaker checkpoints)')
    parser.add_argument('--steps', type=int, default=1000,
                        help='Max number of steps.')
    subparsers = parser.add_subparsers(dest='vocoder')
    wr_parser = subparsers.add_parser('wavernn')
    wr_parser.add_argument('--overlap', '-o', default=550, type=int)
    wr_parser.add_argument('--target', '-t', default=None, type=int,
                           help='fold length (default: auto per sampler)')
    wr_parser.add_argument('--voc_checkpoint', type=str)
    subparsers.add_parser('griffinlim')
    mg_parser = subparsers.add_parser('melgan')
    mg_parser.add_argument('--voc_checkpoint', type=str, default=None)
    hg_parser = subparsers.add_parser('hifigan')
    hg_parser.add_argument('--voc_checkpoint', type=str, default=None)
    args = parser.parse_args()

    assert args.vocoder in {'griffinlim', 'wavernn', 'melgan', 'hifigan'}

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
    from forwardtacotron_tpu.utils.display import simple_table
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    checkpoint_path = args.checkpoint
    if checkpoint_path is None:
        config = read_config(args.config)
        paths = Paths(config['data_path'], config['voc_model_id'],
                      config['tts_model_id'])
        checkpoint_path = paths.taco_checkpoints / 'latest_model.fjax'

    payload = restore_checkpoint(checkpoint_path)
    config = payload['config']
    variables = payload['model']
    step = payload.get('step', 0)
    model = Tacotron.from_config(config)
    dsp = DSP.from_config(config)

    voc_model = voc_variables = voc_dsp = None
    if args.vocoder == 'wavernn':
        from forwardtacotron_tpu.utils.checkpoints import load_voc_checkpoint
        voc_model, voc_variables, voc_config, _ = load_voc_checkpoint(
            args.voc_checkpoint)
        voc_dsp = DSP.from_config(voc_config)
    elif args.vocoder == 'hifigan' and args.voc_checkpoint:
        from forwardtacotron_tpu.models.hifigan import load_hifigan
        voc_model, voc_variables = load_hifigan(args.voc_checkpoint)
    elif args.vocoder == 'melgan' and args.voc_checkpoint:
        from forwardtacotron_tpu.models.melgan import load_melgan
        voc_model, voc_variables = load_melgan(args.voc_checkpoint)

    out_path = Path('model_outputs')
    out_path.mkdir(parents=True, exist_ok=True)
    cleaner = Cleaner.from_config(config)
    tokenizer = Tokenizer()

    if args.input_text:
        texts = [args.input_text]
    else:
        with open('sentences.txt', 'r', encoding='utf-8') as f:
            texts = f.readlines()

    tts_k = step // 1000
    simple_table([('Tacotron', str(tts_k) + 'k'),
                  ('Vocoder Type', args.vocoder)])

    spk = (jnp.asarray([args.speaker], jnp.int32)
           if getattr(model, 'n_speakers', 1) > 1 else None)
    gen_fn = jax.jit(
        lambda v, x, s: model.apply(v, x, args.steps, 1,
                                    method='generate', speaker=s))

    for i, x in enumerate(texts, 1):
        print(f'\n| Generating {i}/{len(texts)}')
        ids = tokenizer(cleaner(x))
        xj = jnp.asarray(np.asarray(ids, dtype=np.int32)[None])
        _, linear, _, n_valid = gen_fn(variables, xj, spk)
        n_valid = int(n_valid)
        mel_post = np.asarray(linear)[0, :max(n_valid, 1)].T  # (n_mels, T)

        wav_name = f'{i}_tacotron_{tts_k}k_{args.vocoder}'
        if args.vocoder == 'melgan':
            if voc_model is not None:
                from forwardtacotron_tpu.models.melgan import vocode_melgan
                wav = vocode_melgan(voc_model, voc_variables, mel_post,
                                    pcm16=True)
                dsp.save_wav(wav, out_path / f'{wav_name}.wav')
            else:
                import torch
                torch.save(torch.tensor(mel_post[None]),
                           out_path / f'{wav_name}.mel')
        elif args.vocoder == 'hifigan':
            if voc_model is not None:
                from forwardtacotron_tpu.models.hifigan import vocode_hifigan
                wav = vocode_hifigan(voc_model, voc_variables, mel_post,
                                     pcm16=True)
                dsp.save_wav(wav, out_path / f'{wav_name}.wav')
            else:
                np.save(out_path / f'{wav_name}.npy', mel_post[None],
                        allow_pickle=False)
        elif args.vocoder == 'wavernn':
            from forwardtacotron_tpu.models.wavernn import generate_wav
            wav = generate_wav(voc_model, voc_variables, mel_post,
                               batched=True, target=args.target,
                               overlap=args.overlap,
                               mu_law=voc_dsp.mu_law, pcm16=True)
            dsp.save_wav(wav, out_path / f'{wav_name}.wav')
        elif args.vocoder == 'griffinlim':
            wav = dsp.griffinlim(mel_post)
            dsp.save_wav(wav, out_path / f'{wav_name}.wav')

    print('\n\nDone.\n')


if __name__ == '__main__':
    main()
