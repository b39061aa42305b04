"""TTS generation CLI.

Contract matches the reference gen_forward.py: `--input_text/-i`,
`--checkpoint`, `--config`, `--alpha` (speed), `--amp` (pitch), and a
vocoder subcommand in {wavernn, griffinlim, melgan, hifigan}. Accepts
both `.fjax` checkpoints and reference torch `.pt` checkpoints (converted
on load). Synthesis runs fully jitted on padded static buckets; bucket
sizes are chosen per input so recompiles stay rare.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _bucket(n: int, multiple: int, minimum: int) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, minimum)


_JIT_CACHE: dict = {}


def synthesize(model, variables, text_ids, alpha: float, amp: float,
               mel_multiple: int = 256, energy_scale: float = 1.0,
               speaker: int = 0):
    """Two-stage jitted generation: predict series, apply user scaling
    (amp scales pitch, energy_scale scales energy — the reference's
    pitch_function/energy_function lambdas, gen_forward.py:98-104),
    expand+decode. jits are cached per (model, bucket) so repeated
    sentences reuse compilations. `speaker` selects the voice on
    multi-speaker models (ignored when n_speakers == 1). Returns
    (mel_post (n_mels, T_true), dur)."""
    import jax
    import jax.numpy as jnp

    x_len = len(text_ids)
    tx = _bucket(x_len, 16, 16)
    x = np.zeros((1, tx), dtype=np.int32)
    x[0, :x_len] = text_ids
    x = jnp.asarray(x)
    xl = jnp.asarray([x_len])
    multispeaker = getattr(model, 'n_speakers', 1) > 1
    spk = jnp.asarray([speaker], jnp.int32) if multispeaker else None

    key = (model, 'series')
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            lambda v, x, xl, a, spk: model.apply(
                v, x, alpha=a, method='predict_series', x_len=xl,
                speaker=spk))
    series = _JIT_CACHE[key](variables, x, xl, alpha, spk)
    dur = np.asarray(series['dur'])[0, :x_len]
    total = int(np.sum(np.floor(np.maximum(dur, 0) + 0.5)))
    max_t = _bucket(total + 1, mel_multiple, mel_multiple)

    pitch = series['pitch'] * amp
    key = (model, 'gen', max_t)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            lambda v, x, d, p, e, xl, spk, _mt=max_t: model.apply(
                v, x, d, p, e, _mt, method='generate_from_series',
                x_len=xl, speaker=spk))
    gen = _JIT_CACHE[key](variables, x, series['dur'], pitch,
                          series['energy'] * energy_scale, xl, spk)
    mel_len = int(gen['mel_len'][0])
    mel_post = np.asarray(gen['mel_post'])[0, :mel_len].T  # (n_mels, T)
    return mel_post, dur


def main() -> None:
    parser = argparse.ArgumentParser(description='TTS Generator')
    parser.add_argument('--input_text', '-i', default=None, type=str,
                        help='[string] Text for TTS generation')
    parser.add_argument('--checkpoint', type=str, default=None,
                        help='[string/path] path to .fjax or .pt model file')
    parser.add_argument('--config', metavar='FILE', default='config.yaml',
                        help='Config file (used if no checkpoint is set).')
    parser.add_argument('--alpha', type=float, default=1.,
                        help='Length regulator speed control')
    parser.add_argument('--amp', type=float, default=1.,
                        help='Pitch amplification')
    parser.add_argument('--speaker', type=int, default=0,
                        help='Speaker id for multi-speaker models '
                             '(ignored by single-speaker checkpoints)')
    parser.add_argument('--split_sentences', action='store_true',
                        help='split article-length inputs on sentence '
                             'boundaries and join the mels with short '
                             'silences (bounds per-dispatch work; see '
                             'docs/serving.md for the serving analog)')
    subparsers = parser.add_subparsers(dest='vocoder')
    wr_parser = subparsers.add_parser('wavernn')
    wr_parser.add_argument('--overlap', '-o', default=550, type=int)
    wr_parser.add_argument('--target', '-t', default=None, type=int,
                           help='fold length in samples (default: auto — '
                                '2750 for the TPU kernel, 11000 for the '
                                'scan sampler, matching the reference)')
    wr_parser.add_argument('--voc_checkpoint', type=str)
    wr_parser.add_argument('--stream', action='store_true',
                           help='write audio incrementally as fold groups '
                                'complete (bounded memory for long inputs)')
    wr_parser.add_argument('--stream_group', default=8, type=int,
                           help='fold lanes sampled per streamed chunk')
    wr_parser.add_argument('--batched_utterances', action='store_true',
                           help='vocode ALL input sentences in one '
                                'fused device program (lane-packed '
                                'fold batching; one dispatch+fetch '
                                'for the whole set)')
    subparsers.add_parser('griffinlim')
    mg_parser = subparsers.add_parser('melgan')
    mg_parser.add_argument('--voc_checkpoint', type=str, default=None,
                           help='MelGAN generator checkpoint (hub-'
                                'lineage torch file). With it, wavs '
                                'are synthesized on-device; without, '
                                'mels are exported as .mel (reference '
                                'behavior)')
    hg_parser = subparsers.add_parser('hifigan')
    hg_parser.add_argument('--voc_checkpoint', type=str, default=None,
                           help='official HiFi-GAN generator checkpoint '
                                '(torch file with a "generator" state '
                                'dict; config.json alongside is picked '
                                'up). With it, wavs are synthesized '
                                'on-device; without, mels are exported '
                                'as .npy (reference behavior)')
    hg_parser.add_argument('--voc_config', type=str, default=None,
                           help='HiFi-GAN config.json (overrides '
                                'auto-detection next to the checkpoint)')
    args = parser.parse_args()

    assert args.vocoder in {'griffinlim', 'wavernn', 'melgan', 'hifigan'}, \
        ("Please provide a valid vocoder! Choices: ['griffinlim', "
         "'wavernn', 'melgan', 'hifigan']")
    if args.alpha <= 0:
        parser.error('--alpha must be > 0 (it divides the predicted '
                     'durations; 0 would explode the output length)')

    from forwardtacotron_tpu.dsp.audio import DSP
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.checkpoints import load_tts_checkpoint
    from forwardtacotron_tpu.utils.display import simple_table
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    checkpoint_path = args.checkpoint
    if checkpoint_path is None:
        config = read_config(args.config)
        paths = Paths(config['data_path'], config['voc_model_id'],
                      config['tts_model_id'])
        checkpoint_path = paths.forward_checkpoints / 'latest_model.fjax'

    print(f'Loading tts checkpoint {checkpoint_path}')
    model, variables, config, step = load_tts_checkpoint(checkpoint_path)
    n_spk = getattr(model, 'n_speakers', 1)
    if n_spk > 1 and not 0 <= args.speaker < n_spk:
        parser.error(f'--speaker {args.speaker} out of range for a '
                     f'{n_spk}-speaker checkpoint')
    dsp = DSP.from_config(config)

    voc_model = voc_variables = voc_dsp = None
    if args.vocoder == 'wavernn':
        from forwardtacotron_tpu.utils.checkpoints import load_voc_checkpoint
        voc_model, voc_variables, voc_config, _ = load_voc_checkpoint(
            args.voc_checkpoint)
        voc_dsp = DSP.from_config(voc_config)
    elif args.vocoder == 'hifigan' and args.voc_checkpoint:
        import json
        from forwardtacotron_tpu.models.hifigan import load_hifigan
        hg_config = None
        if args.voc_config:
            with open(args.voc_config) as f:
                hg_config = json.load(f)
        voc_model, voc_variables = load_hifigan(args.voc_checkpoint,
                                                hg_config)
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
    simple_table([('Forward Tacotron', str(tts_k) + 'k'),
                  ('Vocoder Type', args.vocoder)])

    pending = []  # (wav_name, mel) for --batched_utterances

    for i, x in enumerate(texts, 1):
        print(f'\n| Generating {i}/{len(texts)}')
        wav_name = (f'{i}_forward_{tts_k}k_alpha{args.alpha}_'
                    f'amp{args.amp}_{args.vocoder}')
        if args.split_sentences:
            # article-length input: per-sentence mels joined with
            # silence-pad frames (MEL_PAD renders as silence), so every
            # vocoder branch below consumes one mel as usual
            from forwardtacotron_tpu.data.dataset import MEL_PAD
            from forwardtacotron_tpu.text.segmenter import split_sentences
            pieces = split_sentences(x) or [x]
            gap = np.full((config['dsp']['num_mels'], 10), MEL_PAD,
                          np.float32)
            mels = []
            for sent in pieces:
                m, _ = synthesize(model, variables,
                                  tokenizer(cleaner(sent)), args.alpha,
                                  args.amp, speaker=args.speaker)
                if mels:
                    mels.append(gap)
                mels.append(m)
            mel_post = np.concatenate(mels, axis=1)
        else:
            ids = tokenizer(cleaner(x))
            mel_post, _ = synthesize(model, variables, ids, args.alpha,
                                     args.amp, speaker=args.speaker)

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
            if args.stream:
                from forwardtacotron_tpu.models.streaming import (
                    stream_wav, write_wav_streaming)
                chunks = stream_wav(voc_model, voc_variables, mel_post,
                                    target=args.target,
                                    overlap=args.overlap,
                                    group=args.stream_group,
                                    mu_law=voc_dsp.mu_law)
                n = write_wav_streaming(chunks,
                                        out_path / f'{wav_name}.wav',
                                        dsp.sample_rate)
                print(f'| streamed {n} samples')
            elif args.batched_utterances:
                pending.append((wav_name, mel_post))
            else:
                from forwardtacotron_tpu.models.wavernn import generate_wav
                wav = generate_wav(voc_model, voc_variables, mel_post,
                                   batched=True, target=args.target,
                                   overlap=args.overlap,
                                   mu_law=voc_dsp.mu_law, pcm16=True)
                dsp.save_wav(wav, out_path / f'{wav_name}.wav')
        elif args.vocoder == 'griffinlim':
            wav = dsp.griffinlim(mel_post)
            dsp.save_wav(wav, out_path / f'{wav_name}.wav')

    if pending:
        from forwardtacotron_tpu.models.wavernn import vocode_batch
        print(f'\n| Vocoding {len(pending)} utterances in one batch')
        wavs = vocode_batch(voc_model, voc_variables,
                            [m for _, m in pending], target=args.target,
                            overlap=args.overlap, mu_law=voc_dsp.mu_law,
                            pcm16=True)
        for (wav_name, _), wav in zip(pending, wavs):
            dsp.save_wav(wav, out_path / f'{wav_name}.wav')

    print('\n\nDone.\n')


if __name__ == '__main__':
    main()
