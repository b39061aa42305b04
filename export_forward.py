"""Export a trained ForwardTacotron/FastPitch to a portable StableHLO
artifact — the TPU-native analog of the reference's TorchScript export
(README.md:149-161: `model.generate_jit` + torch.jit.save).

    python export_forward.py --checkpoint checkpoints/.../latest_model.fjax \
        --output forward.ftexp --buckets 64:512,128:1024

The artifact bakes in the weights and replays on any jax install
(optionally for multiple platforms via --platforms cpu,tpu) without
this repo's model code:

    from forwardtacotron_tpu.utils.export import ExportedTTS
    mel, dur = ExportedTTS('forward.ftexp').generate(token_ids)

With --voc_checkpoint (HiFi-GAN/MelGAN generator, or a WaveRNN .fjax —
the complete autoregressive fold/sample/crossfade pipeline serializes
too, with the sampling seed as a runtime input), the vocoder is fused
into the same StableHLO program, making the artifact a full text->wav
synthesizer:

    pcm16 = ExportedTTS('forward.ftexp').synthesize(token_ids)
"""
from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Export TTS generate() to a StableHLO artifact')
    parser.add_argument('--checkpoint', type=str, required=True,
                        help='path to .fjax or reference .pt TTS model')
    parser.add_argument('--output', type=str, required=True,
                        help='output artifact path (.ftexp)')
    parser.add_argument('--buckets', type=str, default='64:512,192:1536',
                        help='comma list of tx:max_mel static buckets')
    parser.add_argument('--platforms', type=str, default=None,
                        help='comma list of lowering platforms '
                             '(e.g. cpu,tpu); default: current backend')
    parser.add_argument('--voc_checkpoint', type=str, default=None,
                        help='vocoder checkpoint (HiFi-GAN/MelGAN '
                             'generator or a WaveRNN .fjax): the vocoder '
                             'is FUSED into the artifact, making it a '
                             'full text->wav program (outputs int16 '
                             'PCM; use ExportedTTS.synthesize)')
    parser.add_argument('--voc_type', type=str, default='auto',
                        choices=['auto', 'hifigan', 'melgan', 'wavernn'],
                        help='vocoder architecture of --voc_checkpoint '
                             '(auto: sniffed from the file)')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.checkpoints import load_tts_checkpoint
    from forwardtacotron_tpu.utils.export import save_exported_tts

    buckets = []
    for part in args.buckets.split(','):
        tx, max_t = part.split(':')
        buckets.append((int(tx), int(max_t)))
    platforms = args.platforms.split(',') if args.platforms else None

    model, variables, config, step = load_tts_checkpoint(args.checkpoint)
    vocoder, voc_mu_law = None, True

    def _load_wavernn(path):
        from forwardtacotron_tpu.utils.checkpoints import (
            load_voc_checkpoint)
        vm, vv, vcfg, _ = load_voc_checkpoint(path)
        return (vm, vv), bool(vcfg['dsp'].get('mu_law', True))

    def _sniff_wavernn(path) -> bool:
        """WaveRNN .fjax param trees are flat ('rnn1_*', 'I_*'), unlike
        GAN trainer files ('generator'/'discriminator' roots) or raw
        torch generator dicts."""
        try:
            from forwardtacotron_tpu.utils.checkpoints import (
                restore_checkpoint)
            roots = restore_checkpoint(path)['model']['params']
            return 'rnn1_w_ih' in roots or 'rnn1_b_ih' in roots
        except Exception:
            return False

    if args.voc_checkpoint:
        if args.voc_type == 'wavernn' or (
                args.voc_type == 'auto'
                and _sniff_wavernn(args.voc_checkpoint)):
            vocoder, voc_mu_law = _load_wavernn(args.voc_checkpoint)
        else:
            from forwardtacotron_tpu.models.hifigan import load_gan_vocoder
            vocoder = load_gan_vocoder(args.voc_checkpoint, args.voc_type)
    save_exported_tts(model, variables, args.output, buckets=buckets,
                      platforms=platforms, vocoder=vocoder,
                      voc_mu_law=voc_mu_law)
    voc_note = ' + fused vocoder' if vocoder else ''
    print(f'Exported step-{step} {type(model).__name__}{voc_note} '
          f'buckets={buckets} -> {args.output}')


if __name__ == '__main__':
    main()
