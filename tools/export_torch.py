"""Export a framework checkpoint (`.fjax`) as a reference-format torch
`.pt` so TPU-trained models deploy on the reference (or any torch
runtime) unchanged:

    python tools/export_torch.py \\
        --checkpoint checkpoints/ljspeech_tts.forward/latest_model.fjax \\
        --out forward_latest.pt

The output is exactly what the reference's own save_checkpoint writes
(/root/reference/utils/checkpoints.py:12-18): {'model': state_dict,
'optim': None, 'config': config}, loadable by its gen_forward.py /
gen_tacotron.py with strict state_dict matching. Supports all four
convertible families (forward_tacotron, fast_pitch, tacotron, wavernn),
auto-detected from the checkpoint. EMA weights are exported when
present (--no_ema for the raw weights).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Export a .fjax checkpoint as a reference torch .pt')
    parser.add_argument('--checkpoint', required=True,
                        help='[path] .fjax checkpoint to export')
    parser.add_argument('--out', required=True, help='[path] output .pt')
    parser.add_argument('--family', default=None,
                        choices=['forward_tacotron', 'fast_pitch',
                                 'tacotron', 'wavernn', 'hifigan'],
                        help='architecture (default: auto-detect). '
                             'hifigan writes the OFFICIAL '
                             "{'generator': sd} format instead of the "
                             'reference .pt')
    parser.add_argument('--no_ema', action='store_true',
                        help='export raw weights even when EMA weights '
                             'are tracked')
    parser.add_argument('--r', type=int, default=1,
                        help='reduction factor buffer for tacotron '
                             'exports')
    args = parser.parse_args()

    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
    from forwardtacotron_tpu.models.torch_export import (
        detect_family, save_torch_checkpoint)

    payload = restore_checkpoint(Path(args.checkpoint))
    variables = dict(payload['model'])
    family = args.family or detect_family(variables, payload['config'])
    if family == 'hifigan':
        # official HiFi-GAN generator format ({'generator': sd}), the
        # file the official repo's inference loads directly
        from forwardtacotron_tpu.models.hifigan import load_hifigan
        from forwardtacotron_tpu.models.torch_export import (
            save_hifigan_checkpoint)
        model, gen_variables = load_hifigan(Path(args.checkpoint))
        save_hifigan_checkpoint(gen_variables, model, args.out)
    else:
        save_torch_checkpoint(
            variables, payload['config'], args.out,
            step=int(payload.get('step', 0)), family=family,
            use_ema=not args.no_ema, r=args.r)
    print(f'Exported {family} step {payload.get("step", 0)} '
          f'-> {args.out}')


if __name__ == '__main__':
    main()
