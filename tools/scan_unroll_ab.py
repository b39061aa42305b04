"""A/B: lax.scan `unroll` on the training-path RNN scans.

Hypothesis (from tools/train_breakdown.py): the B=32 train step pays
~8k sequential scan iterations (decoder BiLSTM 2x768, postnet BiGRU
2x768, prenet 2x128, 3 series BiGRUs 2x128 each, roughly doubled by
the backward replay), each a small (32,512)x(512,2048)-class matmul;
per-iteration while-loop overhead on TPU is then a first-order cost.
`unroll=k` trades trip-count overhead for code size.

Measures the PRODUCTION jitted train step device-time per step
(bench._repeat_device_seconds repeat-program methodology — tunnel
proof) for a ladder of unroll factors by monkeypatching
forwardtacotron_tpu.ops.rnn.SCAN_UNROLL before building the step.

Usage: python tools/scan_unroll_ab.py [--precision bf16] [--batch 32]
       [--unrolls 1,4,8,16]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--precision', default='bf16', choices=['f32', 'bf16'])
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--tx', type=int, default=128)
    ap.add_argument('--tm', type=int, default=768)
    ap.add_argument('--unrolls', default='1,4,8,16')
    ap.add_argument('--fuse_bidir', action='store_true',
                    help='also fuse fwd+bwd directions into one scan at '
                         'training batch sizes (FUSE_BIDIR_MAX_BATCH=inf)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import optax

    from forwardtacotron_tpu.utils import jax_setup
    jax_setup.enable_compilation_cache()
    import bench
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.ops import rnn as rnn_ops
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(_ROOT / 'config.yaml')
    model = ForwardTacotron.from_config(config)
    B, Tx, Tm = args.batch, args.tx, args.tm
    rng = np.random.RandomState(0)
    batch = {
        'x': jnp.asarray(rng.randint(1, 60, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32)),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
        'dur': jnp.asarray(np.full((B, Tx), Tm // Tx, np.float32)),
        'pitch': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
        'energy': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    train_cfg = dict(config['forward_tacotron']['training'],
                     precision=args.precision)
    optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm'), lr=5e-5)
    state = tc.TrainState(
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init(variables['params']),
        step=jnp.asarray(0, jnp.int32))

    if args.fuse_bidir:
        rnn_ops.FUSE_BIDIR_MAX_BATCH = 10 ** 9

    results = {}
    for unroll in [int(u) for u in args.unrolls.split(',')]:
        rnn_ops.SCAN_UNROLL = unroll
        raw_step = tc.build_forward_train_step(model, optimizer, train_cfg)

        def prog(k, kk, st):
            def body(i, s):
                s2, _ = raw_step(s, batch, jax.random.fold_in(kk, i))
                return s2
            final = jax.lax.fori_loop(0, k, body, st)
            return optax.global_norm(final.params)
        jit_prog = jax.jit(prog)

        def run_k(k, seed):
            return jit_prog(k, jax.random.PRNGKey(seed), state)
        try:
            dt = bench._repeat_device_seconds(run_k, k_lo=1, k_hi=5, reps=3)
            results[unroll] = round(dt * 1000, 3)
            print(f'unroll={unroll:3d}  {dt * 1000:8.3f} ms/step',
                  flush=True)
        except Exception as e:
            results[unroll] = f'{type(e).__name__}: {e}'
            print(f'unroll={unroll:3d}  FAILED: {e}', flush=True)
    rnn_ops.SCAN_UNROLL = 1

    print(json.dumps({'device': str(jax.devices()[0]),
                      'precision': args.precision,
                      'batch': [B, Tx, Tm], 'ms_per_step': results}))


if __name__ == '__main__':
    main()
