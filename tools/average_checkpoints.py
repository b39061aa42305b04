"""Checkpoint averaging: merge the last-k (or any chosen) checkpoints
into one by arithmetic-meaning the float parameters — a standard
production trick that smooths SGD noise like EMA does, but applicable
after the fact to an existing run's step-named / top-k checkpoints
(reference keeps top-k only for the vocoder, voc_trainer.py:204-226;
it has no averaging tool).

    python tools/average_checkpoints.py \
        checkpoints/ljspeech_tts.forward/forward_step80k.fjax \
        checkpoints/ljspeech_tts.forward/forward_step90k.fjax \
        --output averaged.fjax

Rules:
- float params (and batch_stats) are averaged; integer leaves (e.g.
  BN counters) are taken from the LAST checkpoint, as are config,
  step, and any EMA tree is averaged too when all inputs carry one.
- all inputs must share an identical tree structure and shapes.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
from typing import Any, Dict, List

import numpy as np


def average_payloads(payloads: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Average the 'model' trees of restore_checkpoint() payloads;
    metadata (config, step) comes from the last one."""
    import jax

    trees = [p['model'] for p in payloads]
    # all inputs must be the same model: structure AND shapes
    ref_struct = jax.tree.structure(trees[-1])
    for i, t in enumerate(trees):
        if jax.tree.structure(t) != ref_struct:
            raise ValueError(f'checkpoint #{i} has a different tree '
                             f'structure — not the same model')
    ref_leaves = jax.tree.leaves(trees[-1])
    for i, t in enumerate(trees):
        for a, b in zip(jax.tree.leaves(t), ref_leaves):
            if np.shape(a) != np.shape(b):
                raise ValueError(f'checkpoint #{i} has mismatched '
                                 f'shapes — not the same model config')

    def avg(*leaves):
        last = leaves[-1]
        arr = np.asarray(last)
        if not np.issubdtype(arr.dtype, np.floating):
            return last          # int counters etc.: keep the last
        return np.mean([np.asarray(l, np.float64) for l in leaves],
                       axis=0).astype(arr.dtype)

    merged = jax.tree.map(avg, *trees)
    out = dict(payloads[-1])
    out['model'] = merged
    out['optim'] = None          # an averaged model has no optimizer
    return out


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Average k checkpoints into one')
    parser.add_argument('checkpoints', nargs='+',
                        help='two or more .fjax/.orbax checkpoints of '
                             'the same model')
    parser.add_argument('--output', required=True,
                        help='output .fjax path')
    args = parser.parse_args()
    if len(args.checkpoints) < 2:
        parser.error('need at least two checkpoints to average')

    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       save_checkpoint)
    payloads = [restore_checkpoint(p) for p in args.checkpoints]
    merged = average_payloads(payloads)
    save_checkpoint(merged['model'], merged['config'], args.output,
                    step=merged['step'])
    print(f'Averaged {len(payloads)} checkpoints '
          f'(steps {[p["step"] for p in payloads]}) -> {args.output}')


if __name__ == '__main__':
    main()
