"""Device-time breakdown of the ForwardTacotron training step.

Round-4 VERDICT item 3 follow-through: bench.py reports train MFU
(15.2% bf16 on v5e at B=32); this tool attributes the step time to
components so optimization effort lands on the top sink instead of
guesses. Methodology is bench.py's tunnel-proof repeat program: each
component is chained k times inside ONE jitted `lax.fori_loop` with
PRNG-varied inputs, and (t[k_hi]-t[k_lo])/(k_hi-k_lo) is pure device
time (immune to the axon tunnel's per-call round trip).

Components measured fwd+bwd (value_and_grad over a scalar readout,
matching what the train step pays for them):
  full_step        the production jitted train step (fwd+bwd+clip+Adam)
  loss_fwd_bwd     model fwd + loss + grads, no optimizer
  decoder_bilstm   TorchBiLSTM over Tm frames (the main net)
  postnet_cbhg     CBHG postnet over Tm frames
  prenet_cbhg      CBHG prenet over Tx tokens
  series_preds     the three SeriesPredictors (dur/pitch/energy)
  optimizer_only   clip + Adam update on precomputed grads

Reference scale anchor: the torch trainer's step is
/root/reference/trainer/forward_trainer.py:35-96 (one fwd+bwd+Adam).

Usage:  python tools/train_breakdown.py [--precision bf16] [--batch 32]
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
    ap.add_argument('--precision', default='bf16',
                    choices=['f32', 'bf16'])
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--tx', type=int, default=128)
    ap.add_argument('--tm', type=int, default=768)
    ap.add_argument('--cpu', action='store_true',
                    help='force CPU (smoke-testing the tool itself)')
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
    from forwardtacotron_tpu.models.forward_tacotron import (
        ForwardTacotron, length_regulate)
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(_ROOT / 'config.yaml')
    model = ForwardTacotron.from_config(config)
    B, Tx, Tm = args.batch, args.tx, args.tm
    rng = np.random.RandomState(0)
    dur = np.full((B, Tx), Tm // Tx, np.float32)
    batch = {
        'x': jnp.asarray(rng.randint(1, 60, (B, Tx)), jnp.int32),
        'x_len': jnp.asarray([Tx] * B, jnp.int32),
        'mel': jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32)),
        'mel_len': jnp.asarray([Tm] * B, jnp.int32),
        'dur': jnp.asarray(dur),
        'pitch': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
        'energy': jnp.asarray(rng.randn(B, Tx).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    train_cfg = dict(config['forward_tacotron']['training'],
                     precision=args.precision)
    optimizer = tc.make_optimizer(train_cfg.get('clip_grad_norm'),
                                  lr=5e-5)
    state0 = tc.TrainState(
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init(variables['params']),
        step=jnp.asarray(0, jnp.int32))
    raw_step = tc.build_forward_train_step(model, optimizer, train_cfg)
    step_fn = jax.jit(raw_step)
    key = jax.random.PRNGKey(0)
    state, _ = step_fn(state0, batch, key)      # warm + stabilize dtypes
    state, _ = step_fn(state, batch, key)
    cast = (lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)) \
        if args.precision == 'bf16' else (lambda t: t)

    results = {}

    def measure(name, make_fn, operand, k_hi=9):
        """make_fn(operand, key_leaf) -> scalar jax value, chained in a
        fori_loop. `operand` (params and/or big inputs) is passed as a
        jit ARGUMENT — large arrays captured as closure constants blow
        the remote-compile request size limit (HTTP 413 through the
        tunnel).

        IMPORTANT (hoist-proofing): make_fn MUST make its computation
        depend on the per-iteration key — a loop-invariant body gets
        hoisted out of the fori_loop by XLA and measures as ~0 device
        time (this produced impossible sub-ms BiLSTM numbers in the
        first version of this tool)."""
        def prog(k, kk, op):
            def body(i, acc):
                return acc + make_fn(op, jax.random.fold_in(kk, i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        jit_prog = jax.jit(prog)

        def run_k(k, seed):
            return jit_prog(k, jax.random.PRNGKey(seed), operand)
        try:
            dt = bench._repeat_device_seconds(run_k, k_lo=1, k_hi=k_hi,
                                              reps=3)
            results[name] = round(dt * 1000, 3)
            print(f'{name:18s} {dt * 1000:8.3f} ms', flush=True)
        except Exception as e:
            results[name] = f'{type(e).__name__}: {e}'
            print(f'{name:18s} FAILED: {e}', flush=True)

    def jiggle(key, arr):
        """Make `arr` iteration-dependent without changing its scale:
        float arrays are scaled by (1 + u*eps) with eps the dtype's own
        machine epsilon (1e-6 would round to exactly 1.0 in bf16, whose
        ulp is ~2^-8, leaving the values loop-invariant); int token ids
        are rolled along time by a key-derived shift. Cost is one scalar
        RNG draw + a broadcast op — negligible next to a fwd+bwd."""
        if jnp.issubdtype(arr.dtype, jnp.integer):
            shift = jax.random.randint(key, (), 0, arr.shape[1])
            return jnp.roll(arr, shift, axis=1)
        eps = jnp.finfo(arr.dtype).eps
        u = jax.random.uniform(key, (), arr.dtype)
        return arr * (1.0 + u * eps)

    # --- full production step (state chained through iterations;
    # state passed as a jit argument, see measure())
    def full_prog(k, kk, st):
        def body(i, s):
            s2, _ = raw_step(s, batch, jax.random.fold_in(kk, i))
            return s2
        final = jax.lax.fori_loop(0, k, body, st)
        return optax.global_norm(final.params)
    jit_full = jax.jit(full_prog)

    def run_full(k, seed):
        return jit_full(k, jax.random.PRNGKey(seed), state)
    try:
        dt = bench._repeat_device_seconds(run_full, k_lo=1, k_hi=5,
                                          reps=3)
        results['full_step'] = round(dt * 1000, 3)
        print(f'{"full_step":18s} {dt * 1000:8.3f} ms', flush=True)
    except Exception as e:
        results['full_step'] = f'{type(e).__name__}: {e}'
        print(f'full_step FAILED: {e}', flush=True)

    # --- loss fwd+bwd (no optimizer) — mirrors the production loss_fn
    # (build_forward_train_step) exactly: bf16 cast at the boundary,
    # f32 masters, preds cast back to f32 for the loss, batch_stats f32
    from forwardtacotron_tpu.train.common import (cast_full, cast_half,
                                                  forward_loss, half_dtype)
    half = half_dtype(train_cfg)

    def loss_of(params, b, key):
        p = cast_half(params, half) if half else params
        bb = cast_half(b, half) if half else b
        pred, _ = model.apply(
            {'params': p, 'batch_stats': state.batch_stats}, bb,
            train=True, mutable=['batch_stats'], rngs={'dropout': key})
        if half:
            pred = cast_full(pred, half)
        loss, _ = forward_loss(pred, b, b['pitch'], b['energy'], train_cfg)
        return loss

    grad_fn = jax.value_and_grad(loss_of)

    def fwd_bwd(op, key):
        params, b = op
        kj, kd = jax.random.split(key)
        b = dict(b, mel=jiggle(kj, b['mel']))
        l, g = grad_fn(params, b, kd)
        return l + optax.global_norm(g)
    measure('loss_fwd_bwd', fwd_bwd, (state.params, dict(batch)))

    # --- submodule fwd+bwd probes. Each applies ONE submodule via
    # flax's method= hook with a synthetic input of the right shape,
    # grads w.r.t. params (what backprop through that stage costs).
    h_dec = jnp.asarray(rng.randn(B, Tm, 512).astype(np.float32))
    mel_in = jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32))
    h_tok = jnp.asarray(rng.randn(B, Tx, 256).astype(np.float32))

    def probe(name, method_fn, x, needs_dropout=True, k_hi=9):
        def loss_p(params, x, key):
            p = cast_half(params, half) if half else params
            kwargs = {'rngs': {'dropout': key}} if needs_dropout else {}
            out = model.apply(
                {'params': p, 'batch_stats': state.batch_stats}, x,
                method=method_fn, mutable=['batch_stats'], **kwargs)[0]
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
        g_fn = jax.value_and_grad(loss_p)

        def f(op, key):
            params, xx = op
            kj, kd = jax.random.split(key)
            xx = jiggle(kj, xx)  # hoist-proof: input varies per iteration
            l, g = g_fn(params, xx, kd)
            return l + optax.global_norm(g)
        measure(name, f, (state.params, x), k_hi=k_hi)

    probe('decoder_bilstm', lambda m, x: m.lstm(x), cast(h_dec),
          needs_dropout=False)
    probe('postnet_cbhg', lambda m, x: m.postnet(x, train=True),
          cast(mel_in))
    probe('prenet_cbhg', lambda m, x: m.prenet(x, train=True),
          cast(h_tok))

    x_ids = batch['x']

    def series_m(m, x):
        d = m.dur_pred(x, train=True)
        p = m.pitch_pred(x, train=True)
        e = m.energy_pred(x, train=True)
        return d + p + e
    probe('series_preds', series_m, x_ids)

    # --- length regulator alone (gather; fwd+bwd)
    def lr_loss(h):
        out, _ = length_regulate(h, batch['dur'], max_t=Tm)
        return jnp.sum(out ** 2) * 1e-6
    g_lr = jax.grad(lr_loss)

    def lr_f(op, key):
        del op
        h = jax.random.normal(key, (B, Tx, 512))
        return optax.global_norm(g_lr(h))
    measure('length_regulate', lr_f, jnp.float32(0.0))

    # --- optimizer-only: clip + Adam. opt_state+params are CHAINED
    # through the fori_loop (via a separate chained program, not
    # measure()) so no iteration can be hoisted or CSE'd.
    def opt_prog(k, kk, st):
        def body(i, carry):
            params, opt_state = carry
            scale = jax.random.uniform(jax.random.fold_in(kk, i), ())
            g = jax.tree.map(lambda a: jnp.full_like(a, scale * 1e-8),
                             params)
            upd, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, upd)
            return (params, opt_state)
        params, _ = jax.lax.fori_loop(0, k, body,
                                      (st.params, st.opt_state))
        return optax.global_norm(params)
    jit_opt = jax.jit(opt_prog)

    def run_opt(k, seed):
        return jit_opt(k, jax.random.PRNGKey(seed), state)
    try:
        dt = bench._repeat_device_seconds(run_opt, k_lo=1, k_hi=17,
                                          reps=3)
        results['optimizer_only'] = round(dt * 1000, 3)
        print(f'{"optimizer_only":18s} {dt * 1000:8.3f} ms', flush=True)
    except Exception as e:
        results['optimizer_only'] = f'{type(e).__name__}: {e}'
        print(f'optimizer_only FAILED: {e}', flush=True)

    dev = jax.devices()[0]
    print(json.dumps({'device': str(dev), 'precision': args.precision,
                      'batch': [B, Tx, Tm], 'ms': results}))


if __name__ == '__main__':
    main()
