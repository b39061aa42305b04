"""Multi-process (multi-host semantics) dryrun of the distributed layer.

The reference is single-process/single-device (SURVEY.md §2.2-2.3);
this repo's multi-host path (parallel/distributed.py) was previously
validated only single-process. This tool runs it for real: it spawns N
OS processes, each owning a disjoint set of virtual CPU devices, brings
up `jax.distributed` (Gloo collectives — the CPU stand-in for a TPU
pod's ICI/DCN), and drives ForwardTacotron training steps over a global
('data','model') mesh where both axes span process boundaries, with
each process feeding only its own batch rows via
`host_local_batch_to_global`.

Pass criteria (checked by the launcher, exercised by
tests/test_multiprocess_distributed.py):
- every process reports the identical per-step losses;
- those losses match a single-process run over the same global mesh
  geometry (GSPMD semantics don't depend on process layout).

Usage:
    python tools/multihost_dryrun.py              # 2 procs x 4 devices
    python tools/multihost_dryrun.py --num_processes 4 \
        --devices_per_process 2
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def _child(args) -> None:
    # Env must be set before jax import: the virtual device count is
    # read at backend init, and maybe_initialize reads the coordinator
    # env vars (the same ones a real pod launcher would set).
    os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count='
                               f'{args.devices_per_process}')
    os.environ['JAX_COORDINATOR_ADDRESS'] = args.coordinator
    os.environ['JAX_NUM_PROCESSES'] = str(args.num_processes)
    os.environ['JAX_PROCESS_ID'] = str(args.process_id)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    try:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    except Exception:
        pass  # older jaxlib: CPU collectives default is fine

    import numpy as np
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.parallel import mesh as pmesh
    from forwardtacotron_tpu.parallel.distributed import (
        host_local_batch_to_global, maybe_initialize)
    from forwardtacotron_tpu.train import common as tc

    assert maybe_initialize({'tpu': {'multihost': True}})
    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, (
        f'{len(jax.devices())} global devices, expected {n_global}')

    # Both mesh axes span processes when devices_per_process < n_data.
    mesh = pmesh.make_mesh(n_data=n_global // 2, n_model=2)

    tiny = dict(embed_dims=16, series_embed_dims=8,
                durpred_conv_dims=8, durpred_rnn_dims=4,
                durpred_dropout=0.0, pitch_conv_dims=8, pitch_rnn_dims=4,
                pitch_dropout=0.0, pitch_strength=1.0, energy_conv_dims=8,
                energy_rnn_dims=4, energy_dropout=0.0, energy_strength=1.0,
                rnn_dims=16, prenet_dims=8, prenet_k=2, prenet_dropout=0.0,
                prenet_num_highways=1, postnet_dims=8, postnet_k=2,
                postnet_num_highways=1, postnet_dropout=0.0)
    train_cfg = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
                 'energy_loss_factor': 0.1, 'pitch_zoneout': 0.0,
                 'energy_zoneout': 0.0, 'clip_grad_norm': 1.0}
    model = ForwardTacotron(num_chars=30, n_mels=8, **tiny)
    optimizer = tc.make_optimizer(train_cfg['clip_grad_norm'], lr=1e-3)

    def global_batch(seed: int):
        # Seed-deterministic: every process computes the same global
        # batch and uploads only its process_slice rows (the
        # BucketBatcher contract, distributed.py:16-19).
        rng = np.random.RandomState(seed)
        B, Tx, Tm = 8, 6, 16
        return {
            'x': rng.randint(1, 30, (B, Tx)).astype(np.int32),
            'x_len': np.full((B,), Tx, np.int32),
            'mel': rng.randn(B, Tm, 8).astype(np.float32),
            'mel_len': np.full((B,), Tm, np.int32),
            'dur': np.full((B, Tx), Tm // Tx, np.float32),
            'pitch': rng.randn(B, Tx).astype(np.float32),
            'energy': rng.randn(B, Tx).astype(np.float32),
        }

    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    first = {k: jnp.asarray(v) for k, v in global_batch(0).items()}
    state = tc.init_train_state(model, optimizer, first, rng,
                                init_kwargs={'train': True})
    state = jax.device_put(state, pmesh.state_shardings(mesh, state))
    step_fn = jax.jit(tc.build_forward_train_step(model, optimizer,
                                                  train_cfg))
    for step in range(args.steps):
        batch = host_local_batch_to_global(mesh, global_batch(step))
        state, metrics = step_fn(state, batch, rng)
        print(f'STEP {step} loss {float(metrics["loss"]):.9f} '
              f'grad_norm {float(metrics["grad_norm"]):.9f}', flush=True)
    print('CHILD-OK', flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _launch(num_processes: int, devices_per_process: int,
            steps: int, timeout: int) -> list:
    """Spawn the child processes; return the per-step loss lines of
    process 0 after asserting all processes agree."""
    coordinator = f'127.0.0.1:{_free_port()}'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--process_id', str(pid),
             '--num_processes', str(num_processes),
             '--devices_per_process', str(devices_per_process),
             '--coordinator', coordinator, '--steps', str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo_root, env=env))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or 'CHILD-OK' not in out:
            raise RuntimeError(f'process {pid} failed:\n{out}')
    losses = [[ln for ln in o.splitlines() if ln.startswith('STEP')]
              for o in outs]
    for pid in range(1, num_processes):
        if losses[pid] != losses[0]:
            raise RuntimeError(
                f'process {pid} diverged from process 0:\n'
                f'{losses[pid]}\nvs\n{losses[0]}')
    return losses[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--num_processes', type=int, default=2)
    ap.add_argument('--devices_per_process', type=int, default=4)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--timeout', type=int, default=600)
    ap.add_argument('--process_id', type=int, default=None)
    ap.add_argument('--coordinator', type=str, default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        _child(args)
        return

    total = args.num_processes * args.devices_per_process
    print(f'[1/2] single-process reference: 1 proc x {total} devices')
    ref = _launch(1, total, args.steps, args.timeout)
    print('\n'.join(ref))
    print(f'[2/2] distributed: {args.num_processes} procs x '
          f'{args.devices_per_process} devices (Gloo)')
    got = _launch(args.num_processes, args.devices_per_process,
                  args.steps, args.timeout)
    print('\n'.join(got))
    if got != ref:
        raise SystemExit('FAIL: distributed losses differ from '
                         'single-process reference')
    print('MULTIHOST-DRYRUN-OK: '
          f'{args.num_processes} processes matched single-process '
          f'losses over {args.steps} steps')


if __name__ == '__main__':
    main()
