"""Trained-weights cross-runtime parity gate (round-4 VERDICT item 4).

All torch<->JAX parity elsewhere in the repo is proven at *random
init*; the published-pretrained-checkpoint gate (verify_pretrained.py)
cannot run in this zero-egress image. This tool closes the
trained-weight blind spot hermetically:

  1. trains the ACTUAL reference ForwardTacotron
     (/root/reference/models/forward_tacotron.py:184, losses exactly
     as /root/reference/trainer/forward_trainer.py:86-96) for a few
     hundred CPU steps on synthetic data — real Adam trajectories,
     evolving BatchNorm running statistics, realistic magnitudes;
  2. saves the reference-format .pt ({'model','optim','config'},
     reference utils/checkpoints.py:12-18), converts it with
     models/torch_compat.convert_forward_tacotron, and compares
     free-running generate() mels between the two runtimes (the
     BASELINE.md north-star contract: mel L1 < 1e-3);
  3. reverse direction: trains OUR JAX model a few steps, exports with
     models/torch_export.export_forward_tacotron, loads the state dict
     into the reference torch model, and compares generate() again.

Run:  python tools/trained_weights_gate.py [--steps 200] [--report F]
Exercised in CI by tests/test_trained_weights_gate.py (slow tier) at
reduced step counts; the committed report is docs/parity_trained.md.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))
_REFERENCE = pathlib.Path('/root/reference')

# Reduced-size model config shared by both directions: big enough for
# meaningful magnitudes/BN drift, small enough for a few hundred CPU
# steps in minutes. Every architectural feature of the production
# config is present (CBHG prenet/postnet, all three series predictors,
# BiLSTM decoder).
GATE_CFG = {
    'embed_dims': 64, 'series_embed_dims': 16,
    'durpred_conv_dims': 32, 'durpred_rnn_dims': 16,
    'durpred_dropout': 0.1,
    'pitch_conv_dims': 32, 'pitch_rnn_dims': 16, 'pitch_dropout': 0.1,
    'pitch_strength': 1.0,
    'energy_conv_dims': 32, 'energy_rnn_dims': 16,
    'energy_dropout': 0.1, 'energy_strength': 1.0,
    'rnn_dims': 64, 'prenet_dims': 32, 'prenet_k': 4,
    'prenet_dropout': 0.1, 'prenet_num_highways': 2,
    'postnet_dims': 32, 'postnet_k': 4, 'postnet_num_highways': 2,
    'postnet_dropout': 0.0,
    'n_mels': 80,
}
NUM_CHARS = 120


def _synth_batch(rng, B=4, Tx=12, frames_per=5, n_mels=80):
    """Synthetic teacher-forced batch with consistent durations."""
    import torch
    x = rng.randint(1, NUM_CHARS - 1, size=(B, Tx))
    dur = rng.randint(2, frames_per + 3, size=(B, Tx)).astype(np.float32)
    mel_len = dur.sum(axis=1).astype(np.int64)
    T = int(mel_len.max())
    mel = (rng.randn(B, n_mels, T) * 1.5 - 6).astype(np.float32)
    pitch = rng.randn(B, Tx).astype(np.float32)
    energy = np.abs(rng.randn(B, Tx)).astype(np.float32)
    return {
        'x': torch.tensor(x, dtype=torch.long),
        'x_len': torch.tensor([Tx] * B, dtype=torch.long),
        'mel': torch.tensor(mel),
        'mel_len': torch.tensor(mel_len),
        'dur': torch.tensor(dur),
        'pitch': torch.tensor(pitch),
        'energy': torch.tensor(energy),
    }


def train_reference_torch(steps: int, seed: int = 0):
    """Train the reference ForwardTacotron on CPU; returns the torch
    model (eval mode) after `steps` Adam updates."""
    import torch
    sys.path.insert(0, str(_REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT
    from trainer.common import MaskedL1

    torch.manual_seed(seed)
    model = TorchFT(num_chars=NUM_CHARS, **GATE_CFG)
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    l1 = MaskedL1()
    rng = np.random.RandomState(seed)
    last = None
    for i in range(steps):
        batch = _synth_batch(rng, n_mels=GATE_CFG['n_mels'])
        pred = model(batch)
        m1 = l1(pred['mel'], batch['mel'], batch['mel_len'])
        m2 = l1(pred['mel_post'], batch['mel'], batch['mel_len'])
        dur_loss = l1(pred['dur'].unsqueeze(1),
                      batch['dur'].unsqueeze(1), batch['x_len'])
        pitch_loss = l1(pred['pitch'], batch['pitch'].unsqueeze(1),
                        batch['x_len'])
        energy_loss = l1(pred['energy'], batch['energy'].unsqueeze(1),
                         batch['x_len'])
        loss = m1 + m2 + 0.1 * (dur_loss + pitch_loss + energy_loss)
        optim.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optim.step()
        last = float(loss.item())
    model.eval()
    return model, optim, last


def _torch_generate(tmodel, x_np):
    import torch
    with torch.no_grad():
        out = tmodel.generate(torch.tensor(x_np, dtype=torch.long))
    mel = out['mel_post'][0].cpu().numpy()      # (n_mels, T)
    return mel.T                                # (T, n_mels)


def _jax_generate(variables, x_np, max_t=512):
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    jmodel = ForwardTacotron(num_chars=NUM_CHARS, **GATE_CFG)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        out = jmodel.apply(variables, jnp.asarray(x_np), max_t,
                           method='generate',
                           x_len=jnp.asarray([x_np.shape[1]]),
                           fast=False)
        T = int(out['mel_len'][0])
        return np.asarray(out['mel_post'][0, :T])   # (T, n_mels)


def gate_torch_to_jax(steps: int, tmpdir) -> dict:
    """Direction 1: torch-trained ckpt -> torch_compat -> JAX generate
    vs reference generate."""
    import torch
    from forwardtacotron_tpu.models.torch_compat import (
        convert_forward_tacotron)

    tmodel, optim, loss = train_reference_torch(steps)
    # save/reload through the reference checkpoint format so the whole
    # .pt surface (not just in-memory state_dicts) is exercised
    ckpt = pathlib.Path(tmpdir) / 'forward_trained.pt'
    torch.save({'model': tmodel.state_dict(),
                'optim': optim.state_dict(),
                'config': {'forward_tacotron': {'model': GATE_CFG}}},
               ckpt)
    payload = torch.load(ckpt, map_location='cpu', weights_only=False)
    variables, step = convert_forward_tacotron(payload['model'], GATE_CFG)

    rng = np.random.RandomState(42)
    l1s, lens = [], []
    for i in range(3):
        x = rng.randint(1, NUM_CHARS - 1, size=(1, 10 + 3 * i))
        ref = _torch_generate(tmodel, x)
        got = _jax_generate(variables, x)
        n = min(len(ref), len(got))
        assert abs(len(ref) - len(got)) == 0, \
            f'generated length mismatch: torch {len(ref)} jax {len(got)}'
        l1s.append(float(np.mean(np.abs(ref[:n] - got[:n]))))
        lens.append(n)
    return {'direction': 'torch->jax', 'train_steps': steps,
            'final_train_loss': loss, 'mel_l1': l1s,
            'mel_l1_max': max(l1s), 'gen_frames': lens}


def gate_jax_to_torch(steps: int, tmpdir) -> dict:
    """Direction 2: JAX-trained state -> torch_export -> reference
    runtime generate vs our generate."""
    import jax
    import torch
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.models.torch_export import (
        export_forward_tacotron)
    from forwardtacotron_tpu.train import common as tc
    sys.path.insert(0, str(_REFERENCE))
    from models.forward_tacotron import ForwardTacotron as TorchFT

    jmodel = ForwardTacotron(num_chars=NUM_CHARS, **GATE_CFG)
    optimizer = tc.make_optimizer(1.0, lr=1e-3)
    rng_np = np.random.RandomState(7)

    import jax.numpy as jnp

    def jax_batch():
        b = _synth_batch(rng_np, n_mels=GATE_CFG['n_mels'])
        return {
            'x': jnp.asarray(b['x'].numpy()),
            'x_len': jnp.asarray(b['x_len'].numpy().astype(np.int32)),
            'mel': jnp.asarray(np.swapaxes(b['mel'].numpy(), 1, 2)),
            'mel_len': jnp.asarray(b['mel_len'].numpy().astype(np.int32)),
            'dur': jnp.asarray(b['dur'].numpy()),
            'pitch': jnp.asarray(b['pitch'].numpy()),
            'energy': jnp.asarray(b['energy'].numpy()),
        }

    train_cfg = {'dur_loss_factor': 0.1, 'pitch_loss_factor': 0.1,
                 'energy_loss_factor': 0.1, 'pitch_zoneout': 0.0,
                 'energy_zoneout': 0.0, 'clip_grad_norm': 1.0}
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        batch0 = jax_batch()
        state = tc.init_train_state(jmodel, optimizer, batch0,
                                    jax.random.PRNGKey(0),
                                    init_kwargs={'train': True})
        step_fn = jax.jit(tc.build_forward_train_step(jmodel, optimizer,
                                                      train_cfg))
        key = jax.random.PRNGKey(1)
        metrics = None
        for i in range(steps):
            state, metrics = step_fn(state, jax_batch(),
                                     jax.random.fold_in(key, i))
        loss = float(metrics['loss'])

    sd = export_forward_tacotron(state.variables, GATE_CFG,
                                 step=int(state.step))
    pt = pathlib.Path(tmpdir) / 'forward_exported.pt'
    torch.save({'model': sd, 'optim': None,
                'config': {'forward_tacotron': {'model': GATE_CFG}}}, pt)
    payload = torch.load(pt, map_location='cpu', weights_only=False)
    tmodel = TorchFT(num_chars=NUM_CHARS, **GATE_CFG)
    tmodel.load_state_dict(payload['model'])
    tmodel.eval()

    rng = np.random.RandomState(43)
    l1s, lens = [], []
    for i in range(3):
        x = rng.randint(1, NUM_CHARS - 1, size=(1, 10 + 3 * i))
        ref = _torch_generate(tmodel, x)
        got = _jax_generate(state.variables, x)
        n = min(len(ref), len(got))
        assert abs(len(ref) - len(got)) == 0, \
            f'generated length mismatch: torch {len(ref)} jax {len(got)}'
        l1s.append(float(np.mean(np.abs(ref[:n] - got[:n]))))
        lens.append(n)
    return {'direction': 'jax->torch', 'train_steps': steps,
            'final_train_loss': loss, 'mel_l1': l1s,
            'mel_l1_max': max(l1s), 'gen_frames': lens}


def run_gate(steps_torch: int = 200, steps_jax: int = 60,
             tmpdir=None) -> dict:
    import tempfile
    own = tmpdir is None
    if own:
        tmpdir = tempfile.mkdtemp(prefix='trained_gate_')
    try:
        d1 = gate_torch_to_jax(steps_torch, tmpdir)
        d2 = gate_jax_to_torch(steps_jax, tmpdir)
    finally:
        if own:
            import shutil
            shutil.rmtree(tmpdir, ignore_errors=True)
    worst = max(d1['mel_l1_max'], d2['mel_l1_max'])
    return {'torch_to_jax': d1, 'jax_to_torch': d2,
            'worst_mel_l1': worst, 'passes_1e-3': worst < 1e-3}


def _force_cpu():
    """This is a CPU tool (torch CPU + JAX CPU); the image's
    sitecustomize force-registers the accelerator platform and env vars
    don't stick, so pin the platform via jax.config before first use —
    never touch the (single-tenant) TPU from here."""
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass


def main():
    _force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200,
                    help='torch-side training steps')
    ap.add_argument('--steps_jax', type=int, default=60)
    ap.add_argument('--report', default=None,
                    help='write a markdown report here')
    args = ap.parse_args()
    if not _REFERENCE.exists():
        sys.exit('reference repo not mounted at /root/reference')
    out = run_gate(args.steps, args.steps_jax)
    print(json.dumps(out, indent=2))
    if args.report:
        lines = [
            '# Trained-weights cross-runtime gate',
            '',
            'Generated by `python tools/trained_weights_gate.py '
            f'--steps {args.steps} --steps_jax {args.steps_jax} '
            '--report <this file>`. See the tool docstring for what it',
            'proves (real Adam trajectories + evolved BatchNorm running',
            'statistics through both checkpoint converters, free-running',
            'generate() compared across runtimes).',
            '',
            '| direction | train steps | final loss | worst mel L1 | '
            'target |',
            '|---|---|---|---|---|',
        ]
        for k in ('torch_to_jax', 'jax_to_torch'):
            d = out[k]
            lines.append(
                f"| {d['direction']} | {d['train_steps']} | "
                f"{d['final_train_loss']:.4f} | {d['mel_l1_max']:.2e} | "
                '< 1e-3 |')
        lines += ['', f"**Result: worst mel L1 = {out['worst_mel_l1']:.2e}"
                  f" — {'PASS' if out['passes_1e-3'] else 'FAIL'}**", '']
        pathlib.Path(args.report).write_text('\n'.join(lines))
        print(f'report -> {args.report}')


if __name__ == '__main__':
    main()
