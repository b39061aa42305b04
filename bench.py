"""Benchmark: batch-1 mel generation real-time factor on one TPU chip.

The headline number from BASELINE.md: the reference generates one
utterance's mel in ~0.04 s on an RTX 2080 (README.md:15), and the target
for this framework is batch-1 RTF < 0.005 per TPU core. We time the full
jitted ForwardTacotron serving path (series prediction + length
regulation + decoder + postnet) on a static bucket sized for a long
utterance, and report RTF = wall_time / generated_audio_seconds.

Prints ONE JSON line:
  {"metric": "batch1_mel_rtf", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <target 0.005 / rtf>, "extra": {...}}
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron

    config = read_config('config.yaml')
    hop = config['dsp']['hop_length']
    sr = config['dsp']['sample_rate']
    model = ForwardTacotron.from_config(config)

    Tx, mel_bucket = 128, 768
    x = jnp.asarray(
        np.random.RandomState(0).randint(1, 60, size=(1, Tx)), jnp.int32)
    x_len = jnp.asarray([120])

    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        variables = model.init({'params': jax.random.PRNGKey(0)}, x,
                               mel_bucket, method='generate', x_len=x_len)
    variables = jax.device_put(variables, jax.devices()[0])

    # Fixed durations (6 frames/phoneme) make the generated length
    # deterministic under random weights: 120 * 6 = 720 frames (~8.4 s).
    def gen(variables, x, x_len):
        series = model.apply(variables, x, method='predict_series',
                             x_len=x_len)
        dur = jnp.where(jnp.arange(Tx)[None] < x_len[:, None], 6.0, 0.0)
        return model.apply(variables, x, dur, series['pitch'],
                           series['energy'], mel_bucket,
                           method='generate_from_series', x_len=x_len)

    gen = jax.jit(gen)
    out = jax.block_until_ready(gen(variables, x, x_len))  # compile
    mel_len = int(out['mel_len'][0])

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = gen(variables, x, x_len)
    jax.block_until_ready(out['mel_post'])
    dt = (time.perf_counter() - t0) / n_iter

    audio_seconds = mel_len * hop / sr
    rtf = dt / audio_seconds

    # secondary: batched serving throughput (mel frames / sec / chip)
    B = 32
    xb = jnp.tile(x, (B, 1))
    xlb = jnp.tile(x_len, (B,))
    outb = jax.block_until_ready(gen(variables, xb, xlb))
    t0 = time.perf_counter()
    for _ in range(10):
        outb = gen(variables, xb, xlb)
    jax.block_until_ready(outb['mel_post'])
    dtb = (time.perf_counter() - t0) / 10
    frames_per_sec = B * mel_len / dtb

    print(json.dumps({
        'metric': 'batch1_mel_rtf',
        'value': round(rtf, 6),
        'unit': 'rtf',
        'vs_baseline': round(0.005 / rtf, 2),
        'extra': {
            'batch1_latency_ms': round(dt * 1000, 3),
            'mel_frames': mel_len,
            'audio_seconds': round(audio_seconds, 2),
            'batched32_mel_frames_per_sec': int(frames_per_sec),
            'device': str(jax.devices()[0]),
            'reference_note': 'reference ~0.04 s/utterance on RTX 2080 '
                              '(README.md:15); target rtf < 0.005',
        },
    }))


if __name__ == '__main__':
    main()
