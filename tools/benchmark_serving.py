"""Serving load benchmark: drive a TTSServer with N concurrent client
threads x M requests each and report latency percentiles, throughput,
and realized batch sizes as ONE JSON line — the load-testing companion
to `serve_forward.py` (reference has no serving story at all).

    python tools/benchmark_serving.py \
        --checkpoint checkpoints/ljspeech_tts.forward/latest_model.fjax \
        --vocoder griffinlim --clients 8 --requests 4

Run it against a warmed server for steady-state numbers (--no-warmup
to include compile time). Works on TPU and (slowly) on CPU.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import json
import threading
import time

TEXTS = [
    'The quick brown fox jumps over the lazy dog.',
    'A TPU systolic array multiplies matrices in hardware.',
    'Speech synthesis turns text into audible waveforms.',
    'Dynamic batching shares device programs across requests.',
    'Latency percentiles summarize the user experience.',
    'Sentence splitting bounds per dispatch work.',
]


def main() -> None:
    parser = argparse.ArgumentParser(
        description='Concurrent-load benchmark for the TTS server')
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--vocoder', default='griffinlim',
                        choices=['griffinlim', 'wavernn', 'hifigan',
                                 'melgan'])
    parser.add_argument('--voc_checkpoint', default=None)
    parser.add_argument('--clients', type=int, default=8)
    parser.add_argument('--requests', type=int, default=4,
                        help='requests per client')
    parser.add_argument('--max_batch', type=int, default=8)
    parser.add_argument('--max_wait_ms', type=float, default=20.0)
    parser.add_argument('--fused', action='store_true')
    parser.add_argument('--no-warmup', dest='warmup',
                        action='store_false')
    args = parser.parse_args()

    from forwardtacotron_tpu.serving import TTSServer

    server = TTSServer(args.checkpoint, vocoder=args.vocoder,
                       voc_checkpoint=args.voc_checkpoint,
                       max_batch=args.max_batch,
                       max_wait_ms=args.max_wait_ms, fused=args.fused)
    with server:
        if args.warmup:
            t0 = time.monotonic()
            info = server.warmup()
            print(f'# warmup: {info["programs"]} programs in '
                  f'{info["seconds"]:.1f}s '
                  f'({time.monotonic() - t0:.1f}s wall)')

        lat, errors = [], []
        lock = threading.Lock()

        def client(cid: int) -> None:
            for k in range(args.requests):
                text = TEXTS[(cid + k) % len(TEXTS)]
                t0 = time.monotonic()
                try:
                    pcm = server.synthesize(text, timeout=600)
                    dt = time.monotonic() - t0
                    with lock:
                        lat.append((dt, len(pcm)))
                except Exception as e:   # noqa: BLE001 - report all
                    with lock:
                        errors.append(f'{type(e).__name__}: {e}')

        t_start = time.monotonic()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t_start

        import numpy as np
        times = np.array([d for d, _ in lat])
        samples = sum(n for _, n in lat)
        stats = server.stats()
        result = {
            'metric': 'serving_p95_latency',
            'value': round(float(np.percentile(times, 95)), 4)
            if len(times) else None,
            'unit': 's',
            'clients': args.clients,
            'requests_total': len(lat),
            'errors': len(errors),
            'wall_s': round(wall, 3),
            'requests_per_s': round(len(lat) / wall, 2),
            'audio_s_per_s': round(
                samples / server.sample_rate / wall, 2),
            'latency_s': {
                'p50': round(float(np.percentile(times, 50)), 4),
                'p95': round(float(np.percentile(times, 95)), 4),
                'p99': round(float(np.percentile(times, 99)), 4),
                'max': round(float(times.max()), 4),
            } if len(times) else None,
            'mean_batch_size': stats['mean_batch_size'],
        }
        print(json.dumps(result))
        if errors:
            for e in errors[:5]:
                print(f'# error: {e}')


if __name__ == '__main__':
    main()
