"""TTS serving CLI (beyond the reference): an HTTP front over the
dynamic-batching TTSServer (forwardtacotron_tpu/serving.py).

    python serve_forward.py --checkpoint ckpt.fjax --port 8000 griffinlim
    python serve_forward.py --checkpoint ckpt.fjax wavernn \
        --voc_checkpoint wave.fjax
    curl -X POST localhost:8000/tts -d '{"text": "hello", "alpha": 1.1}' \
        -o out.wav

Concurrent requests are batched through shared device programs (see
docs/serving.md).
"""
from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description='TTS HTTP server')
    parser.add_argument('--checkpoint', type=str, required=True,
                        help='TTS checkpoint (.fjax or reference .pt)')
    parser.add_argument('--host', type=str, default='127.0.0.1')
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--max_batch', type=int, default=8,
                        help='dynamic batching: max requests per device '
                             'program')
    parser.add_argument('--max_wait_ms', type=float, default=20.0,
                        help='dynamic batching: max time to wait for '
                             'more requests')
    parser.add_argument('--fused', action='store_true',
                        help='neural vocoders (hifigan/melgan/wavernn): '
                             'run text->PCM as ONE device program per '
                             'batch (falls back to staged when the '
                             'output exceeds --fused_max_t frames)')
    parser.add_argument('--fused_max_t', type=int, default=1024)
    parser.add_argument('--max_queue', type=int, default=64,
                        help='backpressure: queued requests beyond this '
                             'are rejected with HTTP 503')
    parser.add_argument('--request_timeout', type=float, default=60.0,
                        help='per-request deadline in seconds (504 when '
                             'exceeded); <=0 disables')
    parser.add_argument('--warmup_text_buckets', type=int, default=1,
                        help='precompile programs for the first N text '
                             'buckets before accepting requests')
    parser.add_argument('--warmup_mel_buckets', type=int, default=1,
                        help='precompile programs for the first N mel '
                             'buckets before accepting requests')
    subparsers = parser.add_subparsers(dest='vocoder')
    subparsers.add_parser('griffinlim')
    wr = subparsers.add_parser('wavernn')
    wr.add_argument('--voc_checkpoint', type=str, required=True)
    hg = subparsers.add_parser('hifigan')
    hg.add_argument('--voc_checkpoint', type=str, required=True)
    mg = subparsers.add_parser('melgan')
    mg.add_argument('--voc_checkpoint', type=str, required=True)
    args = parser.parse_args()
    vocoder = args.vocoder or 'griffinlim'

    from forwardtacotron_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from forwardtacotron_tpu.serving import TTSServer, make_http_server

    server = TTSServer(
        args.checkpoint, vocoder=vocoder,
        voc_checkpoint=getattr(args, 'voc_checkpoint', None),
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        fused=args.fused, fused_max_t=args.fused_max_t,
        max_queue=args.max_queue,
        request_timeout_s=(args.request_timeout
                           if args.request_timeout > 0 else None))
    # precompile the steady-state device programs (text/mel shape
    # lattice) so first requests don't block on XLA compiles
    print('Warming up...')
    stats = server.warmup(
        text_lens=[server.text_bucket * (i + 1)
                   for i in range(max(args.warmup_text_buckets, 1))],
        mel_caps=[server.mel_bucket * (i + 1)
                  for i in range(max(args.warmup_mel_buckets, 1))])
    print(f'Warmed {stats["programs"]} device programs in '
          f'{stats["seconds"]:.1f}s')
    httpd = make_http_server(server, args.host, args.port)
    print(f'Serving TTS ({vocoder}) on http://{args.host}:{args.port} '
          f'— POST /tts {{"text": ...}}')
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == '__main__':
    main()
