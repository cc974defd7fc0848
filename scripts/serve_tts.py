#!/usr/bin/env python
"""Serve text->wav synthesis over HTTP with dynamic micro-batching.

    python scripts/serve_tts.py --fastpitch fp.roar --vocoder hifigan.roar \
        [--host 127.0.0.1] [--port 8000] [--max-batch 8] [--max-wait-ms 5] \
        [--text-buckets 32,64,128,256] [--frames-per-token 12] [--no-warmup]

The bundles are `.roar` archives written by the training CLIs
(training/save_restore.py).  Protocol: `POST /synthesize` with
`{"text": "...", "speaker": 0, "pace": 1.0}` returns 16-bit PCM WAV;
`GET /healthz` returns serving counters.  Every (text-bucket, batch-bucket)
shape is one compiled program; `warmup()` precompiles all of them before
the socket opens (seconds on relaunch with the persistent XLA cache).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fastpitch", required=True, help=".roar FastPitch bundle")
    p.add_argument("--vocoder", required=True, help=".roar HiFi-GAN bundle")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--text-buckets", default="32,64,128,256")
    p.add_argument("--batch-buckets", default="1,2,4,8")
    p.add_argument("--frames-per-token", type=int, default=12)
    p.add_argument("--pace", type=float, default=1.0)
    p.add_argument("--no-warmup", action="store_true")
    args = p.parse_args()

    from roar_tpu.config.cli import enable_persistent_compilation_cache
    from roar_tpu.serving import engine_from_bundles, make_server
    from roar_tpu.utils.logging import get_logger

    log = get_logger()
    enable_persistent_compilation_cache()
    engine = engine_from_bundles(
        args.fastpitch,
        args.vocoder,
        text_buckets=tuple(int(x) for x in args.text_buckets.split(",")),
        batch_buckets=tuple(int(x) for x in args.batch_buckets.split(",")),
        frames_per_token=args.frames_per_token,
        pace=args.pace,
    )
    if not args.no_warmup:
        n = engine.warmup()
        log.info(f"warmed up {n} (text-bucket x batch-bucket) programs")
    server = make_server(engine, host=args.host, port=args.port,
                         max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    log.info(
        f"serving text->wav on http://{args.host}:{args.port} "
        f"(sample_rate={engine.sample_rate}, max_batch={args.max_batch}, "
        f"max_wait={args.max_wait_ms}ms)"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.batcher.close()


if __name__ == "__main__":
    main()
