#!/usr/bin/env python
"""Serving latency benchmark: full-size FastPitch + HiFi-GAN v1 through the
real serving stack (SynthesisEngine -> DynamicBatcher -> HTTP loopback).

    python scripts/benchmarks/serving_bench.py [--requests 64] [--concurrency 8]
        [--port 18443] [--max-wait-ms 5]

Reports per-request wall latency percentiles (parse + batcher wait + device
program + WAV encode + HTTP) and served throughput.  One JSON line.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--port", type=int, default=18443)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--text-buckets", default="64,128")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.config.cli import enable_persistent_compilation_cache
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.serving import SynthesisEngine, make_server

    enable_persistent_compilation_cache()
    root = Path(__file__).resolve().parents[2]
    fp_cfg = load_config(root / "configs/fastpitch_22050_align.yaml",
                         overrides=["train_dataset=x", "validation_datasets=x",
                                    "sup_data_path=x", "pitch_mean=170.0",
                                    "pitch_std=60.0",
                                    "model.min_token_duration=1"])
    hg_cfg = load_config(root / "configs/hifigan_22050.yaml",
                         overrides=["train_dataset=x", "validation_datasets=x"])
    fp = FastPitchModel(fp_cfg["model"])
    hg = HifiGanModel(hg_cfg["model"])
    tokens = jnp.ones((1, 64), jnp.int32)
    fp_params = fp.module.init({"params": jax.random.PRNGKey(0)}, tokens,
                               max_mel_len=128, method=fp.module.infer)
    voc_params = hg.generator.init(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 16, 80), jnp.float32))

    engine = SynthesisEngine(
        fp, fp_params, hg, voc_params,
        text_buckets=tuple(int(x) for x in args.text_buckets.split(",")),
        batch_buckets=(1, 2, 4, 8),
    )
    t0 = time.perf_counter()
    n_programs = engine.warmup()
    warmup_s = time.perf_counter() - t0

    server = make_server(engine, port=args.port, max_wait_ms=args.max_wait_ms)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    text = "the quick brown fox jumps over the lazy dog near the river bank"
    lat, lock = [], threading.Lock()

    def worker(n):
        for _ in range(n):
            body = json.dumps({"text": text}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{args.port}/synthesize", data=body,
                headers={"Content-Type": "application/json"})
            t = time.perf_counter()
            with urllib.request.urlopen(req, timeout=120) as r:
                blob = r.read()
            dt = time.perf_counter() - t
            assert len(blob) > 44, "empty WAV"
            with lock:
                lat.append(dt)

    per = args.requests // args.concurrency
    threads = [threading.Thread(target=worker, args=(per,))
               for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    # --- streaming TTFA: long text, first chunk vs full synthesis ---------
    # (must run BEFORE server.shutdown(): these are live HTTP requests)
    long_text = ". ".join(["the quick brown fox jumps over the lazy dog"] * 6)
    ttfa, full = [], []
    for _ in range(5):
        body = json.dumps({"text": long_text, "stream": True}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{args.port}/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        t = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read(44 + 2)  # WAV header + first PCM bytes of chunk 1
            ttfa.append(time.perf_counter() - t)
            r.read()  # drain the rest
            full.append(time.perf_counter() - t)

    server.shutdown()
    server.batcher.close()

    lat_ms = np.asarray(sorted(lat)) * 1e3
    print(json.dumps({
        "metric": "serving_latency_ms",
        "value": round(float(np.percentile(lat_ms, 50)), 2),
        "unit": "ms p50 per request",
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "requests": len(lat),
        "concurrency": args.concurrency,
        "max_wait_ms": args.max_wait_ms,
        "requests_per_sec": round(len(lat) / wall, 1),
        "batches_run": server.batcher.batches_run,
        "warmup_programs": n_programs,
        "warmup_s": round(warmup_s, 1),
        "stream_ttfa_ms": round(float(np.median(ttfa)) * 1e3, 1),
        "stream_total_ms": round(float(np.median(full)) * 1e3, 1),
        "stream_sentences": long_text.count(".") + 1,
    }))


if __name__ == "__main__":
    main()
