#!/usr/bin/env python
"""Measured achievable HBM bandwidth + MXU throughput for THIS chip.

The roofline tables (README, DESIGN.md §7) need an honest denominator: the
spec sheet's 819 GB/s (v5e) is a marketing ceiling, not what a real kernel
streams.  This probe measures
  - copy-scale  (2 streams: read + write)          -> achievable bandwidth
  - triad-add   (3 streams: 2 reads + 1 write)     -> achievable bandwidth
  - big bf16 matmul                                -> achievable MXU FLOP/s
Each probe runs its iterations INSIDE one jitted `lax.fori_loop` dispatch:
on the tunneled backend a per-iteration host dispatch costs ~1-3 ms, which
at these kernel durations (<1 ms) would dominate and understate bandwidth
3-5x (measured).  Sync is by value fetch (DESIGN.md §7b:
block_until_ready does not force remote execution).

Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(x.ravel()[0])


def _timed(jitted, v, inner, outer=5):
    _sync(jitted(v))  # compile + warm
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = jitted(v)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 64 * 1024 * 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dev = jax.devices()[0]

    x = jax.jit(lambda: jnp.linspace(0.0, 1.0, n))()
    _sync(x)

    @jax.jit
    def copy_loop(v):
        return jax.lax.fori_loop(
            0, inner, lambda i, v: v * 1.0000001 + 1e-7, v
        )

    dt_copy = _timed(copy_loop, x, inner)

    b = jax.jit(lambda: jnp.full((n,), 1e-7, jnp.float32))()
    _sync(b)

    @jax.jit
    def triad_loop(v):
        return jax.lax.fori_loop(
            0, inner, lambda i, v: v + b * 1.0000001, v
        )

    dt_triad = _timed(triad_loop, x, inner)

    m = 8192
    w = jax.jit(lambda: jnp.full((m, m), 1e-2, jnp.bfloat16))()
    _sync(w)

    @jax.jit
    def mm_loop(v):
        return jax.lax.fori_loop(
            0, inner, lambda i, v: (v @ w) * jnp.bfloat16(1e-2), v
        )

    dt_mm = _timed(mm_loop, w, inner)

    print(json.dumps({
        "device": dev.device_kind,
        "buffer_mb": round(4 * n / 2**20),
        "copy_gbps": round(2 * 4 * n / dt_copy / 1e9, 1),
        "triad_gbps": round(3 * 4 * n / dt_triad / 1e9, 1),
        "matmul_tflops": round(2 * m**3 / dt_mm / 1e12, 1),
        "copy_ms": round(dt_copy * 1e3, 3),
        "triad_ms": round(dt_triad * 1e3, 3),
        "matmul_ms": round(dt_mm * 1e3, 3),
        "inner_iters": inner,
    }))


if __name__ == "__main__":
    main()
