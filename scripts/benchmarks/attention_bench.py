#!/usr/bin/env python
"""Flash (Pallas TPU) vs SDPA attention at TTS sequence lengths.

VERDICT r1 #8: `use_flash` delegates to the stock Pallas TPU flash-attention
kernel (models/transformer.py:50-68) but no shipped config turned it on and
no benchmark justified either default.  This measures one FFT self-attention
layer's forward (+backward) at the shapes TTS actually sees:

- t_text 128  (encoder over tokens)
- t_mel  864  (decoder over mel frames, ~10 s at 22.05 kHz hop 256)
- 4096        (stress case / long-form synthesis)

Usage:  python scripts/benchmarks/attention_bench.py [--batch 8] [--iters 50]
Prints one JSON line per (impl, seq_len); record the winner in DESIGN.md and
set shipped-config defaults accordingly.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--d-model", type=int, default=384)
    p.add_argument("--n-head", type=int, default=2)
    p.add_argument("--d-head", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--seq-lens", type=int, nargs="+", default=[128, 864, 4096])
    p.add_argument("--backward", action="store_true", help="time grad step too")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from roar_tpu.models.transformer import MultiHeadAttn

    platform = jax.default_backend()
    for t in args.seq_lens:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (args.batch, t, args.d_model)
            ),
            jnp.float32,
        )
        lens = jnp.full((args.batch,), t, jnp.int32)
        key_mask = jnp.arange(t)[None, :] < lens[:, None]

        for use_flash in (False, True):
            if use_flash and platform != "tpu":
                continue  # the Pallas kernel is TPU-only
            mha = MultiHeadAttn(
                args.n_head, args.d_model, args.d_head, 0.0, use_flash=use_flash
            )
            params = mha.init(jax.random.PRNGKey(0), x, key_mask=key_mask)

            @jax.jit
            def fwd(p, x):
                return jnp.sum(mha.apply(p, x, key_mask=key_mask))

            step = jax.jit(jax.grad(fwd)) if args.backward else fwd

            out = step(params, x)  # compile
            jax.block_until_ready(out)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = step(params, x)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # device sync
            dt = (time.perf_counter() - t0) / args.iters
            print(
                json.dumps(
                    {
                        "metric": "attention_layer_ms",
                        "impl": "flash_pallas" if use_flash else "sdpa_einsum",
                        "seq_len": t,
                        "batch": args.batch,
                        "backward": bool(args.backward),
                        "value": round(dt * 1e3, 4),
                        "unit": "ms",
                        "platform": platform,
                    }
                )
            )


if __name__ == "__main__":
    main()
