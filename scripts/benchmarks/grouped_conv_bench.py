#!/usr/bin/env python
"""Per-shape A/B of grouped-conv lowerings for the MSD discriminator.

The HiFi-GAN per-op profile (profile_step.py) attributes ~60% of the GAN
step to MultiScaleDiscriminator convolutions running at 2-7% HBM util and
~12-21 TFLOP/s — starved MXU, not bandwidth.  Root cause: XLA's native
grouped-conv lowering contracts only Cin/G (32-64) of the 128-wide MXU.
This bench times each MSD conv SHAPE separately (fwd+bwd, the training
cost) under candidate lowerings, so the model can pick per shape:

  native   nn.Conv feature_group_count=G as-is
  dense    block-diagonal dense kernel (GxFLOPs, full contraction)
  im2col   unfold taps then dot_general: contraction k*Cin/G (656-2624),
           groups as a batched dim, at k/s x input bytes
  s2d      space-to-depth: fold the stride phase into channels first
           (stride-s conv k taps -> stride-1 conv ceil(k/s) taps on s*C
           channels), then native grouped conv on the fatter channels

Each candidate runs inside one jitted fori_loop (dispatch amortization,
DESIGN.md §7b) with value-fetch sync.  Prints one JSON line per
(shape, method).
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


# MSD conv stack (models/hifigan.py DiscriminatorS): (name, W_in, Cin, Cout,
# k, stride, groups) at scale 0 (B=32, S=8192).  Scales 1/2 are the same
# stack at S/2, S/4 — same shapes, half/quarter W.
SHAPES = [
    ("s0.conv1", 8192, 128, 128, 41, 2, 4),
    ("s0.conv2", 4096, 128, 256, 41, 2, 16),
    ("s0.conv3", 2048, 256, 512, 41, 4, 16),
    ("s0.conv4", 512, 512, 1024, 41, 4, 16),
    ("s0.conv5", 128, 1024, 1024, 41, 1, 16),
    # scales 1/2 run the same stack on avg-pooled audio whose widths are
    # ODD (pool pad=2): ragged tiles + batch packing are what's measured
    ("s1.conv1", 4097, 128, 128, 41, 2, 4),
    ("s1.conv2", 2049, 128, 256, 41, 2, 16),
    ("s1.conv3", 1025, 256, 512, 41, 4, 16),
    ("s1.conv4", 257, 512, 1024, 41, 4, 16),
    ("s1.conv5", 65, 1024, 1024, 41, 1, 16),
    ("s2.conv4", 129, 512, 1024, 41, 4, 16),
    ("s2.conv5", 33, 1024, 1024, 41, 1, 16),
]


def native(x, w, s, g):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s,), padding=[((41 - 1) // 2,) * 2],
        feature_group_count=g, dimension_numbers=("NWC", "WIO", "NWC"),
    )


def dense(x, w, s, g):
    import jax
    import jax.numpy as jnp

    k, cpg, cout = w.shape
    cin = cpg * g
    w4 = w.reshape(k, cpg, g, cout // g)
    eye = jnp.eye(g, dtype=x.dtype)
    wd = jnp.einsum("kcgo,gh->khcgo", w4, eye).reshape(k, cin, cout)
    return jax.lax.conv_general_dilated(
        x, wd, window_strides=(s,), padding=[((41 - 1) // 2,) * 2],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def im2col(x, w, s, g):
    import jax.numpy as jnp

    k, cpg, cout = w.shape
    b, W, cin = x.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    w_out = W // s
    # taps: [B, W_out, K, Cin] as K strided slices (no gather)
    cols = jnp.stack(
        [xp[:, j::s, :][:, :w_out] for j in range(k)], axis=2
    )
    cols = cols.reshape(b, w_out, k, g, cpg)
    # kernel [K, Cin/G, Cout]: the Cout axis is group-major (output block g
    # reads input group g), so split it as (g, Cout/G) — NOT the Cin/G axis
    wk = w.reshape(k, cpg, g, cout // g)
    return jnp.einsum("bwkgc,kcgo->bwgo", cols, wk).reshape(b, w_out, cout)


def s2d(x, w, s, g):
    """Fold the stride phase into channels, then native grouped stride-1.

    y[b, n, o] = sum_{j} x[b, n*s + j - pad, c] w[j, c, o]
    with x viewed as [b, W/s, s*C]: tap j hits phase (j - pad) mod s at
    folded offset (n + (j - pad) // s).  Build the folded kernel
    [k2, s*Cin/G, Cout] with zeros where a (offset, phase) pair has no tap.
    """
    import jax
    import jax.numpy as jnp

    k, cpg, cout = w.shape
    b, W, cin = x.shape
    pad = (k - 1) // 2
    off = [(j - pad) // s for j in range(k)]
    lo, hi = min(off), max(off)
    k2 = hi - lo + 1
    # folded kernel: zero-init, scatter taps by (offset, phase)
    w2 = np.zeros((k2, s, k), np.float32)  # selector [k2, s, k]
    for j in range(k):
        w2[off[j] - lo, (j - pad) % s, j] = 1.0
    sel = jnp.asarray(w2, x.dtype)
    # wf[t, p, c, o] = sum_j sel[t, p, j] w[j, c, o]
    wf = jnp.einsum("tpj,jco->tpco", sel, w.astype(x.dtype))
    wf = wf.reshape(k2, s * cpg, cout)  # per group: s*cpg in-channels
    xf = x.reshape(b, W // s, s * cin)
    # grouped conv over folded channels: group G reads its s*cpg block —
    # but folded layout interleaves groups within a phase; reorder to
    # [phase, group, cpg] -> [group, phase, cpg]
    xf = xf.reshape(b, W // s, s, g, cpg).transpose(0, 1, 3, 2, 4)
    xf = xf.reshape(b, W // s, g * s * cpg)
    return jax.lax.conv_general_dilated(
        xf, wf, window_strides=(1,), padding=[(-lo, hi)],
        feature_group_count=g, dimension_numbers=("NWC", "WIO", "NWC"),
    )


def pallas(x, w, s, g):
    """ops/grouped_conv.py channels-first kernel.  The [B,W,C]->[B,C,W]
    transpose happens once at the discriminator boundary in the real model
    (layers chain channels-first); it is loop-invariant here so XLA hoists
    it out of the timed fori_loop."""
    import jax.numpy as jnp

    from roar_tpu.ops.grouped_conv import grouped_conv1d_cf

    xc = jnp.swapaxes(x, 1, 2)
    y = grouped_conv1d_cf(xc, w, s, (41 - 1) // 2, g)
    return jnp.swapaxes(y, 1, 2)


def pallas_pp(x, w, s, g):
    """Same kernel with output-phase packing (best_out_fold): the matmul
    emits f output phases as extra M rows, filling the 128-row MXU for
    coutpg = 16-64 (DESIGN.md §7g headroom (b))."""
    import jax.numpy as jnp

    from roar_tpu.ops.grouped_conv import best_out_fold, grouped_conv1d_cf

    k, cpg, cout = w.shape
    cin = cpg * g
    f = best_out_fold(x.shape[1], k, s, (k - 1) // 2, cin, cout, g)
    xc = jnp.swapaxes(x, 1, 2)
    y = grouped_conv1d_cf(xc, w, s, (41 - 1) // 2, g, False, f)
    return jnp.swapaxes(y, 1, 2)


METHODS = {"native": native, "dense": dense, "im2col": im2col, "s2d": s2d,
           "pallas": pallas, "pallas_pp": pallas_pp}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--inner", type=int, default=20)
    p.add_argument("--methods", default="native,dense,im2col,s2d")
    p.add_argument("--shapes", default=None,
                   help="comma-separated shape-name filter (e.g. s0.conv2)")
    p.add_argument("--check", action="store_true",
                   help="verify each method matches native numerically")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from roar_tpu.config.cli import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    rng = np.random.default_rng(0)

    shapes = SHAPES
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = [sh for sh in SHAPES if sh[0] in keep]
    for name, W, cin, cout, k, s, g in shapes:
        x = jnp.asarray(rng.standard_normal((args.batch, W, cin)) * 0.1,
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.05,
                        jnp.bfloat16)
        flops = 2 * args.batch * (W // s) * k * (cin // g) * cout  # fwd
        results = {}
        for m in args.methods.split(","):
            fn = METHODS[m]

            if args.check:
                ref = np.asarray(native(x, w, s, g), np.float32)
                got = np.asarray(fn(x, w, s, g), np.float32)
                if got.shape != ref.shape:
                    print(f"# {name} {m}: SHAPE MISMATCH {got.shape} vs {ref.shape}")
                    continue
                err = np.abs(got - ref).max()
                if err > 0.25:  # bf16 conv, 1312-term dot: loose bound
                    print(f"# {name} {m}: MISMATCH max err {err}")
                    continue

            def loss(w, x, m=m, fn=fn):
                return jnp.sum(fn(x, w, s, g).astype(jnp.float32) ** 2)

            # both grads, like the real step (dW for the optimizer, dX for
            # the upstream layer)
            grad = jax.grad(loss, argnums=(0, 1))

            @jax.jit
            def bench(w, x, grad=grad):
                # loop carries the (bf16) weight gradient: a real data
                # dependence XLA cannot DCE, with no dtype promotion
                def body(i, gw):
                    gw2, _ = grad(w + gw * jnp.bfloat16(1e-30), x)
                    return gw2

                gw = jax.lax.fori_loop(
                    0, args.inner, body, jnp.zeros_like(w)
                )
                return jnp.sum(gw.astype(jnp.float32))

            try:
                float(bench(w, x))  # compile + warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = bench(w, x)
                    float(out)
                    best = min(best, (time.perf_counter() - t0) / args.inner)
            except Exception as e:
                print(f"# {name} {m}: FAILED {type(e).__name__}: {e}")
                continue
            results[m] = best
            print(json.dumps({
                "shape": name, "method": m, "ms": round(best * 1e3, 3),
                "fwd_bwd_tflops": round(3 * flops / best / 1e12, 1),
                "W": W, "cin": cin, "cout": cout, "k": k, "s": s, "g": g,
            }), flush=True)
        if results:
            top = min(results, key=results.get)
            print(f"# {name}: best={top} "
                  f"({results[top]*1e3:.2f} ms vs native "
                  f"{results.get('native', float('nan'))*1e3:.2f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
