#!/usr/bin/env python
"""Training-step benchmark at shipped-config sizes, with optional bf16
mixed precision.

Measures steady-state ms/step on synthetic batches with the static bucket
shapes the real loader produces:
- `--model fastpitch` (default): supervised step incl. on-device mel
  front-end + MAS + forward-sum.
- `--model hifigan`: the full alternating GAN step (G + MPD + MSD, D and G
  updates in one jitted program) at the shipped 8192-sample segments.

    python scripts/benchmarks/train_step_bench.py [--model fastpitch|hifigan]
        [--batch N] [--precision bf16|none]

Prints one JSON line.
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: the GAN-step graphs take minutes to
    compile on the tunneled chip; cached, re-runs start in seconds (same
    helper the CLIs use, config/cli.py:24)."""
    from roar_tpu.config.cli import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()


def _mfu(step, dt, *step_args):
    """MFU/roofline block for the compiled step (VERDICT r2 #1): FLOPs from
    XLA cost_analysis, peak from the live chip's spec (utils/mfu.py)."""
    try:
        from roar_tpu.utils.mfu import compiled_costs, mfu_report

        return mfu_report(compiled_costs(step, *step_args), dt)
    except Exception as e:  # cost model absent on some backends
        return {"mfu": None, "mfu_error": str(e)[:120]}


def bench_hifigan(args):
    import jax
    import jax.numpy as jnp
    import time

    from roar_tpu.config import load_config
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.training.optim import build_optimizer

    root = Path(__file__).resolve().parents[2]
    cfg = load_config(
        root / "configs/hifigan_22050.yaml",
        overrides=["train_dataset=x", "validation_datasets=x"] + args.set)
    model = HifiGanModel(cfg["model"])
    seg = 8192
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((args.batch, seg)) * 0.1,
                             jnp.float32),
        "audio_len": jnp.full((args.batch,), seg, jnp.int32),
    }
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    prec = None if args.precision == "none" else args.precision
    step = model.make_train_step(g_opt, d_opt, precision=prec,
                                 shared_forward=not args.two_forward)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key, 0)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key, 0)
    float(metrics["g_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "hifigan_gan_step_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms/step",
        "batch": args.batch, "segment": seg, "precision": args.precision,
        "shared_forward": not args.two_forward,
        **({"overrides": args.set} if args.set else {}),
        "audio_sec_per_sec": round(args.batch * seg / 22050 / dt, 1),
        **_mfu(step, dt, state, batch, key, 0),
    }))


def bench_jets(args, config_name: str):
    """Full JETS GAN step (FastPitch graph + HiFi-GAN generator on 64-frame
    segments + MPD/MSD) at shipped-config sizes; `jets_conformer` swaps in
    the Conformer/RoPE encoder-decoder recipe (BASELINE configs[4])."""
    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.models.jets_model import JETSModel
    from roar_tpu.training.optim import build_optimizer

    root = Path(__file__).resolve().parents[2]
    cfg = load_config(
        root / f"configs/{config_name}.yaml",
        overrides=["train_dataset=x", "validation_datasets=x", "sup_data_path=x",
                   "pitch_mean=170.0", "pitch_std=60.0",
                   "model.speaker_encoder.lookup_module.n_speakers=4"] + args.set,
    )
    model = JETSModel(cfg["model"])
    hop = model.hop_length
    B, T, M = args.batch, args.text_len, args.mel_len
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, T)), jnp.int32),
        "text_len": jnp.full((B,), T, jnp.int32),
        "audio": jnp.asarray(rng.standard_normal((B, M * hop)) * 0.1, jnp.float32),
        "audio_len": jnp.full((B,), M * hop, jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, M)), jnp.float32),
        "align_prior_matrix": jnp.ones((B, M, T), jnp.float32) / T,
        "speaker_id": jnp.zeros((B,), jnp.int32),
    }
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    prec = None if args.precision == "none" else args.precision
    step = model.make_train_step(g_opt, d_opt, precision=prec,
                                 shared_forward=not args.two_forward)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key, 0)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key, 0)
    float(metrics["g_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"{config_name}_gan_step_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms/step",
        "batch": B, "text_len": T, "mel_len": M, "precision": args.precision,
        "shared_forward": not args.two_forward,
        "utterances_per_sec": round(B / dt, 1),
        **_mfu(step, dt, state, batch, key, 0),
    }))


def bench_gpt(args):
    """Causal-LM training step (cross-entropy fwd+bwd) at --seq tokens,
    optionally through the tuned Pallas causal flash kernel
    (GPTConfig(use_flash=True), DESIGN.md 7c: 2.2x at seq 4000)."""
    import time

    import jax
    import jax.numpy as jnp

    from roar_tpu.models.gpt import GPT, GPTConfig

    cfg = GPTConfig(
        vocab_size=256, block_size=max(args.seq, 128), n_layer=2, n_head=16,
        n_embd=1024, n_query_groups=4, intermediate_size=2816,
        rotary_percentage=1.0, use_flash=args.flash,
    )
    model = GPT(cfg)
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, 256, (args.batch, args.seq)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 256, (args.batch, args.seq)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tok)
    use_bf16 = args.precision == "bf16"

    @jax.jit
    def step(p):
        def loss(p):
            if use_bf16:  # bf16 compute, fp32 master (trainer.py semantics)
                from roar_tpu.training.trainer import cast_floating

                p = cast_floating(p, jnp.bfloat16)
            logits = model.apply(p, tok).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        l, g = jax.value_and_grad(loss)(p)
        return l + 0.0 * sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    float(step(params))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(params)
    float(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "gpt_train_step_ms", "value": round(dt * 1000, 2),
        "unit": "ms", "batch": args.batch, "seq": args.seq,
        "flash": bool(args.flash), "precision": args.precision,
        "tokens_per_sec": round(args.batch * args.seq / dt, 1),
        **_mfu(step, dt, params),
    }))


def bench_gpt_decode(args):
    """Cached single-token decode step (the generate() inner loop) at the
    tiny-llama shape: measures ms/token and the HBM roofline fraction.

    Decode reads the whole KV cache + all weights to produce ONE token per
    row — arithmetic intensity is O(batch) FLOPs/byte, far below the v5e
    ridge (~240), so the step is HBM-bound and a flash kernel (which saves
    softmax-intermediate traffic that only matters when q_len is large) has
    nothing to fuse at q_len=1.  This bench quantifies that: compare
    hbm_frac (near the achievable fraction of peak) with mfu (tiny).
    VERDICT r2 #8 evidence; numbers land in DESIGN.md 7c."""
    import time

    import jax
    import jax.numpy as jnp

    from roar_tpu.models.gpt import GPT, GPTConfig, init_kv_caches

    cfg = GPTConfig(
        vocab_size=32000, block_size=max(args.seq, 128), n_layer=22,
        n_head=32, n_embd=2048, n_query_groups=4, intermediate_size=5632,
        rotary_percentage=1.0,
    )  # tiny-llama-1.1b shape at a --seq-token cache
    model = GPT(cfg)
    rng = np.random.default_rng(0)
    B = args.batch
    tok = jnp.asarray(rng.integers(0, 32000, (B, 1)), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tok)
    dtype = jnp.float32
    if args.precision == "bf16":
        from roar_tpu.training.trainer import cast_floating

        params = cast_floating(params, jnp.bfloat16)
        dtype = jnp.bfloat16
    caches = init_kv_caches(cfg, B, dtype=dtype)

    # donate the caches: the serving loop (generate()'s lax.scan carry)
    # updates them in place; without donation XLA copies the full cache
    # every step, which at decode shapes is pure wasted HBM traffic
    @partial(jax.jit, donate_argnums=(3,))
    def decode(params, tok, pos, caches):
        logits, caches = model.apply(params, tok, pos, caches)
        return logits, caches

    pos = jnp.asarray(cfg.block_size // 2, jnp.int32)  # mid-cache decode
    logits, caches = decode(params, tok, pos, caches)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        logits, caches = decode(params, tok, pos, caches)
    float(jnp.sum(logits))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "gpt_decode_step_ms", "value": round(dt * 1000, 3),
        "unit": "ms/token", "batch": B, "kv_len": cfg.block_size,
        "tokens_per_sec": round(B / dt, 1),
        **_mfu(decode, dt, params, tok, pos, caches),
    }))


def bench_gpt_1b(args):
    """tiny-llama-1.1b (the registry flagship) TRAINS on one chip:
    scan-over-layers + per-block remat + Pallas flash + bf16 params/moments
    + gradient accumulation over --accum microbatches of --batch x --seq
    tokens (VERDICT r3 #2).  Reports tokens/s and two MFU numbers:
    `mfu` from XLA cost_analysis (counts the remat recompute — hardware
    FLOPs) and `mfu_model` from the standard 6*N*tokens + 12*L*d*S
    attention term (model FLOPs — the comparable-across-frameworks one)."""
    import jax
    import jax.numpy as jnp
    import optax

    from roar_tpu.models.gpt import GPT, config_from_name
    from roar_tpu.training.trainer import cast_floating

    cfg = config_from_name(
        "tiny-llama-1.1b", block_size=args.seq, scan_layers=True, remat=True,
        use_flash=args.flash, remat_policy=args.remat_policy,
    )
    model = GPT(cfg)
    B, S, K = args.batch, args.seq, args.accum
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (K, B, S)), jnp.int32)
    tgts = jnp.asarray(rng.integers(0, cfg.vocab_size, (K, B, S)), jnp.int32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), toks[0])
    params = cast_floating(params, jnp.bfloat16)  # bf16 resident weights
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    opt = optax.adamw(3e-4, b1=0.9, b2=0.95, mu_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(params)

    if args.fused_ce:
        from roar_tpu.ops.fused_ce import fused_cross_entropy

        def loss_fn(p, tok, tgt):
            hidden = model.apply(p, tok, return_hidden=True)
            loss, _ = fused_cross_entropy(
                hidden, p["params"]["lm_head"]["kernel"], tgt)
            return loss
    else:
        def loss_fn(p, tok, tgt):
            logits = model.apply(p, tok).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, toks, tgts):
        def acc(g_sum, mb):
            tok, tgt = mb
            l, g = jax.value_and_grad(loss_fn)(params, tok, tgt)
            return jax.tree_util.tree_map(jnp.add, g_sum, g), l
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        g_sum, losses = jax.lax.scan(acc, zeros, (toks, tgts))
        g_mean = jax.tree_util.tree_map(lambda g: g / K, g_sum)
        updates, opt_state = opt.update(g_mean, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, jnp.mean(losses)

    params, opt_state, l = step(params, opt_state, toks, tgts)
    float(l)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, l = step(params, opt_state, toks, tgts)
    float(l)
    dt = (time.perf_counter() - t0) / args.iters

    tokens = K * B * S
    model_flops = tokens * (6 * n_params + 12 * cfg.n_layer * cfg.n_embd * S)
    rep = _mfu(step, dt, params, opt_state, toks, tgts)
    from roar_tpu.utils.mfu import device_peaks
    peak_flops, _ = device_peaks()
    print(json.dumps({
        "metric": "gpt_1b_train_step_ms", "value": round(dt * 1000, 1),
        "unit": "ms/step", "model": "tiny-llama-1.1b", "params": n_params,
        "batch": B, "seq": S, "accum": K, "flash": bool(args.flash),
        "fused_ce": bool(args.fused_ce),
        "remat_policy": args.remat_policy,
        "precision": "bf16", "tokens_per_sec": round(tokens / dt, 1),
        "mfu_model": (round(model_flops / dt / peak_flops, 4)
                      if peak_flops else None),
        **rep,
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fastpitch",
                   choices=["fastpitch", "hifigan", "jets", "jets_conformer",
                            "gpt", "gpt_decode", "gpt_1b"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--text-len", type=int, default=128)
    p.add_argument("--mel-len", type=int, default=864)
    p.add_argument("--seq", type=int, default=4096, help="gpt: tokens per row")
    p.add_argument("--accum", type=int, default=4,
                   help="gpt_1b: grad-accumulation microbatches")
    p.add_argument("--flash", action="store_true", help="gpt: use_flash=True")
    p.add_argument("--fused-ce", action="store_true", dest="fused_ce",
                   help="gpt_1b: fused lm_head+cross-entropy "
                        "(ops/fused_ce.py) instead of materialized logits")
    p.add_argument("--remat-policy", default="nothing", dest="remat_policy",
                   choices=["nothing", "flash"],
                   help="gpt_1b: remat policy — 'flash' saves the flash "
                        "kernel residuals across the remat boundary "
                        "(ops/flash_remat.py)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="extra config dotlist overrides (hifigan: e.g. "
                        "model.msd_variant=dense)")
    p.add_argument("--precision", default="none", choices=["none", "bf16"])
    p.add_argument("--two-forward", action="store_true",
                   help="GAN models: use the generic two-forward step instead "
                        "of the shared-forward vjp step (before/after datum)")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    _enable_compile_cache()

    if args.batch is None:
        args.batch = (
            1 if args.model == "gpt_1b"
            else 2 if args.model in ("gpt", "gpt_decode") else 32
        )
    if args.model == "gpt_1b":
        return bench_gpt_1b(args)
    if args.model == "gpt_decode":
        return bench_gpt_decode(args)
    if args.model == "gpt":
        return bench_gpt(args)
    if args.model == "hifigan":
        return bench_hifigan(args)
    if args.model == "jets":
        return bench_jets(args, "jets_22050_align")
    if args.model == "jets_conformer":
        return bench_jets(args, "jets_22050_conformer")

    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.optim import build_optimizer
    from roar_tpu.training.trainer import Trainer

    root = Path(__file__).resolve().parents[2]
    cfg = load_config(
        root / "configs/fastpitch_22050_align.yaml",
        overrides=["train_dataset=x", "validation_datasets=x", "sup_data_path=x",
                   "pitch_mean=170.0", "pitch_std=60.0",
                   "model.speaker_encoder.lookup_module.n_speakers=4"],
    )
    model = FastPitchModel(cfg["model"])
    hop = model.mel_cfg.hop_length
    B, T, M = args.batch, args.text_len, args.mel_len
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, T)), jnp.int32),
        "text_len": jnp.full((B,), T, jnp.int32),
        "audio": jnp.asarray(rng.standard_normal((B, M * hop)) * 0.1, jnp.float32),
        "audio_len": jnp.full((B,), M * hop, jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, M)), jnp.float32),
        "align_prior_matrix": jnp.ones((B, M, T), jnp.float32) / T,
        "speaker_id": jnp.zeros((B,), jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    opt = build_optimizer(dict(cfg["model"]["optim"]), max_steps=10000,
                          gradient_clip_val=1000.0)
    trainer = Trainer(
        loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
        optimizer=opt,
        precision=None if args.precision == "none" else args.precision,
    )
    state = trainer.init_state(params)
    step = trainer._train_step

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key, 0)  # compile
    float(metrics["loss"])  # sync
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key, 0)
    float(metrics["loss"])  # checksum fetch forces execution
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "fastpitch_train_step_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms/step",
        "batch": B, "text_len": T, "mel_len": M,
        "precision": args.precision,
        "utterances_per_sec": round(B / dt, 1),
        **_mfu(step, dt, state, batch, key, 0),
    }))


if __name__ == "__main__":
    main()
