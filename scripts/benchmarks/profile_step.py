#!/usr/bin/env python
"""Per-op device profile of a train step (VERDICT r3 #1/#4).

Captures a `jax.profiler` device trace of N steady-state steps of the
chosen model's training step, parses the xplane with xprof's op_profile
converter, and prints the top ops by device time with their HBM bytes and
achieved bandwidth — the attribution the roofline tables need (a step
"at 70% of HBM peak" is a hypothesis until the residual is per-op).

    python scripts/benchmarks/profile_step.py --model hifigan [--top 15]
        [--precision bf16] [--steps 3] [--json]

Models reuse the exact shapes/configs of train_step_bench.py.
"""

import argparse
import glob
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def build_step(model_name: str, batch: int, precision, fused_ce: bool = False,
               remat_policy: str = "nothing"):
    """(step_fn, args) for one compiled train step at bench shapes."""
    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.training.optim import build_optimizer

    root = Path(__file__).resolve().parents[2]
    rng = np.random.default_rng(0)
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})

    if model_name == "hifigan":
        from roar_tpu.models.hifigan_model import HifiGanModel

        cfg = load_config(root / "configs/hifigan_22050.yaml",
                          overrides=["train_dataset=x", "validation_datasets=x"])
        model = HifiGanModel(cfg["model"])
        seg = 8192
        batch_d = {
            "audio": jnp.asarray(
                rng.standard_normal((batch, seg)) * 0.1, jnp.float32),
            "audio_len": jnp.full((batch,), seg, jnp.int32),
        }
        state = model.init_state(jax.random.PRNGKey(0), batch_d, g_opt, d_opt)
        step = model.make_train_step(g_opt, d_opt, precision=precision)
        return step, (state, batch_d, jax.random.PRNGKey(1), 0)

    if model_name in ("jets", "jets_conformer"):
        from roar_tpu.models.jets_model import JETSModel

        name = ("jets_22050_align" if model_name == "jets"
                else "jets_22050_conformer")
        cfg = load_config(
            root / f"configs/{name}.yaml",
            overrides=["train_dataset=x", "validation_datasets=x",
                       "sup_data_path=x", "pitch_mean=170.0", "pitch_std=60.0",
                       "model.speaker_encoder.lookup_module.n_speakers=4"])
        model = JETSModel(cfg["model"])
        hop = model.hop_length
        B, T, M = batch, 128, 864
        batch_d = {
            "text": jnp.asarray(rng.integers(1, 40, (B, T)), jnp.int32),
            "text_len": jnp.full((B,), T, jnp.int32),
            "audio": jnp.asarray(
                rng.standard_normal((B, M * hop)) * 0.1, jnp.float32),
            "audio_len": jnp.full((B,), M * hop, jnp.int32),
            "pitch": jnp.asarray(rng.standard_normal((B, M)), jnp.float32),
            "align_prior_matrix": jnp.ones((B, M, T), jnp.float32) / T,
            "speaker_id": jnp.zeros((B,), jnp.int32),
        }
        state = model.init_state(jax.random.PRNGKey(0), batch_d, g_opt, d_opt)
        step = model.make_train_step(g_opt, d_opt, precision=precision)
        return step, (state, batch_d, jax.random.PRNGKey(1), 0)

    if model_name == "gpt1b":
        # the exact bench_gpt_1b step (train_step_bench.py): tiny-llama-1.1b,
        # scan+remat+flash+bf16, grad accumulation — the step whose 43.7%
        # model-FLOPs MFU needs trace attribution (cost_analysis cannot see
        # through the scanned/donated program; VERDICT r4 #5)
        import optax
        from functools import partial as _partial

        from roar_tpu.models.gpt import GPT, config_from_name
        from roar_tpu.training.trainer import cast_floating

        seq, accum = 4096, 4
        cfg = config_from_name("tiny-llama-1.1b", block_size=seq,
                               scan_layers=True, remat=True, use_flash=True,
                               remat_policy=remat_policy)
        model = GPT(cfg)
        B, S, K = max(1, batch // 16), seq, accum
        toks = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (K, B, S)), jnp.int32)
        tgts = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (K, B, S)), jnp.int32)
        params = cast_floating(
            jax.jit(model.init)(jax.random.PRNGKey(0), toks[0]), jnp.bfloat16)
        opt = optax.adamw(3e-4, b1=0.9, b2=0.95, mu_dtype=jnp.bfloat16)
        opt_state = jax.jit(opt.init)(params)

        if fused_ce:
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

        @_partial(jax.jit, donate_argnums=(0,))
        def step(state, toks, tgts):
            params, opt_state = state

            def acc(g_sum, mb):
                tok, tgt = mb
                l, g = jax.value_and_grad(loss_fn)(params, tok, tgt)
                return jax.tree_util.tree_map(jnp.add, g_sum, g), l

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            g_sum, losses = jax.lax.scan(acc, zeros, (toks, tgts))
            g_mean = jax.tree_util.tree_map(lambda g: g / K, g_sum)
            updates, opt_state = opt.update(g_mean, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), {
                "loss": jnp.mean(losses)
            }

        return step, ((params, opt_state), toks, tgts)

    if model_name == "fastpitch":
        from roar_tpu.models.fastpitch_model import FastPitchModel
        from roar_tpu.training.trainer import Trainer

        cfg = load_config(
            root / "configs/fastpitch_22050_align.yaml",
            overrides=["train_dataset=x", "validation_datasets=x",
                       "sup_data_path=x", "pitch_mean=170.0", "pitch_std=60.0",
                       "model.speaker_encoder.lookup_module.n_speakers=4"])
        model = FastPitchModel(cfg["model"])
        hop = model.mel_cfg.hop_length
        B, T, M = batch, 128, 864
        batch_d = {
            "text": jnp.asarray(rng.integers(1, 40, (B, T)), jnp.int32),
            "text_len": jnp.full((B,), T, jnp.int32),
            "audio": jnp.asarray(
                rng.standard_normal((B, M * hop)) * 0.1, jnp.float32),
            "audio_len": jnp.full((B,), M * hop, jnp.int32),
            "pitch": jnp.asarray(rng.standard_normal((B, M)), jnp.float32),
            "align_prior_matrix": jnp.ones((B, M, T), jnp.float32) / T,
            "speaker_id": jnp.zeros((B,), jnp.int32),
        }
        opt = build_optimizer(dict(cfg["model"]["optim"]), max_steps=10000,
                              gradient_clip_val=1000.0)
        trainer = Trainer(
            loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
            optimizer=opt, precision=precision)
        state = trainer.init_state(
            model.init_params(jax.random.PRNGKey(0), batch_d))
        return trainer._train_step, (state, batch_d, jax.random.PRNGKey(1), 0)

    raise SystemExit(f"unknown model {model_name}")


def _first_provenance(node):
    """Depth-first search for the first non-empty xla.provenance under a
    fused-op node (the fusion root itself usually has none; its consumed
    instructions do)."""
    xla = node.get("xla") or {}
    if xla.get("provenance"):
        return xla["provenance"], xla.get("expression", "")
    for c in node.get("children", []) or []:
        got = _first_provenance(c)
        if got:
            return got
    return None


def _phase_of(provenance: str) -> str:
    """Map 'jit(step_fn)/jvp(Generator)/...' -> a human phase label.
    transpose(jvp(X)) is X's backward; jvp(X) its forward."""
    import re

    if not provenance:
        return "?"
    m = re.search(r"transpose\(jvp\(([A-Za-z0-9_]+)\)\)", provenance)
    if m:
        return f"{m.group(1)}:bwd"
    m = re.search(r"jvp\(([A-Za-z0-9_]+)\)", provenance)
    if m:
        return f"{m.group(1)}:fwd"
    # first component after jit(step_fn)
    parts = [p for p in provenance.split("/") if p and not p.startswith("jit(")]
    return parts[0] if parts else provenance.split("/")[-1][:30]


def collect_ops(trace_dir: str, steps: int = 1):
    """Parse the xplane -> list of op dicts (category, name, provenance
    phase, per-STEP time/bytes/flops/bandwidth), plus program totals.

    The profiler reports the whole capture as one program occurrence, so
    per-step normalization divides by the number of traced `steps`."""
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    programs = d["byProgram"]["children"]
    # pick the program with the most device time (the train step; init and
    # helper dispatches are tiny)
    def ptime(p):
        return p.get("metrics", {}).get("rawTime", 0)

    prog = max(programs, key=ptime)
    n_runs = max(1, prog["metrics"].get("occurrences", 1)) * steps
    ops = []
    for cat in prog.get("children", []):
        for op in cat.get("children", []) or [cat]:
            m = op.get("metrics", {})
            if not m.get("rawTime"):
                continue
            occur = m.get("occurrences", 1)
            t_ms = m["rawTime"] / 1e9 / n_runs  # ps -> ms, per step
            hbm_bytes = (m.get("rawBytesAccessedArray") or [0])[0] / n_runs
            prov = _first_provenance(op) or ("", "")
            ops.append({
                "category": cat["name"],
                "op": op["name"],
                "phase": _phase_of(prov[0]),
                "provenance": prov[0].replace("jit(step_fn)/", ""),
                "expression": prov[1][:160],
                "calls_per_step": round(occur / n_runs, 1),
                "ms_per_step": round(t_ms, 3),
                "hbm_mb_per_step": round(hbm_bytes / 2**20, 1),
                "gbps": round(hbm_bytes / 2**30 / (t_ms / 1e3), 1)
                if t_ms else 0.0,
                "hbm_util": round((m.get("bandwidthUtils") or [0])[0], 3),
                "gflops_per_step": round(
                    m.get("rawFlops", 0) / n_runs / 1e9, 1),
            })
    ops.sort(key=lambda o: -o["ms_per_step"])
    total_ms = prog["metrics"]["rawTime"] / 1e9 / n_runs
    return prog["name"], n_runs, total_ms, ops


def phase_table(ops):
    """Aggregate per-step device time by provenance phase."""
    phases = {}
    for o in ops:
        p = phases.setdefault(o["phase"], {"ms": 0.0, "mb": 0.0, "gflop": 0.0})
        p["ms"] += o["ms_per_step"]
        p["mb"] += o["hbm_mb_per_step"]
        p["gflop"] += o["gflops_per_step"]
    return sorted(phases.items(), key=lambda kv: -kv[1]["ms"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="hifigan",
                   choices=["hifigan", "jets", "jets_conformer", "fastpitch",
                            "gpt1b"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--precision", default="bf16", choices=["bf16", "none"])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--json", action="store_true")
    p.add_argument("--trace-dir", default=None,
                   help="parse an existing trace instead of capturing one")
    p.add_argument("--fused-ce", action="store_true", dest="fused_ce",
                   help="gpt1b: fused lm_head+cross-entropy loss")
    p.add_argument("--remat-policy", default="nothing", dest="remat_policy",
                   choices=["nothing", "flash"],
                   help="gpt1b: 'flash' saves flash residuals across remat")
    args = p.parse_args()

    trace_dir = args.trace_dir
    if trace_dir is None:
        import jax

        from roar_tpu.config.cli import enable_persistent_compilation_cache

        enable_persistent_compilation_cache()
        prec = None if args.precision == "none" else args.precision
        step, sargs = build_step(args.model, args.batch, prec, args.fused_ce,
                                  args.remat_policy)
        # the steps donate their state (argnums 0): thread the returned
        # state through, or the second call reads a deleted buffer
        state, rest = sargs[0], sargs[1:]
        state, metrics = step(state, *rest)
        # sync: value-fetch (block_until_ready does not force remote exec)
        float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])
        trace_dir = tempfile.mkdtemp(prefix=f"trace_{args.model}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            for _ in range(args.steps):
                state, metrics = step(state, *rest)
            float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])
        wall = (time.perf_counter() - t0) / args.steps
        print(f"# traced {args.steps} steps, wall {wall*1e3:.1f} ms/step, "
              f"trace: {trace_dir}", file=sys.stderr)

    prog, n_runs, total_ms, ops = collect_ops(trace_dir, steps=args.steps)
    top = ops[: args.top]
    covered = sum(o["ms_per_step"] for o in top)
    phases = phase_table(ops)
    if args.json:
        print(json.dumps({
            "model": args.model, "program": prog, "runs": n_runs,
            "device_ms_per_step": round(total_ms, 2),
            "top_ms": round(covered, 2), "ops": top,
            "phases": [
                {"phase": k, **{m: round(v, 2) for m, v in d.items()}}
                for k, d in phases
            ],
        }))
        return
    print(f"program {prog}  runs={n_runs}  device {total_ms:.1f} ms/step  "
          f"(top {len(top)} ops cover {covered:.1f} ms)")
    print("\n-- device time by phase (provenance) --")
    print(f"{'phase':<36} {'ms':>8} {'MB':>9} {'GFLOP':>9}")
    for k, d in phases:
        print(f"{k:<36} {d['ms']:>8.2f} {d['mb']:>9.1f} {d['gflop']:>9.1f}")
    print()
    hdr = (f"{'op':<28} {'phase':<26} {'calls':>5} {'ms':>8} {'MB':>8} "
           f"{'GB/s':>7} {'util':>5} {'GFLOP':>8}")
    print(hdr)
    print("-" * len(hdr))
    for o in top:
        print(f"{o['op'][:28]:<28} {o['phase'][:26]:<26} "
              f"{o['calls_per_step']:>5} {o['ms_per_step']:>8.3f} "
              f"{o['hbm_mb_per_step']:>8.1f} {o['gbps']:>7.1f} "
              f"{o['hbm_util']:>5.2f} {o['gflops_per_step']:>8.1f}")
        if o["provenance"]:
            print(f"    {o['provenance'][:110]}")


if __name__ == "__main__":
    main()
