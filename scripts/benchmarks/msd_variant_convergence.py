#!/usr/bin/env python
"""Convergence A/B of the MSD discriminator variants (VERDICT r4 #3).

DESIGN.md §7g item (c) claims the reference MSD's grouped convs are
TPU-hostile and a dense-channel stack of ~equal parameter count would
recover the occupancy gap "at equal audio quality" — an untested claim
until this run.  This script trains the FULL HiFi-GAN GAN step (G + MPD +
MSD, shipped 22.05 kHz config, 8192-sample segments, bf16) twice from the
same seed on the same synthetic corpus — `model.msd_variant=grouped` vs
`dense` — and records the loss trajectories that show whether the dense
discriminator still trains the generator: the L1 mel loss must fall
comparably, and the adversarial/feature-matching losses must stay in a
healthy GAN band (D not collapsing to 0 = D overpowering, not exploding).

    python scripts/benchmarks/msd_variant_convergence.py \
        [--steps 400] [--batch 16] [--out /tmp/msd_ab]

Prints one JSON line per variant plus a verdict line; writes the
trajectory plot + raw curves under --out.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def synthetic_batches(n_steps: int, batch: int, seg: int, seed: int = 0):
    """Deterministic harmonic corpus: each crop is a 3-harmonic tone with
    a random f0 (110-330 Hz), per-harmonic decay, amplitude envelope and
    a little noise — enough spectral structure that vocoding it from its
    mel is a real task, cheap enough to synthesize on the fly."""
    sr = 22050
    rng = np.random.default_rng(seed)
    t = np.arange(seg) / sr
    for _ in range(n_steps):
        f0 = rng.uniform(110.0, 330.0, (batch, 1))
        phase = rng.uniform(0, 2 * np.pi, (batch, 3, 1))
        amps = np.array([1.0, 0.5, 0.25])[None, :, None] * rng.uniform(
            0.7, 1.3, (batch, 3, 1)
        )
        harm = amps * np.sin(
            2 * np.pi * f0[:, None] * np.arange(1, 4)[None, :, None] * t + phase
        )
        env = 0.5 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(1.0, 4.0, (batch, 1)) * t
            + rng.uniform(0, 2 * np.pi, (batch, 1))
        )
        x = 0.3 * env * harm.sum(1) + 0.003 * rng.standard_normal((batch, seg))
        yield x.astype(np.float32)


def run_variant(variant: str, steps: int, batch: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.training.optim import build_optimizer

    root = Path(__file__).resolve().parents[2]
    cfg = load_config(
        root / "configs/hifigan_22050.yaml",
        overrides=["train_dataset=x", "validation_datasets=x",
                   f"model.msd_variant={variant}"])
    model = HifiGanModel(cfg["model"])
    seg = 8192
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    gen = synthetic_batches(steps + 1, batch, seg, seed)
    first = next(gen)
    batch_d = {"audio": jnp.asarray(first),
               "audio_len": jnp.full((batch,), seg, jnp.int32)}
    state = model.init_state(jax.random.PRNGKey(seed), batch_d, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt, precision="bf16")
    key = jax.random.PRNGKey(seed + 1)

    curves = {k: [] for k in ("g_mel_loss", "g_fm_loss", "g_adv_loss",
                              "d_loss_mpd", "d_loss_msd")}
    t0 = time.perf_counter()
    for i, audio in enumerate(gen):
        batch_d = {"audio": jnp.asarray(audio),
                   "audio_len": jnp.full((batch,), seg, jnp.int32)}
        state, metrics = step(state, batch_d, key, 0)
        for k in curves:
            curves[k].append(float(metrics[k]))
    wall = time.perf_counter() - t0

    def mean(xs):
        return float(np.mean(xs)) if xs else float("nan")

    w = max(10, steps // 8)
    summary = {
        "variant": variant, "steps": steps, "batch": batch,
        "wall_s": round(wall, 1),
        "mel_first": round(mean(curves["g_mel_loss"][:w]), 3),
        "mel_last": round(mean(curves["g_mel_loss"][-w:]), 3),
        "fm_last": round(mean(curves["g_fm_loss"][-w:]), 3),
        "adv_last": round(mean(curves["g_adv_loss"][-w:]), 3),
        "d_msd_last": round(mean(curves["d_loss_msd"][-w:]), 3),
        "d_mpd_last": round(mean(curves["d_loss_mpd"][-w:]), 3),
    }
    return summary, curves


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--out", default="/tmp/msd_ab")
    args = p.parse_args()

    from roar_tpu.config.cli import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    results = {}
    for variant in ("grouped", "dense"):
        summary, curves = run_variant(variant, args.steps, args.batch)
        results[variant] = (summary, curves)
        print(json.dumps(summary))

    np.savez(out / "curves.npz", **{
        f"{v}_{k}": np.asarray(c) for v, (_, cs) in results.items()
        for k, c in cs.items()
    })

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
        panels = [("g_mel_loss", "L1 mel loss"),
                  ("g_fm_loss", "feature-matching loss"),
                  ("d_loss_msd", "MSD discriminator loss")]
        for ax, (key, title) in zip(axes, panels):
            for variant, style in (("grouped", "-"), ("dense", "--")):
                ax.plot(results[variant][1][key], style, lw=1.0, label=variant)
            ax.set_title(title)
            ax.set_xlabel("step")
            ax.legend()
        fig.tight_layout()
        fig.savefig(out / "msd_variant_convergence.png", dpi=110)
    except Exception as e:  # plot is best-effort; curves.npz is the record
        print(json.dumps({"plot_error": str(e)[:120]}))

    g, d = results["grouped"][0], results["dense"][0]
    verdict = {
        "metric": "msd_variant_convergence",
        "mel_drop_grouped": round(g["mel_first"] - g["mel_last"], 3),
        "mel_drop_dense": round(d["mel_first"] - d["mel_last"], 3),
        "mel_last_ratio_dense_over_grouped": round(
            d["mel_last"] / max(g["mel_last"], 1e-9), 3),
        "out": str(out),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
