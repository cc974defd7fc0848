#!/usr/bin/env python
"""Inference RTF benchmark: FastPitch text->mel, HiFi-GAN mel->wav, and the
end-to-end text->wav pipeline, at full shipped-config model sizes.

RTF = wall-clock seconds of compute per second of audio produced (lower is
better; the reference's headline vocoder target is RTF <= 0.01 on one chip).

Usage:
    python scripts/benchmarks/tts_infer_rtf.py [--batch 8] [--mel-len 864]

Prints one JSON line per stage.  Uses randomly-initialized weights — RTF is
a pure compute/memory measurement, independent of weight values.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def timed(fn, sync, iters=20):
    # warmup: force the result so compilation cannot leak into the timed
    # loop (async-compile backends return before the executable is ready)
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--text-len", type=int, default=128)
    p.add_argument("--mel-len", type=int, default=864)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.models.hifigan_model import HifiGanModel

    root = Path(__file__).resolve().parents[2]
    fp_cfg = load_config(root / "configs/fastpitch_22050_align.yaml",
                         overrides=["train_dataset=x", "validation_datasets=x",
                                    "sup_data_path=x", "pitch_mean=170.0",
                                    "pitch_std=60.0",
                                    "model.speaker_encoder.lookup_module.n_speakers=4"])
    hg_cfg = load_config(root / "configs/hifigan_22050.yaml",
                         overrides=["train_dataset=x", "validation_datasets=x"])

    sr = 22050
    hop = 256
    fp = FastPitchModel(fp_cfg["model"])
    hg = HifiGanModel(hg_cfg["model"])

    rng = jax.random.PRNGKey(0)
    tokens = jnp.ones((args.batch, args.text_len), jnp.int32)
    speaker = jnp.zeros((args.batch,), jnp.int32)
    fp_params = fp.module.init(
        {"params": rng}, tokens, speaker=speaker, max_mel_len=args.mel_len,
        method=fp.module.infer,
    )
    mel0 = jnp.zeros((args.batch, args.mel_len, hg.mel_cfg.nfilt), jnp.float32)
    hg_params = hg.generator.init(rng, mel0)

    # jitted stages; each reduced to a scalar checksum for a real device sync
    @jax.jit
    def mel_stage(params, tokens):
        out = fp.module.apply(params, tokens, speaker=speaker,
                              max_mel_len=args.mel_len, method=fp.module.infer)
        return out["spect"], out["num_frames"]

    @jax.jit
    def voc_stage(params, mel):
        return hg.generator.apply(params, mel)

    @jax.jit
    def e2e_stage(fpp, hgp, tokens):
        spect, n = mel_stage(fpp, tokens)
        return voc_stage(hgp, spect), n

    def sync(x=None):
        if x is not None:
            leaves = jax.tree_util.tree_leaves(x)
            float(jnp.sum(leaves[0]))

    audio_seconds = args.batch * args.mel_len * hop / sr

    t_mel = timed(lambda: mel_stage(fp_params, tokens), sync, args.iters)
    mel = mel_stage(fp_params, tokens)[0]
    t_voc = timed(lambda: voc_stage(hg_params, mel), sync, args.iters)
    t_e2e = timed(lambda: e2e_stage(fp_params, hg_params, tokens), sync, args.iters)

    for name, t in [("fastpitch_mel", t_mel), ("hifigan_vocoder", t_voc),
                    ("text_to_wav_e2e", t_e2e)]:
        print(json.dumps({
            "metric": f"{name}_rtf",
            "value": round(t / audio_seconds, 6),
            "unit": "sec_compute_per_sec_audio",
            "batch": args.batch,
            "audio_seconds_per_call": round(audio_seconds, 2),
            "ms_per_call": round(t * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
