#!/usr/bin/env python
"""Benchmark: sup-data extraction throughput (mel frames/sec/chip).

This is BASELINE.json's headline metric: the reference extracts mel + pYIN
pitch + energy on CPU dataloader workers
(scripts/dataset_processing/tts/extract_sup_data.py); the build target is
>=5x that throughput per TPU chip.  We measure:

- baseline: the CPU-reference pYIN+mel pipeline (numpy/scipy single thread,
  the same algorithm librosa runs) on one utterance, extrapolated to
  frames/sec — librosa itself is not installed in this image.
- ours: the batched on-device extractor (log-mel + batched pYIN + energy in
  one jit), steady-state.

Prints one JSON line per metric (the driver records every line):
  {"metric": "supdata_mel_frames_per_sec_per_chip", "value": N,
   "unit": "frames/sec", "vs_baseline": N}
  {"metric": "hifigan_rtf_22050", "value": N,
   "unit": "sec_compute_per_sec_audio", "vs_baseline": N}

The second line is BASELINE.json's other north-star clause: HiFi-GAN v1
mel->wav synthesis real-time factor at 22.05 kHz (target <= 0.01/chip;
vs_baseline = 0.01 / measured, i.e. how many times under the bar).
"""

import json
import time
from pathlib import Path

import numpy as np

# Pinned CPU-oracle throughput (frames/sec) for the sup-data pipeline:
# ops/pyin_reference.py pyin_cpu + numpy windowed-DFT mel on 4 s / 22.05 kHz
# utterances, single thread, WARM caches (one discarded warmup run builds the
# audio-independent beta/transition tables a real extraction job amortizes),
# median of 5 runs each on a different utterance, otherwise-idle host
# (measured r3; see BASELINE.md "Pinned CPU baseline").  The r1/r2 headline
# ratios swung 6x because the live oracle was timed COLD — table-build time
# dominated one 4 s utterance.  The live oracle is still timed each run
# (vs_live_oracle, cold, single run) as a sanity cross-check, but the
# headline vs_baseline uses this constant so the ratio is reproducible
# run-to-run (VERDICT r2 weak-point 2).
PINNED_CPU_BASELINE_FPS = 571.4


def make_audio(batch, seconds, sr, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    out = []
    for i in range(batch):
        f0 = 110.0 * (2 ** (i % 12 / 12.0))
        vib = np.sin(2 * np.pi * 5.0 * t) * 0.02
        x = 0.4 * np.sin(2 * np.pi * f0 * (1 + vib) * t)
        x += 0.05 * np.sin(2 * np.pi * 2 * f0 * t) + 0.01 * rng.standard_normal(len(t))
        out.append(x.astype(np.float32))
    return out


def bench_hifigan_rtf(batch=8, mel_len=864, iters=20):
    """HiFi-GAN v1 synthesis RTF at 22.05 kHz (shipped-config generator).

    Same measurement as scripts/benchmarks/tts_infer_rtf.py: one jitted
    mel->wav generator call on [batch, mel_len, 80] mels, steady-state,
    RTF = compute seconds per second of audio produced.
    """
    import jax
    import jax.numpy as jnp

    from roar_tpu.config import load_config
    from roar_tpu.models.hifigan_model import HifiGanModel

    root = Path(__file__).resolve().parent
    cfg = load_config(
        root / "configs/hifigan_22050.yaml",
        overrides=["train_dataset=x", "validation_datasets=x"],
    )
    sr, hop = 22050, 256
    hg = HifiGanModel(cfg["model"])
    mel = jnp.zeros((batch, mel_len, hg.mel_cfg.nfilt), jnp.float32)
    params = hg.generator.init(jax.random.PRNGKey(0), mel)

    @jax.jit
    def voc(params, mel):
        return hg.generator.apply(params, mel)

    audio_seconds = batch * mel_len * hop / sr

    def timed_rtf(p, m):
        float(jnp.sum(voc(p, m)))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = voc(p, m)
        float(jnp.sum(out))  # force execution (block_until_ready can no-op
        # under remote-dispatch PJRT plugins; a scalar fetch cannot)
        return (time.perf_counter() - t0) / iters / audio_seconds

    rtf = timed_rtf(params, mel)
    print(
        json.dumps(
            {
                "metric": "hifigan_rtf_22050",
                "value": round(rtf, 6),
                "unit": "sec_compute_per_sec_audio",
                "vs_baseline": round(0.01 / rtf, 2),
            }
        )
    )
    # bf16 inference variant: ~1.4x faster, waveform deviation vs fp32
    # <=1.1e-3 on +-1-scale audio (inaudible); fp32 stays the headline.
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    rtf_bf16 = timed_rtf(cast(params), mel.astype(jnp.bfloat16))
    print(
        json.dumps(
            {
                "metric": "hifigan_rtf_22050_bf16",
                "value": round(rtf_bf16, 6),
                "unit": "sec_compute_per_sec_audio",
                "vs_baseline": round(0.01 / rtf_bf16, 2),
            }
        )
    )


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from roar_tpu.data.sup_data import SupDataConfig, _extract_batch
    from roar_tpu.ops.pyin_reference import pyin_cpu

    sr = 22050
    cfg = SupDataConfig(
        sample_rate=sr, n_fft=2048, win_length=2048, hop_length=512, n_mels=80,
        highfreq=8000.0,
    )
    mel_cfg, pyin_cfg = cfg.mel_config(), cfg.pyin_config()

    # ----- CPU reference (single utterance, extrapolated) -----
    # numpy/scipy twin of librosa.pyin + mel (same algorithm, banded Viterbi)
    from roar_tpu.ops.spectrogram import _windowed_dft_matrix

    cpu_audio = make_audio(1, 4.0, sr, seed=1)[0]
    basis = _windowed_dft_matrix(mel_cfg.fft_length, mel_cfg.win_length, mel_cfg.window)
    fb = mel_cfg.filterbank()
    t0 = time.perf_counter()
    f0_cpu, _, _ = pyin_cpu(cpu_audio, pyin_cfg)
    # numpy mel: frame -> windowed DFT matmul -> |.| -> mel -> log
    pad = mel_cfg.fft_length // 2
    xp = np.pad(cpu_audio, (pad, pad), mode="reflect")
    nfr = (len(xp) - mel_cfg.fft_length) // mel_cfg.hop_length + 1
    fidx = (
        np.arange(nfr)[:, None] * mel_cfg.hop_length
        + np.arange(mel_cfg.fft_length)[None, :]
    )
    proj = xp[fidx] @ basis
    nfq = 1 + mel_cfg.fft_length // 2
    mag = np.sqrt(proj[:, :nfq] ** 2 + proj[:, nfq:] ** 2)
    _ = np.log(mag @ fb.T + 1e-5)
    cpu_time = time.perf_counter() - t0
    cpu_frames = len(cpu_audio) // cfg.hop_length + 1
    cpu_fps = cpu_frames / cpu_time

    # ----- device path -----
    # The timed function reduces every output to one scalar checksum on
    # device; fetching it forces real execution (a plain block_until_ready
    # can be a no-op under remote-dispatch PJRT plugins).
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def bench_step(audio, lens, mel_cfg, pyin_cfg):
        mel, mel_lens, energy, f0, voiced, vprob = _extract_batch(
            audio, lens, mel_cfg, pyin_cfg
        )
        return (
            jnp.sum(mel) + jnp.sum(energy) + jnp.sum(f0) + jnp.sum(vprob)
        ) + jnp.sum(mel_lens) + jnp.sum(voiced)

    batch, seconds = 128, 10.0  # throughput saturates ~128 (scripts/benchmarks sweep)
    audios = make_audio(batch, seconds, sr, seed=2)
    lens = np.array([len(a) for a in audios], np.int32)
    pad = int(np.ceil(lens.max() / 16384)) * 16384
    buf = np.zeros((batch, pad), np.float32)
    for i, a in enumerate(audios):
        buf[i, : len(a)] = a
    dev_audio = jnp.asarray(buf)
    dev_lens = jnp.asarray(lens)

    # warmup / compile
    float(bench_step(dev_audio, dev_lens, mel_cfg, pyin_cfg))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s = bench_step(dev_audio, dev_lens, mel_cfg, pyin_cfg)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    total_frames = int(np.sum(lens // cfg.hop_length + 1))
    fps = total_frames / dt

    print(
        json.dumps(
            {
                "metric": "supdata_mel_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/sec",
                # headline ratio vs the PINNED median-of-5 oracle constant —
                # reproducible run-to-run; the live single-run oracle ratio
                # is kept as a cross-check only
                "vs_baseline": round(fps / PINNED_CPU_BASELINE_FPS, 2),
                "pinned_baseline_fps": PINNED_CPU_BASELINE_FPS,
                "vs_live_oracle": round(fps / cpu_fps, 2),
                "live_oracle_fps": round(cpu_fps, 2),
                # baseline methodology: librosa is not installed in this
                # image, so the CPU baseline is ops/pyin_reference.py — a
                # single-thread numpy/scipy implementation of the same
                # banded-Viterbi pYIN algorithm librosa runs — timed on one
                # 4 s utterance and extrapolated to frames/sec.
                "baseline_method": "pyin_reference.py numpy single-thread, 1x4s utterance, pinned median-of-5",
            }
        )
    )


if __name__ == "__main__":
    main()
    bench_hifigan_rtf()
