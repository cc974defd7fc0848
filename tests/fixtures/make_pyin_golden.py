#!/usr/bin/env python
"""Generate the committed pYIN golden fixtures (tests/fixtures/pyin_golden.npz).

The ground truth here comes ONLY from the synthesis parameters — no pYIN
implementation (device, CPU reference, or librosa) is in the loop, so a shared
misreading of the pYIN paper in ops/pyin.py and ops/pyin_reference.py cannot
leak into the expectations (VERDICT r2 weak-point 3 / SURVEY §7 hard part 1).

Four clips at the production 22.05 kHz config (frame_length 2048, hop 512 —
the PitchFeaturizer shape, reference
roar/collections/tts/parts/preprocessing/features.py:341-397):

- sweep       exponential glide 110→440 Hz; instantaneous F0 is analytic.
- vibrato     220 Hz carrier, 5.5 Hz vibrato, ±50 cents; F0(t) analytic.
- mixed       silence / 180 Hz tone / white noise / 240 Hz tone; the voicing
              mask is known per segment by construction.
- octave_bait 165 Hz with a dominant 2nd harmonic (amp 0.9 vs 0.25 on the
              fundamental) — the classic octave-error trap.

Per-frame truth is evaluated at frame centers (center=True ⇒ t_c = i·hop/sr).
Frames whose analysis window overlaps a segment boundary or a clip edge are
masked out of scoring (`score`), since no estimator has a well-defined answer
there. Tolerances the fixtures are scored against live in
tests/test_pyin.py::test_pyin_golden_fixtures and DESIGN.md §"pYIN golden
fixtures".

Regenerate with:  python tests/fixtures/make_pyin_golden.py
"""

import numpy as np
from pathlib import Path

SR = 22050
FRAME_LENGTH = 2048  # production PyinConfig default; hop = 512
HOP = FRAME_LENGTH // 4
DUR = 1.5  # seconds per clip
EDGE = FRAME_LENGTH // 2 + HOP  # scoring guard band around boundaries, samples


def _phase_from_f(f_inst: np.ndarray) -> np.ndarray:
    """Integrate instantaneous frequency (Hz, per sample) to phase (radians)."""
    return 2.0 * np.pi * np.cumsum(f_inst) / SR


def _frames(n_samples: int) -> np.ndarray:
    """Frame-center sample indices for center=True framing."""
    n_frames = n_samples // HOP + 1
    return np.arange(n_frames) * HOP


def _score_mask(n_samples: int, boundaries) -> np.ndarray:
    """True for frames whose window stays inside one homogeneous segment."""
    centers = _frames(n_samples)
    ok = np.ones(len(centers), bool)
    for b in [0, n_samples, *boundaries]:
        ok &= np.abs(centers - b) >= EDGE
    return ok


def _harmonic(phase: np.ndarray, amps=(1.0, 0.3, 0.15)) -> np.ndarray:
    x = sum(a * np.sin((k + 1) * phase) for k, a in enumerate(amps))
    return (0.4 * x / max(1.0, sum(amps))).astype(np.float32)


def make_sweep():
    n = int(SR * DUR)
    t = np.arange(n) / SR
    f0, f1 = 110.0, 440.0
    f_inst = f0 * (f1 / f0) ** (t / DUR)
    x = _harmonic(_phase_from_f(f_inst))
    centers = _frames(n)
    truth_f0 = f0 * (f1 / f0) ** ((centers / SR) / DUR)
    voiced = np.ones(len(centers), bool)
    return x, truth_f0.astype(np.float32), voiced, _score_mask(n, [])


def make_vibrato():
    n = int(SR * DUR)
    t = np.arange(n) / SR
    depth_cents, rate = 50.0, 5.5
    f_inst = 220.0 * 2.0 ** (depth_cents * np.sin(2 * np.pi * rate * t) / 1200.0)
    x = _harmonic(_phase_from_f(f_inst))
    centers = _frames(n)
    tc = centers / SR
    truth_f0 = 220.0 * 2.0 ** (depth_cents * np.sin(2 * np.pi * rate * tc) / 1200.0)
    voiced = np.ones(len(centers), bool)
    return x, truth_f0.astype(np.float32), voiced, _score_mask(n, [])


def make_mixed():
    rng = np.random.default_rng(7)
    seg_silence = np.zeros(int(0.3 * SR), np.float32)
    t1 = np.arange(int(0.6 * SR)) / SR
    seg_tone1 = _harmonic(2 * np.pi * 180.0 * t1)
    seg_noise = (0.1 * rng.standard_normal(int(0.3 * SR))).astype(np.float32)
    t2 = np.arange(int(0.3 * SR)) / SR
    seg_tone2 = _harmonic(2 * np.pi * 240.0 * t2)
    segs = [seg_silence, seg_tone1, seg_noise, seg_tone2]
    seg_f0 = [0.0, 180.0, 0.0, 240.0]
    x = np.concatenate(segs)
    bounds = np.cumsum([len(s) for s in segs])[:-1]
    centers = _frames(len(x))
    seg_idx = np.searchsorted(bounds, centers, side="right")
    truth_f0 = np.asarray(seg_f0, np.float32)[seg_idx]
    voiced = truth_f0 > 0
    return x, truth_f0, voiced, _score_mask(len(x), bounds)


def make_octave_bait():
    n = int(SR * DUR)
    t = np.arange(n) / SR
    f0 = 165.0
    phase = 2 * np.pi * f0 * t
    rng = np.random.default_rng(11)
    x = 0.25 * np.sin(phase) + 0.9 * np.sin(2 * phase) + 0.15 * np.sin(3 * phase)
    x = (0.35 * x / 1.3 + 0.005 * rng.standard_normal(n)).astype(np.float32)
    centers = _frames(n)
    truth_f0 = np.full(len(centers), f0, np.float32)
    voiced = np.ones(len(centers), bool)
    return x, truth_f0, voiced, _score_mask(n, [])


def main():
    clips = {
        "sweep": make_sweep(),
        "vibrato": make_vibrato(),
        "mixed": make_mixed(),
        "octave_bait": make_octave_bait(),
    }
    out = {"sample_rate": SR, "frame_length": FRAME_LENGTH, "hop": HOP,
           "names": np.asarray(sorted(clips))}
    for name, (audio, f0, voiced, score) in clips.items():
        out[f"{name}_audio"] = audio
        out[f"{name}_f0"] = f0
        out[f"{name}_voiced"] = voiced
        out[f"{name}_score"] = score
    path = Path(__file__).parent / "pyin_golden.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
