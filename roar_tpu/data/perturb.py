"""Audio perturbations for data augmentation.

Re-design of the reference perturbation framework
(roar/collections/asr/parts/preprocessing/perturb.py, 1408 LoC): the
practically used subset — speed, gain, time shift, white noise, and noise
mixing from a manifest — as numpy host-side transforms composable via
`AudioAugmentor`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from roar_tpu.data.audio import AudioSegment, resample
from roar_tpu.data.manifest import read_manifest


class Perturbation:
    def max_augmentation_length(self, length: float) -> float:
        return length

    def perturb(self, samples: np.ndarray, sample_rate: int, rng) -> np.ndarray:
        raise NotImplementedError


class SpeedPerturbation(Perturbation):
    """Resample-based speed change (perturb.py SpeedPerturbation)."""

    def __init__(self, min_speed_rate=0.9, max_speed_rate=1.1, resolution=0.05):
        self.rates = np.arange(min_speed_rate, max_speed_rate + 1e-9, resolution)

    def max_augmentation_length(self, length):
        return length / float(self.rates.min())

    def perturb(self, samples, sample_rate, rng):
        rate = float(rng.choice(self.rates))
        if abs(rate - 1.0) < 1e-6:
            return samples
        new_sr = int(round(sample_rate * rate))
        return resample(samples, new_sr, sample_rate)


class GainPerturbation(Perturbation):
    def __init__(self, min_gain_dbfs=-10.0, max_gain_dbfs=10.0):
        self.min_gain_dbfs = min_gain_dbfs
        self.max_gain_dbfs = max_gain_dbfs

    def perturb(self, samples, sample_rate, rng):
        gain = rng.uniform(self.min_gain_dbfs, self.max_gain_dbfs)
        return samples * (10.0 ** (gain / 20.0))


class ShiftPerturbation(Perturbation):
    def __init__(self, min_shift_ms=-5.0, max_shift_ms=5.0):
        self.min_shift_ms = min_shift_ms
        self.max_shift_ms = max_shift_ms

    def perturb(self, samples, sample_rate, rng):
        shift = int(rng.uniform(self.min_shift_ms, self.max_shift_ms) * sample_rate / 1000)
        if shift == 0:
            return samples
        out = np.zeros_like(samples)
        if shift > 0:
            out[shift:] = samples[:-shift]
        else:
            out[:shift] = samples[-shift:]
        return out


class WhiteNoisePerturbation(Perturbation):
    def __init__(self, min_level=-90, max_level=-46):
        self.min_level = min_level
        self.max_level = max_level

    def perturb(self, samples, sample_rate, rng):
        level = rng.uniform(self.min_level, self.max_level)
        std = 10.0 ** (level / 20.0)
        return samples + rng.standard_normal(samples.shape).astype(samples.dtype) * std


class NoisePerturbation(Perturbation):
    """Mix a random noise clip from a manifest at a random SNR
    (perturb.py NoisePerturbation, used by scripts add_noise)."""

    def __init__(self, manifest_path, min_snr_db=10.0, max_snr_db=50.0, max_noise_duration=None):
        self.entries = read_manifest(manifest_path)
        self.min_snr_db = min_snr_db
        self.max_snr_db = max_snr_db
        self.max_noise_duration = max_noise_duration

    def perturb(self, samples, sample_rate, rng):
        entry = self.entries[int(rng.integers(0, len(self.entries)))]
        noise = AudioSegment.from_file(entry["audio_filepath"], target_sr=sample_rate).samples
        if len(noise) == 0:
            return samples
        snr_db = rng.uniform(self.min_snr_db, self.max_snr_db)
        # tile/crop noise to match
        if len(noise) < len(samples):
            reps = int(np.ceil(len(samples) / len(noise)))
            noise = np.tile(noise, reps)
        start = int(rng.integers(0, len(noise) - len(samples) + 1))
        noise = noise[start : start + len(samples)]
        sig_rms = np.sqrt(np.mean(samples**2) + 1e-12)
        noise_rms = np.sqrt(np.mean(noise**2) + 1e-12)
        gain = sig_rms / (noise_rms * (10.0 ** (snr_db / 20.0)))
        return samples + gain * noise


class AudioAugmentor:
    """Probabilistic composition of perturbations (perturb.py AudioAugmentor)."""

    def __init__(self, perturbations: Sequence[Tuple[float, Perturbation]], seed: int = 0):
        self.perturbations = list(perturbations)
        self.rng = np.random.default_rng(seed)

    def perturb(self, samples: np.ndarray, sample_rate: int) -> np.ndarray:
        for prob, p in self.perturbations:
            if self.rng.random() < prob:
                samples = p.perturb(samples, sample_rate, self.rng)
        return samples.astype(np.float32)
