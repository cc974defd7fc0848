"""Audio perturbations for data augmentation.

Re-design of the reference perturbation framework
(roar/collections/asr/parts/preprocessing/perturb.py, 1408 LoC) as numpy
host-side transforms composable via `AudioAugmentor`: speed, time-stretch
(phase vocoder), gain, silence padding, RIR convolution, time shift, noise
mixing, white noise, RIR+noise, codec transcoding, and random segments —
plus the name registry / `process_augmentations` config entry point
(perturb.py:1121-1242).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

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


def _phase_vocoder(stft: np.ndarray, rate: float, hop_length: int) -> np.ndarray:
    """Time-stretch a complex STFT [freq, frames] by `rate` (>1 = faster)
    via classic phase-vocoder resynthesis: magnitudes are linearly
    interpolated at fractional frame positions and phases accumulate the
    expected per-hop advance plus the wrapped instantaneous deviation."""
    n_freq, n_frames = stft.shape
    n_fft = 2 * (n_freq - 1)
    time_steps = np.arange(0, n_frames, rate)
    # expected phase advance per hop for each bin
    phi_advance = np.linspace(0, np.pi * hop_length, n_freq)
    # pad one zero frame so idx+1 is always valid
    stft = np.concatenate([stft, np.zeros((n_freq, 2), stft.dtype)], axis=1)
    out = np.empty((n_freq, len(time_steps)), dtype=stft.dtype)
    phase_acc = np.angle(stft[:, 0])
    for t, step in enumerate(time_steps):
        idx = int(step)
        frac = step - idx
        a, b = stft[:, idx], stft[:, idx + 1]
        mag = (1.0 - frac) * np.abs(a) + frac * np.abs(b)
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(b) - np.angle(a) - phi_advance
        dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))  # wrap
        phase_acc += phi_advance + dphase
    return out


class TimeStretchPerturbation(Perturbation):
    """Pitch-preserving time stretch via a numpy phase vocoder
    (perturb.py:146-260 TimeStretchPerturbation; same knobs, own
    implementation over scipy STFT/ISTFT)."""

    def __init__(self, min_speed_rate=0.9, max_speed_rate=1.1, num_rates=5, n_fft=512):
        if min(min_speed_rate, max_speed_rate) <= 0.0:
            raise ValueError("speed rates must be > 0")
        self.min_rate = min_speed_rate
        self.max_rate = max_speed_rate
        self.num_rates = num_rates
        self.rates = (
            np.linspace(min_speed_rate, max_speed_rate, num_rates, endpoint=True)
            if num_rates > 0
            else None
        )
        self.n_fft = int(n_fft)
        self.hop = self.n_fft // 2

    def max_augmentation_length(self, length):
        return length * self.max_rate

    def perturb(self, samples, sample_rate, rng):
        from scipy import signal as sps

        rate = (
            float(rng.choice(self.rates))
            if self.rates is not None
            else float(rng.uniform(self.min_rate, self.max_rate))
        )
        if abs(rate - 1.0) < 1e-9:
            return samples
        # slow-down doubles the window (matching the reference's fft_multiplier
        # trick, perturb.py:222-233) to bound smearing artifacts
        mult = 1 if rate >= 1.0 else 2
        n_fft, hop = self.n_fft * mult, self.hop * mult
        _, _, stft = sps.stft(
            samples, nperseg=n_fft, noverlap=n_fft - hop, boundary="zeros",
            padded=True,
        )
        stretched = _phase_vocoder(stft, rate, hop)
        _, y = sps.istft(stretched, nperseg=n_fft, noverlap=n_fft - hop)
        target_len = int(round(len(samples) / rate))
        y = y[:target_len].astype(samples.dtype)
        if len(y) < target_len:
            y = np.pad(y, (0, target_len - len(y)))
        return y


class SilencePerturbation(Perturbation):
    """Random silence padding at start/end (perturb.py:264-305)."""

    def __init__(
        self,
        min_start_silence_secs=0.0,
        max_start_silence_secs=0.0,
        min_end_silence_secs=0.0,
        max_end_silence_secs=0.0,
        value=0.0,
    ):
        self.start_range = (min_start_silence_secs, max_start_silence_secs)
        self.end_range = (min_end_silence_secs, max_end_silence_secs)
        self.value = value

    def max_augmentation_length(self, length):
        return length + self.start_range[1] + self.end_range[1]

    def perturb(self, samples, sample_rate, rng):
        n_start = int(rng.uniform(*self.start_range) * sample_rate)
        n_end = int(rng.uniform(*self.end_range) * sample_rate)
        return np.concatenate(
            [
                np.full((n_start,), self.value, samples.dtype),
                samples,
                np.full((n_end,), self.value, samples.dtype),
            ]
        )


class ImpulsePerturbation(Perturbation):
    """Convolve with a room impulse response drawn from a manifest
    (perturb.py:327-400): optional zero-mean/unit-amp normalization,
    optional dominant-path delay compensation, peak renormalization."""

    def __init__(self, manifest_path, normalize_impulse=False, shift_impulse=False):
        self.entries = read_manifest(manifest_path)
        self.normalize_impulse = normalize_impulse
        self.shift_impulse = shift_impulse

    def perturb(self, samples, sample_rate, rng):
        from scipy import signal as sps

        entry = self.entries[int(rng.integers(0, len(self.entries)))]
        ir = AudioSegment.from_file(entry["audio_filepath"], target_sr=sample_rate).samples
        if len(ir) == 0:
            return samples
        if self.normalize_impulse:
            ir = ir - ir.mean()
            ir = ir / max(np.abs(ir).max(), 1e-12)
        out = sps.fftconvolve(samples, ir, mode="full")
        if self.shift_impulse:
            out = out[int(np.argmax(np.abs(ir))):]
        out = out[: len(samples)]
        peak = np.abs(out).max()
        return (out / peak if peak > 0 else out).astype(samples.dtype)


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

    def get_one_noise(self, sample_rate: int, rng) -> np.ndarray:
        entry = self.entries[int(rng.integers(0, len(self.entries)))]
        return AudioSegment.from_file(
            entry["audio_filepath"], target_sr=sample_rate
        ).samples

    @staticmethod
    def _snr_gain(samples, noise, snr_db):
        sig_rms = np.sqrt(np.mean(samples**2) + 1e-12)
        noise_rms = np.sqrt(np.mean(noise**2) + 1e-12)
        return sig_rms / (noise_rms * (10.0 ** (snr_db / 20.0)))

    def with_input_noise(self, samples, noise, rng) -> np.ndarray:
        """Full-length additive mix at a random SNR
        (perturb_with_input_noise semantics)."""
        if len(noise) == 0:
            return samples
        snr_db = rng.uniform(self.min_snr_db, self.max_snr_db)
        if len(noise) < len(samples):
            reps = int(np.ceil(len(samples) / len(noise)))
            noise = np.tile(noise, reps)
        start = int(rng.integers(0, len(noise) - len(samples) + 1))
        noise = noise[start : start + len(samples)]
        return samples + self._snr_gain(samples, noise, snr_db) * noise

    def with_foreground_noise(
        self, samples, noise, rng, max_noise_dur, max_additions, sample_rate
    ) -> np.ndarray:
        """Add short noise events at random positions
        (perturb_with_foreground_noise semantics): up to `max_additions`
        snippets of at most `max_noise_dur` seconds each."""
        if len(noise) == 0:
            return samples
        out = samples.copy()
        n_add = int(rng.integers(1, max_additions + 1))
        max_len = min(len(noise), int(max_noise_dur * sample_rate), len(samples))
        if max_len <= 0:
            return out
        for _ in range(n_add):
            snr_db = rng.uniform(self.min_snr_db, self.max_snr_db)
            dur = int(rng.integers(1, max_len + 1))
            n_start = int(rng.integers(0, len(noise) - dur + 1))
            snip = noise[n_start : n_start + dur]
            pos = int(rng.integers(0, len(samples) - dur + 1))
            out[pos : pos + dur] += self._snr_gain(samples, snip, snr_db) * snip
        return out

    def perturb(self, samples, sample_rate, rng):
        return self.with_input_noise(
            samples, self.get_one_noise(sample_rate, rng), rng
        )


class RirAndNoisePerturbation(Perturbation):
    """RIR convolution + foreground noise events + background noise
    (perturb.py:877-1014).  Single-rate simplification: the reference keys
    its noise perturbers by original sample rate for mixed-rate ASR
    training; the TTS stack is single-rate, so one manifest each."""

    def __init__(
        self,
        rir_manifest_path=None,
        rir_prob=0.5,
        noise_manifest_paths=None,
        noise_prob=1.0,
        min_snr_db=0.0,
        max_snr_db=50.0,
        apply_noise_rir=False,
        max_additions=5,
        max_duration=2.0,
        bg_noise_manifest_paths=None,
        bg_noise_prob=1.0,
        bg_min_snr_db=10.0,
        bg_max_snr_db=50.0,
    ):
        def _scalar(v):
            return float(v[0]) if isinstance(v, (list, tuple)) else float(v)

        def _first(v):
            return v[0] if isinstance(v, (list, tuple)) else v

        self.rir_prob = rir_prob
        self.noise_prob = noise_prob
        self.bg_noise_prob = bg_noise_prob
        self.apply_noise_rir = apply_noise_rir
        self.max_additions = max_additions
        self.max_duration = max_duration
        self.rir = (
            ImpulsePerturbation(rir_manifest_path, shift_impulse=True)
            if rir_manifest_path
            else None
        )
        self.fg = (
            NoisePerturbation(
                _first(noise_manifest_paths), _scalar(min_snr_db), _scalar(max_snr_db)
            )
            if noise_manifest_paths
            else None
        )
        self.bg = (
            NoisePerturbation(
                _first(bg_noise_manifest_paths),
                _scalar(bg_min_snr_db),
                _scalar(bg_max_snr_db),
            )
            if bg_noise_manifest_paths
            else None
        )

    def perturb(self, samples, sample_rate, rng):
        if self.rir is not None and rng.random() < self.rir_prob:
            samples = self.rir.perturb(samples, sample_rate, rng)
        if self.fg is not None and rng.random() < self.noise_prob:
            noise = self.fg.get_one_noise(sample_rate, rng)
            if self.apply_noise_rir and self.rir is not None:
                noise = self.rir.perturb(noise, sample_rate, rng)
            samples = self.fg.with_foreground_noise(
                samples, noise, rng, self.max_duration, self.max_additions, sample_rate
            )
        if self.bg is not None and rng.random() < self.bg_noise_prob:
            samples = self.bg.with_input_noise(
                samples, self.bg.get_one_noise(sample_rate, rng), rng
            )
        return samples


def _alaw_compand(x: np.ndarray, A: float = 87.6) -> np.ndarray:
    """ITU-T G.711 A-law compress -> expand roundtrip (the quantization a
    real G.711 codec applies), in [-1, 1]."""
    sign = np.sign(x)
    ax = np.abs(x)
    lnA = 1.0 + np.log(A)
    y = np.where(ax < 1.0 / A, A * ax / lnA, (1.0 + np.log(np.maximum(A * ax, 1e-12))) / lnA)
    # 8-bit quantization of the companded signal
    y = np.round(y * 127.0) / 127.0
    # expand
    x2 = np.where(y < 1.0 / lnA, y * lnA / A, np.exp(y * lnA - 1.0) / A)
    return (sign * x2).astype(np.float32)


class TranscodePerturbation(Perturbation):
    """Low-bitrate codec simulation (perturb.py:1017-1075).

    The reference shells out to sox for g711/amr-nb/ogg.  Here `g711` is
    implemented natively (300–3400 Hz band-pass at 8 kHz + A-law companding
    — the actual G.711 signal path), and amr-nb/ogg use sox when present
    (not in this image; they are skipped with a warning otherwise)."""

    def __init__(self, codecs=None):
        self.codecs = list(codecs) if codecs is not None else ["g711"]
        supported = {"g711", "amr-nb", "ogg"}
        bad = set(self.codecs) - supported
        if bad:
            raise ValueError(f"unsupported codecs {sorted(bad)}; supported: {sorted(supported)}")

    def _g711(self, samples, sample_rate):
        from scipy import signal as sps

        x = resample(samples, sample_rate, 8000)
        sos = sps.butter(4, [300.0, 3400.0], btype="bandpass", fs=8000, output="sos")
        x = sps.sosfilt(sos, x).astype(np.float32)
        x = _alaw_compand(np.clip(x, -1.0, 1.0))
        y = resample(x, 8000, sample_rate)
        y = y[: len(samples)]
        if len(y) < len(samples):
            y = np.pad(y, (0, len(samples) - len(y)))
        return y.astype(samples.dtype)

    def _sox(self, samples, sample_rate, codec, rng):
        import shutil
        import subprocess
        import tempfile
        import warnings

        if shutil.which("sox") is None:
            warnings.warn(f"sox not available; skipping {codec} transcode")
            return samples
        from roar_tpu.data.audio import write_wav

        with tempfile.NamedTemporaryFile(suffix=".wav") as src, tempfile.NamedTemporaryFile(
            suffix=".wav"
        ) as dst:
            peak = np.abs(samples).max()
            norm = samples * (0.8 / peak) if peak > 0.8 else samples
            write_wav(src.name, norm.astype(np.float32), sample_rate)
            fmt = "amr-nb" if codec == "amr-nb" else "ogg"
            rate = int(rng.integers(0, 4)) if codec == "amr-nb" else int(rng.integers(-1, 8))
            subprocess.check_output(
                f"sox {src.name} -V0 -C {rate} -t {fmt} - | "
                f"sox -t {fmt} - -V0 -b 16 -r {sample_rate} {dst.name}",
                shell=True,
            )
            out = AudioSegment.from_file(dst.name, target_sr=sample_rate).samples
        out = out[: len(samples)]
        if len(out) < len(samples):
            out = np.pad(out, (0, len(samples) - len(out)))
        return out.astype(samples.dtype)

    def perturb(self, samples, sample_rate, rng):
        codec = self.codecs[int(rng.integers(0, len(self.codecs)))]
        if codec == "g711":
            return self._g711(samples, sample_rate)
        return self._sox(samples, sample_rate, codec, rng)


class RandomSegmentPerturbation(Perturbation):
    """Crop a random fixed-duration segment (perturb.py:1077-1118; used for
    self-supervised pretraining)."""

    def __init__(self, duration_sec=32.0, pad_to_duration=False):
        if duration_sec <= 0:
            raise ValueError("duration_sec must be > 0")
        self.duration_sec = duration_sec
        self.pad_to_duration = pad_to_duration

    def max_augmentation_length(self, length):
        return self.duration_sec

    def perturb(self, samples, sample_rate, rng):
        n = int(self.duration_sec * sample_rate)
        if n > len(samples):
            if not self.pad_to_duration:
                raise ValueError(
                    f"audio shorter than {self.duration_sec}s and pad_to_duration=False"
                )
            return np.pad(samples, (0, n - len(samples)))
        start = int(rng.integers(0, len(samples) - n + 1))
        return samples[start : start + n]


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

    def max_augmentation_length(self, length: float) -> float:
        for _, p in self.perturbations:
            length = p.max_augmentation_length(length)
        return length


perturbation_types: Dict[str, type] = {
    "speed": SpeedPerturbation,
    "time_stretch": TimeStretchPerturbation,
    "gain": GainPerturbation,
    "silence": SilencePerturbation,
    "impulse": ImpulsePerturbation,
    "shift": ShiftPerturbation,
    "noise": NoisePerturbation,
    "white_noise": WhiteNoisePerturbation,
    "rir_noise_aug": RirAndNoisePerturbation,
    "transcode_aug": TranscodePerturbation,
    "random_segment": RandomSegmentPerturbation,
}


def register_perturbation(name: str, perturbation: type) -> None:
    """Add a user perturbation to the registry (perturb.py:1242-1249)."""
    if name in perturbation_types:
        raise KeyError(
            f"Perturbation {name!r} already registered "
            f"({perturbation_types[name].__name__})"
        )
    perturbation_types[name] = perturbation


def process_augmentations(augmenter, seed: int = 0) -> Optional[AudioAugmentor]:
    """Build an AudioAugmentor from the reference's YAML `augmentor` format
    (perturb.py:1171-1240): {name: {prob: float, **kwargs}}.  Passes an
    existing AudioAugmentor through; returns None for empty/None input."""
    if augmenter is None:
        return None
    if isinstance(augmenter, AudioAugmentor):
        return augmenter
    if not isinstance(augmenter, dict):
        raise ValueError(f"augmenter must be a dict or AudioAugmentor, got {type(augmenter)}")
    perturbations = []
    for name, cfg in augmenter.items():
        if name not in perturbation_types:
            raise KeyError(
                f"unknown perturbation {name!r}; known: {sorted(perturbation_types)}"
            )
        cfg = dict(cfg or {})
        prob = float(cfg.pop("prob", 1.0))
        if not 0.0 <= prob <= 1.0:
            raise ValueError(f"{name}: prob must be in [0, 1], got {prob}")
        cfg.pop("rng", None)  # reference seed knob; we seed the Augmentor
        perturbations.append((prob, perturbation_types[name](**cfg)))
    return AudioAugmentor(perturbations, seed=seed) if perturbations else None
