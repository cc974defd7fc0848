"""Silence trimming: energy-based and VAD-based trimmers.

Capability port of the reference audio_trimming.py
(roar/collections/tts/parts/preprocessing/audio_trimming.py:14-337):
`AudioTrimmer` interface, `EnergyAudioTrimmer` (frame-RMS dB gate),
`VadAudioTrimmer` (speech-probability gate), plus the shared boundary
helpers `get_start_and_end_of_speech_frames` / `pad_sample_indices`.

Differences from the reference:
- No librosa/torch: framing and RMS are plain numpy; boundary search is a
  vectorized convolution instead of Python loops.
- The reference's VAD downloads a pretrained NeMo MarbleNet (zero-egress
  here).  `VadAudioTrimmer` takes any `vad_fn: frames [N, W] -> speech
  probs [N]`; the default is a self-contained statistical VAD combining
  frame energy and spectral flatness (speech is tonal/low-flatness, noise
  and silence are flat), so the trimmer works out of the box and a trained
  classifier can be plugged in where available.
"""

from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from typing import Callable, Optional, Tuple

import numpy as np

from roar_tpu.data.audio import resample


def normalize_volume(audio: np.ndarray, volume_level: float = 0.95) -> np.ndarray:
    """Peak-normalize to `volume_level` (tts_dataset_utils.normalize_volume)."""
    if not 0.0 <= volume_level <= 1.0:
        raise ValueError(f"Volume must be in range [0.0, 1.0], received {volume_level}")
    peak = np.max(np.abs(audio)) if audio.size else 0.0
    if peak == 0.0:
        return audio
    return (volume_level / peak) * audio


def _frame(audio: np.ndarray, win_length: int, hop_length: int) -> np.ndarray:
    """[S] -> [num_frames, win_length] (no padding; partial tail dropped)."""
    n = 1 + (audio.shape[0] - win_length) // hop_length
    if n <= 0:
        return np.zeros((0, win_length), audio.dtype)
    idx = np.arange(n)[:, None] * hop_length + np.arange(win_length)[None, :]
    return audio[idx]


def get_start_and_end_of_speech_frames(
    is_speech: np.ndarray, speech_frame_threshold: int, audio_id: str = ""
) -> Tuple[int, int]:
    """First/last run of `speech_frame_threshold` consecutive speech frames
    -> (start inclusive, end exclusive); (0, 0) when none exists
    (audio_trimming.py:276-310)."""
    is_speech = np.asarray(is_speech, bool)
    k = speech_frame_threshold
    if is_speech.shape[0] < k:
        warnings.warn(f"Could not find start or end of speech for '{audio_id}'")
        return 0, 0
    runs = np.convolve(is_speech.astype(np.int32), np.ones(k, np.int32), "valid") == k
    hits = np.flatnonzero(runs)
    if hits.size == 0:
        warnings.warn(f"Could not find start or end of speech for '{audio_id}'")
        return 0, 0
    return int(hits[0]), int(hits[-1] + k)


def pad_sample_indices(
    start_sample: int,
    end_sample: int,
    max_sample: int,
    sample_rate: int,
    pad_seconds: float,
) -> Tuple[int, int]:
    """Widen [start, end) by pad_seconds, clamped to [0, max_sample]."""
    pad = int(pad_seconds * sample_rate)
    return max(0, start_sample - pad), min(max_sample, end_sample + pad)


class AudioTrimmer(ABC):
    """Interface: audio -> (trimmed audio, start sample, end sample)."""

    @abstractmethod
    def trim_audio(
        self, audio: np.ndarray, sample_rate: int, audio_id: str = ""
    ) -> Tuple[np.ndarray, int, int]:
        raise NotImplementedError


class EnergyAudioTrimmer(AudioTrimmer):
    """Frame-RMS silence gate (audio_trimming.py:33-115): frames at least
    `db_threshold` dB below `ref_amplitude` are silence."""

    def __init__(
        self,
        db_threshold: int = 50,
        ref_amplitude: float = 1.0,
        speech_frame_threshold: int = 1,
        trim_win_length: int = 2048,
        trim_hop_length: int = 512,
        pad_seconds: float = 0.1,
        volume_norm: bool = True,
    ):
        assert db_threshold >= 0 and ref_amplitude >= 0
        assert speech_frame_threshold > 0 and trim_win_length > 0 and trim_hop_length > 0
        self.db_threshold = db_threshold
        self.ref_amplitude = ref_amplitude
        self.speech_frame_threshold = speech_frame_threshold
        self.trim_win_length = trim_win_length
        self.trim_hop_length = trim_hop_length
        self.pad_seconds = pad_seconds
        self.volume_norm = volume_norm

    def trim_audio(
        self, audio: np.ndarray, sample_rate: int, audio_id: str = ""
    ) -> Tuple[np.ndarray, int, int]:
        if self.volume_norm:
            audio = normalize_volume(audio, volume_level=1.0)
        # centered frames, matching librosa.effects._signal_to_frame_nonsilent
        padded = np.pad(audio, self.trim_win_length // 2, mode="constant")
        frames = _frame(padded, self.trim_win_length, self.trim_hop_length)
        rms = np.sqrt(np.mean(np.square(frames), axis=-1))
        with np.errstate(divide="ignore"):
            db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(self.ref_amplitude, 1e-10))
        speech_frames = db > -self.db_threshold

        start_frame, end_frame = get_start_and_end_of_speech_frames(
            speech_frames, self.speech_frame_threshold, audio_id
        )
        if start_frame == 0 and end_frame == 0:
            return np.array([]), 0, 0

        start_sample = start_frame * self.trim_hop_length
        end_sample = end_frame * self.trim_hop_length
        start_sample, end_sample = pad_sample_indices(
            start_sample, end_sample, audio.shape[0], sample_rate, self.pad_seconds
        )
        return audio[start_sample:end_sample], start_sample, end_sample


def spectral_flatness_vad(frames: np.ndarray, energy_db_floor: float = -45.0) -> np.ndarray:
    """Self-contained statistical VAD: speech prob per frame [N, W] -> [N].

    Speech frames are both energetic and spectrally peaked (low flatness);
    broadband noise is flat, silence is quiet.  Probability is the product
    of an energy sigmoid and a (1 - flatness) term.
    """
    if frames.shape[0] == 0:
        return np.zeros((0,), np.float32)
    win = np.hanning(frames.shape[1]).astype(frames.dtype)
    spec = np.abs(np.fft.rfft(frames * win, axis=-1)) ** 2 + 1e-12
    flatness = np.exp(np.mean(np.log(spec), axis=-1)) / np.mean(spec, axis=-1)
    rms = np.sqrt(np.mean(np.square(frames), axis=-1))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10))
    energy_gate = 1.0 / (1.0 + np.exp(-(db - energy_db_floor) / 3.0))
    return (energy_gate * (1.0 - flatness)).astype(np.float32)


class VadAudioTrimmer(AudioTrimmer):
    """VAD-probability silence gate (audio_trimming.py:118-273).

    `vad_fn` maps frames [N, trim_win_length] at `vad_sample_rate` to
    speech probabilities [N]; defaults to `spectral_flatness_vad`.
    """

    def __init__(
        self,
        vad_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        vad_sample_rate: int = 16000,
        vad_threshold: float = 0.5,
        speech_frame_threshold: int = 1,
        trim_win_length: int = 4096,
        trim_hop_length: int = 1024,
        pad_seconds: float = 0.1,
        volume_norm: bool = True,
    ):
        assert vad_sample_rate > 0 and vad_threshold >= 0
        assert speech_frame_threshold > 0 and trim_win_length > 0 and trim_hop_length > 0
        self.vad_fn = vad_fn or spectral_flatness_vad
        self.vad_sample_rate = vad_sample_rate
        self.vad_threshold = vad_threshold
        self.speech_frame_threshold = speech_frame_threshold
        self.trim_win_length = trim_win_length
        self.trim_hop_length = trim_hop_length
        self.trim_shift = trim_win_length // 2  # center frames
        self.pad_seconds = pad_seconds
        self.volume_norm = volume_norm

    def _detect_speech(self, audio: np.ndarray) -> np.ndarray:
        frames = _frame(audio, self.trim_win_length, self.trim_hop_length)
        if frames.shape[0] == 0:
            return np.zeros((0,), bool)
        return np.asarray(self.vad_fn(frames)) >= self.vad_threshold

    def trim_audio(
        self, audio: np.ndarray, sample_rate: int, audio_id: str = ""
    ) -> Tuple[np.ndarray, int, int]:
        vad_audio = (
            audio
            if sample_rate == self.vad_sample_rate
            else resample(audio, sample_rate, self.vad_sample_rate)
        )
        if self.volume_norm:
            vad_audio = normalize_volume(vad_audio, volume_level=1.0)

        speech_frames = self._detect_speech(vad_audio)
        start_frame, end_frame = get_start_and_end_of_speech_frames(
            speech_frames, self.speech_frame_threshold, audio_id
        )
        if start_frame == 0 and end_frame == 0:
            return np.array([]), 0, 0

        if start_frame == 0:
            start_sample = 0
        else:
            start_sample = start_frame * self.trim_hop_length + self.trim_shift
        # keep the tail: partial end frames are unreliable for any VAD
        if end_frame == speech_frames.shape[0]:
            end_sample = vad_audio.shape[0]
        else:
            end_sample = end_frame * self.trim_hop_length + self.trim_shift

        if sample_rate != self.vad_sample_rate:
            ratio = sample_rate / self.vad_sample_rate
            start_sample, end_sample = int(ratio * start_sample), int(ratio * end_sample)

        start_sample, end_sample = pad_sample_indices(
            start_sample, end_sample, audio.shape[0], sample_rate, self.pad_seconds
        )
        return audio[start_sample:end_sample], start_sample, end_sample
