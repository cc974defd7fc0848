"""Supplementary-data (sup-data) extraction on device.

The reference computes mel/pitch/energy one utterance at a time on CPU
dataloader workers and caches .pt files
(roar/collections/tts/data/dataset.py:577-794, SURVEY.md §3.2).  Here the
whole pipeline — log-mel, pYIN pitch (+voiced mask/prob), frame energy — is
one jitted, batched device function over padded audio buckets; the host only
does WAV IO and cache writes.  This is the ≥5x sup-data throughput path
(BASELINE.md build targets).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.ops.pyin import PyinConfig, pyin
from roar_tpu.ops.spectrogram import MelConfig, frame_energy, log_mel_spectrogram

# Sup-data type names, mirroring the reference registry
# (roar/collections/tts/torch/tts_data_types.py:1-75).
SUP_DATA_TYPES = (
    "log_mel",
    "durations",
    "align_prior_matrix",
    "pitch",
    "energy",
    "speaker_id",
    "voiced_mask",
    "p_voiced",
    "reference_audio",
)


@dataclasses.dataclass(frozen=True)
class SupDataConfig:
    """Audio/feature parameters shared by dataset + extractor.

    Field names match the reference TTSDataset constructor keys
    (dataset.py:71-180) so YAML configs carry over.
    """

    sample_rate: int = 22050
    n_fft: int = 2048
    win_length: int = 2048
    hop_length: int = 512
    window: str = "hann"
    n_mels: int = 80
    lowfreq: float = 0.0
    highfreq: Optional[float] = 8000.0
    pitch_fmin: float = 65.40639132514966
    pitch_fmax: float = 2093.004522404789

    def mel_config(self) -> MelConfig:
        # Matches the dataset-side get_log_mel (dataset.py:305-333, :524-537):
        # plain |STFT| -> slaney mel -> log(x + 1e-5); no preemph/dither/norm.
        return MelConfig(
            sample_rate=self.sample_rate,
            n_window_size=self.win_length,
            n_window_stride=self.hop_length,
            window=self.window,
            n_fft=self.n_fft,
            nfilt=self.n_mels,
            lowfreq=self.lowfreq,
            highfreq=self.highfreq,
            preemph=None,
            normalize=None,
            mag_power=1.0,
            log=True,
            log_zero_guard_type="add",
            log_zero_guard_value=1e-5,
            dither=0.0,
            pad_to=1,
        )

    def pyin_config(self) -> PyinConfig:
        # dataset.py:695-708: librosa.pyin(frame_length=win_length, sr=sr,
        # fmin/fmax, fill_na=0) — hop defaults to frame_length // 4.
        return PyinConfig(
            sample_rate=self.sample_rate,
            fmin=self.pitch_fmin,
            fmax=self.pitch_fmax,
            frame_length=self.win_length,
            hop_length=None,
            fill_na=0.0,
        )


@functools.partial(jax.jit, static_argnums=(2, 3))
def _extract_batch(
    audio: jnp.ndarray,
    audio_lens: jnp.ndarray,
    mel_cfg: MelConfig,
    pyin_cfg: PyinConfig,
):
    mel, mel_lens = log_mel_spectrogram(audio, audio_lens, mel_cfg)
    energy = frame_energy(audio, mel_cfg)
    f0, voiced, vprob = pyin(audio, audio_lens, pyin_cfg)
    return mel, mel_lens, energy, f0, voiced, vprob


class SupDataExtractor:
    """Batched device extraction with per-file .npy caching."""

    def __init__(
        self,
        cfg: SupDataConfig,
        sup_data_path: Optional[str] = None,
        batch_size: int = 8,
        audio_pad_multiple: int = 16384,
    ):
        self.cfg = cfg
        self.sup_data_path = Path(sup_data_path) if sup_data_path else None
        self.batch_size = batch_size
        self.audio_pad_multiple = audio_pad_multiple
        if self.sup_data_path is not None:
            for sub in ("pitch", "energy", "voiced_mask", "p_voiced"):
                (self.sup_data_path / sub).mkdir(parents=True, exist_ok=True)

    def _cache_file(self, kind: str, file_id: str) -> Optional[Path]:
        if self.sup_data_path is None:
            return None
        return self.sup_data_path / kind / f"{file_id}.npy"

    def load_cached(self, kind: str, file_id: str) -> Optional[np.ndarray]:
        p = self._cache_file(kind, file_id)
        if p is not None and p.exists():
            return np.load(p)
        return None

    def extract(
        self, audios: Sequence[np.ndarray], file_ids: Optional[Sequence[str]] = None
    ) -> List[Dict[str, np.ndarray]]:
        """Compute sup-data for a list of raw audio arrays.

        Pads each bucket of `batch_size` utterances to a common
        `audio_pad_multiple` length (bounding the jit cache), runs one device
        call per bucket, trims per-utterance, optionally writes the cache.
        """
        out: List[Dict[str, np.ndarray]] = []
        mel_cfg, pyin_cfg = self.cfg.mel_config(), self.cfg.pyin_config()
        for i in range(0, len(audios), self.batch_size):
            chunk = [np.asarray(a, np.float32) for a in audios[i : i + self.batch_size]]
            lens = np.array([len(a) for a in chunk], np.int32)
            pad_len = int(np.ceil(lens.max() / self.audio_pad_multiple)) * self.audio_pad_multiple
            batch = np.zeros((len(chunk), pad_len), np.float32)
            for j, a in enumerate(chunk):
                batch[j, : len(a)] = a
            mel, mel_lens, energy, f0, voiced, vprob = _extract_batch(
                jnp.asarray(batch), jnp.asarray(lens), mel_cfg, pyin_cfg
            )
            mel, mel_lens = np.asarray(mel), np.asarray(mel_lens)
            energy, f0 = np.asarray(energy), np.asarray(f0)
            voiced, vprob = np.asarray(voiced), np.asarray(vprob)
            n_pitch_frames = np.asarray(pyin_cfg.num_frames(lens))
            for j in range(len(chunk)):
                ml, pl = int(mel_lens[j]), int(n_pitch_frames[j])
                item = {
                    "log_mel": mel[j, :, :ml],
                    "mel_len": np.int32(ml),
                    "energy": energy[j, :ml],
                    "pitch": f0[j, :pl],
                    "voiced_mask": voiced[j, :pl],
                    "p_voiced": vprob[j, :pl],
                }
                out.append(item)
                if file_ids is not None and self.sup_data_path is not None:
                    fid = file_ids[i + j]
                    for kind in ("pitch", "energy", "voiced_mask", "p_voiced"):
                        np.save(self._cache_file(kind, fid), item[kind])
        return out


def pitch_statistics(pitches: Sequence[np.ndarray]) -> Dict[str, float]:
    """Mean/std over nonzero (voiced) pitch values, as printed by
    extract_sup_data.py:16-32 (PITCH_MEAN / PITCH_STD)."""
    vals = np.concatenate([p[p != 0.0] for p in pitches]) if pitches else np.zeros(1)
    if vals.size == 0:
        vals = np.zeros(1)
    return {
        "pitch_mean": float(vals.mean()),
        "pitch_std": float(vals.std()),
        "pitch_min": float(vals.min()),
        "pitch_max": float(vals.max()),
    }
