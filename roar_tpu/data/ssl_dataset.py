"""Dataset for SSL-feature-driven FastPitch training.

Re-design of the reference FastPitchSSLDataset
(roar/collections/tts/data/dataset.py:1344-1731): audio padded to a
`pad_multiple` (static-shape friendly), precomputed SSL content embeddings /
speaker embeddings / durations / pitch contours / mels loaded from a
`sup_data_dir`, per-sample / mean / interpolated speaker conditioning, and
global or speaker-wise pitch normalization from a stats JSON.

Storage divergence from the reference (documented): supplementary arrays are
`.npy` files (`<kind>_<file_id>.npy`) instead of torch `.pt` pickles — the
natural zero-copy format for a JAX host pipeline.  File-id construction
(relative path with '/' -> '_') matches the reference so caches are
relocatable the same way.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.manifest import filter_by_duration, read_manifest
from roar_tpu.utils.logging import get_logger

logging = get_logger()


def _get_base_dir(paths: List[str]) -> str:
    return os.path.commonpath([os.path.dirname(os.path.abspath(p)) for p in paths]) if paths else ""


class FastPitchSSLDataset:
    """See module docstring.  Items are dicts with the reference's keys
    (dataset.py:1715-1727): audio, audio_len, content_embedding,
    speaker_embedding, encoded_len, pitch_contour, speaker, mel_spectrogram,
    mel_len, dataset_id, duration."""

    CONDITIONING_TYPES = ("per_sample", "mean", "interpolate")
    EMB_TYPES = ("probs", "embedding", "log_probs", "embedding_and_probs")

    def __init__(
        self,
        manifest_filepath,
        sample_rate: int,
        ssl_content_emb_type: str,
        pad_multiple: int = 1024,
        max_duration: Optional[float] = None,
        min_duration: Optional[float] = None,
        ignore_file: Optional[str] = None,
        trim: bool = False,
        pitch_conditioning: bool = False,
        pitch_mean: Optional[float] = None,
        pitch_std: Optional[float] = None,
        pitch_normalization: Optional[str] = None,
        sup_data_dir: Optional[str] = None,
        speaker_stats_pitch_fp: Optional[str] = None,
        speaker_conditioning_type: str = "per_sample",
        seed: int = 0,
    ):
        if ssl_content_emb_type not in self.EMB_TYPES:
            raise ValueError(f"ssl_content_emb_type must be one of {self.EMB_TYPES}")
        if speaker_conditioning_type not in self.CONDITIONING_TYPES:
            raise ValueError(
                f"speaker_conditioning_type must be one of {self.CONDITIONING_TYPES}"
            )

        entries = read_manifest(manifest_filepath)
        for e in entries:
            e.setdefault("speaker", 0)
            e.setdefault("dataset_id", 0)
        if ignore_file:
            ignored = {e.get("audio_filepath") for e in read_manifest(ignore_file)}
            entries = [e for e in entries if e.get("audio_filepath") not in ignored]
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        self.data = entries
        self.base_data_dir = _get_base_dir([e["audio_filepath"] for e in entries])

        self.sample_rate = sample_rate
        self.trim = trim
        self.pad_multiple = int(pad_multiple)
        self.pitch_conditioning = pitch_conditioning
        self.pitch_mean = pitch_mean
        self.pitch_std = pitch_std
        self.pitch_normalization = pitch_normalization
        self.speaker_conditioning_type = speaker_conditioning_type
        self.ssl_content_emb_type = ssl_content_emb_type
        self._rng = np.random.default_rng(seed)

        if sup_data_dir is None:
            sup_data_dir = os.path.join(self.base_data_dir, "sup_data")
        self.sup_data_dir = sup_data_dir

        self.speaker_stats: Dict[int, Dict[str, float]] = {}
        if pitch_normalization == "speaker_wise":
            if speaker_stats_pitch_fp is None:
                speaker_stats_pitch_fp = os.path.join(
                    sup_data_dir, "speaker_pitch_stats.json"
                )
            if not os.path.exists(speaker_stats_pitch_fp):
                raise FileNotFoundError(
                    f"speaker_stats_pitch_fp {speaker_stats_pitch_fp} does not "
                    "exist. Run the SSL sup-data extraction first."
                )
            with open(speaker_stats_pitch_fp) as f:
                for key, val in json.load(f).items():
                    self.speaker_stats[int(key)] = val

        self._mean_speaker_emb_cache: Dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.data)

    # ------------------------------------------------------------------
    # sup-data IO
    # ------------------------------------------------------------------

    def file_id(self, entry: Dict[str, Any]) -> str:
        rel = Path(entry["audio_filepath"])
        try:
            rel = rel.relative_to(self.base_data_dir)
        except ValueError:
            pass
        return str(rel.with_suffix("")).replace("/", "_")

    def _load(self, name: str) -> np.ndarray:
        fp = os.path.join(self.sup_data_dir, name + ".npy")
        if not os.path.exists(fp):
            raise FileNotFoundError(
                f"Supplementary file {fp} does not exist. Run the SSL sup-data "
                "extraction first."
            )
        return np.load(fp)

    def get_ssl_features(self, fid: str):
        content = self._load(f"{self.ssl_content_emb_type}_content_embedding_{fid}")
        speaker = self._load(f"speaker_embedding_{fid}")
        duration = self._load(f"duration_embedding_{fid}")
        encoded_len = np.int32(content.shape[1])
        return content, speaker, encoded_len, duration

    def get_pitch_contour(self, fid: str) -> np.ndarray:
        return self._load(f"pitch_contour_{fid}")

    def get_mel_spectrogram(self, fid: str) -> np.ndarray:
        return self._load(f"mel_spec_{fid}")

    def mean_speaker_embedding(self, speaker: int) -> np.ndarray:
        """Mean (L2-normalized) of per-utterance speaker embeddings for a
        speaker; cached after first use."""
        if speaker not in self._mean_speaker_emb_cache:
            embs = [
                self._load(f"speaker_embedding_{self.file_id(e)}")
                for e in self.data
                if int(e["speaker"]) == speaker
            ]
            if not embs:
                raise KeyError(f"{speaker} not in speaker emb")
            mean = np.mean(np.stack(embs), axis=0)
            self._mean_speaker_emb_cache[speaker] = (
                mean / max(np.linalg.norm(mean), 1e-8)
            ).astype(np.float32)
        return self._mean_speaker_emb_cache[speaker]

    # ------------------------------------------------------------------

    def _get_wav(self, path: str):
        seg = AudioSegment.from_file(path, target_sr=self.sample_rate, trim=self.trim)
        audio = seg.samples.astype(np.float32)
        rem = len(audio) % self.pad_multiple
        if rem:
            audio = np.pad(audio, (0, self.pad_multiple - rem))
        return audio, np.int32(len(audio))

    def _normalize_pitch(self, pitch: np.ndarray, speaker: int) -> np.ndarray:
        if self.pitch_normalization not in ("speaker_wise", "global"):
            return pitch
        mean, std = self.pitch_mean, self.pitch_std
        if self.pitch_normalization == "speaker_wise":
            stats = self.speaker_stats.get(speaker)
            if stats is not None:
                mean, std = stats.get("pitch_mean"), stats.get("pitch_std")
            if (
                mean is None or std is None
                or np.isnan(mean) or np.isnan(std) or mean == 0 or std == 0
            ):
                logging.warning(f"NaN/invalid pitch stats for speaker {speaker}")
                mean, std = self.pitch_mean, self.pitch_std
        pitch = pitch - mean
        pitch[pitch == -mean] = 0.0
        return pitch / std

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        sample = self.data[idx]
        fid = self.file_id(sample)
        speaker = int(sample["speaker"])

        audio, audio_len = self._get_wav(sample["audio_filepath"])
        content, speaker_emb, encoded_len, duration = self.get_ssl_features(fid)

        if self.speaker_conditioning_type == "mean":
            speaker_emb = self.mean_speaker_embedding(speaker)
        elif self.speaker_conditioning_type == "interpolate":
            e1 = self.mean_speaker_embedding(speaker)
            alpha = float(self._rng.uniform(0.0, 1.0))
            mixed = e1 * (1 - alpha) + speaker_emb * alpha
            speaker_emb = mixed / max(np.linalg.norm(mixed), 1e-8)

        mel = self.get_mel_spectrogram(fid)
        mel_len = np.int32(mel.shape[1])

        pitch_contour = None
        if self.pitch_conditioning:
            pitch_contour = self.get_pitch_contour(fid).astype(np.float32).copy()
            pitch_contour = self._normalize_pitch(pitch_contour, speaker)
            if pitch_contour.shape[0] != mel.shape[1]:
                logging.warning(
                    f"invalid pitch contour for {sample['audio_filepath']}; using 0"
                )
                pitch_contour = np.zeros((mel.shape[1],), np.float32)

        return {
            "audio": audio,
            "audio_len": audio_len,
            "content_embedding": content.astype(np.float32),
            "speaker_embedding": np.asarray(speaker_emb, np.float32),
            "encoded_len": encoded_len,
            "pitch_contour": pitch_contour,
            "speaker": np.int32(speaker),
            "mel_spectrogram": mel.astype(np.float32),
            "mel_len": mel_len,
            "dataset_id": np.int32(sample["dataset_id"]),
            "duration": duration.astype(np.float32),
        }

    def collate(self, batch: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        """Padded collation with the reference's key set
        (dataset.py:1577-1635 pad_collate_fn)."""
        b = len(batch)
        max_audio = max(int(r["audio_len"]) for r in batch)
        max_mel = max(int(r["mel_len"]) for r in batch)
        max_enc = max(int(r["encoded_len"]) for r in batch)
        c_dim = batch[0]["content_embedding"].shape[0]
        n_mel = batch[0]["mel_spectrogram"].shape[0]

        out: Dict[str, np.ndarray] = {
            "audio": np.zeros((b, max_audio), np.float32),
            "audio_len": np.zeros((b,), np.int32),
            "content_embedding": np.zeros((b, c_dim, max_enc), np.float32),
            "encoded_len": np.zeros((b,), np.int32),
            "speaker_embedding": np.stack(
                [r["speaker_embedding"] for r in batch]
            ),
            "speaker": np.asarray([r["speaker"] for r in batch], np.int32),
            "mel_spectrogram": np.zeros((b, n_mel, max_mel), np.float32),
            "mel_len": np.zeros((b,), np.int32),
            "dataset_id": np.asarray([r["dataset_id"] for r in batch], np.int32),
            "duration": np.zeros((b, max_enc), np.float32),
        }
        has_pitch = batch[0]["pitch_contour"] is not None
        if has_pitch:
            out["pitch_contour"] = np.zeros((b, max_mel), np.float32)
        for j, r in enumerate(batch):
            out["audio"][j, : int(r["audio_len"])] = r["audio"]
            out["audio_len"][j] = r["audio_len"]
            out["content_embedding"][j, :, : int(r["encoded_len"])] = r[
                "content_embedding"
            ]
            out["encoded_len"][j] = r["encoded_len"]
            out["mel_spectrogram"][j, :, : int(r["mel_len"])] = r["mel_spectrogram"]
            out["mel_len"][j] = r["mel_len"]
            d = r["duration"][:max_enc]
            out["duration"][j, : len(d)] = d
            if has_pitch:
                p = r["pitch_contour"][:max_mel]
                out["pitch_contour"][j, : len(p)] = p
        return out
