"""New-style TextToSpeechDataset: precomputed features + weighted mixing.

Re-design of roar/collections/tts/data/text_to_speech_dataset.py:47-310:
reads features from a `feature_dir` populated by compute_features.py,
resolves speakers through a speaker-map JSON, applies feature processors,
computes align priors on the fly, and supports weighted multi-dataset
sampling through data/concat_dataset.py + sampling weights.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.dataset import TTSDataset
from roar_tpu.data.featurizers import _feature_path
from roar_tpu.data.manifest import filter_by_duration, read_manifest
from roar_tpu.ops.priors import BetaBinomialInterpolator


class TextToSpeechDataset:
    def __init__(
        self,
        manifest_filepath,
        sample_rate: int,
        text_tokenizer,
        feature_dir: Optional[str] = None,
        speaker_path: Optional[str] = None,
        featurizers: Sequence[str] = ("pitch", "energy"),
        feature_processors: Optional[Sequence[Any]] = None,
        align_prior_hop_length: Optional[int] = None,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        weight: float = 1.0,
        **_unused,
    ):
        self.sample_rate = sample_rate
        self.text_tokenizer = text_tokenizer
        self.feature_dir = Path(feature_dir) if feature_dir else None
        self.feature_names = tuple(featurizers)
        self.feature_processors = list(feature_processors or ())
        self.align_prior_hop_length = align_prior_hop_length
        self.weight = weight

        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        self.entries = entries
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]

        self.speaker_map = None
        if speaker_path:
            with open(speaker_path) as f:
                self.speaker_map = json.load(f)
        self.prior_interp = BetaBinomialInterpolator() if align_prior_hop_length else None
        self.tokens = [
            np.asarray(
                text_tokenizer(e.get("normalized_text", e.get("text", ""))), np.int32
            )
            for e in entries
        ]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        entry = self.entries[idx]
        seg = AudioSegment.from_file(entry["audio_filepath"], target_sr=self.sample_rate)
        audio = seg.samples
        tokens = self.tokens[idx]
        item: Dict[str, Any] = {
            "audio": audio,
            "audio_len": np.int32(len(audio)),
            "text": tokens,
            "text_len": np.int32(len(tokens)),
        }
        if self.feature_dir is not None:
            for name in self.feature_names:
                p = _feature_path(self.feature_dir, name, entry)
                if p.exists():
                    item[name] = np.load(p)
        if self.speaker_map is not None:
            spk = str(entry.get("speaker", entry.get("speaker_id", "")))
            item["speaker_id"] = np.int32(self.speaker_map.get(spk, 0))
        elif "speaker_id" in entry:
            item["speaker_id"] = np.int32(entry["speaker_id"])
        if self.align_prior_hop_length:
            mel_len = len(audio) // self.align_prior_hop_length + 1
            item["mel_len"] = np.int32(mel_len)
            item["align_prior_matrix"] = self.prior_interp(int(mel_len), len(tokens))
        elif "pitch" in item:
            item["mel_len"] = np.int32(len(item["pitch"]))
        else:
            item["mel_len"] = np.int32(1)
        for proc in self.feature_processors:
            proc.process(item)
        return item

    # reuse the bucketed collate from TTSDataset
    collate = TTSDataset.collate
