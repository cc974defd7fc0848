"""ASR-side datasets: audio->text, audio->label, audio->audio.

Lean TPU-first re-design of the reference's ASR data support code
(roar/collections/asr/data/audio_to_text.py:94-745 ASRManifestProcessor /
AudioToCharDataset / AudioToBPEDataset, audio_to_label.py:212-467
AudioToClassificationLabelDataset / AudioToSpeechLabelDataset,
audio_to_audio.py:665-1014 AudioToTargetDataset +WithReference): JSON-lines
manifests, duration filtering, parser/tokenizer text encoding, fixed-window
label slicing, padded collation with pad-to-multiple bucketing
(static-shape jit; SURVEY.md §5.7).  The webdataset-tar variants are
host-IO plumbing for GPU clusters and are not carried; multi-host sharding
is the sampler's job (data/sampling.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.manifest import filter_by_duration, read_manifest


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


class CharParser:
    """Char-vocabulary text parser (the `labels` path of AudioToCharDataset,
    audio_to_text.py:529-621): maps text to label ids, OOV chars dropped,
    optional lowercasing."""

    def __init__(self, labels: Sequence[str], do_lowercase: bool = True,
                 unk_id: int = -1):
        self.labels = list(labels)
        self.do_lowercase = do_lowercase
        self.unk_id = unk_id
        self._map = {c: i for i, c in enumerate(self.labels)}

    def __call__(self, text: str) -> List[int]:
        if self.do_lowercase:
            text = text.lower()
        ids = [self._map.get(c, self.unk_id) for c in text]
        return [i for i in ids if i >= 0]


class _AudioTextDataset:
    """Manifest -> (audio, audio_len, tokens, tokens_len)
    (audio_to_text.py:414-528)."""

    def __init__(
        self,
        manifest_filepath,
        parser: Callable[[str], List[int]],
        sample_rate: int,
        max_duration: Optional[float] = None,
        min_duration: Optional[float] = None,
        max_utts: int = 0,
        trim: bool = False,
        return_sample_id: bool = False,
        pad_id: int = 0,
        audio_multiple: int = 16000,
        text_multiple: int = 16,
        augmentor=None,
    ):
        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        if max_utts:
            entries = entries[:max_utts]
        self.entries = entries
        self.parser = parser
        self.sample_rate = sample_rate
        self.trim = trim
        self.return_sample_id = return_sample_id
        self.pad_id = pad_id
        self.audio_multiple = audio_multiple
        self.text_multiple = text_multiple
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]
        # online augmentation: AudioAugmentor or the reference YAML dict
        # format {name: {prob, **kwargs}} (audio_to_text.py augmentor arg)
        from roar_tpu.data.perturb import process_augmentations

        self.augmentor = process_augmentations(augmentor)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        e = self.entries[idx]
        seg = AudioSegment.from_file(
            e["audio_filepath"],
            target_sr=self.sample_rate,
            trim=self.trim,
            offset=e.get("offset", 0.0) or 0.0,
            duration=e.get("duration"),
        )
        tokens = np.asarray(self.parser(e.get("text", "")), np.int32)
        samples = seg.samples.astype(np.float32)
        if self.augmentor is not None:
            samples = self.augmentor.perturb(samples, self.sample_rate)
        item = {
            "audio": samples,
            "audio_len": np.int32(len(samples)),
            "tokens": tokens,
            "tokens_len": np.int32(len(tokens)),
        }
        if self.return_sample_id:
            item["sample_id"] = np.int32(idx)
        return item

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        b = len(items)
        s = _round_up(max(int(i["audio_len"]) for i in items), self.audio_multiple)
        t = _round_up(max(int(i["tokens_len"]) for i in items), self.text_multiple)
        audio = np.zeros((b, s), np.float32)
        tokens = np.full((b, t), self.pad_id, np.int32)
        a_len = np.zeros((b,), np.int32)
        t_len = np.zeros((b,), np.int32)
        for j, it in enumerate(items):
            audio[j, : int(it["audio_len"])] = it["audio"]
            tokens[j, : int(it["tokens_len"])] = it["tokens"]
            a_len[j] = it["audio_len"]
            t_len[j] = it["tokens_len"]
        out = {"audio": audio, "audio_len": a_len, "tokens": tokens,
               "tokens_len": t_len}
        if self.return_sample_id:
            out["sample_id"] = np.asarray([i["sample_id"] for i in items], np.int32)
        return out


class AudioToCharDataset(_AudioTextDataset):
    """Char-label ASR dataset (audio_to_text.py:529-621)."""

    def __init__(self, manifest_filepath, labels: Sequence[str],
                 sample_rate: int, blank_index: int = -1, unk_index: int = -1,
                 **kwargs):
        self.labels = list(labels)
        parser = CharParser(labels, unk_id=unk_index)
        super().__init__(
            manifest_filepath, parser, sample_rate,
            pad_id=blank_index if blank_index >= 0 else len(self.labels),
            **kwargs,
        )


class AudioToBPEDataset(_AudioTextDataset):
    """Subword ASR dataset (audio_to_text.py:622-745): any tokenizer with
    `text_to_ids` (e.g. data/sentencepiece_tokenizer.py), optional bos/eos."""

    def __init__(self, manifest_filepath, tokenizer, sample_rate: int,
                 use_start_end_token: bool = True, **kwargs):
        self.tokenizer = tokenizer
        bos = getattr(tokenizer, "bos_id", None) if use_start_end_token else None
        eos = getattr(tokenizer, "eos_id", None) if use_start_end_token else None
        pad = getattr(tokenizer, "pad_id", 0)

        def parser(text: str) -> List[int]:
            ids = list(tokenizer.text_to_ids(text))
            if bos is not None and bos > 0:
                ids = [bos] + ids
            if eos is not None and eos > 0:
                ids = ids + [eos]
            return ids

        super().__init__(
            manifest_filepath, parser, sample_rate,
            pad_id=pad if pad is not None and pad >= 0 else 0, **kwargs,
        )


class AudioToLabelDataset:
    """Manifest -> (audio, audio_len, label_id) for classification /
    speaker-recognition (audio_to_label.py:212-467).  `window_length_in_sec`
    crops/pads a fixed window (the AudioToSpeechLabelDataset featurizer
    behavior) — fixed windows are also what static-shape jit wants."""

    def __init__(
        self,
        manifest_filepath,
        labels: Optional[Sequence[str]],
        sample_rate: int,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        trim: bool = False,
        window_length_in_sec: Optional[float] = None,
        label_key: str = "label",
        is_regression_task: bool = False,
        audio_multiple: int = 16000,
    ):
        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        self.entries = entries
        self.sample_rate = sample_rate
        self.trim = trim
        self.window = window_length_in_sec
        self.label_key = label_key
        self.is_regression_task = is_regression_task
        self.audio_multiple = audio_multiple

        if is_regression_task:
            self.labels = None
            self.label2id = self.id2label = None
        else:
            if labels is None:
                labels = sorted({str(e.get(label_key)) for e in entries})
            self.labels = list(labels)
            self.label2id = {l: i for i, l in enumerate(self.labels)}
            self.id2label = {i: l for i, l in enumerate(self.labels)}
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        e = self.entries[idx]
        seg = AudioSegment.from_file(
            e["audio_filepath"], target_sr=self.sample_rate, trim=self.trim,
            offset=e.get("offset", 0.0) or 0.0, duration=e.get("duration"),
        )
        audio = seg.samples.astype(np.float32)
        if self.window is not None:
            n = int(self.window * self.sample_rate)
            if len(audio) >= n:
                audio = audio[:n]
            else:
                audio = np.pad(audio, (0, n - len(audio)))
        raw = e.get(self.label_key)
        if self.is_regression_task:
            label = np.float32(raw)
        else:
            label = np.int32(self.label2id[str(raw)])
        return {"audio": audio, "audio_len": np.int32(len(audio)), "label": label}

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        b = len(items)
        s = _round_up(max(len(i["audio"]) for i in items), self.audio_multiple)
        audio = np.zeros((b, s), np.float32)
        lens = np.zeros((b,), np.int32)
        for j, it in enumerate(items):
            audio[j, : len(it["audio"])] = it["audio"]
            lens[j] = it["audio_len"]
        label_dtype = np.float32 if self.is_regression_task else np.int32
        return {
            "audio": audio,
            "audio_len": lens,
            "label": np.asarray([i["label"] for i in items], label_dtype),
        }


class AudioToTargetDataset:
    """Paired (input audio, target audio) for enhancement / separation
    (audio_to_audio.py:665-870 AudioToTargetDataset): manifest keys for
    input/target paths, optional fixed-duration random crop of synchronized
    segments, optional reference audio (AudioToTargetWithReferenceDataset
    :871-1014 via `reference_key`), optional per-item embedding vector from
    a .npy file (AudioToTargetWithEmbeddingDataset :1015-1121 via
    `embedding_key`)."""

    def __init__(
        self,
        manifest_filepath,
        sample_rate: int,
        input_key: str = "input_filepath",
        target_key: str = "target_filepath",
        reference_key: Optional[str] = None,
        embedding_key: Optional[str] = None,
        audio_duration: Optional[float] = None,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        audio_multiple: int = 16000,
        seed: int = 0,
    ):
        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        self.entries = entries
        self.sample_rate = sample_rate
        self.input_key = input_key
        self.target_key = target_key
        self.reference_key = reference_key
        self.embedding_key = embedding_key
        self.audio_duration = audio_duration
        self.audio_multiple = audio_multiple
        self._rng = np.random.default_rng(seed)
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]

    def __len__(self) -> int:
        return len(self.entries)

    def _load(self, path: str) -> np.ndarray:
        return AudioSegment.from_file(
            path, target_sr=self.sample_rate
        ).samples.astype(np.float32)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        e = self.entries[idx]
        x = self._load(e[self.input_key])
        y = self._load(e[self.target_key])
        n = min(len(x), len(y))
        x, y = x[:n], y[:n]
        if self.audio_duration is not None:
            w = int(self.audio_duration * self.sample_rate)
            if n > w:
                start = int(self._rng.integers(0, n - w + 1))
                x, y = x[start : start + w], y[start : start + w]
            else:
                x = np.pad(x, (0, w - n))
                y = np.pad(y, (0, w - n))
        item = {
            "input_signal": x,
            "target_signal": y,
            "audio_len": np.int32(len(x)),
        }
        if self.reference_key is not None:
            item["reference_signal"] = self._load(e[self.reference_key])
        if self.embedding_key is not None:
            item["embedding_vector"] = np.load(e[self.embedding_key]).astype(
                np.float32
            )
        return item

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        b = len(items)
        s = _round_up(max(len(i["input_signal"]) for i in items), self.audio_multiple)
        out = {
            "input_signal": np.zeros((b, s), np.float32),
            "target_signal": np.zeros((b, s), np.float32),
            "audio_len": np.zeros((b,), np.int32),
        }
        for j, it in enumerate(items):
            n = len(it["input_signal"])
            out["input_signal"][j, :n] = it["input_signal"]
            out["target_signal"][j, :n] = it["target_signal"]
            out["audio_len"][j] = it["audio_len"]
        if self.reference_key is not None and "reference_signal" in items[0]:
            r = _round_up(max(len(i["reference_signal"]) for i in items), self.audio_multiple)
            ref = np.zeros((b, r), np.float32)
            for j, it in enumerate(items):
                ref[j, : len(it["reference_signal"])] = it["reference_signal"]
            out["reference_signal"] = ref
        if self.embedding_key is not None and "embedding_vector" in items[0]:
            d = max(len(i["embedding_vector"]) for i in items)
            emb = np.zeros((b, d), np.float32)
            lens = np.zeros((b,), np.int32)
            for j, it in enumerate(items):
                emb[j, : len(it["embedding_vector"])] = it["embedding_vector"]
                lens[j] = len(it["embedding_vector"])
            out["embedding_vector"] = emb
            out["embedding_len"] = lens
        return out


class AudioToMultiLabelDataset:
    """Manifest -> (audio, audio_len, label sequence, label_len) for
    frame-sequence tasks (per-frame VAD, multi-label classification)
    (audio_to_label.py:895-1084 AudioToMultiLabelDataset).

    Each manifest line carries a label SEQUENCE, e.g. "0 1 1 0 1"; in
    regression mode the sequence parses to floats.  `normalize_audio_db`
    rescales the waveform to a target RMS level before batching."""

    def __init__(
        self,
        manifest_filepath,
        sample_rate: int,
        labels: Optional[Sequence[str]] = None,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        trim: bool = False,
        delimiter: Optional[str] = None,
        is_regression_task: bool = False,
        normalize_audio_db: Optional[float] = None,
        label_key: str = "label",
        audio_multiple: int = 16000,
        label_multiple: int = 8,
    ):
        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        self.entries = entries
        self.sample_rate = sample_rate
        self.trim = trim
        self.delimiter = delimiter
        self.is_regression_task = is_regression_task
        self.normalize_audio_db = normalize_audio_db
        self.label_key = label_key
        self.audio_multiple = audio_multiple
        self.label_multiple = label_multiple

        if is_regression_task:
            self.labels = None
            self.label2id = self.id2label = None
        else:
            if labels is None:
                seen = set()
                for e in entries:
                    seen.update(self._split(e.get(label_key, "")))
                labels = sorted(seen)
            self.labels = list(labels)
            self.label2id = {l: i for i, l in enumerate(self.labels)}
            self.id2label = {i: l for i, l in enumerate(self.labels)}
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]

    def _split(self, raw) -> List[str]:
        if isinstance(raw, (list, tuple)):
            return [str(x) for x in raw]
        return str(raw).split(self.delimiter)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        e = self.entries[idx]
        seg = AudioSegment.from_file(
            e["audio_filepath"], target_sr=self.sample_rate, trim=self.trim,
            offset=e.get("offset", 0.0) or 0.0, duration=e.get("duration"),
        )
        audio = seg.samples.astype(np.float32)
        if self.normalize_audio_db is not None:
            rms = float(np.sqrt(np.mean(np.square(audio)))) or 1e-8
            target = 10.0 ** (self.normalize_audio_db / 20.0)
            audio = audio * (target / max(rms, 1e-8))
        toks = self._split(e.get(self.label_key, ""))
        if self.is_regression_task:
            label = np.asarray([float(t) for t in toks], np.float32)
        else:
            label = np.asarray([self.label2id[t] for t in toks], np.int32)
        return {
            "audio": audio,
            "audio_len": np.int32(len(audio)),
            "label": label,
            "label_len": np.int32(len(label)),
        }

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        b = len(items)
        s = _round_up(max(len(i["audio"]) for i in items), self.audio_multiple)
        t = _round_up(max(len(i["label"]) for i in items), self.label_multiple)
        label_dtype = np.float32 if self.is_regression_task else np.int32
        out = {
            "audio": np.zeros((b, s), np.float32),
            "audio_len": np.zeros((b,), np.int32),
            "label": np.zeros((b, t), label_dtype),
            "label_len": np.zeros((b,), np.int32),
        }
        for j, it in enumerate(items):
            out["audio"][j, : len(it["audio"])] = it["audio"]
            out["audio_len"][j] = it["audio_len"]
            out["label"][j, : len(it["label"])] = it["label"]
            out["label_len"][j] = it["label_len"]
        return out
