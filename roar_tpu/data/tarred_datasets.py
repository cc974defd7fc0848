"""Tarred (sharded) audio datasets — the webdataset-style IO path.

Re-design of the reference's TarredAudioToCharDataset /
TarredAudioToBPEDataset machinery
(roar/collections/asr/data/audio_to_text.py:779-1431): audio lives inside
tar shards keyed by file name; a JSON-lines manifest carries transcripts and
durations.  The reference streams via the external `webdataset` package on
GPU dataloader workers; here shards are read with the stdlib tarfile module:

- brace expansion for shard lists ('audio_{0..3}.tar')
- shard partitioning across data-parallel processes (scatter strategy)
- a shuffle_n look-ahead buffer (webdataset semantics)
- manifest-driven filtering by duration; entries missing from the shards
  assigned to this process are skipped (the reference behaves the same)

This is an IterableDataset-style object: iterate for items, use
`collate()` from the map-style datasets for batching.
"""

from __future__ import annotations

import re
import tarfile
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from roar_tpu.data.manifest import filter_by_duration, read_manifest


def expand_braces(pattern: Union[str, Sequence[str]]) -> List[str]:
    """'audio_{0..3}.tar' -> ['audio_0.tar', ..., 'audio_3.tar']
    (webdataset brace-expansion subset: one {a..b} numeric range)."""
    if not isinstance(pattern, str):
        return [p for item in pattern for p in expand_braces(item)]
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo) if lo.startswith("0") and len(lo) > 1 else 0
    out = []
    for i in range(int(lo), int(hi) + 1):
        s = str(i).zfill(width) if width else str(i)
        out.extend(expand_braces(pattern[: m.start()] + s + pattern[m.end():]))
    return out


def partition_shards(
    shards: Sequence[str], num_shards: int = 1, shard_rank: int = 0
) -> List[str]:
    """Scatter shard files across data-parallel processes (the reference's
    'scatter' shard_strategy): rank r takes shards r, r+W, r+2W, ..."""
    if num_shards <= 1:
        return list(shards)
    if len(shards) % num_shards:
        import warnings

        warnings.warn(
            f"{len(shards)} tar shards not divisible by world size "
            f"{num_shards}; ranks will see uneven shard counts"
        )
    return [s for i, s in enumerate(shards) if i % num_shards == shard_rank]


def _decode_audio(name: str, data: bytes, target_sr: int) -> np.ndarray:
    from roar_tpu.data.audio import AudioSegment

    import tempfile
    import os

    suffix = "." + name.rsplit(".", 1)[-1] if "." in name else ".wav"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        tmp = f.name
    try:
        return AudioSegment.from_file(tmp, target_sr=target_sr).samples
    finally:
        os.unlink(tmp)


class TarredAudioTextDataset:
    """Iterable (audio, tokens) items from tar shards + manifest."""

    def __init__(
        self,
        audio_tar_filepaths: Union[str, Sequence[str]],
        manifest_filepath: str,
        parser: Callable[[str], List[int]],
        sample_rate: int,
        shuffle_n: int = 0,
        min_duration: Optional[float] = None,
        max_duration: Optional[float] = None,
        num_shards: int = 1,
        shard_rank: int = 0,
        seed: int = 0,
        augmentor=None,
    ):
        entries = read_manifest(manifest_filepath)
        entries, _, _ = filter_by_duration(entries, min_duration, max_duration)
        # index by basename AND stem: shard members may drop directories
        # and/or extensions relative to the manifest's audio_filepath
        self.by_key: Dict[str, dict] = {}
        for e in entries:
            base = e["audio_filepath"].rsplit("/", 1)[-1]
            self.by_key[base] = e
            self.by_key[base.rsplit(".", 1)[0]] = e
        self.entries = entries
        self.shards = partition_shards(
            expand_braces(audio_tar_filepaths), num_shards, shard_rank
        )
        self.parser = parser
        self.sample_rate = sample_rate
        self.shuffle_n = shuffle_n
        self.rng = np.random.default_rng(seed + shard_rank)
        from roar_tpu.data.perturb import process_augmentations

        self.augmentor = process_augmentations(augmentor)
        self.lengths = [float(e.get("duration", 0.0)) for e in entries]

    def __len__(self) -> int:
        # the reference documents len() as the filtered manifest length
        return len(self.entries)

    def _make_item(self, name: str, data: bytes) -> Optional[Dict[str, np.ndarray]]:
        base = name.rsplit("/", 1)[-1]
        entry = self.by_key.get(base) or self.by_key.get(base.rsplit(".", 1)[0])
        if entry is None:
            return None
        samples = _decode_audio(base, data, self.sample_rate).astype(np.float32)
        if self.augmentor is not None:
            samples = self.augmentor.perturb(samples, self.sample_rate)
        tokens = np.asarray(self.parser(entry.get("text", "")), np.int32)
        return {
            "audio": samples,
            "audio_len": np.int32(len(samples)),
            "tokens": tokens,
            "tokens_len": np.int32(len(tokens)),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        buffer: List[Dict[str, np.ndarray]] = []
        shards = list(self.shards)
        if self.shuffle_n:
            self.rng.shuffle(shards)
        for shard in shards:
            with tarfile.open(shard, "r:*") as tf:
                for member in tf:
                    if not member.isfile():
                        continue
                    fobj = tf.extractfile(member)
                    if fobj is None:
                        continue
                    item = self._make_item(member.name, fobj.read())
                    if item is None:
                        continue
                    if self.shuffle_n > 1:
                        buffer.append(item)
                        if len(buffer) >= self.shuffle_n:
                            idx = int(self.rng.integers(0, len(buffer)))
                            yield buffer.pop(idx)
                    else:
                        yield item
        while buffer:
            idx = int(self.rng.integers(0, len(buffer)))
            yield buffer.pop(idx)


class TarredAudioToCharDataset(TarredAudioTextDataset):
    """Char-vocabulary variant (audio_to_text.py:1048-1206)."""

    def __init__(self, audio_tar_filepaths, manifest_filepath, labels,
                 sample_rate, do_lowercase: bool = True, **kwargs):
        from roar_tpu.data.asr_datasets import CharParser

        super().__init__(
            audio_tar_filepaths, manifest_filepath,
            CharParser(labels, do_lowercase=do_lowercase), sample_rate, **kwargs,
        )


class TarredAudioToBPEDataset(TarredAudioTextDataset):
    """Subword-tokenizer variant (audio_to_text.py:1209-1431)."""

    def __init__(self, audio_tar_filepaths, manifest_filepath, tokenizer,
                 sample_rate, use_start_end_token: bool = True, **kwargs):
        bos = getattr(tokenizer, "bos_id", None)
        eos = getattr(tokenizer, "eos_id", None)

        def parse(text: str) -> List[int]:
            ids = tokenizer.text_to_ids(text)
            if use_start_end_token and bos is not None and bos >= 0:
                ids = [bos] + ids
            if use_start_end_token and eos is not None and eos >= 0:
                ids = ids + [eos]
            return ids

        super().__init__(
            audio_tar_filepaths, manifest_filepath, parse, sample_rate, **kwargs,
        )


class TarredAudioToLabelDataset(TarredAudioTextDataset):
    """Tar-sharded (audio, label) items for classification / speaker tasks
    (audio_to_label.py:469-894 _TarredAudioLabelDataset and its
    Classification/SpeechLabel subclasses — one implementation here; the
    subclass split in the reference differs only in featurizer plumbing).

    Reuses the shard partitioning / shuffle machinery of
    TarredAudioTextDataset; the parser maps the manifest's `label_key`
    value to an id."""

    def __init__(
        self,
        audio_tar_filepaths,
        manifest_filepath: str,
        sample_rate: int,
        labels=None,
        label_key: str = "label",
        window_length_in_sec=None,
        **kwargs,
    ):
        super().__init__(
            audio_tar_filepaths, manifest_filepath,
            parser=lambda s: [], sample_rate=sample_rate, **kwargs,
        )
        self.label_key = label_key
        self.window = window_length_in_sec
        if labels is None:
            labels = sorted({str(e.get(label_key)) for e in self.entries})
        self.labels = list(labels)
        self.label2id = {l: i for i, l in enumerate(self.labels)}
        self.id2label = {i: l for i, l in enumerate(self.labels)}

    def _make_item(self, name, data):
        base = name.rsplit("/", 1)[-1]
        entry = self.by_key.get(base) or self.by_key.get(base.rsplit(".", 1)[0])
        if entry is None:
            return None
        samples = _decode_audio(base, data, self.sample_rate).astype(np.float32)
        if self.augmentor is not None:
            samples = self.augmentor.perturb(samples, self.sample_rate)
        if self.window is not None:
            n = int(self.window * self.sample_rate)
            samples = samples[:n] if len(samples) >= n else np.pad(
                samples, (0, n - len(samples))
            )
        return {
            "audio": samples,
            "audio_len": np.int32(len(samples)),
            "label": np.int32(self.label2id[str(entry.get(self.label_key))]),
        }
