"""Multi-corpus dataset mixing.

Re-design of roar/collections/common/data/dataset.py:13-644 (ConcatDataset /
ConcatMapDataset): map-style concatenation with optional per-dataset
sampling weights (temperature or explicit probabilities).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np


class ConcatMapDataset:
    """Concatenates map-style datasets; index space is the union."""

    def __init__(self, datasets: Sequence[Any]):
        if not datasets:
            raise ValueError("need at least one dataset")
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        # pass through per-item lengths when available (for bucketing)
        self.lengths: List[float] = []
        for d in self.datasets:
            self.lengths.extend(getattr(d, "lengths", [0.0] * len(d)))

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def locate(self, idx: int):
        ds_idx = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return ds_idx, idx - int(self._offsets[ds_idx])

    def __getitem__(self, idx: int):
        ds_idx, local = self.locate(idx)
        return self.datasets[ds_idx][local]

    def collate(self, items, *args, **kwargs):
        return self.datasets[0].collate(items, *args, **kwargs)


def sampling_probabilities(
    sizes: Sequence[int],
    technique: str = "temperature",
    temperature: float = 5.0,
    probabilities: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Per-dataset sampling distribution (ConcatDataset sampling options)."""
    sizes = np.asarray(sizes, np.float64)
    if technique == "random" and probabilities is not None:
        p = np.asarray(probabilities, np.float64)
    elif technique == "temperature":
        p = sizes ** (1.0 / temperature)
    elif technique == "round-robin":
        p = np.ones_like(sizes)
    else:
        p = sizes
    return p / p.sum()


def mixed_indices(
    datasets: Sequence[Any],
    num_samples: int,
    technique: str = "temperature",
    temperature: float = 5.0,
    probabilities: Optional[Sequence[float]] = None,
    seed: int = 0,
) -> np.ndarray:
    """Global indices into ConcatMapDataset drawn with the mixing policy."""
    sizes = [len(d) for d in datasets]
    probs = sampling_probabilities(sizes, technique, temperature, probabilities)
    rng = np.random.default_rng(seed)
    offsets = np.cumsum([0] + sizes)
    ds_choice = rng.choice(len(datasets), size=num_samples, p=probs)
    out = np.empty(num_samples, np.int64)
    for i, c in enumerate(ds_choice):
        out[i] = offsets[c] + rng.integers(0, sizes[c])
    return out


class ConcatDataset:
    """Iterable multi-corpus mixer (common/data/dataset.py:13-185
    ConcatDataset): draws each next item from one of the sub-datasets
    according to a sampling technique — 'temperature' (size^(1/T) weights),
    'random' (explicit probabilities) or 'round-robin' — with exhausted
    sub-iterators restarting (reshuffled for map-style datasets).

    Works with map-style datasets (``__getitem__``/``__len__``) and plain
    iterables with a length.  `world_size`/`global_rank` partition map-style
    datasets so each host sees a disjoint shard (the multi-host input
    pipeline contract; SURVEY.md §5.8).
    """

    def __init__(
        self,
        datasets: Sequence[Any],
        shuffle: bool = True,
        sampling_technique: str = "temperature",
        sampling_temperature: float = 5.0,
        sampling_scale: float = 1,
        sampling_probabilities: Optional[Sequence[float]] = None,
        seed: Optional[int] = None,
        global_rank: int = 0,
        world_size: int = 1,
    ):
        if sampling_technique not in ("temperature", "random", "round-robin"):
            raise ValueError(
                "Currently we only support sampling techniques in "
                "['temperature', 'random', 'round-robin']."
            )
        if sampling_technique == "random":
            if sampling_probabilities is None or len(sampling_probabilities) != len(
                datasets
            ):
                raise ValueError(
                    "Length of probabilities list must be equal to the number "
                    "of datasets."
                )
        self.datasets = list(datasets)
        self.shuffle = shuffle
        self.technique = sampling_technique
        self.temperature = sampling_temperature
        self.probabilities = sampling_probabilities
        self.seed = seed
        self.global_rank = global_rank
        self.world_size = world_size

        self.length = 0
        for d in self.datasets:
            n = len(d)
            self.length += n // world_size if self._is_map(d) else n
        self.length = int(self.length * sampling_scale)

        if hasattr(self.datasets[0], "collate"):
            self.collate = self.datasets[0].collate

    @staticmethod
    def _is_map(ds) -> bool:
        return hasattr(ds, "__getitem__")

    def _shard(self, ds):
        """Per-rank contiguous shard of a map-style dataset
        (common/data/dataset.py:110-117 semantics, incl. last-rank tail)."""
        n = len(ds)
        per = n // self.world_size
        start = per * self.global_rank
        end = n if self.global_rank == self.world_size - 1 else start + per
        return list(range(start, end))

    def _index_generator(self, rng):
        sizes = [len(d) for d in self.datasets]
        if self.technique == "round-robin":
            while True:
                yield from range(len(self.datasets))
        p = sampling_probabilities(
            sizes, self.technique, self.temperature, self.probabilities
        )
        while True:
            yield int(rng.choice(len(self.datasets), p=p))

    def _fresh_iter(self, ds, rng):
        if self._is_map(ds):
            idx = np.asarray(self._shard(ds))
            if self.shuffle:
                rng.shuffle(idx)
            return iter(idx.tolist())
        return iter(ds)

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        iters = [self._fresh_iter(d, rng) for d in self.datasets]
        gen = self._index_generator(rng)
        produced = 0
        while produced < self.length:
            ds_i = next(gen)
            try:
                val = next(iters[ds_i])
            except StopIteration:
                iters[ds_i] = self._fresh_iter(self.datasets[ds_i], rng)
                continue
            if self._is_map(self.datasets[ds_i]):
                val = self.datasets[ds_i][val]
            produced += 1
            yield val

    def __len__(self) -> int:
        return self.length


class CodeSwitchedDataset:
    """Synthetic code-switching mixer (common/data/dataset.py:279-644):
    builds composite utterances by concatenating normalized audio snippets
    drawn from per-language sub-datasets, with silence pauses at the start,
    between language switches, and at the end, and concatenated token
    sequences.

    Sub-datasets are map-style and must yield dicts with at least
    ``audio`` (np.float32 [S] or [S, C]) and ``text`` (int token ids); the
    composite item carries the same keys.  A `min_monolingual` fraction of
    outputs are untouched single-language samples.
    """

    def __init__(
        self,
        datasets: Sequence[Any],
        lang_probs: Optional[Sequence[float]] = None,
        shuffle: bool = True,
        min_duration: float = 4.0,
        max_duration: float = 20.0,
        min_monolingual: float = 0.3,
        db_norm: float = -25.0,
        pause_start: int = 0,
        pause_join: int = 0,
        pause_end: int = 0,
        sampling_scales=None,
        seed: Optional[int] = None,
        global_rank: int = 0,
        world_size: int = 1,
        pure_random: bool = False,
        force_monochannel: bool = True,
        infinity_mode: bool = False,
        sample_rate: int = 16000,
        augmentor=None,
    ):
        if len(datasets) == 0:
            raise ValueError(
                "CodeSwitchedDataset must receive a non-zero length datasets object"
            )
        self.datasets = list(datasets)
        self.langs = list(range(len(datasets)))
        if lang_probs is None:
            self.lang_probs = np.full(len(self.langs), 1.0 / len(self.langs))
        else:
            if len(lang_probs) != len(self.langs):
                raise ValueError(
                    "Size mismatch between languages and respective probs in "
                    "CodeSwitchedDataset"
                )
            self.lang_probs = np.asarray(lang_probs, np.float64)
        self.shuffle = shuffle
        self.min_duration = min_duration
        self.max_duration = max_duration
        self.min_monolingual = min_monolingual
        self.db_norm = db_norm
        self.pause_start = pause_start
        self.pause_join = pause_join
        self.pause_end = pause_end
        self.pure_random = pure_random
        self.force_monochannel = force_monochannel
        self.infinity_mode = infinity_mode
        self.sample_rate = sample_rate
        self.augmentor = augmentor
        self.seed = seed
        self.global_rank = global_rank
        self.world_size = world_size

        if sampling_scales is None:
            scales = [1.0] * len(self.langs)
        elif np.isscalar(sampling_scales):
            scales = [float(sampling_scales)] * len(self.langs)
        else:
            scales = list(sampling_scales)
        self.length = int(
            sum(
                (len(d) // world_size) * s
                for d, s in zip(self.datasets, scales)
            )
        )
        if hasattr(self.datasets[0], "collate"):
            self.collate = self.datasets[0].collate

    # ------------------------------------------------------------------

    def _lang_iter(self, lang, rng):
        idx = np.arange(len(self.datasets[lang]))
        if self.shuffle:
            rng.shuffle(idx)
        return iter(idx.tolist())

    def _next_sample(self, lang, iters, rng):
        try:
            i = next(iters[lang])
        except StopIteration:
            iters[lang] = self._lang_iter(lang, rng)
            i = next(iters[lang])
        return self.datasets[lang][i]

    def _silence(self, msecs: int, like: np.ndarray) -> np.ndarray:
        n = int(msecs * self.sample_rate / 1000.0)
        shape = (n,) if like.ndim == 1 else (n, like.shape[-1])
        return np.zeros(shape, like.dtype)

    def build_single_cs_sample(self, iters, rng):
        """One composite utterance (common/data/dataset.py:437-583)."""
        texts: List[np.ndarray] = []
        audios: List[np.ndarray] = []
        sampled_langs: List[int] = []
        duration = 0.0
        pure_mono = rng.random() <= self.min_monolingual

        while duration < self.min_duration:
            remaining = set(self.langs) - set(sampled_langs)
            if (self.pure_random and not pure_mono) or not sampled_langs or not remaining:
                lang = int(rng.choice(self.langs, p=self.lang_probs))
            else:
                rem = sorted(remaining)
                p = self.lang_probs[rem]
                lang = int(rng.choice(rem, p=p / p.sum()))

            item = self._next_sample(lang, iters, rng)
            audio = np.asarray(item["audio"])
            if audio.size == 0 or not np.any(audio):
                continue  # all-silence: keep sampling
            if audio.ndim > 1 and self.force_monochannel:
                audio = audio.mean(axis=-1)
            dur = len(audio) / self.sample_rate
            if duration + dur > self.max_duration:
                continue
            duration += dur
            sampled_langs.append(lang)
            audios.append(audio)
            texts.append(np.asarray(item["text"]).reshape(-1))
            if pure_mono:
                break

        ndims = {a.ndim for a in audios}
        if len(ndims) > 1:
            raise RuntimeError(
                "Mixture of audios with different number of channels in "
                "CodeSwitchedDataset."
            )

        comp = self._silence(self.pause_start, audios[0])
        for k, wav in enumerate(audios):
            if wav.ndim == 1:
                wav = np.trim_zeros(wav)
            rms = np.maximum(0.01, np.sqrt((wav ** 2).mean(axis=0)))
            wav = wav * (10.0 ** (self.db_norm / 20.0) / rms)
            comp = np.append(comp, wav, axis=0)
            if k < len(audios) - 1 and self.pause_join:
                comp = np.append(comp, self._silence(self.pause_join, comp), axis=0)
        comp = np.append(comp, self._silence(self.pause_end, comp), axis=0)
        comp = comp.astype(np.float32)
        if self.augmentor is not None:
            comp = self.augmentor.perturb(comp, self.sample_rate)

        return {
            "audio": comp,
            "audio_len": np.int32(len(comp)),
            "text": np.concatenate(texts).astype(np.int32),
            "langs": np.asarray(sampled_langs, np.int32),
        }

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        iters = {k: self._lang_iter(k, rng) for k in self.langs}
        produced = 0
        while self.infinity_mode or produced < self.length:
            produced += 1
            yield self.build_single_cs_sample(iters, rng)

    def __len__(self) -> int:
        return self.length
