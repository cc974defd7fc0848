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
