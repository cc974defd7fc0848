"""Batch sampling: length-bucketed batching and weighted multi-dataset
sampling.

TPU-first rethink of the reference's DistributedBucketSampler
(roar/collections/tts/data/dataset.py:1733-1851) and get_weighted_sampler
(tts_dataset_utils.py:214-240): batches are grouped by length so that each
jit bucket shape sees near-full occupancy, sharded across data-parallel hosts
deterministically by (seed, epoch, shard).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


class LengthBucketBatchSampler:
    """Yields lists of dataset indices.

    Items are sorted by length, grouped into contiguous batches (so lengths
    within a batch are similar, minimizing pad waste and jit-bucket count),
    and batch order is shuffled per epoch.  With `num_shards`, each shard
    sees a disjoint, equally-sized subset of batches (drop-last semantics
    across shards), the pjit-data-parallel analogue of the reference's
    per-rank bucket slicing.
    """

    def __init__(
        self,
        lengths: Sequence[float],
        batch_size: int,
        num_shards: int = 1,
        shard_rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        boundaries: Optional[Sequence[float]] = None,
    ):
        self.lengths = np.asarray(lengths)
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard_rank = shard_rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.boundaries = boundaries
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _batches(self) -> List[np.ndarray]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = np.argsort(self.lengths, kind="stable")
        if self.shuffle:
            # jitter within length-sorted order: shuffle inside coarse blocks
            block = max(self.batch_size * 8, 1)
            blocks = [order[i : i + block] for i in range(0, len(order), block)]
            order = np.concatenate([rng.permutation(b) for b in blocks]) if blocks else order
        bs = self.batch_size
        n_full = len(order) // bs
        batches = [order[i * bs : (i + 1) * bs] for i in range(n_full)]
        if not self.drop_last and len(order) % bs:
            batches.append(order[n_full * bs :])
        if self.shuffle:
            rng.shuffle(batches)
        # shard across data-parallel hosts
        if self.num_shards > 1:
            usable = (len(batches) // self.num_shards) * self.num_shards
            batches = batches[self.shard_rank : usable : self.num_shards]
        return batches

    def __iter__(self) -> Iterator[List[int]]:
        for b in self._batches():
            yield [int(i) for i in b]

    def __len__(self) -> int:
        return len(self._batches())


def weighted_indices(
    sample_weights: Sequence[float], num_samples: int, seed: int = 0, epoch: int = 0
) -> np.ndarray:
    """Weighted sampling with replacement (get_weighted_sampler analogue)."""
    w = np.asarray(sample_weights, dtype=np.float64)
    w = w / w.sum()
    rng = np.random.default_rng((seed, epoch, 7))
    return rng.choice(len(w), size=num_samples, replace=True, p=w)
