"""Tests for iterable ConcatDataset and CodeSwitchedDataset
(reference common/data/dataset.py:13-644)."""

import numpy as np
import pytest

from roar_tpu.data.concat_dataset import CodeSwitchedDataset, ConcatDataset


class ToyDS:
    """Map-style dataset of tagged sine snippets."""

    def __init__(self, tag, n=10, sr=16000, seconds=1.0, token_base=0):
        self.tag = tag
        self.n = n
        self.sr = sr
        self.seconds = seconds
        self.token_base = token_base

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        t = np.arange(int(self.sr * self.seconds)) / self.sr
        audio = 0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t).astype(np.float32)
        return {
            "audio": audio,
            "text": np.asarray([self.token_base + i], np.int32),
            "tag": self.tag,
        }

    def collate(self, items):
        return items


class TestConcatDataset:
    def test_round_robin_alternates(self):
        ds = ConcatDataset(
            [ToyDS("a"), ToyDS("b")], sampling_technique="round-robin",
            shuffle=False, seed=0,
        )
        tags = [item["tag"] for item in ds]
        assert len(tags) == len(ds) == 20
        assert tags[:6] == ["a", "b", "a", "b", "a", "b"]

    def test_temperature_flattens_sizes(self):
        """High temperature should sample the small dataset far more often
        than its size share."""
        big, small = ToyDS("big", n=90), ToyDS("small", n=10)
        ds = ConcatDataset(
            [big, small], sampling_technique="temperature",
            sampling_temperature=1000.0, seed=0,
        )
        tags = [item["tag"] for item in ds]
        frac_small = tags.count("small") / len(tags)
        assert 0.3 < frac_small < 0.7  # ~0.5 at T->inf, vs 0.1 by size

    def test_random_probabilities_respected(self):
        ds = ConcatDataset(
            [ToyDS("a", n=50), ToyDS("b", n=50)],
            sampling_technique="random", sampling_probabilities=[0.9, 0.1],
            seed=0,
        )
        tags = [item["tag"] for item in ds]
        assert tags.count("a") > tags.count("b")

    def test_random_requires_probabilities(self):
        with pytest.raises(ValueError):
            ConcatDataset([ToyDS("a")], sampling_technique="random")

    def test_unknown_technique_raises(self):
        with pytest.raises(ValueError):
            ConcatDataset([ToyDS("a")], sampling_technique="bogus")

    def test_world_size_partitions(self):
        full = ConcatDataset([ToyDS("a", n=8)], shuffle=False, world_size=1)
        r0 = ConcatDataset(
            [ToyDS("a", n=8)], shuffle=False, world_size=2, global_rank=0
        )
        r1 = ConcatDataset(
            [ToyDS("a", n=8)], shuffle=False, world_size=2, global_rank=1
        )
        ids_full = {int(i["text"][0]) for i in full}
        ids0 = {int(i["text"][0]) for i in r0}
        ids1 = {int(i["text"][0]) for i in r1}
        assert ids0 | ids1 == ids_full
        assert not (ids0 & ids1)
        assert len(r0) == len(r1) == 4

    def test_sampling_scale(self):
        ds = ConcatDataset([ToyDS("a", n=10)], sampling_scale=2, seed=0)
        assert len(ds) == 20
        assert sum(1 for _ in ds) == 20


class TestCodeSwitchedDataset:
    def test_composite_sample_structure(self):
        ds = CodeSwitchedDataset(
            [ToyDS("ta", token_base=0), ToyDS("hi", token_base=100)],
            min_duration=2.0, max_duration=10.0, min_monolingual=0.0,
            pause_start=20, pause_join=10, pause_end=30,
            seed=0, sample_rate=16000,
        )
        item = next(iter(ds))
        # >= 2 snippets of 1 s each to reach min_duration=2
        assert item["audio_len"] >= 2 * 16000
        assert item["text"].size >= 2
        assert len(set(item["langs"].tolist())) >= 2  # actually code-switched
        # starts with pause_start ms of silence
        n_start = int(20 * 16000 / 1000)
        assert np.abs(item["audio"][:n_start]).max() == 0.0
        # db-normalized: RMS of the voiced part near the target level
        voiced = item["audio"][n_start:]
        rms_db = 20 * np.log10(np.sqrt((voiced[np.abs(voiced) > 0] ** 2).mean()))
        assert -32 < rms_db < -18

    def test_monolingual_fraction(self):
        ds = CodeSwitchedDataset(
            [ToyDS("a"), ToyDS("b")], min_duration=2.0, min_monolingual=1.0,
            seed=0, sample_rate=16000,
        )
        item = next(iter(ds))
        assert len(item["langs"]) == 1  # pure mono short-circuits

    def test_length_and_iteration_bound(self):
        ds = CodeSwitchedDataset(
            [ToyDS("a", n=4), ToyDS("b", n=4)], min_duration=1.0,
            min_monolingual=1.0, seed=0, sample_rate=16000,
        )
        assert len(ds) == 8
        assert sum(1 for _ in ds) == 8

    def test_lang_probs_validation(self):
        with pytest.raises(ValueError):
            CodeSwitchedDataset([ToyDS("a"), ToyDS("b")], lang_probs=[1.0])

    def test_empty_datasets_raise(self):
        with pytest.raises(ValueError):
            CodeSwitchedDataset([])


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
