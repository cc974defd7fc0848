"""Train the speech enhancement model (reference entry:
examples/audio_tasks/speech_enhancement.py:11-42).

Manifest entries need `audio_filepath` (noisy) and `target_filepath` (clean).

    python examples/audio_tasks/speech_enhancement.py --config-name=speech_enhancement \
        train_dataset=train.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from roar_tpu.config.cli import config_runner
from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.manifest import read_manifest
from roar_tpu.models.enhancement import EncMaskDecEnhancementModel
from roar_tpu.training.run import train_supervised


class PairedAudioDataset:
    """(noisy, clean) pairs with fixed-length random crops."""

    def __init__(self, manifest_filepath, sample_rate, segment_samples=32768, seed=0):
        self.entries = read_manifest(manifest_filepath)
        self.sample_rate = sample_rate
        self.segment = segment_samples
        self.lengths = [float(e.get("duration", 0.0)) for e in self.entries]
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx):
        e = self.entries[idx]
        noisy = AudioSegment.from_file(e["audio_filepath"], target_sr=self.sample_rate).samples
        clean = AudioSegment.from_file(e["target_filepath"], target_sr=self.sample_rate).samples
        n = min(len(noisy), len(clean))
        if n >= self.segment:
            s = int(self._rng.integers(0, n - self.segment + 1))
            noisy, clean = noisy[s : s + self.segment], clean[s : s + self.segment]
        else:
            noisy = np.pad(noisy[:n], (0, self.segment - n))
            clean = np.pad(clean[:n], (0, self.segment - n))
        return {
            "input_signal": noisy,
            "target_signal": clean,
            "input_length": np.int32(min(n, self.segment)),
        }

    def collate(self, items, buckets=None):
        return {
            "input_signal": np.stack([i["input_signal"] for i in items]),
            "target_signal": np.stack([i["target_signal"] for i in items]),
            "input_length": np.asarray([i["input_length"] for i in items]),
        }


class MultiChannelPairedAudioDataset(PairedAudioDataset):
    """(multi-mic noisy [C, S], clean [S]) pairs for the beamforming recipe
    (reference beamforming.yaml train_ds: multi-channel input_key files,
    target_channel_selector)."""

    def __init__(self, manifest_filepath, sample_rate, num_channels=2,
                 target_channel=0, segment_samples=32768, seed=0):
        super().__init__(manifest_filepath, sample_rate, segment_samples, seed)
        self.num_channels = num_channels
        self.target_channel = target_channel

    def __getitem__(self, idx):
        e = self.entries[idx]
        chans = [
            AudioSegment.from_file(
                e["audio_filepath"], target_sr=self.sample_rate,
                channel_selector=c,
            ).samples
            for c in range(self.num_channels)
        ]
        clean = AudioSegment.from_file(
            e["target_filepath"], target_sr=self.sample_rate,
            channel_selector=self.target_channel,
        ).samples
        n = min(min(len(c) for c in chans), len(clean))
        if n >= self.segment:
            s = int(self._rng.integers(0, n - self.segment + 1))
            noisy = np.stack([c[s : s + self.segment] for c in chans])
            clean = clean[s : s + self.segment]
            n = self.segment
        else:
            noisy = np.stack(
                [np.pad(c[:n], (0, self.segment - n)) for c in chans]
            )
            clean = np.pad(clean[:n], (0, self.segment - n))
        return {
            "input_signal": noisy.astype(np.float32),
            "target_signal": clean.astype(np.float32),
            "input_length": np.int32(n),
        }


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="speech_enhancement")
def main(cfg):
    if cfg["model"].get("mask_processor") == "beamformer":
        # multi-channel MVDR recipe (reference beamforming.yaml — its
        # MaskBasedBeamformer target is absent upstream; working here)
        from roar_tpu.models.enhancement import MaskBasedBeamformerModel

        model = MaskBasedBeamformerModel(cfg["model"])
        ds = MultiChannelPairedAudioDataset(
            cfg["train_dataset"],
            sample_rate=cfg["model"].get("sample_rate", 16000),
            num_channels=cfg["model"].get("num_channels", 2),
            target_channel=cfg["model"].get("target_channel", 0),
            segment_samples=cfg["model"].get("segment_samples", 32768),
        )
        return train_supervised(cfg, model, ds, None)
    model = EncMaskDecEnhancementModel(cfg["model"])
    ds = PairedAudioDataset(
        cfg["train_dataset"],
        sample_rate=cfg["model"].get("sample_rate", 16000),
        segment_samples=cfg["model"].get("segment_samples", 32768),
    )
    train_supervised(cfg, model, ds, None)


if __name__ == "__main__":
    main()
