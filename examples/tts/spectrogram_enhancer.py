"""Train the spectrogram enhancer (GAN mel refinement).

The reference exports SpectrogramEnhancerModel but its config `_target_`s
do not exist in its own tree and it ships no example; this CLI wires the
working TPU-native stack end to end: paired (predicted, ground-truth)
mels (ref PairedRealFakeSpectrogramsDataset, dataset.py:1303-1342) ->
hinge/R1/consistency GAN losses -> the shared GAN engine.

    python examples/tts/spectrogram_enhancer.py --config-name=spectrogram_enhancer \
        train_dataset=pairs.json trainer.max_steps=1000

The manifest comes from `generate_mels.py` (adds mel_filepath) plus a
`mel_gt_filepath` per entry (ground-truth mel .npy, e.g. a sup-data cache
path). The enhancer has no validation step (reference
spectrogram_enhancer.py setup_validation_data: none of the losses is a
model-selection metric).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.data import BucketSpec, PairedRealFakeSpectrogramsDataset
from roar_tpu.models.spectrogram_enhancer import SpectrogramEnhancerModel
from roar_tpu.training.run import train_gan


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="spectrogram_enhancer")
def main(cfg):
    dataset = PairedRealFakeSpectrogramsDataset(cfg["train_dataset"])
    model = SpectrogramEnhancerModel(cfg.get("model", {}))
    return train_gan(cfg, model, dataset, None,
                     buckets=BucketSpec(text_multiple=1, mel_multiple=32,
                                        audio_multiple=1))


if __name__ == "__main__":
    main()
