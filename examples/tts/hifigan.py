"""Train the HiFi-GAN vocoder (reference entry: examples/tts/hifigan.py).

    python examples/tts/hifigan.py --config-name=hifigan_22050 \
        train_dataset=train.json validation_datasets=val.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.models.hifigan_model import HifiGanModel
from roar_tpu.training.run import build_validation_datasets, build_vocoder_dataset, train_gan


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="hifigan_22050")
def main(cfg):
    model = HifiGanModel(cfg["model"])
    train_ds = build_vocoder_dataset(cfg["model"]["train_ds"]["dataset"])
    val_cfg = (cfg["model"].get("validation_ds") or {}).get("dataset")
    val_ds = (
        build_validation_datasets(val_cfg, build_vocoder_dataset)
        if val_cfg else None
    )
    train_gan(cfg, model, train_ds, val_ds)


if __name__ == "__main__":
    main()
