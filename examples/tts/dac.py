"""Train the DAC residual-VQ audio codec.

The reference ships a broken models/dac.py (imports a DACModule that does
not exist in its tree); this entry point trains the working codec
(roar_tpu/models/dac.py) with the shared GAN engine:

    python examples/tts/dac.py --config-name=dac_22050 \
        train_dataset=train.json validation_datasets=val.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.models.dac import DACModel
from roar_tpu.training.run import build_validation_datasets, build_vocoder_dataset, train_gan


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="dac_22050")
def main(cfg):
    model = DACModel(cfg["model"])
    train_ds = build_vocoder_dataset(cfg["model"]["train_ds"]["dataset"])
    val_cfg = (cfg["model"].get("validation_ds") or {}).get("dataset")
    val_ds = (
        build_validation_datasets(val_cfg, build_vocoder_dataset)
        if val_cfg else None
    )
    train_gan(cfg, model, train_ds, val_ds)


if __name__ == "__main__":
    main()
