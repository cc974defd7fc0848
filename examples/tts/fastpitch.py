"""Train FastPitch (reference entry: examples/tts/fastpitch.py:10-29).

    python examples/tts/fastpitch.py --config-name=fastpitch_22050_align \
        train_dataset=train.json validation_datasets=val.json \
        sup_data_path=sup pitch_mean=212.35 pitch_std=68.52
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.data import BucketSpec
from roar_tpu.models.fastpitch_model import FastPitchModel
from roar_tpu.training.run import build_tts_dataset, build_validation_datasets, train_supervised


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="fastpitch_22050_align")
def main(cfg):
    model = FastPitchModel(cfg["model"])
    train_ds = build_tts_dataset(cfg["model"]["train_ds"]["dataset"], model.tokenizer)
    val_cfg = (cfg["model"].get("validation_ds") or {}).get("dataset")
    val_ds = (
        build_validation_datasets(val_cfg, lambda c: build_tts_dataset(c, model.tokenizer))
        if val_cfg else None
    )
    train_supervised(cfg, model, train_ds, val_ds, buckets=BucketSpec())


if __name__ == "__main__":
    main()
