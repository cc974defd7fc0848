"""Train the standalone Aligner (reference entry: examples/tts/aligner.py).

    python examples/tts/aligner.py --config-name=aligner \
        train_dataset=train.json sup_data_path=sup
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.data import BucketSpec
from roar_tpu.models.aligner_model import AlignerModel
from roar_tpu.training.run import build_tts_dataset, train_supervised


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="aligner")
def main(cfg):
    model_cfg = dict(cfg["model"])
    model_cfg.setdefault("max_epochs", cfg.get("trainer", {}).get("max_epochs", 100))
    model = AlignerModel(model_cfg)
    train_ds = build_tts_dataset(cfg["model"]["train_ds"]["dataset"], model.tokenizer)
    train_supervised(cfg, model, train_ds, None, buckets=BucketSpec())


if __name__ == "__main__":
    main()
