"""Adapter-based FastPitch finetuning (parameter-efficient speaker
adaptation).

The reference's adapter workflow (examples + adapter mixins) becomes:
1. restore a pretrained `.roar` bundle,
2. rebuild the module with `adapter_dim > 0` (bottleneck adapters are
   identity at init, so the pretrained behavior is preserved),
3. transplant the pretrained weights (path-matched),
4. train ONLY the adapter (+ optionally speaker-table) parameters via a
   masked optimizer.

    python examples/tts/fastpitch_finetune_adapters.py \
        --config-name=fastpitch_22050_align \
        train_dataset=ft.json sup_data_path=sup \
        pitch_mean=... pitch_std=... \
        +pretrained=base_model.roar +adapter_dim=64
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

from roar_tpu.config.cli import config_runner
from roar_tpu.data import BucketSpec, LengthBucketBatchSampler
from roar_tpu.models.fastpitch_model import FastPitchModel
from roar_tpu.training import (
    ExpManager,
    Trainer,
    build_optimizer,
    count_trainable,
    masked_optimizer,
    restore_from,
)
from roar_tpu.training.run import batch_iterator, build_tts_dataset
from roar_tpu.training.save_restore import transfer_params
from roar_tpu.utils.logging import get_logger


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"),
               config_name="fastpitch_22050_align")
def main(cfg):
    log = get_logger()
    adapter_dim = int(cfg.get("adapter_dim", 64))
    model_cfg = dict(cfg["model"])
    model_cfg.setdefault("input_fft", {})["adapter_dim"] = adapter_dim
    model_cfg.setdefault("output_fft", {})["adapter_dim"] = adapter_dim
    model = FastPitchModel(model_cfg)

    ds = build_tts_dataset(cfg["model"]["train_ds"]["dataset"], model.tokenizer)
    buckets = BucketSpec()
    sampler = LengthBucketBatchSampler(
        ds.lengths,
        batch_size=cfg["model"]["train_ds"]["dataloader_params"].get("batch_size", 16),
    )
    example = ds.collate([ds[i] for i in list(iter(sampler))[0]], buckets)
    params = model.init_params(jax.random.PRNGKey(0), example)

    if cfg.get("pretrained"):
        _, source = restore_from(cfg["pretrained"], params_template=None)
        params, loaded, _ = transfer_params(jax.device_get(params), source)
        log.info(f"warm start: {len(loaded)} tensors transplanted")

    patterns = [r"adapter", r"speaker_table"]
    base_opt = build_optimizer(cfg["model"].get("optim", {}))
    opt = masked_optimizer(base_opt, params, patterns)
    n_train, n_total = count_trainable(params, patterns)
    log.info(f"training {n_train/1e6:.2f}M of {n_total/1e6:.2f}M params")

    trainer = Trainer(
        loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e), optimizer=opt
    )
    exp = ExpManager(
        exp_dir=cfg.get("exp_manager", {}).get("exp_dir") or "./exp",
        name="fastpitch_adapters",
    )
    state = trainer.init_state(params)
    for epoch in range(cfg.get("trainer", {}).get("max_epochs", 100)):
        sampler.set_epoch(epoch)
        state, metrics = trainer.run_epoch(
            state, batch_iterator(ds, sampler, buckets), epoch=epoch, logger=exp.logger
        )
        exp.save(state, metrics)
        if exp.should_stop():
            break
    exp.close()


if __name__ == "__main__":
    main()
