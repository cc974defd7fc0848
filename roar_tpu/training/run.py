"""Config-driven training runner (the L5 glue).

Replaces the reference's `hydra_runner + pl.Trainer + exp_manager` entry
pattern (examples/tts/fastpitch.py:10-29 etc.): builds dataset, sampler,
model task, optimizer(s), mesh, and runs the epoch loop with validation,
checkpointing, preemption, and profiler windows.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from roar_tpu.data import BucketSpec, LengthBucketBatchSampler, TTSDataset, VocoderDataset
from roar_tpu.parallel import make_mesh, replicate, shard_batch
from roar_tpu.training.exp_manager import ExpManager
from roar_tpu.training.optim import build_optimizer
from roar_tpu.training.trainer import Trainer


def build_tts_dataset(ds_cfg: Dict[str, Any], tokenizer) -> TTSDataset:
    """Instantiate a TTSDataset from a reference train_ds.dataset block."""
    kwargs = {k: v for k, v in ds_cfg.items() if k != "_target_"}
    kwargs.setdefault("text_tokenizer", tokenizer)
    kwargs["text_tokenizer"] = tokenizer
    return TTSDataset(**kwargs)


def build_vocoder_dataset(ds_cfg: Dict[str, Any]):
    """Instantiate either vocoder dataset family: the classic
    manifest_filepath VocoderDataset, or — when the `_target_`/keys name the
    new-style dataset — the dataset_meta-driven one
    (data/vocoder_dataset.py, conf/hifigan_dataset recipes)."""
    kwargs = {k: v for k, v in ds_cfg.items() if k != "_target_"}
    target = ds_cfg.get("_target_", "")
    if "dataset_meta" in kwargs or "vocoder_dataset" in target:
        from roar_tpu.data.vocoder_dataset import VocoderDataset as MetaVocoderDataset

        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        return MetaVocoderDataset(**kwargs)
    return VocoderDataset(**kwargs)


def parse_dataset_as_name(name) -> str:
    """Metric-prefix name for a validation manifest (ref
    roar/utils/model_utils.py:150-196 parse_dataset_as_name): file stem,
    dashes to underscores, 'manifest'/'dataset' stripped, trailing '_'."""
    import os

    s = str(name)
    if os.path.exists(s):
        from pathlib import Path

        s = Path(s).stem
    s = s.replace("-", "_").replace("manifest", "").replace("dataset", "")
    if not s:
        raise ValueError(
            "manifest filename reduces to an empty dataloader name; pick a "
            "more descriptive filename (ref model_utils.py:179-186)"
        )
    if not s.endswith("_"):
        s += "_"
    return s


def build_validation_datasets(ds_cfg: Dict[str, Any], builder):
    """One or several validation datasets from a validation_ds.dataset block
    (ref roar/utils/model_utils.py:219-296 resolve_validation_dataloaders):
    a list (or comma-joined string) of manifest paths becomes one dataset per
    path, named via parse_dataset_as_name; a single path stays a single
    dataset.  `builder(ds_cfg)` constructs one dataset from one config."""
    paths = ds_cfg.get("manifest_filepath")
    if isinstance(paths, str) and "," in paths:
        paths = [p.strip() for p in paths.split(",")]
    if not isinstance(paths, (list, tuple)) or len(paths) <= 1:
        return builder(ds_cfg)
    sets = {}
    for p in paths:
        name = parse_dataset_as_name(p)
        if name in sets:
            raise ValueError(
                f"validation manifests produce duplicate dataloader name "
                f"'{name}' (ref model_utils.py unique_names_check)"
            )
        sets[name] = builder({**ds_cfg, "manifest_filepath": p})
    return sets


def _val_sets(val_dataset, model_cfg: Dict[str, Any]):
    """Normalize val_dataset (one dataset | list | dict name->dataset) to
    [(name, ds)] plus the val_dl_idx whose metrics log unprefixed (ref
    ModelPT multi_validation_epoch_end: the val_dl_idx dataloader's metrics
    are THE val_* metrics; every dataloader also logs '<name>val_*')."""
    if val_dataset is None:
        return [], 0
    if isinstance(val_dataset, dict):
        sets = list(val_dataset.items())
    elif isinstance(val_dataset, (list, tuple)):
        sets = [(f"{i}_", d) for i, d in enumerate(val_dataset)]
    else:
        sets = [("", val_dataset)]
    idx = int((model_cfg.get("validation_ds") or {}).get("val_dl_idx", 0) or 0)
    if not 0 <= idx < len(sets):
        raise ValueError(
            f"val_dl_idx={idx} is out of range for {len(sets)} validation "
            f"dataloader(s) — a typo'd index would silently change which "
            f"dataloader defines the unprefixed val_* metrics"
        )
    return sets, idx


def batch_iterator(
    dataset,
    sampler,
    buckets: Optional[BucketSpec] = None,
    num_workers: int = 0,
    prefetch_factor: int = 2,
):
    """Yield collated batches in sampler order.

    With num_workers > 0, loading + collation run in a thread pool with a
    bounded in-order window of in-flight batches, so host-side audio
    decode / numpy collate for batch N+1..N+k overlaps the device step for
    batch N — the TPU-native analogue of the reference's
    `dataloader_params.num_workers` (torch DataLoader workers, e.g.
    conf/fastpitch/fastpitch_22050_align.yaml dataloader_params). Threads
    (not processes) suffice: audio decode (native/audio_io.cc, soundfile)
    and numpy collate release the GIL.
    """

    def load(idxs):
        items = [dataset[i] for i in idxs]
        if buckets is not None:
            return dataset.collate(items, buckets)
        return dataset.collate(items)

    if num_workers <= 0:
        for idxs in sampler:
            yield load(idxs)
        return

    import collections
    from concurrent.futures import ThreadPoolExecutor

    window = max(2, num_workers * max(prefetch_factor, 1))
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = collections.deque()
        it = iter(sampler)
        try:
            for idxs in it:
                pending.append(pool.submit(load, idxs))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for f in pending:
                f.cancel()


class ProfilerWindow:
    """jax.profiler trace windowed by step numbers, the TPU analogue of the
    reference's nsys start/end-step hooks (modelPT.py:1720-1859)."""

    def __init__(self, cfg: Optional[Dict[str, Any]], log_dir: str):
        cfg = cfg or {}
        self.enabled = bool(cfg.get("enabled", False))
        self.start_step = cfg.get("start_step", 10)
        self.end_step = cfg.get("end_step", 20)
        self.log_dir = str(log_dir)
        self._active = False

    def on_step(self, step: int):
        if not self.enabled:
            return
        if self.start_step <= step < self.end_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def as_callback(self):
        """Per-step Trainer callback; counts steps host-side (no device
        sync per step)."""
        counter = {"step": 0}

        def cb(state, metrics):
            counter["step"] += 1
            self.on_step(counter["step"])

        return cb if self.enabled else None

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def _early_stopping_cfg(exp_cfg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Translate the reference exp_manager keys
    (`create_early_stopping_callback` + `early_stopping_callback_params`,
    roar/utils/exp_manager.py:270-272,434-436) into EarlyStopping kwargs;
    Lightning-only params (strict/log_rank_zero_only/...) are dropped."""
    if not exp_cfg.get("create_early_stopping_callback", False):
        return None
    params = exp_cfg.get("early_stopping_callback_params") or {}
    keep = ("monitor", "mode", "min_delta", "patience", "check_finite", "verbose")
    return {k: params[k] for k in keep if k in params}


def _map_precision(value) -> Optional[str]:
    """Reference trainer `precision` values -> our mixed-precision mode.
    16/'16'/'16-mixed' map to bf16 (the TPU AMP analogue; no loss scaling),
    'bf16'/'bf16-mixed' stay bf16, 32/None stay full precision."""
    if value in (16, "16", "16-mixed", "bf16", "bf16-mixed", "bfloat16"):
        return "bf16"
    return None


def _mesh_from_cfg(trainer_cfg: Dict[str, Any], batch_size: Optional[int] = None):
    import math
    import warnings

    n = len(jax.devices())
    devices_cfg = trainer_cfg.get("devices", -1)
    if isinstance(devices_cfg, int) and devices_cfg > 0:
        n = min(n, devices_cfg)
    model_axis = int(trainer_cfg.get("model_parallel_size", 1))
    data_axis = n // model_axis
    if batch_size is not None and batch_size % data_axis != 0:
        capped = math.gcd(batch_size, data_axis)
        warnings.warn(
            f"batch_size {batch_size} not divisible by {data_axis} data-parallel "
            f"devices; using a {capped}-way data axis"
        )
        data_axis = capped
    devices = jax.devices()[: data_axis * model_axis]
    # multi-slice (DCN) topology: slice-major data ordering so the gradient
    # all-reduce goes hierarchical (ICI reduce-scatter -> DCN -> ICI gather)
    n_slices = len({getattr(d, "slice_index", 0) or 0 for d in devices})
    if n_slices > 1:
        from roar_tpu.parallel.mesh import make_hybrid_mesh

        try:
            return make_hybrid_mesh(num_slices=n_slices, model=model_axis,
                                    devices=devices)
        except ValueError as e:  # capped/uneven device subset: plain order
            warnings.warn(f"hybrid (multi-slice) mesh unavailable: {e}")
    return make_mesh(data=data_axis, model=model_axis)


def _yaml_safe(obj):
    """Strip config values yaml.safe_dump cannot carry (callables injected
    at run time, e.g. a text_normalizer hook) so the bundle config stays a
    faithful, loadable record of everything declarable."""
    if isinstance(obj, dict):
        return {k: _yaml_safe(v) for k, v in obj.items() if not callable(v)}
    if isinstance(obj, (list, tuple)):
        return [_yaml_safe(v) for v in obj]
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    return str(obj)


def _maybe_save_roar(cfg, exp, state, gan: bool = False) -> None:
    """End-of-training `.roar` bundle, the reference RoarModelCheckpoint's
    `always_save_roar` / save-on-train-end behavior
    (roar/utils/callbacks/roar_model_checkpoint.py:19-250): one restorable
    artifact holding the config and the final weights.  Enabled by
    `exp_manager.always_save_roar` or
    `exp_manager.checkpoint_callback_params.always_save_roar`.  GAN states
    bundle `{'g_params', 'd_params', 'd_stats'}` so a vocoder bundle both
    serves (serving.engine_from_bundles reads g_params) and fine-tunes."""
    exp_cfg = cfg.get("exp_manager") or {}
    ccp = exp_cfg.get("checkpoint_callback_params") or {}
    if not (exp_cfg.get("always_save_roar") or ccp.get("always_save_roar")):
        return
    from roar_tpu.training.save_restore import save_to
    from roar_tpu.utils.logging import get_logger

    if jax.process_index() != 0:
        return
    name = exp_cfg.get("name") or cfg.get("name") or "model"
    (exp.root / "checkpoints").mkdir(parents=True, exist_ok=True)
    path = str(exp.root / "checkpoints" / f"{name}.roar")
    if gan:
        params = {
            "g_params": jax.device_get(state.g_params),
            "d_params": jax.device_get(state.d_params),
        }
        if state.d_stats is not None:
            params["d_stats"] = jax.device_get(state.d_stats)
    else:
        params = jax.device_get(state.params)
    save_to(path, _yaml_safe(cfg), params)
    get_logger().info(f"saved end-of-training bundle: {path}")


def _log_tts_artifacts(artifacts, model, state, val_dataset, epoch: int):
    """Synthesize one validation utterance and write plot/audio artifacts."""
    import numpy as np

    try:
        text = np.asarray(val_dataset[0]["text"])[None]
        pad_to = -(-text.shape[1] // 16) * 16
        pad_id = model.tokenizer.pad if model.tokenizer is not None else 0
        text = np.pad(text, ((0, 0), (0, pad_to - text.shape[1])),
                      constant_values=pad_id)
        spect, lens = model.generate_spectrogram(
            jax.device_get(state.params), jnp.asarray(text), max_mel_len=1024
        )
        outputs = {"spect": np.asarray(spect)[:, : int(lens[0])]}
        artifacts(epoch, outputs, {})
    except Exception as e:  # artifacts must never kill training
        from roar_tpu.utils.logging import get_logger

        get_logger().warning(f"artifact generation failed: {e}")


def _first_batch_indices(sampler, dataset, batch_size):
    """First sampler batch, with a diagnosable error when filtering +
    drop_last leave nothing (the raw IndexError hid the cause: e.g. the
    hifigan recipe's train_min_duration filtering a short corpus below one
    full batch)."""
    batches = list(iter(sampler))
    if not batches:
        raise ValueError(
            f"training sampler produced 0 batches: dataset has "
            f"{len(dataset)} usable items after duration/manifest filtering "
            f"but batch_size={batch_size} with drop_last needs at least one "
            f"full batch. Lower batch_size, add data, or relax "
            f"min/max_duration."
        )
    return batches[0]


def train_supervised(
    cfg: Dict[str, Any],
    model,
    dataset,
    val_dataset=None,
    max_epochs: Optional[int] = None,
    buckets: Optional[BucketSpec] = None,
) -> Any:
    """Train a loss_fn-style task (FastPitch, Aligner)."""
    trainer_cfg = cfg.get("trainer", {})
    exp_cfg = cfg.get("exp_manager", {}) or {}
    model_cfg = cfg.get("model", {})
    dl_cfg = (model_cfg.get("train_ds") or {}).get("dataloader_params", {})
    batch_size = dl_cfg.get("batch_size", 16)
    max_epochs = max_epochs or trainer_cfg.get("max_epochs", 1)

    mesh = _mesh_from_cfg(trainer_cfg, batch_size)
    # multi-host: each process reads a disjoint shard of batches
    sampler = LengthBucketBatchSampler(
        dataset.lengths, batch_size=batch_size,
        shuffle=dl_cfg.get("shuffle", True),
        drop_last=True,
        seed=trainer_cfg.get("seed", 0),
        num_shards=jax.process_count(), shard_rank=jax.process_index(),
    )
    steps_per_epoch = max(len(sampler), 1)
    optimizer = build_optimizer(
        model_cfg.get("optim", {}),
        steps_per_epoch=steps_per_epoch,
        max_epochs=max_epochs,
        max_steps=model_cfg.get("max_steps") or trainer_cfg.get("max_steps"),
        gradient_clip_val=trainer_cfg.get("gradient_clip_val"),
    )

    def loss_fn(params, batch, rng, epoch):
        return model.loss_fn(params, batch, rng, epoch)

    trainer = Trainer(
        loss_fn=loss_fn,
        optimizer=optimizer,
        mesh=mesh,
        ema_decay=exp_cfg.get("ema", {}).get("decay") if exp_cfg.get("ema") else None,
        log_every=trainer_cfg.get("log_every_n_steps", 100),
        precision=_map_precision(trainer_cfg.get("precision")),
        # stop condition: trainer.max_steps wins (Lightning semantics);
        # model.max_steps is the LR-schedule horizon, not a stop signal
        max_steps=trainer_cfg.get("max_steps") or model_cfg.get("max_steps"),
        # dynamic freezing (ref model.freeze_updates, modelPT.py:1779-1841)
        freeze_updates=model_cfg.get("freeze_updates"),
    )
    exp = ExpManager(
        exp_dir=exp_cfg.get("exp_dir") or "./exp",
        name=exp_cfg.get("name", cfg.get("name", "run")),
        version=exp_cfg.get("version"),
        resume_if_exists=exp_cfg.get("resume_if_exists", False),
        use_tensorboard=exp_cfg.get("create_tensorboard_logger", True),
        use_wandb=exp_cfg.get("create_wandb_logger", False),
        wandb_kwargs=exp_cfg.get("wandb_logger_kwargs"),
        use_mlflow=exp_cfg.get("create_mlflow_logger", False),
        mlflow_kwargs=exp_cfg.get("mlflow_logger_kwargs"),
        use_dllogger=exp_cfg.get("create_dllogger_logger", False),
        dllogger_kwargs=exp_cfg.get("dllogger_logger_kwargs"),
        use_clearml=exp_cfg.get("create_clearml_logger", False),
        clearml_kwargs=exp_cfg.get("clearml_logger_kwargs"),
        max_time_seconds=trainer_cfg.get("max_time_seconds"),
        early_stopping=_early_stopping_cfg(exp_cfg),
        config=cfg,
    )
    profiler = ProfilerWindow(model_cfg.get("profile"), str(exp.root / "profile"))
    prof_cb = profiler.as_callback()
    if prof_cb is not None:
        trainer.callbacks = tuple(trainer.callbacks) + (prof_cb,)

    _first = _first_batch_indices(sampler, dataset, batch_size)
    example = (
        dataset.collate([dataset[i] for i in _first], buckets)
        if buckets
        else dataset.collate([dataset[i] for i in _first])
    )
    params = model.init_params(jax.random.PRNGKey(trainer_cfg.get("seed", 0)), example)
    state = trainer.init_state(params)
    state, start_step = exp.maybe_resume(state)
    if start_step:
        state = replicate(state, mesh)

    check_val_every = trainer_cfg.get("check_val_every_n_epoch", 1)
    val_sets, val_dl_idx = _val_sets(val_dataset, model_cfg)

    # optional validation artifacts (plots + Griffin-Lim preview), matching
    # the reference's configure_callbacks artifact generators
    artifacts = None
    if exp_cfg.get("log_artifacts") and hasattr(model, "generate_spectrogram"):
        from roar_tpu.training.callbacks import FastPitchArtifactGenerator

        artifacts = FastPitchArtifactGenerator(
            str(exp.root / "artifacts"),
            log_every_epochs=check_val_every,
            mel_cfg=getattr(model, "mel_cfg", None),
        )

    # jitted once: eager per-batch eval dispatches the whole model op-by-op
    @jax.jit
    def _val_metrics(params, batch, epoch):
        _, m = model.loss_fn(params, batch, None, epoch, deterministic=True)
        return m

    num_workers = int(dl_cfg.get("num_workers") or 0)
    for epoch in range(max_epochs):
        sampler.set_epoch(epoch)
        batches = batch_iterator(dataset, sampler, buckets, num_workers=num_workers)
        state, metrics = trainer.run_epoch(state, batches, epoch=epoch, logger=exp.logger)
        if exp.should_stop() or trainer.reached_max_steps:
            exp.save(state, metrics)
            break
        if val_sets and (epoch + 1) % check_val_every == 0:
            val_logged: Dict[str, float] = {}
            for si, (ds_name, vds) in enumerate(val_sets):
                val_sampler = LengthBucketBatchSampler(
                    vds.lengths, batch_size=batch_size, shuffle=False, drop_last=True
                )
                val_metrics = trainer.evaluate(
                    _val_metrics,
                    state,
                    batch_iterator(vds, val_sampler, buckets, num_workers=num_workers),
                    extra_args=(jnp.asarray(epoch, jnp.int32),),
                )
                # multi-dataloader naming (ref ModelPT multi_validation_epoch_end):
                # every set logs '<name>val_*'; the val_dl_idx set is THE 'val_*'
                if len(val_sets) > 1:
                    val_logged.update(
                        {f"{ds_name}val_{k}": v for k, v in val_metrics.items()}
                    )
                if si == val_dl_idx:
                    val_logged.update({f"val_{k}": v for k, v in val_metrics.items()})
            exp.logger.log_metrics(
                val_logged, step=int(jax.device_get(state.step))
            )
            if artifacts is not None:
                _log_tts_artifacts(artifacts, model, state, val_sets[val_dl_idx][1], epoch)
            if exp.check_early_stop(val_logged):
                exp.save(state, metrics)
                break
        exp.save(state, metrics)
    profiler.close()
    exp.close()
    _maybe_save_roar(cfg, exp, state)
    return state


def train_gan(
    cfg: Dict[str, Any],
    model,
    dataset,
    val_dataset=None,
    max_epochs: Optional[int] = None,
    buckets: Optional[BucketSpec] = None,
) -> Any:
    """Train a GAN task (HifiGanModel, JETSModel)."""
    trainer_cfg = cfg.get("trainer", {})
    exp_cfg = cfg.get("exp_manager", {}) or {}
    model_cfg = cfg.get("model", {})
    dl_cfg = (model_cfg.get("train_ds") or {}).get("dataloader_params", {})
    batch_size = dl_cfg.get("batch_size", 16)
    max_epochs = max_epochs or trainer_cfg.get("max_epochs", 1)

    mesh = _mesh_from_cfg(trainer_cfg, batch_size)
    sampler = LengthBucketBatchSampler(
        dataset.lengths, batch_size=batch_size,
        shuffle=dl_cfg.get("shuffle", True), drop_last=True,
        seed=trainer_cfg.get("seed", 0),
        num_shards=jax.process_count(), shard_rank=jax.process_index(),
    )
    steps_per_epoch = max(len(sampler), 1)
    optim_cfg = dict(model_cfg.get("optim", {}))
    optim_cfg.pop("_target_", None)
    max_steps = model_cfg.get("max_steps") or trainer_cfg.get("max_steps")
    g_opt = build_optimizer(
        optim_cfg, steps_per_epoch=steps_per_epoch, max_epochs=max_epochs,
        max_steps=max_steps, gradient_clip_val=trainer_cfg.get("gradient_clip_val"),
    )
    d_opt = build_optimizer(
        optim_cfg, steps_per_epoch=steps_per_epoch, max_epochs=max_epochs,
        max_steps=max_steps, gradient_clip_val=trainer_cfg.get("gradient_clip_val"),
    )

    exp = ExpManager(
        exp_dir=exp_cfg.get("exp_dir") or "./exp",
        name=exp_cfg.get("name", cfg.get("name", "run")),
        version=exp_cfg.get("version"),
        resume_if_exists=exp_cfg.get("resume_if_exists", False),
        use_tensorboard=exp_cfg.get("create_tensorboard_logger", True),
        use_wandb=exp_cfg.get("create_wandb_logger", False),
        wandb_kwargs=exp_cfg.get("wandb_logger_kwargs"),
        use_mlflow=exp_cfg.get("create_mlflow_logger", False),
        mlflow_kwargs=exp_cfg.get("mlflow_logger_kwargs"),
        use_dllogger=exp_cfg.get("create_dllogger_logger", False),
        dllogger_kwargs=exp_cfg.get("dllogger_logger_kwargs"),
        use_clearml=exp_cfg.get("create_clearml_logger", False),
        clearml_kwargs=exp_cfg.get("clearml_logger_kwargs"),
        max_time_seconds=trainer_cfg.get("max_time_seconds"),
        early_stopping=_early_stopping_cfg(exp_cfg),
        config=cfg,
    )

    first = _first_batch_indices(sampler, dataset, batch_size)
    example = (
        dataset.collate([dataset[i] for i in first], buckets)
        if buckets
        else dataset.collate([dataset[i] for i in first])
    )
    rng = jax.random.PRNGKey(trainer_cfg.get("seed", 0))
    state = model.init_state(rng, example, g_opt, d_opt)
    step_fn = model.make_train_step(
        g_opt, d_opt, precision=_map_precision(trainer_cfg.get("precision"))
    )

    state, start_step = exp.maybe_resume(state)
    if start_step:
        state = replicate(state, mesh)
    else:
        state = replicate(state, mesh)

    log_every = trainer_cfg.get("log_every_n_steps", 100)
    check_val_every = trainer_cfg.get("check_val_every_n_epoch", 1)
    val_sets, val_dl_idx = _val_sets(val_dataset, model_cfg)

    # jitted once: eager per-batch eval dispatches the whole model op-by-op
    @jax.jit
    def _gan_val_metrics(g_params, d_params, d_stats, batch, rng, epoch):
        _, vmetrics = model.g_loss_fn(g_params, d_params, d_stats, batch, rng, epoch)
        return vmetrics

    # host-side global step mirror: stop at trainer.max_steps (reference
    # Lightning semantics) without a device sync per step.  trainer.max_steps
    # wins over model.max_steps (the latter is the LR-schedule horizon).
    stop_steps = trainer_cfg.get("max_steps") or max_steps
    gstep = int(start_step or 0)
    reached_max_steps = False
    num_workers = int(dl_cfg.get("num_workers") or 0)
    for epoch in range(max_epochs):
        sampler.set_epoch(epoch)
        t0 = time.perf_counter()
        metrics = {}
        for i, batch in enumerate(
            batch_iterator(dataset, sampler, buckets, num_workers=num_workers)
        ):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, shard_batch(batch, mesh), sub, epoch)
            gstep += 1
            if i % log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["train_step_timing"] = (time.perf_counter() - t0) / (i + 1)
                exp.logger.log_metrics(host, step=int(jax.device_get(state.step)))
            if stop_steps is not None and gstep >= stop_steps:
                reached_max_steps = True
                break
            if exp.should_stop():
                break
        # validation: generator reconstruction losses without updates
        if val_sets and (epoch + 1) % check_val_every == 0 and not exp.should_stop():
            val_logged: Dict[str, float] = {}
            for si, (ds_name, vds) in enumerate(val_sets):
                val_sampler = LengthBucketBatchSampler(
                    vds.lengths, batch_size=batch_size, shuffle=False, drop_last=True
                )
                totals: Dict[str, float] = {}
                n = 0
                for batch in batch_iterator(
                    vds, val_sampler, buckets, num_workers=num_workers
                ):
                    rng, sub = jax.random.split(rng)
                    vmetrics = _gan_val_metrics(
                        state.g_params, state.d_params, state.d_stats,
                        shard_batch(batch, mesh), sub, jnp.asarray(epoch, jnp.int32),
                    )
                    for k, v in vmetrics.items():
                        totals[k] = totals.get(k, 0.0) + float(v)
                    n += 1
                if not n:
                    if si == val_dl_idx:
                        from roar_tpu.utils.logging import get_logger

                        get_logger().warning(
                            f"validation dataloader '{ds_name or si}' "
                            f"(val_dl_idx={val_dl_idx}) produced zero full "
                            f"batches (drop_last with a small val set?) — the "
                            f"headline val_* metrics are absent this epoch and "
                            f"early-stopping monitors will not see their key"
                        )
                    continue
                if len(val_sets) > 1:
                    val_logged.update(
                        {f"{ds_name}val_{k}": v / n for k, v in totals.items()}
                    )
                if si == val_dl_idx:
                    val_logged.update({f"val_{k}": v / n for k, v in totals.items()})
            if val_logged:
                exp.logger.log_metrics(
                    val_logged, step=int(jax.device_get(state.step))
                )
                exp.check_early_stop(val_logged)
        exp.save(state, {k: float(v) for k, v in metrics.items()})
        if exp.should_stop() or reached_max_steps:
            break
    exp.close()
    _maybe_save_roar(cfg, exp, state, gan=True)
    return state


def run_test(
    cfg: Dict[str, Any],
    model,
    test_dataset,
    state=None,
    params=None,
    buckets: Optional[BucketSpec] = None,
    log_dir: Optional[str] = None,
    epoch: Optional[int] = None,
) -> Dict[str, float]:
    """Evaluate a trained task on one or several test sets — the analogue of
    the reference's `trainer.test()` path (ModelPT setup_test_data /
    resolve_test_dataloaders, roar/utils/model_utils.py:299; metrics named
    like multi_test_epoch_end's 'test_*' and '<name>test_*').

    `test_dataset` follows the same shapes as validation: one dataset, a
    list, or a dict name->dataset (build_validation_datasets output).
    Supply either a TrainState (`state`) or a bare `params` pytree.
    `epoch` feeds models with epoch-scheduled loss terms (FastPitch aligner
    binarization ramp, bin_loss warmup); when omitted it is derived from
    the state's step count and `trainer.max_epochs`/`max_steps` so test
    metrics use the END-of-training schedule weights (comparable to the
    final val metrics), not epoch 0.
    Returns the aggregated metrics dict and appends one record to
    `<log_dir>/test_metrics.jsonl` when log_dir is given.
    """
    import json

    model_cfg = cfg.get("model", {})
    trainer_cfg = cfg.get("trainer", {})
    dl_cfg = (model_cfg.get("test_ds") or {}).get("dataloader_params", {})
    batch_size = dl_cfg.get("batch_size", 16)
    num_workers = int(dl_cfg.get("num_workers") or 0)
    mesh = _mesh_from_cfg(trainer_cfg, batch_size)
    if params is None:
        if state is None:
            raise ValueError("run_test needs state or params")
        params = state.params
    if epoch is None:
        max_epochs = int(trainer_cfg.get("max_epochs") or 0)
        max_steps = int(trainer_cfg.get("max_steps") or 0)
        step_count = int(jax.device_get(state.step)) if state is not None else 0
        if max_epochs and max_steps and step_count:
            epoch = min(max_epochs, round(step_count / max_steps * max_epochs))
        elif max_epochs and step_count:
            epoch = max_epochs  # trained state, epoch-count unknown: end-of-run
        else:
            epoch = 0

    # test_dl_idx mirrors val_dl_idx (ref resolve_test_dataloaders)
    if isinstance(test_dataset, dict):
        sets = list(test_dataset.items())
    elif isinstance(test_dataset, (list, tuple)):
        sets = [(f"{i}_", d) for i, d in enumerate(test_dataset)]
    else:
        sets = [("", test_dataset)]
    idx = int((model_cfg.get("test_ds") or {}).get("test_dl_idx", 0) or 0)
    if not 0 <= idx < len(sets):
        raise ValueError(
            f"test_dl_idx={idx} is out of range for {len(sets)} test "
            f"dataloader(s)"
        )

    @jax.jit
    def _metrics(params, batch, ep):
        _, m = model.loss_fn(params, batch, None, ep, deterministic=True)
        return m

    out: Dict[str, float] = {}
    for si, (ds_name, ds) in enumerate(sets):
        sampler = LengthBucketBatchSampler(
            ds.lengths, batch_size=batch_size, shuffle=False, drop_last=False
        )
        totals: Dict[str, float] = {}
        n = 0
        for batch in batch_iterator(ds, sampler, buckets, num_workers=num_workers):
            # sample-weighted epoch mean (the reference's trainer.test()
            # semantics): the ragged final batch contributes by its true
            # size, not as one equal-weight batch mean.  (Under dp>1
            # shard_batch may duplicate trailing rows inside that batch's
            # own mean — a second-order effect bounded by 1/batch_size.)
            w = int(jax.tree_util.tree_leaves(batch)[0].shape[0])
            m = _metrics(params, shard_batch(batch, mesh), jnp.asarray(epoch, jnp.int32))
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * w
            n += w
        if not n:
            if si == idx:
                from roar_tpu.utils.logging import get_logger

                get_logger().warning(
                    f"test dataloader '{ds_name or si}' (test_dl_idx={idx}) "
                    f"produced zero batches — headline test_* metrics absent"
                )
            continue
        if len(sets) > 1:
            out.update({f"{ds_name}test_{k}": v / n for k, v in totals.items()})
        if si == idx:
            out.update({f"test_{k}": v / n for k, v in totals.items()})
    if log_dir is not None:
        from pathlib import Path

        p = Path(log_dir)
        p.mkdir(parents=True, exist_ok=True)
        with open(p / "test_metrics.jsonl", "a", encoding="utf-8") as f:
            f.write(json.dumps({"time": time.time(), **out}) + "\n")
    return out
