"""Training engine tests: optim/schedules, trainer e2e on FastPitch,
checkpoint/resume, .roar bundles, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.data import BucketSpec, TTSDataset, write_manifest, write_wav
from roar_tpu.data.tokenizers import EnglishCharsTokenizer
from roar_tpu.models.fastpitch_model import FastPitchModel
from roar_tpu.parallel import make_mesh
from roar_tpu.training import (
    ExpManager,
    Trainer,
    build_optimizer,
    get_schedule,
    restore_from,
    save_to,
)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def test_noam_annealing_shape():
    s = get_schedule("NoamAnnealing", initial_lr=1e-3, d_model=1, warmup_steps=100)
    lrs = [float(s(jnp.asarray(i))) for i in [0, 50, 99, 100, 1000, 10000]]
    # rises during warmup, peaks at warmup, decays afterward
    assert lrs[0] < lrs[1] < lrs[2]
    assert lrs[3] >= lrs[4] > lrs[5]


def test_cosine_annealing_endpoints():
    s = get_schedule(
        "CosineAnnealing", initial_lr=1.0, max_steps=1000, warmup_steps=100, min_lr=0.1
    )
    assert float(s(jnp.asarray(100))) == pytest.approx(1.0, abs=1e-3)
    assert float(s(jnp.asarray(1000))) == pytest.approx(0.1, abs=1e-3)
    assert float(s(jnp.asarray(550))) == pytest.approx(0.55, abs=0.01)


def test_build_optimizer_warmup_ratio():
    """warmup_ratio resolves against max_steps (aligner.yaml:81,
    hifigan_22050.yaml:83 use it); regression: train_supervised path used
    to crash with an unexpected kwarg."""
    opt = build_optimizer(
        {
            "name": "adamw",
            "lr": "1e-3",  # also exercise string-float coercion
            "sched": {"name": "CosineAnnealing", "warmup_ratio": 0.1, "min_lr": "1e-5"},
        },
        max_steps=1000,
    )
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # and via steps_per_epoch * max_epochs when max_steps isn't given
    opt2 = build_optimizer(
        {"name": "adam", "lr": 1e-3,
         "sched": {"name": "CosineAnnealing", "warmup_ratio": 0.5}},
        steps_per_epoch=10, max_epochs=10,
    )
    assert opt2.init(params) is not None
    with pytest.raises(ValueError, match="warmup_ratio"):
        build_optimizer(
            {"name": "adam", "lr": 1e-3,
             "sched": {"name": "NoamAnnealing", "warmup_ratio": 0.5}},
        )


def test_build_optimizer_from_reference_cfg():
    opt = build_optimizer(
        {
            "name": "adamw",
            "lr": 1e-3,
            "betas": [0.9, 0.999],
            "weight_decay": 1e-6,
            "sched": {"name": "NoamAnnealing", "warmup_steps": 10, "d_model": 1, "last_epoch": -1},
        },
        gradient_clip_val=1000.0,
    )
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


# ---------------------------------------------------------------------------
# End-to-end FastPitch training on a synthetic corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("fp_corpus")
    sr = 22050
    entries = []
    rng = np.random.default_rng(0)
    texts = ["hello world", "jax on tpu", "fast pitch go", "one two three four"]
    for i, txt in enumerate(texts):
        dur = 0.45 + 0.12 * i
        t = np.arange(int(sr * dur)) / sr
        f = 140 + 40 * i
        x = (0.4 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t))).astype(
            np.float32
        )
        p = root / f"wavs/u{i}.wav"
        p.parent.mkdir(exist_ok=True)
        write_wav(str(p), x, sr)
        entries.append(
            {"audio_filepath": str(p), "text": txt, "duration": dur, "speaker_id": 0}
        )
    man = root / "manifest.json"
    write_manifest(man, entries)
    return root, man, sr


def small_model_cfg():
    d = 48
    return {
        "learn_alignment": True,
        "bin_loss_warmup_epochs": 2,
        "n_mel_channels": 32,
        "symbols_embedding_dim": d,
        "preprocessor": {
            "sample_rate": 22050,
            "features": 32,
            "n_window_size": 1024,
            "n_window_stride": 256,
            "n_fft": 1024,
            "lowfreq": 0,
            "highfreq": 8000,
            "preemph": None,
            "normalize": None,
            "mag_power": 1.0,
            "log": True,
            "log_zero_guard_type": "add",
            "log_zero_guard_value": 1e-5,
            "dither": 0.0,
            "pad_to": 1,
        },
        "text_tokenizer": {
            "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
            "pad_with_space": True,
        },
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": d, "d_head": 16, "d_inner": 96},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": d, "d_head": 16, "d_inner": 96},
        "alignment_module": {"n_text_channels": d, "n_att_channels": 16},
        "duration_predictor": {"input_size": d, "filter_size": 24},
        "pitch_predictor": {"input_size": d, "filter_size": 24},
    }


@pytest.fixture(scope="module")
def fp_setup(corpus):
    root, man, sr = corpus
    model = FastPitchModel(small_model_cfg())
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=model.tokenizer,
        sup_data_path=str(root / "sup"),
        sup_data_types=["align_prior_matrix", "pitch"],
        n_fft=1024,
        win_length=1024,
        hop_length=256,
        n_mels=32,
        highfreq=8000,
    )
    buckets = BucketSpec(text_multiple=8, mel_multiple=16, audio_multiple=4096)
    batch = ds.collate([ds[i] for i in range(4)], buckets)
    return model, ds, batch


def test_fastpitch_trains_and_loss_decreases(fp_setup, tmp_path):
    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(0), batch)
    opt = build_optimizer(
        {"name": "adamw", "lr": 2e-3, "weight_decay": 1e-6}, gradient_clip_val=1000.0
    )

    def loss_fn(p, b, rng, epoch):
        return model.loss_fn(p, b, rng, epoch)

    mesh = make_mesh(data=4, model=1)  # 4-way data parallel on the CPU mesh
    trainer = Trainer(loss_fn=loss_fn, optimizer=opt, mesh=mesh, ema_decay=0.999)
    state = trainer.init_state(params)

    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="fp", use_tensorboard=False)
    losses = []
    for epoch in range(6):
        state, metrics = trainer.run_epoch(state, [batch], epoch=epoch, logger=exp.logger)
        losses.append(metrics["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # checkpoint save + restore roundtrip
    exp.save(state, metrics)
    restored = exp.restore(jax.device_get(state))
    rs = jax.tree_util.tree_leaves(restored.params)
    os_ = jax.tree_util.tree_leaves(jax.device_get(state).params)
    for a, b in zip(rs, os_):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(restored.step)) == 6
    exp.close()

    # EMA params differ from raw params but stay close
    ema = jax.tree_util.tree_leaves(state.ema_params)
    raw = jax.tree_util.tree_leaves(state.params)
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(ema, raw)]
    assert max(diffs) > 0

    # inference produces a mel
    tokens = jnp.asarray(model.parse("hello world"))
    spect, lens = model.generate_spectrogram(state.params, tokens, max_mel_len=256)
    assert spect.shape == (1, 256, 32)
    assert 0 < int(lens[0]) <= 256


def test_max_steps_stops_mid_epoch():
    """`trainer.max_steps` (reference Lightning Trainer arg in every shipped
    YAML) halts training at the step count even inside an epoch, including
    across a resume-style restart where state.step starts non-zero."""
    opt = build_optimizer({"name": "adam", "lr": 0.1})

    def loss_fn(p, b, rng, epoch):
        l = jnp.sum((p["w"] - b["target"]) ** 2)
        return l, {"loss": l}

    trainer = Trainer(loss_fn=loss_fn, optimizer=opt, max_steps=5)
    batch = {"target": jnp.full((4,), 3.0)}
    state = trainer.init_state({"w": jnp.zeros((4,))})
    state, _ = trainer.run_epoch(state, [batch] * 10, epoch=0)
    assert int(jax.device_get(state.step)) == 5
    assert trainer.reached_max_steps

    # resumed run: 5 already done, 2 more allowed by max_steps=7
    trainer2 = Trainer(loss_fn=loss_fn, optimizer=opt, max_steps=7)
    trainer2.reached_max_steps = False
    state, _ = trainer2.run_epoch(state, [batch] * 10, epoch=1)
    assert int(jax.device_get(state.step)) == 7
    assert trainer2.reached_max_steps


def test_maybe_resume_restores_into_fresh_run(tmp_path):
    """resume_if_exists picks up the latest checkpoint in a new process
    (exp_manager.py:530-618 semantics), on a tiny quadratic task."""
    opt = build_optimizer({"name": "adam", "lr": 0.1})

    def loss_fn(p, b, rng, epoch):
        l = jnp.sum((p["w"] - b["target"]) ** 2)
        return l, {"loss": l}

    trainer = Trainer(loss_fn=loss_fn, optimizer=opt)
    batch = {"target": jnp.full((4,), 3.0)}
    state = trainer.init_state({"w": jnp.zeros((4,))})
    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="q", use_tensorboard=False)
    for epoch in range(3):
        state, metrics = trainer.run_epoch(state, [batch], epoch=epoch, logger=exp.logger)
    exp.save(state, metrics)
    exp.close()

    # fresh manager + fresh state, as after preemption
    exp2 = ExpManager(
        exp_dir=str(tmp_path / "exp"), name="q",
        use_tensorboard=False, resume_if_exists=True,
    )
    fresh = trainer.init_state({"w": jnp.zeros((4,))})
    resumed, start_step = exp2.maybe_resume(fresh)
    assert start_step == 3
    np.testing.assert_allclose(
        np.asarray(resumed.params["w"]), np.asarray(jax.device_get(state).params["w"])
    )
    # and training continues from there
    resumed, m = trainer.run_epoch(resumed, [batch], epoch=3, logger=exp2.logger)
    assert int(jax.device_get(resumed.step)) == 4
    exp2.close()


def test_roar_bundle_roundtrip(fp_setup, tmp_path):
    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(1), batch)
    path = str(tmp_path / "model.roar")
    save_to(path, {"target": "roar_tpu.models.fastpitch_model.FastPitchModel", "model": small_model_cfg()}, params)
    cfg, restored = restore_from(path, params_template=jax.device_get(params))
    assert cfg["target"].endswith("FastPitchModel")
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(jax.device_get(params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_sharding_over_mesh(fp_setup):
    model, ds, batch = fp_setup
    mesh = make_mesh(data=4, model=1)
    from roar_tpu.parallel import shard_batch

    sharded = shard_batch(batch, mesh)
    audio = sharded["audio"]
    assert len(audio.sharding.device_set) == 4

    # ragged batch: padded by duplicating the last example (torch
    # DistributedSampler wrap-around semantics), not an error
    ragged = np.arange(6).reshape(3, 2).astype(np.float32)
    out = shard_batch({"x": ragged}, make_mesh(data=8, model=1))["x"]
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(out)[2:], np.broadcast_to(ragged[-1], (6, 2)))


@pytest.mark.slow
def test_ragged_final_batch_trains(fp_setup):
    """An epoch whose final batch is smaller than data_axis x per-device
    batch still trains to completion on the virtual mesh (VERDICT r1 #6):
    3 full batches of 4 + one ragged batch of 2."""
    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(7), batch)
    opt = build_optimizer({"name": "adamw", "lr": 1e-3})
    mesh = make_mesh(data=4, model=1)
    trainer = Trainer(loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
                      optimizer=opt, mesh=mesh)
    state = trainer.init_state(params)
    ragged = {
        k: (v[:2] if isinstance(v, np.ndarray) or hasattr(v, "shape") else v)
        for k, v in batch.items()
    }
    state, metrics = trainer.run_epoch(state, [batch, ragged], epoch=0)
    assert int(jax.device_get(state.step)) == 2
    assert np.isfinite(metrics["loss"])


@pytest.mark.slow
def test_bf16_mixed_precision_step(fp_setup):
    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(2), batch)
    opt = build_optimizer({"name": "adamw", "lr": 1e-3})
    trainer = Trainer(loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
                      optimizer=opt, precision="bf16")
    state = trainer.init_state(params)
    state, metrics = trainer.run_epoch(state, [batch], epoch=0)
    assert np.isfinite(metrics["loss"])
    # master weights stay fp32
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))


@pytest.mark.slow
def test_grad_accumulation(fp_setup):
    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(3), batch)
    opt = build_optimizer({"name": "adamw", "lr": 1e-3})
    trainer = Trainer(loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
                      optimizer=opt, accumulate_grad_batches=2)
    state = trainer.init_state(params)
    p0 = jax.device_get(state.params)
    state, _ = trainer.run_epoch(state, [batch], epoch=0)
    # after one micro-batch, params unchanged (accumulating)
    p1 = jax.device_get(state.params)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    )
    assert same
    state, _ = trainer.run_epoch(state, [batch], epoch=0)
    p2 = jax.device_get(state.params)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p2))
    )
    assert changed


@pytest.mark.slow
def test_tensor_parallel_fastpitch_step(fp_setup):
    """Real TP: FFT-block params sharded over the mesh 'model' axis via
    GSPMD; one train step on a (data=2, model=2) mesh."""
    from roar_tpu.parallel import FFT_TP_RULES, tp_param_shardings

    model, ds, batch = fp_setup
    params = model.init_params(jax.random.PRNGKey(4), batch)
    mesh = make_mesh(data=2, model=2)
    opt = build_optimizer({"name": "adamw", "lr": 1e-3})
    trainer = Trainer(
        loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
        optimizer=opt, mesh=mesh, tp_rules=FFT_TP_RULES,
    )
    state = trainer.init_state(params)
    # qkv kernels actually sharded over 'model'
    shardings = tp_param_shardings(params, mesh)
    qkv = state.params["params"]["encoder_module"]["stack"]["layers_0"]["dec_attn"]["qkv_net"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2
    state, metrics = trainer.run_epoch(state, [batch], epoch=0)
    assert np.isfinite(metrics["loss"])


def test_noam_matches_nemo_formula():
    """Golden values vs the reference NoamAnnealing math
    (lr_schedulers.py:504): lr = init * d_model^-0.5 *
    min(step^-0.5, step * warmup^-1.5), floored at min_lr."""
    init, d_model, warmup, min_lr = 1e-3, 384, 1000, 1e-5
    s = get_schedule(
        "NoamAnnealing", initial_lr=init, d_model=d_model,
        warmup_steps=warmup, min_lr=min_lr,
    )
    for step in [1, 10, 500, 1000, 5000, 100000]:
        expected = max(
            init * d_model ** -0.5 * min(step ** -0.5, step * warmup ** -1.5),
            min_lr,
        )
        got = float(s(jnp.asarray(step - 1)))  # our schedules are 0-indexed
        assert got == pytest.approx(expected, rel=1e-5), (step, got, expected)


def test_cosine_matches_nemo_formula():
    """CosineAnnealing after warmup: min + (init-min) * (1+cos(pi*p))/2."""
    import math

    init, min_lr, warmup, max_steps = 2e-4, 1e-5, 100, 1000
    s = get_schedule(
        "CosineAnnealing", initial_lr=init, max_steps=max_steps,
        warmup_steps=warmup, min_lr=min_lr,
    )
    for step in [100, 250, 500, 900, 1000]:
        p = (step - warmup) / (max_steps - warmup)
        expected = min_lr + (init - min_lr) * (1 + math.cos(math.pi * p)) / 2
        got = float(s(jnp.asarray(step)))
        assert got == pytest.approx(expected, rel=1e-4), (step, got, expected)


def test_evaluate_autojits_and_caches():
    """Trainer.evaluate enforces compiled validation: a plain python eval_fn
    is jitted once and cached per function object; per-epoch scalars flow
    through extra_args as traced values (no fresh-closure retraces)."""
    import optax

    from roar_tpu.training.trainer import Trainer, TrainState, create_train_state

    calls = {"traces": 0}

    def eval_fn(params, batch, epoch):
        calls["traces"] += 1  # counted at TRACE time only once if jitted
        return {"metric": jnp.mean(batch["x"]) * params["w"] + epoch * 0.0}

    opt = optax.sgd(1e-2)
    params = {"w": jnp.asarray(2.0)}
    trainer = Trainer(loss_fn=lambda p, b, r, e: (p["w"] * 0.0, {}), optimizer=opt)
    state = create_train_state(params, opt)

    batches = [{"x": np.full((4,), float(i), np.float32)} for i in range(3)]
    out = trainer.evaluate(
        eval_fn, state, batches, extra_args=(jnp.asarray(0, jnp.int32),)
    )
    assert out["metric"] == pytest.approx(np.mean([0.0, 2.0, 4.0]))
    assert calls["traces"] == 1  # jitted: one trace for three batches
    # second epoch with the SAME fn object: cache hit, still one trace
    trainer.evaluate(eval_fn, state, batches, extra_args=(jnp.asarray(1, jnp.int32),))
    assert calls["traces"] == 1
    assert len(trainer._jitted_evals) == 1


@pytest.mark.slow
def test_interpolate_speaker():
    """FastPitchModel.interpolate_speaker blends two speaker rows into a
    third slot, functionally (ref models/fastpitch.py:904-955)."""
    from roar_tpu.models.fastpitch_model import FastPitchModel

    cfg = {
        "n_mel_channels": 16, "symbols_embedding_dim": 32, "n_symbols": 40,
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                      "d_inner": 64},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                       "d_inner": 64},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16},
        "duration_predictor": {"input_size": 32, "filter_size": 16},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "speaker_encoder": {"lookup_module": {"n_speakers": 4}},
        "preprocessor": {"sample_rate": 22050, "features": 16,
                         "n_window_size": 512, "n_window_stride": 128,
                         "n_fft": 512},
    }
    model = FastPitchModel(cfg)
    # module-level init (cheap: skips the wrapper's mel front-end program);
    # interpolate_speaker only reads/writes params['params']['speaker_table']
    from roar_tpu.ops.priors import beta_binomial_prior

    prior = jnp.broadcast_to(beta_binomial_prior(16, 64), (2, 64, 16))
    params = model.module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((2, 16), jnp.int32),
        pitch=jnp.zeros((2, 64), jnp.float32),
        speaker=jnp.zeros((2,), jnp.int32),
        spec=jnp.zeros((2, 64, 16), jnp.float32),
        attn_prior=prior,
        mel_lens=jnp.full((2,), 64, jnp.int32),
        input_lens=jnp.full((2,), 16, jnp.int32),
    )
    emb_before = np.asarray(params["params"]["speaker_table"]["embedding"]).copy()

    new_params = model.interpolate_speaker(params, 0, 1, 0.25, 0.75, 3)
    emb_after = np.asarray(new_params["params"]["speaker_table"]["embedding"])
    np.testing.assert_allclose(
        emb_after[3], 0.25 * emb_before[0] + 0.75 * emb_before[1], rtol=1e-6
    )
    # other rows untouched; original params untouched (functional)
    np.testing.assert_array_equal(emb_after[:3], emb_before[:3])
    np.testing.assert_array_equal(
        np.asarray(params["params"]["speaker_table"]["embedding"]), emb_before
    )
    # single-speaker model refuses (reference raises too)
    with pytest.raises(ValueError, match="multi-speaker"):
        model.interpolate_speaker({"params": {}}, 0, 0, 0.5, 0.5, 0)
    with pytest.raises(ValueError, match="out of range"):
        model.interpolate_speaker(params, 0, 1, 0.5, 0.5, 7)


def test_dynamic_freezing_schedules():
    """freeze_updates (ref modelPT.py:1779-1841): scalar N freezes a module
    for the first N updates; [start, end] freezes a window; -1 is forever.
    Masking runs on the traced step inside one jitted program — transitions
    cause no recompile — and frozen params provably do not move."""
    import optax

    from roar_tpu.training.trainer import Trainer, create_train_state

    def loss_fn(p, b, r, e):
        loss = ((p["enc"]["w"] - 3.0) ** 2 + (p["dec"]["w"] - 3.0) ** 2
                + (p["pitch"]["w"] - 3.0) ** 2)
        return loss, {"loss": loss}

    opt = optax.sgd(0.1)
    trainer = Trainer(
        loss_fn=loss_fn, optimizer=opt,
        freeze_updates={"enabled": True,
                        "modules": {"enc": 2, "pitch": [2, 3], "dec": -1}},
    )
    params = {"enc": {"w": jnp.asarray(0.0)}, "dec": {"w": jnp.asarray(0.0)},
              "pitch": {"w": jnp.asarray(0.0)}}
    state = trainer.init_state(params)

    vals = []
    batch = {"x": np.zeros((1,), np.float32)}
    for _ in range(4):
        state, _ = trainer.run_epoch(state, [batch])
        vals.append({k: float(state.params[k]["w"]) for k in ("enc", "dec", "pitch")})

    # enc frozen for updates 1-2, moves from update 3
    assert vals[0]["enc"] == 0.0 and vals[1]["enc"] == 0.0
    assert vals[2]["enc"] != 0.0
    # dec: -1 -> frozen forever
    assert all(v["dec"] == 0.0 for v in vals)
    # pitch: moves at update 1, frozen updates 2-3, moves again at 4
    assert vals[0]["pitch"] != 0.0
    assert vals[1]["pitch"] == vals[0]["pitch"] == vals[2]["pitch"]
    assert vals[3]["pitch"] != vals[2]["pitch"]

    # unknown module name errors like the reference's getattr
    bad = Trainer(loss_fn=loss_fn, optimizer=opt,
                  freeze_updates={"enabled": True,
                                  "modules": {"nonexistent": 1}})
    bstate = bad.init_state(params)
    with pytest.raises(ValueError, match="matches no parameter path"):
        bad.run_epoch(bstate, [batch])


def test_dynamic_freezing_counts_optimizer_updates_and_specificity():
    """With gradient accumulation the freeze window counts OPTIMIZER updates
    (reference global_step), not micro-batches; module names match whole
    path components (no substring bleed) with longest-name-wins."""
    import optax

    from roar_tpu.training.trainer import Trainer, make_train_step, create_train_state

    def loss_fn(p, b, r, e):
        loss = (p["enc"]["w"] - 3.0) ** 2 + (p["enc_extra"]["w"] - 3.0) ** 2
        return loss, {"loss": loss}

    # accumulate 2 micro-batches per update; freeze enc for 1 UPDATE
    trainer = Trainer(
        loss_fn=loss_fn, optimizer=optax.sgd(0.1), accumulate_grad_batches=2,
        freeze_updates={"enabled": True, "modules": {"enc": 1}},
    )
    params = {"enc": {"w": jnp.asarray(0.0)}, "enc_extra": {"w": jnp.asarray(0.0)}}
    state = trainer.init_state(params)
    batch = {"x": np.zeros((1,), np.float32)}
    vals = []
    for _ in range(4):  # 4 micro-batches = 2 optimizer updates
        state, _ = trainer.run_epoch(state, [batch])
        vals.append({k: float(state.params[k]["w"]) for k in params})
    # 'enc' must NOT freeze 'enc_extra' (component matching, no substring)
    assert vals[1]["enc_extra"] != 0.0
    # update 1 (micro-batches 1-2): enc frozen; update 2 (3-4): enc moves
    assert vals[1]["enc"] == 0.0
    assert vals[3]["enc"] != 0.0

    # longest-name-wins: enc frozen forever, enc/w... nested specificity
    def loss2(p, b, r, e):
        loss = (p["m"]["a"]["w"] - 1.0) ** 2 + (p["m"]["b"]["w"] - 1.0) ** 2
        return loss, {"loss": loss}

    step = make_train_step(
        loss2, optax.sgd(0.1),
        freeze_updates={"enabled": True,
                        "modules": {"m": -1, "m/a": 0}},  # m/a never frozen (0 updates)
    )
    p2 = {"m": {"a": {"w": jnp.asarray(0.0)}, "b": {"w": jnp.asarray(0.0)}}}
    st = create_train_state(p2, optax.sgd(0.1))
    st, _ = step(st, batch, jax.random.PRNGKey(0), 0)
    assert float(st.params["m"]["a"]["w"]) != 0.0  # specific spec wins
    assert float(st.params["m"]["b"]["w"]) == 0.0  # outer -1 freeze holds


def test_frozen_params_keep_optimizer_moments():
    """During a freeze window Adam's mu/nu for the frozen module must not
    decay toward zero (the reference's requires_grad=False path never feeds
    the param to the optimizer, keeping moments intact for post-unfreeze
    dynamics)."""
    import optax

    from roar_tpu.training.trainer import make_train_step, create_train_state

    def loss_fn(p, b, r, e):
        loss = (p["enc"]["w"] - 3.0) ** 2 + (p["dec"]["w"] - 3.0) ** 2
        return loss, {"loss": loss}

    opt = optax.adam(0.1)
    # warm up 2 unfrozen steps to build nonzero moments, then freeze enc
    # for updates 3..4 ([start, end] window), then unfreeze
    step = make_train_step(
        loss_fn, opt, freeze_updates={"enabled": True, "modules": {"enc": [3, 4]}}
    )
    params = {"enc": {"w": jnp.asarray(0.0)}, "dec": {"w": jnp.asarray(0.0)}}
    st = create_train_state(params, opt)
    batch = {"x": np.zeros((1,), np.float32)}
    rng = jax.random.PRNGKey(0)
    for _ in range(2):  # updates 1-2: both params train
        st, _ = step(st, batch, rng, 0)

    def adam_moments(opt_state, module):
        adam_states = [
            s for s in jax.tree_util.tree_leaves(
                opt_state, is_leaf=lambda x: hasattr(x, "mu")
            ) if hasattr(s, "mu")
        ]
        s = adam_states[0]
        return float(s.mu[module]["w"]), float(s.nu[module]["w"])

    mu_before, nu_before = adam_moments(st.opt_state, "enc")
    assert mu_before != 0.0 and nu_before != 0.0
    w_before = float(st.params["enc"]["w"])
    for _ in range(2):  # updates 3-4: enc frozen
        st, _ = step(st, batch, rng, 0)
    mu_frozen, nu_frozen = adam_moments(st.opt_state, "enc")
    assert float(st.params["enc"]["w"]) == w_before  # param provably still
    assert mu_frozen == mu_before and nu_frozen == nu_before  # moments intact
    # dec trained throughout: its moments moved
    mu_dec, _ = adam_moments(st.opt_state, "dec")
    st2, _ = step(st, batch, rng, 0)  # update 5: enc unfreezes
    assert float(st2.params["enc"]["w"]) != w_before


@pytest.mark.slow
def test_tensor_parallel_numerical_equivalence_realistic_width():
    """Same seed, same batch: a d=384 6-layer FastPitch train step produces
    the same loss and post-step parameters on mesh(data=8, model=1) and
    mesh(data=4, model=2).  TP here is GSPMD sharding rules (parallel/tp.py
    FFT_TP_RULES) — a transposed rule would not crash, it would silently
    change the math; this pins the numerics at realistic width
    (round-2 verdict item 6).  SGD keeps the comparison on the raw gradient."""
    from roar_tpu.parallel import FFT_TP_RULES

    cfg = small_model_cfg()
    d = 384
    fft = {"n_layer": 3, "n_head": 2, "d_model": d, "d_head": 192,
           "d_inner": 1536}
    cfg["symbols_embedding_dim"] = d
    cfg["input_fft"] = dict(fft)
    cfg["output_fft"] = dict(fft)
    cfg["alignment_module"] = {"n_text_channels": d, "n_att_channels": 32}
    cfg["duration_predictor"] = {"input_size": d, "filter_size": 64}
    cfg["pitch_predictor"] = {"input_size": d, "filter_size": 64}
    model = FastPitchModel(cfg)

    B, T, M, hop = 8, 32, 96, 256
    rng = np.random.default_rng(0)
    batch = {
        "text": np.asarray(rng.integers(1, 40, (B, T)), np.int32),
        "text_len": np.full((B,), T, np.int32),
        "audio": np.asarray(rng.standard_normal((B, M * hop)) * 0.1, np.float32),
        "audio_len": np.full((B,), M * hop, np.int32),
        "pitch": np.asarray(rng.standard_normal((B, M)), np.float32),
        "align_prior_matrix": np.ones((B, M, T), np.float32) / T,
    }
    params0 = jax.device_get(model.init_params(jax.random.PRNGKey(0), batch))

    results = []
    for dp, tp in [(8, 1), (4, 2)]:
        mesh = make_mesh(data=dp, model=tp)
        opt = build_optimizer({"name": "sgd", "lr": 1e-2})
        trainer = Trainer(
            loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e),
            optimizer=opt, mesh=mesh, tp_rules=FFT_TP_RULES,
        )
        state = trainer.init_state(jax.tree_util.tree_map(np.copy, params0))
        state, metrics = trainer.run_epoch(state, [batch], epoch=0)
        results.append((float(metrics["loss"]), jax.device_get(state.params)))

    (loss_dp, p_dp), (loss_tp, p_tp) = results
    assert loss_dp == pytest.approx(loss_tp, rel=1e-5), (loss_dp, loss_tp)
    flat_dp = jax.tree_util.tree_leaves_with_path(p_dp)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    assert len(flat_dp) == len(flat_tp)
    for (kp, a), b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_hybrid_mesh_slice_major_ordering_and_step():
    """Multi-slice (DCN) mesh: make_hybrid_mesh keeps the ('data','model')
    axis names, orders the data axis slice-major (per-slice device blocks
    contiguous, so XLA's gradient all-reduce lowers hierarchically:
    ICI reduce-scatter -> small DCN all-reduce -> ICI all-gather), and a
    P('data')-sharded computation over it matches the plain mesh exactly."""
    from roar_tpu.parallel import make_hybrid_mesh, shard_batch

    mesh = make_hybrid_mesh(num_slices=2, model=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    # emulated slices are contiguous device blocks: slice 0 = devices 0..3
    # must fill the first data rows (slice-major), never interleave
    grid = np.asarray(mesh.devices)
    row_slices = [min(d.id // 4 for d in row) for row in grid]
    assert row_slices == sorted(row_slices), row_slices
    for row in grid:  # the model axis never crosses a slice boundary
        assert len({d.id // 4 for d in row}) == 1

    # same math as the flat mesh: data-sharded mean-of-squares + psum-free
    # jit (XLA inserts the collective), identical result on both meshes
    x = np.arange(32, dtype=np.float32).reshape(8, 4)

    def run(m):
        xs = shard_batch({"x": x}, m)["x"]
        return float(jax.jit(lambda a: jnp.mean(a * a))(xs))

    assert run(mesh) == run(make_mesh(data=4, model=2))

    # single slice degrades to make_mesh; model axis may not span slices
    flat = make_hybrid_mesh(num_slices=1, model=2)
    assert np.asarray(flat.devices).shape == (4, 2)
    with pytest.raises(ValueError):
        make_hybrid_mesh(num_slices=2, model=8)
