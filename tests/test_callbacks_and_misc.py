"""Artifact callbacks, HiFi-GAN denoising, warm-start transfer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.training.callbacks import (
    FastPitchArtifactGenerator,
    plot_alignment_to_file,
    plot_spectrogram_to_file,
)
from roar_tpu.training.save_restore import transfer_params


def test_plots_written(tmp_path):
    spec = np.random.default_rng(0).standard_normal((40, 100)).astype(np.float32)
    p = plot_spectrogram_to_file(spec, str(tmp_path / "s.png"))
    assert p and (tmp_path / "s.png").exists()
    attn = np.random.default_rng(1).random((100, 20)).astype(np.float32)
    p = plot_alignment_to_file(attn, str(tmp_path / "a.png"))
    assert p and (tmp_path / "a.png").exists()


def test_fastpitch_artifact_generator(tmp_path):
    from roar_tpu.ops.spectrogram import MelConfig

    gen = FastPitchArtifactGenerator(
        str(tmp_path), log_every_epochs=1, audio_preview=True,
        mel_cfg=MelConfig(sample_rate=22050, n_window_size=512,
                          n_window_stride=128, n_fft=512, nfilt=24,
                          highfreq=8000, preemph=None, normalize=None,
                          mag_power=1.0, dither=0.0, pad_to=1),
    )
    rng = np.random.default_rng(0)
    outputs = {
        "spect": rng.standard_normal((2, 60, 24)).astype(np.float32),
        "attn_soft": rng.random((2, 1, 60, 12)).astype(np.float32),
        "pitch_predicted": rng.standard_normal((2, 12)).astype(np.float32),
    }
    written = gen(0, outputs, {})
    names = {p.split("_", 1)[1] for p in map(lambda s: s.split("/")[-1], written)}
    assert "spec_pred.png" in names
    assert "alignment.png" in names
    assert "pitch.png" in names
    assert "preview.wav" in names
    # off-epoch writes nothing
    gen2 = FastPitchArtifactGenerator(str(tmp_path), log_every_epochs=5)
    assert gen2(3, outputs, {}) == []


@pytest.mark.slow
def test_hifigan_denoise():
    from roar_tpu.models.hifigan_model import HifiGanModel

    cfg = {
        "preprocessor": {
            "sample_rate": 22050, "nfilt": 24, "n_window_size": 512,
            "n_window_stride": 128, "n_fft": 512, "highfreq": 8000,
            "preemph": None, "normalize": None, "mag_power": 1.0,
            "log_zero_guard_type": "clamp", "log_zero_guard_value": 1e-05,
            "dither": 0.0, "pad_to": 0, "exact_pad": True,
        },
        "generator": {
            "resblock": 2, "upsample_rates": [8, 4, 4],
            "upsample_kernel_sizes": [16, 8, 8],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        },
    }
    model = HifiGanModel(cfg)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4096)).astype(np.float32) * 0.1
    )
    batch = {"audio": audio, "audio_len": jnp.asarray([4096])}
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    bias = model.compute_stft_bias(g_params)
    assert bias.shape[1] == 257
    out = model.denoise(g_params, audio, strength=0.01, stft_bias=bias)
    assert out.shape == audio.shape
    assert np.isfinite(np.asarray(out)).all()
    # strength 0 ~ identity (modulo STFT roundtrip) away from edges
    ident = np.asarray(model.denoise(g_params, audio, strength=0.0, stft_bias=bias))
    np.testing.assert_allclose(
        ident[0, 512:3584], np.asarray(audio)[0, 512:3584], atol=1e-3
    )


def test_transfer_params():
    src = {"params": {"a": np.ones((2, 2)), "b": np.ones(3), "c": np.ones(4)}}
    tgt = {"params": {"a": np.zeros((2, 2)), "b": np.zeros(5), "d": np.zeros(4)}}
    out, loaded, skipped = transfer_params(tgt, src)
    assert np.all(out["params"]["a"] == 1)  # shape match -> copied
    assert np.all(out["params"]["b"] == 0)  # shape mismatch -> kept
    assert np.all(out["params"]["d"] == 0)  # missing in source -> kept
    assert "params/a" in loaded

    out2, loaded2, _ = transfer_params(tgt, src, exclude=["a"])
    assert np.all(out2["params"]["a"] == 0)
    out3, loaded3, _ = transfer_params(tgt, src, include=["a"])
    assert "params/a" in loaded3 and len(loaded3) == 1


@pytest.mark.slow
def test_adapters_and_freezing():
    """Adapters start as identity; masked optimizer trains only adapters."""
    import optax

    from roar_tpu.models.transformer import FFTransformerEncoder
    from roar_tpu.training.finetune import count_trainable, masked_optimizer

    enc_plain = FFTransformerEncoder(
        n_layer=1, n_head=1, d_model=16, d_head=8, d_inner=32, kernel_size=3,
        dropout=0.0, dropatt=0.0, n_embed=20,
    )
    enc_adapt = FFTransformerEncoder(
        n_layer=1, n_head=1, d_model=16, d_head=8, d_inner=32, kernel_size=3,
        dropout=0.0, dropatt=0.0, n_embed=20, adapter_dim=4,
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, 20, (2, 6)), jnp.int32)
    p_plain = enc_plain.init(jax.random.PRNGKey(0), tokens)
    p_adapt = enc_adapt.init(jax.random.PRNGKey(0), tokens)
    # identity at init: outputs match the plain encoder with shared init
    o1, _ = enc_plain.apply(p_plain, tokens)
    o2, _ = enc_adapt.apply(p_adapt, tokens)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    n_train, n_total = count_trainable(p_adapt, [r"adapter"])
    assert 0 < n_train < n_total

    opt = masked_optimizer(optax.adam(1e-2), p_adapt, [r"adapter"])
    state = opt.init(p_adapt)

    def loss(p):
        out, _ = enc_adapt.apply(p, tokens)
        return jnp.mean(jnp.square(out))

    g = jax.grad(loss)(p_adapt)
    updates, _ = opt.update(g, state, p_adapt)
    new_p = optax.apply_updates(p_adapt, updates)
    # only adapter params moved
    from jax.tree_util import tree_flatten_with_path

    for kp, (a, b) in zip(
        tree_flatten_with_path(p_adapt)[0],
        zip(jax.tree_util.tree_leaves(p_adapt), jax.tree_util.tree_leaves(new_p)),
    ):
        path = "/".join(str(getattr(k, "key", k)) for k in kp[0])
        moved = not np.allclose(np.asarray(a), np.asarray(b))
        if "adapter" in path and "up" not in path:
            # down proj + LN receive gradients through the zero-init up proj?
            pass  # gradient may be zero at init for some; don't assert
        if "adapter" not in path:
            assert not moved, path


@pytest.mark.slow
def test_log_tts_artifacts_runner_hook(tmp_path):
    """run._log_tts_artifacts synthesizes a val utterance and writes plots
    (reference configure_callbacks artifact generators analogue)."""
    import types

    import jax
    import jax.numpy as jnp

    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.callbacks import FastPitchArtifactGenerator
    from roar_tpu.training.run import _log_tts_artifacts

    cfg = {
        "n_mel_channels": 16, "symbols_embedding_dim": 32,
        "text_tokenizer": {
            "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
        },
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16},
        "duration_predictor": {"input_size": 32, "filter_size": 16},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "preprocessor": {"sample_rate": 22050, "features": 16, "n_window_size": 512,
                         "n_window_stride": 128, "n_fft": 512},
    }
    model = FastPitchModel(cfg)
    tokens = jnp.zeros((1, 16), jnp.int32)
    params = model.module.init(
        {"params": jax.random.PRNGKey(0)}, tokens, max_mel_len=64,
        method=model.module.infer,
    )
    state = types.SimpleNamespace(params=params)
    val_ds = [{"text": np.asarray(model.tokenizer("hello"), np.int32)}]
    gen = FastPitchArtifactGenerator(str(tmp_path), log_every_epochs=1,
                                     audio_preview=False, mel_cfg=model.mel_cfg)
    _log_tts_artifacts(gen, model, state, val_ds, epoch=1)
    pngs = list(tmp_path.glob("*.png"))
    assert pngs, "no artifact images written"


class TestTorchStyleSchedules:
    def test_exponential_lr(self):
        from roar_tpu.training.optim import get_schedule

        sched = get_schedule("ExponentialLR", initial_lr=1.0, gamma=0.9)
        import numpy as np

        assert float(sched(0)) == 1.0
        np.testing.assert_allclose(float(sched(10)), 0.9**10, rtol=1e-5)

    def test_step_lr(self):
        from roar_tpu.training.optim import get_schedule

        sched = get_schedule("StepLR", initial_lr=1.0, step_size=5, gamma=0.1)
        assert float(sched(4)) == 1.0
        import numpy as np

        np.testing.assert_allclose(float(sched(5)), 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-5)


class TestLoggerFanout:
    def test_gated_backends_degrade_and_jsonl_works(self, tmp_path):
        import json

        from roar_tpu.training.exp_manager import MetricsLogger

        lg = MetricsLogger(
            tmp_path, use_tensorboard=False, use_wandb=True, use_mlflow=True,
            use_dllogger=True,
        )
        lg.log_metrics({"loss": 0.5}, step=7)
        lg.close()
        rec = json.loads(open(tmp_path / "metrics.jsonl").readline())
        assert rec["step"] == 7 and rec["loss"] == 0.5
        # none of the optional packages exist in this image
        assert lg._wandb is None and lg._mlflow is None and lg._dllogger is None


def _capture_roar_log():
    """The roar_tpu logger does not propagate (rank-decorated handler), so
    attach a buffering handler directly."""
    import io
    import logging as pylog

    buf = io.StringIO()
    handler = pylog.StreamHandler(buf)
    pylog.getLogger("roar_tpu").addHandler(handler)
    return buf, handler


class TestDecorators:
    def test_deprecated_warns_once(self):
        import logging as pylog

        from roar_tpu.utils.decorators import deprecated

        @deprecated(version="9.9")
        def fn():
            return 42

        buf, handler = _capture_roar_log()
        try:
            assert fn() == 42
            assert fn() == 42
        finally:
            pylog.getLogger("roar_tpu").removeHandler(handler)
        assert buf.getvalue().count("deprecated") == 1

    def test_experimental_class(self):
        import logging as pylog

        from roar_tpu.utils.decorators import experimental

        @experimental
        class Thing:
            def __init__(self):
                self.x = 1

        buf, handler = _capture_roar_log()
        try:
            t = Thing()
        finally:
            pylog.getLogger("roar_tpu").removeHandler(handler)
        assert t.x == 1
        assert "experimental" in buf.getvalue()


class TestEarlyStopping:
    """EarlyStopping unit semantics (ref exp_manager.py:125-139,434-436)."""

    def _es(self, **kw):
        from roar_tpu.training.exp_manager import EarlyStopping

        return EarlyStopping(**kw)

    def test_min_mode_patience(self):
        es = self._es(monitor="val_loss", mode="min", min_delta=0.0, patience=2)
        assert not es.update({"val_loss": 1.0})
        assert not es.update({"val_loss": 0.9})   # improved
        assert not es.update({"val_loss": 0.95})  # wait=1
        assert es.update({"val_loss": 0.95})      # wait=2 == patience -> stop
        assert es.stopped

    def test_min_delta_counts_as_no_improvement(self):
        es = self._es(monitor="val_loss", min_delta=0.5, patience=1)
        es.update({"val_loss": 1.0})
        assert es.update({"val_loss": 0.8})  # improvement < min_delta
        assert es.stopped

    def test_max_mode(self):
        es = self._es(monitor="val_acc", mode="max", min_delta=0.0, patience=1)
        assert not es.update({"val_acc": 0.5})
        assert not es.update({"val_acc": 0.6})
        assert es.update({"val_acc": 0.55})

    def test_non_finite_stops(self):
        es = self._es(monitor="val_loss", check_finite=True)
        assert es.update({"val_loss": float("nan")})

    def test_missing_monitor_is_noop(self):
        es = self._es(monitor="val_loss", patience=0)
        assert not es.update({"other": 1.0})
        assert not es.stopped

    def test_bad_mode_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._es(mode="sideways")


def test_exp_manager_provenance_snapshot(tmp_path):
    """ExpManager captures run provenance into the experiment dir (ref
    exp_manager.py:727-757 git hash/diff + :381-390 per-rank logs): cmd-args,
    git-info (hash + working diff), config.yaml, and a per-process log file
    that receives logger records."""
    from roar_tpu.training.exp_manager import ExpManager
    from roar_tpu.utils.logging import get_logger

    exp = ExpManager(
        exp_dir=str(tmp_path), name="prov", use_tensorboard=False,
        config={"model": {"lr": 0.1}, "name": "prov"},
    )
    root = tmp_path / "prov"
    assert (root / "cmd-args.log").read_text().strip()
    git_info = (root / "git-info.log").read_text()  # tests run inside the repo
    assert git_info.startswith("commit: ")
    import yaml

    assert yaml.safe_load((root / "config.yaml").read_text())["model"]["lr"] == 0.1
    get_logger().warning("provenance-test-record")
    exp.close()
    log_files = list(root.glob("log_process-*.txt"))
    assert log_files and "provenance-test-record" in log_files[0].read_text()


def test_plot_multipitch_written(tmp_path):
    from roar_tpu.training.callbacks import plot_multipitch_to_file

    gt = np.abs(np.sin(np.linspace(0, 6, 80))) * 200
    pred = gt + np.random.default_rng(0).normal(0, 5, 80)
    out = plot_multipitch_to_file(gt, pred, str(tmp_path / "mp.png"))
    assert out is None or (tmp_path / "mp.png").stat().st_size > 0
