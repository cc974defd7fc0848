"""Runner glue + AlignerModel tests."""

import numpy as np
import pytest

import jax

from roar_tpu.data import BucketSpec, TTSDataset, write_manifest, write_wav
from roar_tpu.models.aligner_model import AlignerModel
from roar_tpu.training.run import train_supervised


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner_corpus")
    sr = 22050
    entries = []
    rng = np.random.default_rng(0)
    for i in range(4):
        dur = 0.4 + 0.1 * i
        t = np.arange(int(sr * dur)) / sr
        x = (0.4 * np.sin(2 * np.pi * (130 + 25 * i) * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        p = root / f"wavs/u{i}.wav"
        p.parent.mkdir(exist_ok=True)
        write_wav(str(p), x, sr)
        entries.append({"audio_filepath": str(p), "text": f"test utt {i}", "duration": dur})
    man = root / "manifest.json"
    write_manifest(man, entries)
    return root, man, sr


def aligner_cfg(root, man):
    return {
        "name": "AlignerTest",
        "model": {
            "symbols_embedding_dim": 32,
            "bin_loss_start_ratio": 0.5,
            "bin_loss_warmup_epochs": 1,
            "max_epochs": 2,
            "text_tokenizer": {
                "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
                "pad_with_space": True,
            },
            "preprocessor": {
                "sample_rate": 22050,
                "features": 24,
                "n_window_size": 1024,
                "n_window_stride": 256,
                "n_fft": 1024,
                "highfreq": 8000,
                "preemph": None,
                "normalize": None,
                "mag_power": 1.0,
                "log_zero_guard_type": "add",
                "log_zero_guard_value": 1e-05,
                "dither": 0.0,
                "pad_to": 1,
            },
            "alignment_encoder": {"n_att_channels": 24},
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {
                "dataset": {},
                "dataloader_params": {"batch_size": 4, "shuffle": True},
            },
        },
        "trainer": {"max_epochs": 2, "gradient_clip_val": 100.0, "log_every_n_steps": 1},
        "exp_manager": {
            "exp_dir": str(root / "exp"),
            "name": "aligner",
            "create_tensorboard_logger": False,
        },
    }


def test_train_supervised_aligner_end_to_end(corpus):
    root, man, sr = corpus
    cfg = aligner_cfg(root, man)
    model = AlignerModel(cfg["model"])
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=model.tokenizer,
        sup_data_path=str(root / "sup"),
        sup_data_types=["align_prior_matrix"],
        n_fft=1024,
        win_length=1024,
        hop_length=256,
        n_mels=24,
        highfreq=8000,
    )
    state = train_supervised(
        cfg, model, ds, None, buckets=BucketSpec(8, 16, 8192)
    )
    assert int(np.asarray(jax.device_get(state.step))) == 2  # 1 batch x 2 epochs
    # metrics written
    metrics_file = root / "exp" / "aligner" / "metrics.jsonl"
    assert metrics_file.exists()
    # checkpoint exists
    assert any((root / "exp" / "aligner" / "checkpoints").iterdir())

    # align() produces valid durations
    batch = ds.collate([ds[i] for i in range(4)], BucketSpec(8, 16, 8192))
    durs, attn = model.align(jax.device_get(state.params), batch)
    durs = np.asarray(durs)
    assert durs.shape == (4, batch["text"].shape[1])
    assert (durs.sum(-1) > 0).all()


@pytest.mark.slow
def test_train_supervised_early_stopping(corpus):
    """create_early_stopping_callback stops training before max_epochs when
    the monitored val metric plateaus (ref exp_manager.py:434-436): with an
    unreachable min_delta, round 1 sets best, round 2 is 'no improvement'
    and patience=0 stops — 2 of 6 epochs run."""
    root, man, sr = corpus
    cfg = aligner_cfg(root, man)
    cfg["trainer"]["max_epochs"] = 6
    cfg["trainer"]["check_val_every_n_epoch"] = 1
    cfg["exp_manager"]["name"] = "aligner_es"
    cfg["exp_manager"]["create_early_stopping_callback"] = True
    cfg["exp_manager"]["early_stopping_callback_params"] = {
        "monitor": "val_loss",
        "mode": "min",
        "min_delta": 1e9,
        "patience": 0,
        "strict": True,  # Lightning-only key: must be tolerated, not passed
    }
    model = AlignerModel(cfg["model"])
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=model.tokenizer,
        sup_data_path=str(root / "sup"),
        sup_data_types=["align_prior_matrix"],
        n_fft=1024,
        win_length=1024,
        hop_length=256,
        n_mels=24,
        highfreq=8000,
    )
    state = train_supervised(cfg, model, ds, ds, buckets=BucketSpec(8, 16, 8192))
    assert int(np.asarray(jax.device_get(state.step))) == 2  # stopped early


@pytest.mark.slow
def test_train_gan_hifigan_end_to_end(corpus):
    """train_gan glue: VocoderDataset -> HifiGanModel for one epoch."""
    from roar_tpu.data import VocoderDataset
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.training.run import train_gan

    root, man, sr = corpus
    cfg = {
        "name": "HifiGanTest",
        "model": {
            "preprocessor": {
                "sample_rate": sr, "nfilt": 24, "n_window_size": 512,
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
            "debug": True,
            "train_ds": {"dataloader_params": {"batch_size": 4, "shuffle": True}},
            "optim": {"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]},
        },
        "trainer": {"max_epochs": 1, "log_every_n_steps": 1, "max_steps": 100},
        "exp_manager": {
            "exp_dir": str(root / "exp_gan"), "name": "hifigan",
            "create_tensorboard_logger": False,
        },
    }
    model = HifiGanModel(cfg["model"])
    ds = VocoderDataset(manifest_filepath=str(man), sample_rate=sr, n_segments=2048)
    state = train_gan(cfg, model, ds, None)
    assert int(np.asarray(jax.device_get(state.step))) >= 1
    assert (root / "exp_gan" / "hifigan" / "metrics.jsonl").exists()


def test_multi_validation_helpers(tmp_path):
    """Multi-dataloader resolution (ref model_utils.py:150-296): list-valued
    manifest_filepath -> one named dataset per path; val_dl_idx selects the
    unprefixed val_* metrics set."""
    from roar_tpu.training.run import (
        _val_sets,
        build_validation_datasets,
        parse_dataset_as_name,
    )

    assert parse_dataset_as_name("some-name") == "some_name_"
    p = tmp_path / "dev-clean-manifest.json"
    p.write_text("")
    assert parse_dataset_as_name(str(p)) == "dev_clean_"
    with pytest.raises(ValueError, match="descriptive"):
        parse_dataset_as_name("manifest")

    built = []
    def builder(c):
        built.append(c["manifest_filepath"])
        return ("ds", c["manifest_filepath"])

    # single path -> single dataset straight through
    one = build_validation_datasets({"manifest_filepath": "a_set.json", "x": 1}, builder)
    assert one == ("ds", "a_set.json")
    # list -> dict of named datasets, one per path (names from real paths)
    p1, p2 = tmp_path / "val-one.json", tmp_path / "val-two.json"
    p1.write_text(""); p2.write_text("")
    many = build_validation_datasets(
        {"manifest_filepath": [str(p1), str(p2)]}, builder
    )
    assert list(many) == ["val_one_", "val_two_"]
    assert built == ["a_set.json", str(p1), str(p2)]
    # comma-joined string behaves like a list (reference accepts both)
    many2 = build_validation_datasets(
        {"manifest_filepath": f"{p1},{p2}"}, builder
    )
    assert list(many2) == ["val_one_", "val_two_"]
    with pytest.raises(ValueError, match="duplicate"):
        build_validation_datasets(
            {"manifest_filepath": ["dup.json", "dup.json"]}, builder
        )

    # _val_sets normalization + out-of-range val_dl_idx rejection
    sets, idx = _val_sets({"a_": 1, "b_": 2}, {"validation_ds": {"val_dl_idx": 1}})
    assert sets == [("a_", 1), ("b_", 2)] and idx == 1
    sets, idx = _val_sets([10, 20], {})
    assert sets == [("0_", 10), ("1_", 20)] and idx == 0
    with pytest.raises(ValueError, match="val_dl_idx=3 is out of range"):
        _val_sets(5, {"validation_ds": {"val_dl_idx": 3}})
    assert _val_sets(None, {}) == ([], 0)


def test_run_test_evaluates_test_sets(corpus, tmp_path):
    """run_test — the reference trainer.test() analogue: evaluates named
    test sets, logs '<name>test_*' + test_dl_idx-selected 'test_*' metrics,
    appends to test_metrics.jsonl."""
    import json

    from roar_tpu.training.run import run_test

    root, man, sr = corpus
    cfg = aligner_cfg(root, man)
    cfg["model"]["test_ds"] = {
        "dataloader_params": {"batch_size": 4},
        "test_dl_idx": 1,
    }
    model = AlignerModel(cfg["model"])
    ds = TTSDataset(
        manifest_filepath=str(man), sample_rate=sr,
        text_tokenizer=model.tokenizer, sup_data_path=str(root / "sup"),
        sup_data_types=["align_prior_matrix"],
        n_fft=1024, win_length=1024, hop_length=256, n_mels=24, highfreq=8000,
    )
    batch = ds.collate([ds[i] for i in range(4)], BucketSpec(8, 16, 8192))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    out = run_test(
        cfg, model, {"seen_": ds, "heldout_": ds}, params=params,
        buckets=BucketSpec(8, 16, 8192), log_dir=str(tmp_path),
    )
    assert "seen_test_loss" in out and "heldout_test_loss" in out
    assert out["test_loss"] == out["heldout_test_loss"]  # test_dl_idx=1
    assert np.isfinite(out["test_loss"])
    rec = json.loads((tmp_path / "test_metrics.jsonl").read_text().splitlines()[-1])
    assert rec["test_loss"] == out["test_loss"]


def test_always_save_roar_bundle(tmp_path):
    """exp_manager.always_save_roar writes an end-of-training .roar whose
    cfg+weights roundtrip (ref RoarModelCheckpoint save-on-train-end,
    roar_model_checkpoint.py:19-250); callables in cfg (a text_normalizer
    hook) are stripped rather than crashing yaml."""
    from types import SimpleNamespace

    import numpy as np

    from roar_tpu.training import ExpManager, restore_from
    from roar_tpu.training.run import _maybe_save_roar

    cfg = {
        "name": "BundleTest",
        "model": {"d_model": 8, "text_normalizer": lambda s: s},
        "exp_manager": {"always_save_roar": True},
    }
    exp = ExpManager(exp_dir=str(tmp_path), name="BundleTest",
                     use_tensorboard=False)
    state = SimpleNamespace(params={"params": {"w": np.ones((2, 3), np.float32)}})
    _maybe_save_roar(cfg, exp, state)
    path = exp.root / "checkpoints" / "BundleTest.roar"
    assert path.exists()
    loaded_cfg, params = restore_from(str(path))
    assert loaded_cfg["model"]["d_model"] == 8
    assert "text_normalizer" not in loaded_cfg["model"]
    np.testing.assert_array_equal(params["params"]["w"], np.ones((2, 3)))

    # GAN variant bundles g/d params (+stats) for serving AND finetuning
    gstate = SimpleNamespace(
        g_params={"params": {"g": np.zeros(2, np.float32)}},
        d_params={"params": {"d": np.ones(2, np.float32)}},
        d_stats={"msd": {"u": np.ones(1, np.float32)}},
    )
    _maybe_save_roar(cfg, exp, gstate, gan=True)
    _, gp = restore_from(str(path))
    assert set(gp) == {"g_params", "d_params", "d_stats"}
    exp.close()
