"""Config system + entry-point tests."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from roar_tpu.config import instantiate, load_config, resolve_interpolations
from roar_tpu.config.config import apply_overrides

REPO = Path(__file__).resolve().parents[1]
CONFIGS = REPO / "configs"


def test_interpolation_and_overrides():
    cfg = {
        "a": {"b": 5},
        "c": "${a.b}",
        "d": "x_${a.b}_y",
        "nested": {"e": "${c}"},
    }
    out = resolve_interpolations(cfg)
    assert out["c"] == 5
    assert out["d"] == "x_5_y"
    assert out["nested"]["e"] == 5

    cfg2 = apply_overrides({"a": {"b": 1}}, ["a.b=7", "a.new=[1,2]"])
    assert cfg2["a"]["b"] == 7
    assert cfg2["a"]["new"] == [1, 2]


def test_mandatory_missing_markers(tmp_path):
    """Hydra `???` semantics (ref jets.yaml `n_speakers: ???`): an
    un-overridden mandatory key is absent from the loaded dict (so
    `cfg.get(key, default)` falls back), an override fills it in, and an
    interpolation referencing one fails with a named error."""
    from roar_tpu.config import MISSING, ConfigError, to_yaml

    p = tmp_path / "c.yaml"
    p.write_text(
        "model:\n  n_speakers: ???\n  dim: 4\n  listy: [1, '???', 3]\n"
    )
    cfg = load_config(p)
    assert "n_speakers" not in cfg["model"]
    assert cfg["model"].get("n_speakers", 1) == 1
    # list markers keep their index as a falsy sentinel
    assert not cfg["model"]["listy"][1] and cfg["model"]["listy"][2] == 3
    assert "'???'" in to_yaml(cfg) or "???" in to_yaml(cfg)
    assert bool(MISSING) is False

    cfg2 = load_config(p, overrides=["model.n_speakers=10"])
    assert cfg2["model"]["n_speakers"] == 10

    p2 = tmp_path / "c2.yaml"
    p2.write_text("top: ???\nuse: ${top}\n")
    with pytest.raises(ConfigError, match="top"):
        load_config(p2)
    assert load_config(p2, overrides=["top=3"])["use"] == 3


def test_instantiate_with_alias():
    # reference-style _target_ path resolves via alias table
    tok = instantiate(
        {
            "_target_": "roar.collections.common.tokenizers.text_to_speech.tts_tokenizers.TamilCharsTokenizer",
            "pad_with_space": True,
        }
    )
    assert tok.encode("வணக்கம்")


@pytest.mark.parametrize(
    "name",
    [
        "fastpitch_22050_align",
        "fastpitch_44100_align",
        "hifigan_22050",
        "hifigan_44100",
        "jets_22050_align",
        "jets_22050_conformer",
        "aligner",
        "ds_for_fastpitch_align",
    ],
)
def test_shipped_configs_load(name):
    overrides = [
        "train_dataset=/tmp/x.json",
        "validation_datasets=/tmp/x.json",
        "sup_data_path=/tmp/sup",
        "pitch_mean=200.0",
        "pitch_std=60.0",
        "manifest_filepath=/tmp/x.json",
    ]
    cfg = load_config(CONFIGS / f"{name}.yaml", overrides=overrides)
    assert isinstance(cfg, dict)
    if name.startswith("hifigan"):
        gen = cfg["model"]["generator"]
        assert "upsample_rates" in gen  # _file_ include expanded
        assert int(np.prod(gen["upsample_rates"])) == cfg["n_window_stride"]
    if name.startswith("jets"):
        gen = cfg["model"]["waveform_generator"]
        assert int(np.prod(gen["upsample_rates"])) == cfg["n_window_stride"]
    if name == "jets_22050_conformer":
        for k in ("input_fft", "output_fft"):
            fft = cfg["model"][k]
            assert fft["encoder_type"] == "conformer"
            assert fft["use_rope"] is True
            assert fft["kernel_size"] == 31
            # inherited from the base recipe via _file_ include
            assert fft["d_model"] == cfg["model"]["symbols_embedding_dim"]
            assert fft["n_layer"] == 6


def test_fastpitch_model_from_shipped_config():
    cfg = load_config(
        CONFIGS / "fastpitch_22050_align.yaml",
        overrides=[
            "train_dataset=/tmp/x.json",
            "validation_datasets=/tmp/x.json",
            "sup_data_path=/tmp/sup",
            "pitch_mean=200.0",
            "pitch_std=60.0",
            "model.speaker_encoder.lookup_module.n_speakers=4",
        ],
    )
    from roar_tpu.models.fastpitch_model import FastPitchModel

    model = FastPitchModel(cfg["model"])
    assert model.module.n_speakers == 4
    assert model.module.n_mel_channels == 80
    assert model.module.encoder.d_model == 384
    assert model.tokenizer is not None
    assert model.mel_cfg.sample_rate == 22050
    assert model.mel_cfg.hop_length == 512


@pytest.mark.slow
def test_extract_sup_data_script(tmp_path):
    from roar_tpu.data import write_manifest, write_wav

    sr = 22050
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    entries = []
    for i in range(3):
        t = np.arange(int(sr * 0.5)) / sr
        x = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        p = wav_dir / f"u{i}.wav"
        write_wav(str(p), x, sr)
        entries.append({"audio_filepath": str(p), "text": "ab", "duration": 0.5})
    man = tmp_path / "manifest.json"
    write_manifest(man, entries)

    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts/dataset_processing/tts/extract_sup_data.py"),
            "--config-name=ds_for_fastpitch_align",
            f"manifest_filepath={man}",
            f"sup_data_path={tmp_path / 'sup'}",
            "batch_size=4",
            "n_fft=1024",
            "win_length=1024",
            "hop_length=256",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
        },
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "PITCH_MEAN=" in result.stdout
    pitch_files = list((tmp_path / "sup" / "pitch").glob("*.npy"))
    assert len(pitch_files) == 3
    # detected pitch near the synthesized tones
    meds = sorted(
        float(np.median(v[v > 0])) for v in (np.load(f) for f in pitch_files)
    )
    np.testing.assert_allclose(meds, [150, 180, 210], rtol=0.05)


@pytest.mark.slow
def test_export_script_fastpitch(tmp_path):
    """scripts/export.py produces a serialized StableHLO artifact."""
    import jax

    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.save_restore import save_to

    cfg = {
        "n_mel_channels": 16,
        "symbols_embedding_dim": 32,
        "n_symbols": 40,
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16},
        "duration_predictor": {"input_size": 32, "filter_size": 16},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "preprocessor": {"sample_rate": 22050, "features": 16, "n_window_size": 512,
                         "n_window_stride": 128, "n_fft": 512},
    }
    model = FastPitchModel(cfg)
    import jax.numpy as jnp

    tokens = jnp.zeros((1, 16), jnp.int32)
    params = model.module.init(
        {"params": jax.random.PRNGKey(0)}, tokens, max_mel_len=64,
        method=model.module.infer,
    )
    bundle = tmp_path / "m.roar"
    save_to(str(bundle), {"target": "FastPitchModel", "model": cfg}, params)

    result = subprocess.run(
        [
            sys.executable, str(REPO / "scripts/export.py"),
            "--model", str(bundle), "--kind", "fastpitch",
            "--out", str(tmp_path / "exported"),
            "--batch", "1", "--text-len", "16", "--mel-len", "64",
        ],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    out_file = tmp_path / "exported" / "fastpitch.stablehlo"
    assert out_file.exists() and out_file.stat().st_size > 1000


def test_yaml_scientific_notation_floats():
    """pyyaml parses `1e-3` as a string by default; our loader must not."""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write("lr: 1e-3\nwd: 1e-6\nplain: 0.5\nexp_dot: 2.5e-4\nname: abc\n")
        path = f.name
    cfg = load_config(path)
    assert isinstance(cfg["lr"], float) and cfg["lr"] == 1e-3
    assert isinstance(cfg["wd"], float) and cfg["wd"] == 1e-6
    assert cfg["exp_dot"] == 2.5e-4
    assert cfg["name"] == "abc"

    # the shipped fastpitch config yields float lr/weight_decay
    c = load_config(
        CONFIGS / "fastpitch_22050_align.yaml",
        overrides=["train_dataset=x", "validation_datasets=x", "sup_data_path=x",
                   "pitch_mean=200.0", "pitch_std=60.0"],
    )
    assert isinstance(c["model"]["optim"]["lr"], float)
    assert isinstance(c["model"]["optim"]["weight_decay"], float)
    assert isinstance(c["model"]["preprocessor"]["log_zero_guard_value"], float)


@pytest.mark.slow
def test_resynthesize_dataset_script(tmp_path):
    """scripts/dataset_processing/tts/resynthesize_dataset.py writes mels."""
    import jax
    import jax.numpy as jnp

    from roar_tpu.data import write_manifest
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.save_restore import save_to

    cfg = {
        "n_mel_channels": 16,
        "symbols_embedding_dim": 32,
        "text_tokenizer": {
            "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
            "pad_with_space": True,
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
    bundle = tmp_path / "fp.roar"
    save_to(str(bundle), {"target": "FastPitchModel", "model": cfg}, params)

    man = tmp_path / "in.json"
    write_manifest(man, [
        {"audio_filepath": "none.wav", "text": "hello world", "duration": 1.0},
        {"audio_filepath": "none2.wav", "text": "testing", "duration": 1.0},
    ])
    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts/dataset_processing/tts/resynthesize_dataset.py"),
            "--fastpitch_model", str(bundle),
            "--input_manifest", str(man),
            "--output_dir", str(tmp_path / "resynth"),
            "--max_mel_len", "64",
        ],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    mels = list((tmp_path / "resynth" / "mels").glob("*.npy"))
    assert len(mels) == 2
    assert np.load(mels[0]).shape[0] == 16  # [n_mel, T]
    assert (tmp_path / "resynth" / "manifest.json").exists()


@pytest.mark.slow
def test_preprocess_audio_script(tmp_path):
    """preprocess_audio.py trims + normalizes and rewrites the manifest."""
    from roar_tpu.data import write_manifest, write_wav
    from roar_tpu.data.manifest import read_manifest

    sr = 22050
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sil = np.zeros(sr // 2, np.float32)
    t = np.arange(sr) / sr
    tone = (0.25 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    p = wav_dir / "a.wav"
    write_wav(str(p), np.concatenate([sil, tone, sil]), sr)
    man = tmp_path / "in.json"
    write_manifest(man, [{"audio_filepath": str(p), "text": "x", "duration": 2.0}])

    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts/dataset_processing/tts/preprocess_audio.py"),
            "--input_manifest", str(man),
            "--output_manifest", str(tmp_path / "out.json"),
            "--output_dir", str(tmp_path / "proc"),
            "--trimmer", "vad",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out = read_manifest(tmp_path / "out.json")
    assert len(out) == 1
    # two seconds in, ~1s of speech (+pads) out, peak-normalized
    assert 0.9 <= out[0]["duration"] <= 1.5
    from roar_tpu.data import read_wav

    audio, _ = read_wav(out[0]["audio_filepath"])
    assert 0.9 <= np.abs(audio).max() <= 1.0


@pytest.mark.slow
def test_generate_mels_script(tmp_path):
    """scripts/dataset_processing/tts/generate_mels.py writes GTA mels +
    manifest with mel_filepath (reference generate_mels.py parity)."""
    import jax

    from roar_tpu.data import BucketSpec, TTSDataset, write_manifest, write_wav
    from roar_tpu.data.manifest import read_manifest
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.save_restore import save_to

    sr = 22050
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    entries = []
    for i in range(2):
        t = np.arange(int(sr * 0.4)) / sr
        x = (0.4 * np.sin(2 * np.pi * (160 + 20 * i) * t)).astype(np.float32)
        p = wav_dir / f"g{i}.wav"
        write_wav(str(p), x, sr)
        entries.append({"audio_filepath": str(p), "text": "hi there", "duration": 0.4})
    man = tmp_path / "in.json"
    write_manifest(man, entries)

    cfg = {
        "n_mel_channels": 16,
        "symbols_embedding_dim": 32,
        "text_tokenizer": {
            "_target_": "roar_tpu.data.tokenizers.EnglishCharsTokenizer",
            "pad_with_space": True,
        },
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16, "d_inner": 64},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16},
        "duration_predictor": {"input_size": 32, "filter_size": 16},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "preprocessor": {"sample_rate": sr, "features": 16, "n_window_size": 512,
                         "n_window_stride": 128, "n_fft": 512},
    }
    model = FastPitchModel(cfg)
    # params from the TRAINING-mode init (teacher-forced apply needs the
    # aligner params, which the infer path never touches)
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=model.tokenizer,
        sup_data_path=str(tmp_path / "sup"),
        sup_data_types=["align_prior_matrix", "pitch"],
        n_fft=512, win_length=512, hop_length=128, n_mels=16,
    )
    example = ds.collate([ds[0]], BucketSpec())
    params = model.init_params(jax.random.PRNGKey(0), example)
    bundle = tmp_path / "fp.roar"
    save_to(str(bundle), {"target": "FastPitchModel", "model": cfg}, params)

    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts/dataset_processing/tts/generate_mels.py"),
            "--fastpitch_model", str(bundle),
            "--input_manifest", str(man),
            "--output_manifest", str(tmp_path / "out.json"),
            "--mel_dir", str(tmp_path / "mels"),
            "--sup_data_path", str(tmp_path / "sup"),
            "--batch_size", "2",
        ],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    out_entries = read_manifest(tmp_path / "out.json")
    assert len(out_entries) == 2
    for e in out_entries:
        mel = np.load(e["mel_filepath"])
        assert mel.shape[0] == 16  # [n_mel, T]
        assert mel.shape[1] > 10
        assert np.isfinite(mel).all()


class TestVocoderDatasetRouting:
    def _corpus(self, tmp_path):
        import json
        import wave

        import numpy as np

        sr = 22050
        t = np.arange(sr) / sr
        x = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
        wav = tmp_path / "r.wav"
        with wave.open(str(wav), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(x.tobytes())
        mf = tmp_path / "m.json"
        mf.write_text(json.dumps({"audio_filepath": str(wav), "text": "x",
                                  "duration": 1.0}) + "\n")
        return mf

    def test_classic_manifest_config(self, tmp_path):
        from roar_tpu.data.dataset import VocoderDataset
        from roar_tpu.training.run import build_vocoder_dataset

        mf = self._corpus(tmp_path)
        ds = build_vocoder_dataset(
            {"_target_": "roar_tpu.data.dataset.VocoderDataset",
             "manifest_filepath": str(mf), "sample_rate": 22050,
             "n_segments": 2048}
        )
        assert isinstance(ds, VocoderDataset)
        assert ds[0]["audio"].shape == (2048,)

    def test_dataset_meta_config(self, tmp_path):
        from roar_tpu.data.vocoder_dataset import VocoderDataset as MetaDS
        from roar_tpu.training.run import build_vocoder_dataset

        mf = self._corpus(tmp_path)
        ds = build_vocoder_dataset(
            {"_target_": "roar_tpu.data.vocoder_dataset.VocoderDataset",
             "dataset_meta": {"a": {"manifest_path": str(mf),
                                    "audio_dir": str(tmp_path)}},
             "sample_rate": 22050, "n_samples": 2048,
             "weighted_sampling_steps_per_epoch": None}
        )
        assert isinstance(ds, MetaDS)
        batch = ds.collate([ds[0]])
        assert batch["audio"].shape[0] == 1
        assert "audio_filepaths" in batch


@pytest.mark.slow
def test_export_script_dynamic_batch(tmp_path):
    """--dynamic-batch exports with a symbolic batch dimension (the
    TPU-idiomatic analogue of the reference's ragged-batch export,
    models/fastpitch.py:886-902): the artifact deserializes and runs at
    batch sizes never traced."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.save_restore import save_to

    cfg = {
        "n_mel_channels": 16,
        "symbols_embedding_dim": 32,
        "n_symbols": 40,
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
    bundle = tmp_path / "m.roar"
    save_to(str(bundle), {"target": "FastPitchModel", "model": cfg}, params)

    result = subprocess.run(
        [
            sys.executable, str(REPO / "scripts/export.py"),
            "--model", str(bundle), "--kind", "fastpitch",
            "--out", str(tmp_path / "exported"),
            "--text-len", "16", "--mel-len", "64", "--dynamic-batch",
        ],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    blob = (tmp_path / "exported" / "fastpitch.stablehlo").read_bytes()
    rehydrated = jax.export.deserialize(blob)
    for b in (1, 3):
        out = rehydrated.call(jnp.zeros((b, 16), jnp.int32))
        assert np.asarray(out).shape == (b, 64, 16)
