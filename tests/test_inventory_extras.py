"""Tests for the inventory-completion batch: featurizers, feature processors,
TextToSpeechDataset, ConditionalRMSNorm, metrics, multirun, debug utils."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.data import write_manifest, write_wav
from roar_tpu.data.featurizers import (
    FeatureScaler,
    LogCompression,
    MeanVarianceNormalization,
    MeanVarianceSpeakerNormalization,
    PitchFeaturizer,
)
from roar_tpu.data.sup_data import SupDataConfig
from roar_tpu.data.text_to_speech_dataset import TextToSpeechDataset
from roar_tpu.data.tokenizers import EnglishCharsTokenizer
from roar_tpu.utils.metrics import GlobalAverageLossMetric, accuracy, perplexity


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tts_new_corpus")
    sr = 22050
    entries = []
    for i in range(3):
        t = np.arange(int(sr * 0.4)) / sr
        x = (0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t)).astype(np.float32)
        p = root / f"wavs/u{i}.wav"
        p.parent.mkdir(exist_ok=True)
        write_wav(str(p), x, sr)
        entries.append({
            "audio_filepath": str(p), "text": f"sample {i}",
            "duration": 0.4, "speaker": f"spk{i % 2}",
        })
    man = root / "manifest.json"
    write_manifest(man, entries)
    return root, man, sr, entries


def test_featurizer_save_load(corpus):
    root, man, sr, entries = corpus
    cfg = SupDataConfig(sample_rate=sr, n_fft=1024, win_length=1024, hop_length=256)
    feat = PitchFeaturizer(cfg, str(root / "feats"))
    feat.setup()
    from roar_tpu.data.audio import AudioSegment

    audio = AudioSegment.from_file(entries[0]["audio_filepath"], target_sr=sr).samples
    feat.save(entries[0], audio)
    loaded = feat.load(entries[0])
    assert set(loaded) == {"pitch", "voiced_mask", "p_voiced"}
    voiced = loaded["pitch"][loaded["pitch"] > 0]
    assert abs(np.median(voiced) - 140.0) < 8.0


def test_feature_processors(corpus, tmp_path):
    ex = {"pitch": np.array([0.0, 100.0, 200.0]), "voiced_mask": np.array([False, True, True]),
          "speaker_id": 1}
    FeatureScaler("pitch", add_value=-100.0, div_value=10.0).process(ex)
    np.testing.assert_allclose(ex["pitch"], [-10.0, 0.0, 10.0])

    ex2 = {"energy": np.array([0.0, np.e - 1.0])}
    LogCompression("energy").process(ex2)
    np.testing.assert_allclose(ex2["energy"], [0.0, 1.0], atol=1e-6)

    stats = {"default": {"pitch_mean": 150.0, "pitch_std": 50.0},
             "1": {"pitch_mean": 100.0, "pitch_std": 25.0}}
    sp = tmp_path / "stats.json"
    sp.write_text(json.dumps(stats))
    ex3 = {"pitch": np.array([0.0, 100.0, 200.0]), "voiced_mask": np.array([False, True, True])}
    MeanVarianceNormalization("pitch", str(sp)).process(ex3)
    np.testing.assert_allclose(ex3["pitch"], [0.0, -1.0, 1.0])

    ex4 = {"pitch": np.array([100.0, 150.0]), "voiced_mask": np.array([True, True]),
           "speaker_id": 1}
    MeanVarianceSpeakerNormalization("pitch", str(sp)).process(ex4)
    np.testing.assert_allclose(ex4["pitch"], [0.0, 2.0])


def test_text_to_speech_dataset(corpus):
    root, man, sr, entries = corpus
    # precompute features
    cfg = SupDataConfig(sample_rate=sr, n_fft=1024, win_length=1024, hop_length=256)
    feat = PitchFeaturizer(cfg, str(root / "feats"))
    feat.setup()
    from roar_tpu.data.audio import AudioSegment

    for e in entries:
        feat.save(e, AudioSegment.from_file(e["audio_filepath"], target_sr=sr).samples)
    smap = root / "speakers.json"
    smap.write_text(json.dumps({"spk0": 0, "spk1": 1}))

    ds = TextToSpeechDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=EnglishCharsTokenizer(pad_with_space=True),
        feature_dir=str(root / "feats"),
        speaker_path=str(smap),
        featurizers=("pitch",),
        align_prior_hop_length=256,
    )
    item = ds[1]
    assert item["speaker_id"] == 1
    assert "pitch" in item and "align_prior_matrix" in item
    assert item["align_prior_matrix"].shape == (int(item["mel_len"]), int(item["text_len"]))
    batch = ds.collate([ds[i] for i in range(3)])
    assert batch["pitch"].shape[0] == 3


def test_conditional_rmsnorm():
    from roar_tpu.models.submodules import ConditionalRMSNorm

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 8)), jnp.float32)
    cond = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 8)), jnp.float32)
    m = ConditionalRMSNorm(8, 8, ("layernorm",))
    p = m.init(jax.random.PRNGKey(0), x, cond)
    y = m.apply(p, x, cond)
    assert y.shape == x.shape
    # identity-at-init conditioning: equals plain RMSNorm
    plain = ConditionalRMSNorm(8)
    pp = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(plain.apply(pp, x)), atol=1e-5)


def test_metrics():
    logits = jnp.asarray([[3.0, 1.0], [0.0, 2.0], [5.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    assert float(accuracy(logits, labels)) == pytest.approx(2 / 3)
    lp = jax.nn.log_softmax(logits)
    assert float(perplexity(lp, labels)) > 1.0
    m = GlobalAverageLossMetric()
    m.update(2.0, 1)
    m.update(4.0, 3)
    assert m.compute() == pytest.approx(3.5)


def test_multirun_expand():
    from roar_tpu.config.multirun import expand_sweep

    jobs = expand_sweep(["a=1,2", "b=x"])
    assert jobs == [["a=1", "b=x"], ["a=2", "b=x"]]


def test_debug_activation_and_grad_norms():
    from flax import linen as nn

    from roar_tpu.utils.debug import activation_norms, grad_norms

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(nn.relu(nn.Dense(8)(x)))

    m = M()
    x = jnp.ones((2, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    norms = activation_norms(m, p, x)
    assert norms and all(v >= 0 for v in norms.values())

    g = jax.grad(lambda p: jnp.sum(m.apply(p, x)))(p)
    gn = grad_norms(g)
    assert any("Dense_0" in k for k in gn)


def test_checkify_nan_guard():
    """utils.debug.checked wraps a jitted fn with NaN/index guards
    (SURVEY §5.2: jax.debug/checkify for NaN/shape guards)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from roar_tpu.utils.debug import checked

    def loss(x):
        return jnp.log(x).sum()  # NaN for negative inputs

    guarded = checked(jax.jit(loss))
    assert np.isfinite(float(guarded(jnp.ones(4))))
    with pytest.raises(checkify.JaxRuntimeError):
        guarded(-jnp.ones(4))


class TestMiscUtils:
    """utils/misc.py (ref env_var_parsing / metaclasses / enum /
    exceptions / data_utils / config_utils small surfaces)."""

    def test_env_parsing(self, monkeypatch):
        from roar_tpu.utils import misc

        monkeypatch.setenv("RT_STR", "hello")
        monkeypatch.setenv("RT_INT", "42")
        monkeypatch.setenv("RT_BOOL", "Yes")
        monkeypatch.setenv("RT_DICT", '{"a": 1}')
        assert misc.get_env("RT_STR") == "hello"
        assert misc.get_envint("RT_INT") == 42
        assert misc.get_envbool("RT_BOOL") is True
        assert misc.get_envbool("RT_MISSING", False) is False
        assert misc.get_envdict("RT_DICT") == {"a": 1}
        with pytest.raises(misc.RequiredSettingMissingError):
            misc.get_env("RT_MISSING")
        monkeypatch.setenv("RT_BADINT", "xyz")
        with pytest.raises(misc.CoercionError):
            misc.get_envint("RT_BADINT")

    def test_singleton_and_enum(self):
        from roar_tpu.utils.misc import PrettyStrEnum, Singleton

        class S(metaclass=Singleton):
            pass

        assert S() is S()

        class Mode(PrettyStrEnum):
            FAST = "fast"
            SLOW = "slow"

        assert str(Mode("fast")) == "fast"
        with pytest.raises(ValueError, match="fast, slow"):
            Mode("warp")

    def test_check_install(self):
        from roar_tpu.utils.misc import CheckInstall, RoarTPUBaseException

        obj = CheckInstall()
        with pytest.raises(RoarTPUBaseException):
            obj()
        with pytest.raises(RoarTPUBaseException):
            obj.anything

    def test_cache_dir_and_tarred(self, monkeypatch):
        from roar_tpu.utils import misc

        monkeypatch.setenv("ROAR_TPU_CACHE_DIR", "/tmp/rtcache")
        assert str(misc.resolve_cache_dir()) == "/tmp/rtcache"
        monkeypatch.delenv("ROAR_TPU_CACHE_DIR")
        assert misc.resolve_cache_dir().name == "roar_tpu"
        assert misc.is_tarred_path("x/audio_0.tar")
        assert not misc.is_tarred_path("x/a.wav")

    def test_dataclass_signature_match(self):
        import dataclasses

        from roar_tpu.utils.misc import assert_dataclass_signature_match

        @dataclasses.dataclass
        class Cfg:
            a: int = 1
            b: str = "x"

        class Good:
            def __init__(self, a=1, b="x"):
                pass

        class Bad:
            def __init__(self, a=1, c=None):
                pass

        ok, c_only, d_only = assert_dataclass_signature_match(Good, Cfg)
        assert ok and not c_only and not d_only
        ok, c_only, d_only = assert_dataclass_signature_match(Bad, Cfg)
        assert not ok and c_only == ["c"] and d_only == ["b"]
