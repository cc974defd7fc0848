"""Config-driven ASR dataset builders (data/asr_builders.py) — the
reference's audio_to_text_dataset.py entry points (:583 char, :726 bpe,
:912 convert_to_config_list) driven from raw config dicts, including the
dispatch precedence, refusal semantics, and the shipped ASR config file."""

import json
import tarfile
import wave
from pathlib import Path

import numpy as np
import pytest

from roar_tpu.data.asr_builders import (
    convert_to_config_list,
    get_audio_to_label_dataset_from_config,
    get_audio_to_text_bpe_dataset_from_config,
    get_audio_to_text_char_dataset_from_config,
)

LABELS = [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)]


@pytest.fixture(scope="module")
def asr_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("asr_corpus")
    sr = 16000
    entries = []
    for i, txt in enumerate(["hello there", "speech to text", "one two", "go"]):
        dur = 0.3 + 0.1 * i
        t = np.arange(int(sr * dur)) / sr
        x = (0.3 * np.sin(2 * np.pi * (120 + 40 * i) * t)).astype(np.float32)
        p = root / f"u{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((x * 32767).astype(np.int16).tobytes())
        entries.append(
            {"audio_filepath": str(p), "text": txt, "duration": dur,
             "label": f"spk{i % 2}"}
        )
    man = root / "manifest.json"
    with open(man, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    # a second manifest (reversed order) for concat / code-switched paths
    man2 = root / "manifest2.json"
    with open(man2, "w") as f:
        for e in reversed(entries):
            f.write(json.dumps(e) + "\n")
    # one tar shard containing all wavs (tarred path)
    tar = root / "audio_0.tar"
    with tarfile.open(tar, "w") as tf:
        for e in entries:
            tf.add(e["audio_filepath"],
                   arcname=Path(e["audio_filepath"]).name)
    return root, str(man), str(man2), str(tar), sr


def test_convert_to_config_list():
    assert convert_to_config_list("a.json") == [["a.json"]]
    assert convert_to_config_list("a.json,b.json") == [["a.json"], ["b.json"]]
    assert convert_to_config_list(["a", "b"]) == [["a"], ["b"]]
    assert convert_to_config_list([["a"], ["b", "c"]]) == [["a"], ["b", "c"]]
    with pytest.raises(ValueError):
        convert_to_config_list(None)


def test_char_builder_plain(asr_corpus):
    _, man, _, _, sr = asr_corpus
    ds = get_audio_to_text_char_dataset_from_config(
        {"manifest_filepath": man, "labels": LABELS, "sample_rate": sr,
         "shuffle": True}
    )
    assert len(ds) == 4
    item = ds[0]
    assert item["tokens_len"] > 0 and item["audio_len"] > 0
    batch = ds.collate([ds[0], ds[1]])
    assert batch["audio"].shape[0] == 2
    assert batch["tokens"].dtype == np.int32


def test_char_builder_none_manifest_returns_none():
    assert get_audio_to_text_char_dataset_from_config(
        {"manifest_filepath": None, "labels": LABELS, "sample_rate": 16000}
    ) is None


def test_char_builder_concat_dispatch_and_validation(asr_corpus):
    _, man, man2, _, sr = asr_corpus
    base = {"manifest_filepath": [man, man2], "labels": LABELS,
            "sample_rate": sr, "is_concat": True}
    # random technique without probabilities -> refused like the reference
    assert get_audio_to_text_char_dataset_from_config(
        {**base, "concat_sampling_technique": "random"}
    ) is None
    # probabilities that don't sum to 1 -> refused
    assert get_audio_to_text_char_dataset_from_config(
        {**base, "concat_sampling_technique": "random",
         "concat_sampling_probabilities": [0.9, 0.9]}
    ) is None
    ds = get_audio_to_text_char_dataset_from_config(
        {**base, "concat_sampling_technique": "random",
         "concat_sampling_probabilities": [0.5, 0.5],
         "concat_sampling_seed": 0}
    )
    items = [item for item, _ in zip(iter(ds), range(6))]
    assert len(items) == 6 and all("tokens" in i for i in items)


def test_char_builder_tarred_dispatch(asr_corpus):
    _, man, _, tar, sr = asr_corpus
    ds = get_audio_to_text_char_dataset_from_config(
        {"manifest_filepath": man, "tarred_audio_filepaths": tar,
         "labels": LABELS, "sample_rate": sr, "is_tarred": True}
    )
    items = list(iter(ds))
    assert len(items) == 4
    assert all(i["audio_len"] > 0 for i in items)
    with pytest.raises(ValueError, match="Tarred datasets require"):
        get_audio_to_text_char_dataset_from_config(
            {"labels": LABELS, "sample_rate": sr, "is_tarred": True,
             "tarred_audio_filepaths": tar}
        )


def test_char_builder_code_switched_dispatch(asr_corpus):
    _, man, man2, _, sr = asr_corpus
    ds = get_audio_to_text_char_dataset_from_config(
        {"manifest_filepath": [man, man2], "labels": LABELS,
         "sample_rate": sr, "is_code_switched": True,
         "code_switched": {"min_duration": 1, "max_duration": 3,
                           "min_monolingual": 0.0, "seed": 3}}
    )
    it = iter(ds)
    item = next(it)
    assert "audio" in item and len(item["audio"]) > 0


class _Tok:
    """Minimal text_to_ids tokenizer for the BPE builder path."""

    pad_id, bos_id, eos_id = 0, 1, 2

    def text_to_ids(self, text):
        return [3 + (ord(c) % 20) for c in text]


def test_bpe_builder_plain_and_concat(asr_corpus):
    _, man, man2, _, sr = asr_corpus
    ds = get_audio_to_text_bpe_dataset_from_config(
        {"manifest_filepath": man, "sample_rate": sr}, _Tok()
    )
    item = ds[0]
    assert item["tokens"][0] == 1 and item["tokens"][item["tokens_len"] - 1] == 2
    cds = get_audio_to_text_bpe_dataset_from_config(
        {"manifest_filepath": [man, man2], "sample_rate": sr,
         "is_concat": True, "concat_sampling_technique": "round-robin"},
        _Tok(),
    )
    items = [item for item, _ in zip(iter(cds), range(4))]
    assert len(items) == 4


def test_label_builder_single_and_multi_manifest(asr_corpus):
    _, man, man2, _, sr = asr_corpus
    ds = get_audio_to_label_dataset_from_config(
        {"manifest_filepath": man, "sample_rate": sr,
         "window_length_in_sec": 0.25}
    )
    assert sorted(ds.labels) == ["spk0", "spk1"]
    item = ds[0]
    assert len(item["audio"]) == int(0.25 * sr)
    multi = get_audio_to_label_dataset_from_config(
        {"manifest_filepath": [man, man2], "sample_rate": sr,
         "labels": ["spk0", "spk1"]}
    )
    items = [item for item, _ in zip(iter(multi), range(4))]
    assert all(i["label"] in (0, 1) for i in items)
    assert get_audio_to_label_dataset_from_config(
        {"manifest_filepath": None, "sample_rate": sr}
    ) is None


def test_shipped_asr_config_instantiates(asr_corpus):
    """configs/asr_char_dataset.yaml -> builder -> working dataset, the
    'ASR configs instantiate end-to-end like TTS ones' bar."""
    from roar_tpu.config import load_config

    _, man, man2, _, sr = asr_corpus
    root = Path(__file__).resolve().parents[1]
    cfg = load_config(
        root / "configs/asr_char_dataset.yaml",
        overrides=[f"train_manifest={man}", f"validation_manifest={man2}",
                   f"sample_rate={sr}"],
    )
    train = get_audio_to_text_char_dataset_from_config(cfg["model"]["train_ds"])
    val = get_audio_to_text_char_dataset_from_config(
        cfg["model"]["validation_ds"]
    )
    assert len(train) == 4 and len(val) == 4
    batch = train.collate([train[i] for i in range(4)])
    assert batch["audio"].shape[0] == 4 and np.isfinite(batch["audio"]).all()


# ----------------------------------------------------------------------
# Multi-label + tarred-label datasets (r3 depth: audio_to_label.py
# :469-894 tarred variants, :895-1084 AudioToMultiLabelDataset)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def multilabel_corpus(asr_corpus, tmp_path_factory):
    root, man, _, _, sr = asr_corpus
    out = tmp_path_factory.mktemp("ml")
    man_ml = out / "ml.json"
    with open(man, encoding="utf-8") as f:
        entries = [json.loads(l) for l in f if l.strip()]
    with open(man_ml, "w") as f:
        for i, e in enumerate(entries):
            e = dict(e)
            e["label"] = " ".join(str((i + j) % 2) for j in range(3 + i))
            f.write(json.dumps(e) + "\n")
    return str(man_ml), sr


def test_multi_label_dataset_items_and_collate(multilabel_corpus):
    from roar_tpu.data.asr_datasets import AudioToMultiLabelDataset

    man, sr = multilabel_corpus
    ds = AudioToMultiLabelDataset(manifest_filepath=man, sample_rate=sr)
    assert ds.labels == ["0", "1"]
    items = [ds[i] for i in range(len(ds))]
    assert [int(i["label_len"]) for i in items] == [3, 4, 5, 6]
    batch = ds.collate(items)
    assert batch["label"].shape[0] == 4
    assert batch["label"].shape[1] % ds.label_multiple == 0
    assert batch["label"].dtype == np.int32
    # padded label tail is zero
    assert (batch["label"][0, 3:] == 0).all()


def test_multi_label_regression_and_normalize(multilabel_corpus):
    from roar_tpu.data.asr_datasets import AudioToMultiLabelDataset

    man, sr = multilabel_corpus
    ds = AudioToMultiLabelDataset(
        manifest_filepath=man, sample_rate=sr, is_regression_task=True,
        normalize_audio_db=-20.0,
    )
    item = ds[0]
    assert item["label"].dtype == np.float32
    rms = np.sqrt(np.mean(np.square(item["audio"])))
    np.testing.assert_allclose(rms, 10 ** (-20 / 20), rtol=1e-3)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["label"].dtype == np.float32


def test_tarred_label_dataset(asr_corpus):
    from roar_tpu.data.tarred_datasets import TarredAudioToLabelDataset

    _, man, _, tar, sr = asr_corpus
    ds = TarredAudioToLabelDataset(
        audio_tar_filepaths=tar, manifest_filepath=man, sample_rate=sr,
        window_length_in_sec=0.25,
    )
    assert ds.labels == ["spk0", "spk1"]
    items = list(iter(ds))
    assert len(items) == 4
    n = int(0.25 * sr)
    assert all(i["audio"].shape == (n,) for i in items)
    assert sorted({int(i["label"]) for i in items}) == [0, 1]


def test_label_builder_tarred_dispatch(asr_corpus):
    from roar_tpu.data.asr_builders import get_audio_to_label_dataset_from_config
    from roar_tpu.data.tarred_datasets import TarredAudioToLabelDataset

    _, man, _, tar, sr = asr_corpus
    ds = get_audio_to_label_dataset_from_config(
        {"manifest_filepath": man, "tarred_audio_filepaths": tar,
         "sample_rate": sr, "is_tarred": True}
    )
    assert isinstance(ds, TarredAudioToLabelDataset)
    assert len(list(iter(ds))) == 4


def test_multi_label_builder(multilabel_corpus):
    from roar_tpu.data.asr_builders import (
        get_audio_to_multi_label_dataset_from_config,
    )

    man, sr = multilabel_corpus
    ds = get_audio_to_multi_label_dataset_from_config(
        {"manifest_filepath": man, "sample_rate": sr}
    )
    assert len(ds) == 4
    both = get_audio_to_multi_label_dataset_from_config(
        {"manifest_filepath": [man, man], "sample_rate": sr}
    )
    from roar_tpu.data.concat_dataset import ConcatDataset

    assert isinstance(both, ConcatDataset)
    assert get_audio_to_multi_label_dataset_from_config({"sample_rate": sr}) is None
