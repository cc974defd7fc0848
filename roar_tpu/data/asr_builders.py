"""Config-driven ASR dataset builders.

The reference instantiates ASR datasets through builder entry points that a
model's `setup_training_data` calls with the raw `train_ds`/`validation_ds`
config (roar/collections/asr/data/audio_to_text_dataset.py:
get_audio_to_text_char_dataset_from_config:583, *_bpe_:726, get_char_dataset
:116, get_bpe_dataset:201, get_concat_*:64/152, get_tarred_dataset:292,
get_code_switched_dataset:398, convert_to_config_list:912).  This module is
that layer for the TPU build: a config dict goes in, a ready dataset comes
out, with the same dispatch precedence (code-switched > concat > tarred >
plain) and the same validation warnings.  DALI builders (:485/:535) are
GPU-only plumbing and are not carried (SURVEY §7 sanctioned drop); multi-host
partitioning flows through `global_rank`/`world_size` exactly as the
reference threads them.
"""

from __future__ import annotations

from math import isclose
from typing import Any, Dict, List, Optional, Sequence

from roar_tpu.data.asr_datasets import (
    AudioToBPEDataset,
    AudioToCharDataset,
    AudioToLabelDataset,
)
from roar_tpu.data.concat_dataset import CodeSwitchedDataset, ConcatDataset
from roar_tpu.data.tarred_datasets import (
    TarredAudioToBPEDataset,
    TarredAudioToCharDataset,
)
from roar_tpu.utils.logging import get_logger


def convert_to_config_list(initial_list) -> List[List[Any]]:
    """Normalize manifest/tar path config to a list-of-lists (ref :912):
    'a.json' -> [['a.json']], ['a','b'] -> [['a'],['b']], already-nested
    lists pass through."""
    if initial_list is None or initial_list == []:
        raise ValueError("manifest_filepath is None or empty")
    if isinstance(initial_list, str):
        initial_list = initial_list.split(",")
    if not isinstance(initial_list, (list, tuple)):
        raise ValueError(f"cannot normalize config list from {initial_list!r}")
    if all(not isinstance(x, (list, tuple)) for x in initial_list):
        return [[x] for x in initial_list]
    return [list(x) if isinstance(x, (list, tuple)) else [x] for x in initial_list]


_CHAR_KEYS = (
    "labels", "sample_rate", "max_duration", "min_duration", "max_utts",
    "trim", "return_sample_id", "blank_index", "unk_index",
    "audio_multiple", "text_multiple",
)
_BPE_KEYS = (
    "sample_rate", "max_duration", "min_duration", "max_utts", "trim",
    "return_sample_id", "use_start_end_token", "audio_multiple",
    "text_multiple",
)


def _subset(config: Dict[str, Any], keys: Sequence[str]) -> Dict[str, Any]:
    return {k: config[k] for k in keys if k in config}


def get_char_dataset(config: Dict[str, Any], augmentor=None) -> AudioToCharDataset:
    """Plain char dataset from config (ref :116)."""
    return AudioToCharDataset(
        manifest_filepath=config["manifest_filepath"],
        augmentor=augmentor, **_subset(config, _CHAR_KEYS),
    )


def get_bpe_dataset(
    config: Dict[str, Any], tokenizer, augmentor=None
) -> AudioToBPEDataset:
    """Plain subword dataset from config (ref :201)."""
    return AudioToBPEDataset(
        manifest_filepath=config["manifest_filepath"], tokenizer=tokenizer,
        augmentor=augmentor, **_subset(config, _BPE_KEYS),
    )


def _concat_kwargs(config: Dict[str, Any], global_rank: int, world_size: int):
    return dict(
        sampling_technique=config.get("concat_sampling_technique", "temperature"),
        sampling_temperature=config.get("concat_sampling_temperature", 5.0),
        sampling_scale=config.get("concat_sampling_scale", 1),
        sampling_probabilities=config.get("concat_sampling_probabilities"),
        shuffle=config.get("concat_shuffle", True),
        seed=config.get("concat_sampling_seed"),
        global_rank=global_rank,
        world_size=world_size,
    )


def get_concat_char_dataset(
    config: Dict[str, Any], global_rank: int = 0, world_size: int = 1,
    augmentor=None,
) -> ConcatDataset:
    """One char dataset per manifest, mixed by a ConcatDataset (ref :64)."""
    manifests = convert_to_config_list(config["manifest_filepath"])
    datasets = [
        get_char_dataset({**config, "manifest_filepath": m[0]}, augmentor)
        for m in manifests
    ]
    return ConcatDataset(datasets, **_concat_kwargs(config, global_rank, world_size))


def get_concat_bpe_dataset(
    config: Dict[str, Any], tokenizer, global_rank: int = 0,
    world_size: int = 1, augmentor=None,
) -> ConcatDataset:
    """One BPE dataset per manifest, mixed by a ConcatDataset (ref :152)."""
    manifests = convert_to_config_list(config["manifest_filepath"])
    datasets = [
        get_bpe_dataset({**config, "manifest_filepath": m[0]}, tokenizer, augmentor)
        for m in manifests
    ]
    return ConcatDataset(datasets, **_concat_kwargs(config, global_rank, world_size))


def get_tarred_dataset(
    config: Dict[str, Any], tokenizer=None, global_rank: int = 0,
    world_size: int = 1, augmentor=None,
):
    """Tar-sharded dataset (ref :292): char when no tokenizer is given,
    BPE otherwise.  Shards partition across `world_size` processes."""
    common = dict(
        audio_tar_filepaths=config["tarred_audio_filepaths"],
        manifest_filepath=config["manifest_filepath"],
        sample_rate=config["sample_rate"],
        shuffle_n=config.get("shuffle_n", 0),
        min_duration=config.get("min_duration"),
        max_duration=config.get("max_duration"),
        num_shards=world_size,
        shard_rank=global_rank,
        augmentor=augmentor,
    )
    if tokenizer is None:
        return TarredAudioToCharDataset(labels=config["labels"], **common)
    return TarredAudioToBPEDataset(
        tokenizer=tokenizer,
        use_start_end_token=config.get("use_start_end_token", True),
        **common,
    )


class _TokensAsText:
    """Adapter: CodeSwitchedDataset consumes items keyed `text` (the
    common-collection contract); ASR datasets emit `tokens`."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        item = dict(self.ds[idx])
        item["text"] = item.pop("tokens")
        return item


def get_code_switched_dataset(
    config: Dict[str, Any], tokenizer=None, global_rank: int = 0,
    world_size: int = 1, augmentor=None,
) -> CodeSwitchedDataset:
    """Synthetic code-switching over per-language manifests (ref :398)."""
    if "manifest_filepath" not in config:
        raise ValueError("`manifest_filepath` is missing from the dataset config")
    cs = config.get("code_switched") or {}
    manifests = convert_to_config_list(config["manifest_filepath"])
    datasets = []
    for m in manifests:
        sub = {**config, "manifest_filepath": m[0]}
        if tokenizer is None:
            datasets.append(_TokensAsText(get_char_dataset(sub, augmentor)))
        else:
            datasets.append(
                _TokensAsText(get_bpe_dataset(sub, tokenizer, augmentor))
            )
    return CodeSwitchedDataset(
        datasets,
        lang_probs=cs.get("probs"),
        shuffle=cs.get("shuffle", True),
        min_duration=cs.get("min_duration", 4.0),
        max_duration=cs.get("max_duration", 20.0),
        min_monolingual=cs.get("min_monolingual", 0.3),
        db_norm=cs.get("db_norm", -25.0),
        pause_start=cs.get("pause_start", 0),
        pause_join=cs.get("pause_join", 0),
        pause_end=cs.get("pause_end", 0),
        sampling_scales=cs.get("sampling_scales"),
        seed=cs.get("seed"),
        global_rank=global_rank,
        world_size=world_size,
        pure_random=cs.get("pure_random", False),
        force_monochannel=cs.get("force_monochannel", True),
        sample_rate=config["sample_rate"],
        augmentor=augmentor,
    )


def _validate_concat(config: Dict[str, Any]) -> bool:
    """The reference's concat-config validation (ref :611-632): returns
    False (caller yields None) on an unusable config, with a warning."""
    if (
        "concat_sampling_technique" in config
        and config["concat_sampling_technique"] is None
    ):
        get_logger().warning(
            f"Concat dataset requires `concat_sampling_technique` but it was "
            f"not provided. Config: {config}"
        )
        return False
    if config.get("concat_sampling_technique") == "random":
        probs = config.get("concat_sampling_probabilities")
        if not probs:
            get_logger().warning(
                f"Concat dataset requires `concat_sampling_probabilities` "
                f"list. Config: {config}"
            )
            return False
        if not isclose(sum(probs), 1.0, abs_tol=1e-6):
            get_logger().warning(
                f"`concat_sampling_probabilities` need to sum to 1. "
                f"Config: {config}"
            )
            return False
    return True


def _augmentor_from(config: Dict[str, Any]):
    if "augmentor" not in config:
        return None
    from roar_tpu.data.perturb import process_augmentations

    return process_augmentations(config["augmentor"])


def get_audio_to_text_char_dataset_from_config(
    config: Dict[str, Any], global_rank: int = 0, world_size: int = 1,
    local_rank: int = 0, preprocessor_cfg=None,
):
    """Char-dataset dispatch from a raw `train_ds`-style config (ref :583).

    Precedence mirrors the reference: code-switched > concat > tarred >
    plain.  Returns None (with a warning) on configs the reference also
    refuses.  `local_rank`/`preprocessor_cfg` are accepted for call-site
    parity; they only steered the dropped DALI path."""
    del local_rank, preprocessor_cfg
    augmentor = _augmentor_from(config)
    if config.get("is_code_switched", False):
        return get_code_switched_dataset(
            config, tokenizer=None, global_rank=global_rank,
            world_size=world_size, augmentor=augmentor,
        )
    if config.get("is_concat", False):
        if not _validate_concat(config):
            return None
        return get_concat_char_dataset(
            config, global_rank=global_rank, world_size=world_size,
            augmentor=augmentor,
        )
    if config.get("is_tarred", False):
        if ("tarred_audio_filepaths" in config) ^ ("manifest_filepath" in config):
            raise ValueError(
                "Tarred datasets require both `tarred_audio_filepaths` and "
                "`manifest_filepath`"
            )
        if "tarred_audio_filepaths" not in config:
            return None
        return get_tarred_dataset(
            config, tokenizer=None, global_rank=global_rank,
            world_size=world_size, augmentor=augmentor,
        )
    if "manifest_filepath" in config and config["manifest_filepath"] is None:
        get_logger().warning(
            f"Could not load dataset as `manifest_filepath` was None. "
            f"Provided config: {config}"
        )
        return None
    return get_char_dataset(config, augmentor=augmentor)


def get_audio_to_text_bpe_dataset_from_config(
    config: Dict[str, Any], tokenizer, global_rank: int = 0,
    world_size: int = 1, local_rank: int = 0, preprocessor_cfg=None,
):
    """BPE-dataset dispatch from a raw config (ref :726); same precedence
    and refusal semantics as the char builder."""
    del local_rank, preprocessor_cfg
    augmentor = _augmentor_from(config)
    if config.get("is_code_switched", False):
        return get_code_switched_dataset(
            config, tokenizer=tokenizer, global_rank=global_rank,
            world_size=world_size, augmentor=augmentor,
        )
    if config.get("is_concat", False):
        if not _validate_concat(config):
            return None
        return get_concat_bpe_dataset(
            config, tokenizer, global_rank=global_rank,
            world_size=world_size, augmentor=augmentor,
        )
    if config.get("is_tarred", False):
        if ("tarred_audio_filepaths" in config) ^ ("manifest_filepath" in config):
            raise ValueError(
                "Tarred datasets require both `tarred_audio_filepaths` and "
                "`manifest_filepath`"
            )
        if "tarred_audio_filepaths" not in config:
            return None
        return get_tarred_dataset(
            config, tokenizer=tokenizer, global_rank=global_rank,
            world_size=world_size, augmentor=augmentor,
        )
    if "manifest_filepath" in config and config["manifest_filepath"] is None:
        get_logger().warning(
            f"Could not load dataset as `manifest_filepath` was None. "
            f"Provided config: {config}"
        )
        return None
    return get_bpe_dataset(config, tokenizer, augmentor=augmentor)


_LABEL_KEYS = (
    "sample_rate", "min_duration", "max_duration", "trim",
    "window_length_in_sec", "label_key", "is_regression_task",
    "audio_multiple",
)


def get_audio_to_label_dataset_from_config(
    config: Dict[str, Any], global_rank: int = 0, world_size: int = 1,
):
    """Label-dataset builder (classification / speaker-recognition /
    regression; ref audio_to_label_dataset.py get_*_label_dataset).  Multiple
    manifests mix through ConcatDataset like the text builders."""
    if config.get("manifest_filepath") is None:
        get_logger().warning(
            f"Could not load dataset as `manifest_filepath` was None. "
            f"Provided config: {config}"
        )
        return None
    if config.get("is_tarred") or config.get("tarred_audio_filepaths"):
        from roar_tpu.data.tarred_datasets import TarredAudioToLabelDataset

        return TarredAudioToLabelDataset(
            audio_tar_filepaths=config["tarred_audio_filepaths"],
            manifest_filepath=config["manifest_filepath"],
            sample_rate=config["sample_rate"],
            labels=config.get("labels"),
            label_key=config.get("label_key", "label"),
            window_length_in_sec=config.get("window_length_in_sec"),
            shuffle_n=config.get("tarred_shard_shuffle_n", 0)
            or config.get("shuffle_n", 0),
            min_duration=config.get("min_duration"),
            max_duration=config.get("max_duration"),
            num_shards=world_size,
            shard_rank=global_rank,
        )
    del global_rank, world_size  # host sharding is the sampler's job here
    manifests = convert_to_config_list(config["manifest_filepath"])
    datasets = [
        AudioToLabelDataset(
            manifest_filepath=m[0], labels=config.get("labels"),
            **_subset(config, _LABEL_KEYS),
        )
        for m in manifests
    ]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatDataset(
        datasets,
        sampling_technique=config.get("concat_sampling_technique", "temperature"),
        sampling_probabilities=config.get("concat_sampling_probabilities"),
    )


_MULTI_LABEL_KEYS = (
    "sample_rate", "min_duration", "max_duration", "trim", "delimiter",
    "is_regression_task", "normalize_audio_db", "label_key",
    "audio_multiple", "label_multiple",
)


def get_audio_to_multi_label_dataset_from_config(
    config: Dict[str, Any], global_rank: int = 0, world_size: int = 1,
):
    """Frame-sequence label builder (per-frame VAD, multi-label
    classification; ref audio_to_label.py:895-1084 AudioToMultiLabelDataset).
    Multiple manifests mix through ConcatDataset."""
    del global_rank, world_size
    if config.get("manifest_filepath") is None:
        get_logger().warning(
            f"Could not load dataset as `manifest_filepath` was None. "
            f"Provided config: {config}"
        )
        return None
    from roar_tpu.data.asr_datasets import AudioToMultiLabelDataset

    manifests = convert_to_config_list(config["manifest_filepath"])
    datasets = [
        AudioToMultiLabelDataset(
            manifest_filepath=m[0], labels=config.get("labels"),
            **_subset(config, _MULTI_LABEL_KEYS),
        )
        for m in manifests
    ]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatDataset(
        datasets,
        sampling_technique=config.get("concat_sampling_technique", "temperature"),
        sampling_probabilities=config.get("concat_sampling_probabilities"),
    )


# ---------------------------------------------------------------------------
# Audio-to-audio builders (ref audio_to_audio_dataset.py:4-100)
# ---------------------------------------------------------------------------

_A2A_KEYS = (
    "sample_rate", "input_key", "target_key", "audio_duration",
    "min_duration", "max_duration", "audio_multiple",
)


def get_audio_to_target_dataset(config: Dict[str, Any]):
    """(input, target) audio-pair dataset for enhancement / separation
    (ref audio_to_audio_dataset.py:4-26 get_audio_to_target_dataset)."""
    from roar_tpu.data.asr_datasets import AudioToTargetDataset

    return AudioToTargetDataset(
        manifest_filepath=config["manifest_filepath"],
        **_subset(config, _A2A_KEYS),
    )


def get_audio_to_target_with_reference_dataset(config: Dict[str, Any]):
    """Adds a reference signal (e.g. enrollment audio for target-speaker
    extraction; ref audio_to_audio_dataset.py:29-55)."""
    from roar_tpu.data.asr_datasets import AudioToTargetDataset

    return AudioToTargetDataset(
        manifest_filepath=config["manifest_filepath"],
        reference_key=config.get("reference_key", "reference_filepath"),
        **_subset(config, _A2A_KEYS),
    )


def get_audio_to_target_with_embedding_dataset(config: Dict[str, Any]):
    """Adds a per-item embedding vector loaded from .npy (e.g. speaker
    d-vector; ref audio_to_audio_dataset.py:58-100)."""
    from roar_tpu.data.asr_datasets import AudioToTargetDataset

    return AudioToTargetDataset(
        manifest_filepath=config["manifest_filepath"],
        embedding_key=config.get("embedding_key", "embedding_filepath"),
        **_subset(config, _A2A_KEYS),
    )
