"""Data pipeline: manifests, tokenizers, audio IO, sup-data, datasets."""

from roar_tpu.data.audio import AudioSegment, read_wav, resample, trim_silence, write_wav  # noqa: F401
from roar_tpu.data.audio_trimming import (  # noqa: F401
    AudioTrimmer,
    EnergyAudioTrimmer,
    VadAudioTrimmer,
    normalize_volume,
)
from roar_tpu.data.dataset import (  # noqa: F401
    BucketSpec,
    MixerTTSXDataset,
    PairedRealFakeSpectrogramsDataset,
    TTSDataset,
    VocoderDataset,
)
from roar_tpu.data.concat_dataset import (  # noqa: F401
    CodeSwitchedDataset,
    ConcatDataset,
    ConcatMapDataset,
)
from roar_tpu.data.ssl_dataset import FastPitchSSLDataset  # noqa: F401
from roar_tpu.data.manifest import filter_by_duration, read_manifest, write_manifest  # noqa: F401
from roar_tpu.data.sampling import LengthBucketBatchSampler, weighted_indices  # noqa: F401
from roar_tpu.data.sup_data import (  # noqa: F401
    SUP_DATA_TYPES,
    SupDataConfig,
    SupDataExtractor,
    pitch_statistics,
)
from roar_tpu.data import ipa_lexicon, tokenizers  # noqa: F401
from roar_tpu.data.asr_datasets import (  # noqa: F401
    AudioToBPEDataset,
    AudioToCharDataset,
    AudioToLabelDataset,
    AudioToTargetDataset,
    CharParser,
)
from roar_tpu.data.asr_builders import (  # noqa: F401
    convert_to_config_list,
    get_audio_to_label_dataset_from_config,
    get_audio_to_text_bpe_dataset_from_config,
    get_audio_to_text_char_dataset_from_config,
)
from roar_tpu.data import audio_utils, speaker_utils  # noqa: F401
from roar_tpu.data import cleaners  # noqa: F401
from roar_tpu.data.parsers import ENCharParser, RUCharParser, make_parser  # noqa: F401
from roar_tpu.data.vocoder_dataset import DatasetMeta, VocoderDataset as NewVocoderDataset  # noqa: F401
