"""TPU-native DSP / alignment ops."""

from roar_tpu.ops.spectrogram import (  # noqa: F401
    MelConfig,
    frame_energy,
    frame_signal,
    get_window,
    hz_to_mel,
    log_mel_spectrogram,
    mel_filterbank,
    mel_frequencies,
    mel_to_hz,
    normalize_batch,
    preemphasis,
    stft_frame_count,
    stft_magnitude,
)
from roar_tpu.ops.priors import (  # noqa: F401
    BetaBinomialInterpolator,
    beta_binomial_prior,
    beta_binomial_prior_np,
)
from roar_tpu.ops.mas import binarize_attention, mas_width1  # noqa: F401
from roar_tpu.ops.lengths import (  # noqa: F401
    average_features,
    log_to_duration,
    mask_from_lens,
    rand_slice_segments,
    regulate_len,
    slice_segments,
)
from roar_tpu.ops.forward_sum import (  # noqa: F401
    bin_loss,
    ctc_forward_sum,
    forward_sum_loss,
)
from roar_tpu.ops.clustering import (  # noqa: F401
    NMESC,
    SpeakerClustering,
    SpectralClustering,
    cos_affinity,
    kmeans,
)
