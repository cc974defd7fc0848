"""Audio math utilities for multi-channel processing and SDR evaluation.

Re-design of roar/collections/asr/parts/utils/audio_utils.py (select_channels
:42, sinc_unnormalized :108, theoretical/estimated coherence :120/:167,
generate_approximate_noise_field :203, transform_to_match_coherence :250,
rms/mag2db/db2mag/pow2db :335-384, get_segment_start :385,
calculate_sdr_numpy :408, convmtx :476-541, scale/convolution-invariant
targets :542-617, toeplitz :619).  Host-side numpy throughout (these are
dataset-construction and evaluation helpers, not train-step math); the STFT
pair used by the coherence transform is scipy's, replacing the reference's
librosa dependency.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Union

import numpy as np

SOUND_VELOCITY = 343.0  # m/s

ChannelSelectorType = Union[int, Iterable[int], str, None]


def select_channels(signal: np.ndarray, channel_selector: ChannelSelectorType = None) -> np.ndarray:
    """Downmix / select channels of a (..., num_channels) signal
    (audio_utils.py:42-106): None = passthrough, 'average' = mean,
    int = single channel, iterable = subset (squeezed if singleton)."""
    if signal.ndim == 1:
        if channel_selector not in (None, 0, "average"):
            raise ValueError(
                f"Input signal is one-dimensional, channel selector "
                f"({channel_selector}) cannot be used."
            )
        return signal

    num_channels = signal.shape[-1]
    if channel_selector is None:
        return signal
    if channel_selector == "average":
        return np.mean(signal, axis=-1)
    if isinstance(channel_selector, int):
        if channel_selector >= num_channels:
            raise ValueError(
                f"Cannot select channel {channel_selector} from a signal with "
                f"{num_channels} channels."
            )
        return signal[..., channel_selector]
    if isinstance(channel_selector, Iterable):
        sel = list(channel_selector)
        if max(sel) >= num_channels:
            raise ValueError(
                f"Cannot select channel subset {sel} from a signal with "
                f"{num_channels} channels."
            )
        out = signal[..., sel]
        return np.squeeze(out, axis=-1) if len(sel) == 1 else out
    raise ValueError(f"Unexpected value for channel_selector ({channel_selector})")


def sinc_unnormalized(x) -> np.ndarray:
    """sin(x)/x with sinc(0)=1 (audio_utils.py:108-118)."""
    return np.sinc(np.asarray(x) / np.pi)


# ----------------------------------------------------------------------
# Levels
# ----------------------------------------------------------------------

def rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x))))


def mag2db(mag: float, eps: float = 1e-16) -> float:
    return float(20 * np.log10(mag + eps))


def db2mag(db: float) -> float:
    return float(10 ** (db / 20))


def pow2db(power: float, eps: float = 1e-16) -> float:
    return float(10 * np.log10(power + eps))


# ----------------------------------------------------------------------
# Alignment / SDR
# ----------------------------------------------------------------------

def get_segment_start(signal: np.ndarray, segment: np.ndarray) -> int:
    """Index where `segment` begins inside `signal` via cross-correlation
    (audio_utils.py:385-406)."""
    if len(signal) <= len(segment):
        raise ValueError(
            f"segment must be shorter than signal: len(segment) = "
            f"{len(segment)}, len(signal) = {len(signal)}"
        )
    from scipy.signal import correlate

    cc = correlate(signal, segment, mode="valid")
    return int(np.argmax(cc))


def scale_invariant_target(estimate: np.ndarray, target: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    """argmin_scale ||scale*target - estimate||^2 applied to target
    (audio_utils.py:542-566)."""
    if target.ndim != 1 or estimate.ndim != 1:
        raise ValueError("Only one-dimensional inputs supported")
    scale = np.mean(estimate * target) / (np.mean(np.abs(target) ** 2) + eps)
    return scale * target


def convolution_invariant_target(
    estimate: np.ndarray,
    target: np.ndarray,
    filter_length: int,
    diag_reg: float = 1e-8,
    eps: float = 1e-10,
) -> np.ndarray:
    """Least-squares filtered target (audio_utils.py:567-617): solve the
    Toeplitz normal equations for the optimal length-L filter and filter the
    target with it."""
    if target.ndim != 1 or estimate.ndim != 1:
        raise ValueError("Only one-dimensional inputs supported")
    from scipy.linalg import toeplitz as sp_toeplitz

    n_fft = 2 ** math.ceil(math.log2(len(target) + len(estimate) - 1))
    t = np.fft.rfft(target, n=n_fft)
    e = np.fft.rfft(estimate, n=n_fft)
    tt_corr = np.fft.irfft(np.abs(t) ** 2, n=n_fft)[:filter_length]
    te_corr = np.fft.irfft(t.conj() * e, n=n_fft)[:filter_length]
    if diag_reg is not None:
        tt_corr[0] += diag_reg * tt_corr[0] + eps
    filt = np.linalg.solve(sp_toeplitz(tt_corr), te_corr)
    target_filt = np.fft.irfft(t * np.fft.rfft(filt, n=n_fft), n=n_fft)
    return target_filt[: len(target)]


def calculate_sdr(
    estimate: np.ndarray,
    target: np.ndarray,
    scale_invariant: bool = False,
    convolution_invariant: bool = False,
    convolution_filter_length: Optional[int] = None,
    remove_mean: bool = True,
    sdr_max: Optional[float] = None,
    eps: float = 1e-10,
) -> float:
    """SDR in dB, optionally SI-SDR / CI-SDR (audio_utils.py:408-462)."""
    if scale_invariant and convolution_invariant:
        raise ValueError(
            "Arguments scale_invariant and convolution_invariant cannot be "
            "used simultaneously."
        )
    if remove_mean:
        estimate = estimate - np.mean(estimate)
        target = target - np.mean(target)
    if scale_invariant or (convolution_invariant and convolution_filter_length == 1):
        target = scale_invariant_target(estimate, target, eps)
    elif convolution_invariant:
        target = convolution_invariant_target(
            estimate, target, convolution_filter_length, eps=eps
        )
    target_pow = np.mean(np.abs(target) ** 2)
    distortion_pow = np.mean(np.abs(estimate - target) ** 2)
    if sdr_max is not None:
        distortion_pow = distortion_pow + 10 ** (-sdr_max / 10) * target_pow
    return float(10 * np.log10(target_pow / (distortion_pow + eps) + eps))


# kept under the reference's name too
calculate_sdr_numpy = calculate_sdr
scale_invariant_target_numpy = scale_invariant_target
convolution_invariant_target_numpy = convolution_invariant_target


# ----------------------------------------------------------------------
# Linear-algebra helpers
# ----------------------------------------------------------------------

def toeplitz(x: np.ndarray) -> np.ndarray:
    """Symmetric Toeplitz matrices from the last axis (audio_utils.py:619-630):
    out[..., i, j] = x[..., |i-j|]."""
    length = x.shape[-1]
    idx = np.abs(np.arange(length)[:, None] - np.arange(length)[None, :])
    return x[..., idx]


def convmtx(x: np.ndarray, filter_length: int, delay: int = 0, n_steps: Optional[int] = None) -> np.ndarray:
    """Convolution matrix for a single-channel signal (audio_utils.py:476-510):
    row t holds x[t + delay - k] for k in [0, filter_length)."""
    if n_steps is None:
        n_steps = len(x)
    out = np.zeros((n_steps, filter_length), x.dtype)
    for k in range(filter_length):
        for t in range(n_steps):
            src = t + delay - k
            if 0 <= src < len(x):
                out[t, k] = x[src]
    return out


def convmtx_mc(x: np.ndarray, filter_length: int, delay: int = 0, n_steps: Optional[int] = None) -> np.ndarray:
    """Multi-channel convolution matrix (audio_utils.py:511-541): channel
    blocks concatenated along columns."""
    return np.concatenate(
        [convmtx(x[:, m], filter_length, delay, n_steps) for m in range(x.shape[1])],
        axis=1,
    )


def wrap_to_pi(x: np.ndarray) -> np.ndarray:
    """Wrap angles to [-pi, pi) (audio_utils.py:463-475)."""
    return ((np.asarray(x) + np.pi) % (2 * np.pi)) - np.pi


# ----------------------------------------------------------------------
# Spatial coherence (multi-mic noise-field simulation)
# ----------------------------------------------------------------------

def theoretical_coherence(
    mic_positions: np.ndarray,
    sample_rate: float,
    field: str = "spherical",
    fft_length: int = 512,
    sound_velocity: float = SOUND_VELOCITY,
) -> np.ndarray:
    """Diffuse-field coherence matrix per subband (audio_utils.py:120-165)."""
    if mic_positions.shape[1] != 3:
        raise ValueError("Expecting 3D microphone positions")
    num_mics = mic_positions.shape[0]
    if num_mics < 2:
        raise ValueError(f"Expecting at least 2 microphones, received {num_mics}")
    if field != "spherical":
        raise ValueError(f"Unknown noise field {field}.")

    num_subbands = fft_length // 2 + 1
    angular_freq = 2 * np.pi * sample_rate * np.arange(num_subbands) / fft_length
    diff = mic_positions[:, None, :] - mic_positions[None, :, :]
    dist = np.sqrt(np.sum(diff**2, axis=-1))  # [M, M]
    coh = sinc_unnormalized(angular_freq[:, None, None] * dist[None] / sound_velocity)
    return coh


def estimated_coherence(S: np.ndarray, eps: float = 1e-16) -> np.ndarray:
    """Complex coherence of an STFT (subband, frame, channel)
    (audio_utils.py:167-201)."""
    if S.ndim != 3:
        raise RuntimeError("Expecting the input STFT to be a 3D array")
    if S.shape[2] < 2:
        raise ValueError("Expecting at least 2 microphones")
    psd = np.mean(np.abs(S) ** 2, axis=1)  # [F, M]
    cross = np.einsum("ftp,ftq->fpq", S, np.conjugate(S)) / S.shape[1]
    denom = np.sqrt(psd[:, :, None] * psd[:, None, :] + eps)
    coh = cross / denom
    idx = np.arange(S.shape[2])
    coh[:, idx, idx] = 1.0
    return coh


def transform_to_match_coherence(
    signal: np.ndarray,
    desired_coherence: np.ndarray,
    method: str = "cholesky",
    ref_channel: int = 0,
    corrcoef_threshold: float = 0.2,
) -> np.ndarray:
    """Mix independent channels so their coherence matches `desired_coherence`
    (audio_utils.py:250-334; Habets et al. 2008).  signal: (samples, mics)."""
    from scipy.signal import istft as sp_istft
    from scipy.signal import stft as sp_stft

    num_channels = signal.shape[1]
    num_subbands = desired_coherence.shape[0]
    if desired_coherence.shape[1:] != (num_channels, num_channels):
        raise ValueError("desired_coherence shape mismatch")
    fft_length = 2 * (num_subbands - 1)

    signal = signal - np.mean(signal, axis=0)
    power = np.mean(np.abs(signal) ** 2, axis=0)
    signal = signal * np.sqrt(power[ref_channel]) / np.sqrt(power)

    corr = np.corrcoef(signal.T)
    np.fill_diagonal(corr, 0.0)
    if np.any(np.abs(corr) > corrcoef_threshold):
        raise RuntimeError(
            f"Input channels are correlated above the threshold "
            f"{corrcoef_threshold}."
        )

    _, _, S = sp_stft(
        signal.T, nperseg=fft_length, noverlap=3 * fft_length // 4, window="hann"
    )  # [M, F, T]
    S = S.transpose(1, 2, 0)  # [F, T, M]

    if method == "cholesky":
        a = np.linalg.cholesky(desired_coherence[1:]).swapaxes(1, 2)
    elif method == "evd":
        w, v = np.linalg.eigh(desired_coherence[1:])
        a = (np.sqrt(np.maximum(w, 0.0))[:, None, :] * v).swapaxes(1, 2)
    else:
        raise ValueError(f"Unknown method {method}")

    X = np.zeros_like(S)
    X[1:] = np.matmul(S[1:], a)
    _, x = sp_istft(
        X.transpose(2, 0, 1), nperseg=fft_length, noverlap=3 * fft_length // 4,
        window="hann",
    )
    return x[:, : len(signal)].T


def generate_approximate_noise_field(
    mic_positions: np.ndarray,
    noise_signal: np.ndarray,
    sample_rate: float,
    field: str = "spherical",
    fft_length: int = 512,
    method: str = "cholesky",
    sound_velocity: float = SOUND_VELOCITY,
) -> np.ndarray:
    """Spatially-coherent noise field from independent channels
    (audio_utils.py:203-248)."""
    if fft_length % 2:
        raise ValueError("fft_length must be even")
    coh = theoretical_coherence(
        mic_positions, sample_rate=sample_rate, field=field,
        fft_length=fft_length, sound_velocity=sound_velocity,
    )
    return transform_to_match_coherence(noise_signal, coh, method=method)
