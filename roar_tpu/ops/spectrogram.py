"""STFT / mel-spectrogram front-end, TPU-first.

Re-implements the semantics of the reference mel pipeline
(roar/collections/asr/parts/preprocessing/features.py:196-461 `FilterbankFeatures`)
as pure-functional JAX: framed STFT expressed as one windowed-DFT matmul
(MXU-friendly; XLA fuses magnitude/power/mel/log around it), a
librosa-compatible slaney mel filterbank built host-side in numpy, and the
exact log-zero-guard / normalization / masking behavior of the reference.

Design notes (TPU):
- The STFT is `frames @ (window * DFT)` — a single [B*T, n_fft] x [n_fft, 2F]
  matmul that tiles directly onto the MXU instead of an FFT butterfly that XLA
  cannot fuse.  For TTS-scale n_fft (1024-2048) the matmul formulation is at
  or above FFT speed on TPU and fuses with the downstream mel matmul.
- All shapes are static; variable audio length is handled by caller-side
  bucketing plus the `lengths` mask, mirroring get_seq_len
  (features.py:368-378).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible, built host-side with numpy)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies: np.ndarray, htk: bool = False) -> np.ndarray:
    """Convert Hz to mels (slaney formula by default, as librosa)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    """Convert mels to Hz (inverse of :func:`hz_to_mel`)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.where(log_region, mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float, htk: bool = False) -> np.ndarray:
    mels = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels)
    return mel_to_hz(mels, htk)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    norm: Optional[str] = "slaney",
    htk: bool = False,
    dtype: np.dtype = np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, [n_mels, 1 + n_fft // 2].

    Matches ``librosa.filters.mel`` (consumed by the reference at
    features.py:298-308) including slaney area normalization.
    """
    if fmax is None:
        fmax = float(sample_rate) / 2
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, float(sample_rate) / 2, n_freqs)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax, htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f.reshape(-1, 1) - fftfreqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm.reshape(-1, 1)
    elif norm is not None:
        raise ValueError(f"Unsupported mel norm: {norm!r}")

    return weights.astype(dtype)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

_WINDOW_FNS = {}


def _register_window(name):
    def deco(fn):
        _WINDOW_FNS[name] = fn
        return fn

    return deco


def _cosine_sum_window(coeffs, win_length: int) -> np.ndarray:
    """Symmetric generalized-cosine window (periodic=False torch semantics)."""
    if win_length == 1:
        return np.ones(1)
    n = np.arange(win_length, dtype=np.float64)
    x = 2 * np.pi * n / (win_length - 1)
    out = np.zeros(win_length)
    for k, a in enumerate(coeffs):
        out += a * np.cos(k * x) * ((-1) ** k)
    return out


@_register_window("hann")
def _hann(win_length):
    return _cosine_sum_window([0.5, 0.5], win_length)


@_register_window("hamming")
def _hamming(win_length):
    # torch.hamming_window defaults: alpha=0.54, beta=0.46
    return _cosine_sum_window([0.54, 0.46], win_length)


@_register_window("blackman")
def _blackman(win_length):
    return _cosine_sum_window([0.42, 0.5, 0.08], win_length)


@_register_window("bartlett")
def _bartlett(win_length):
    n = np.arange(win_length, dtype=np.float64)
    return 1.0 - np.abs(2.0 * n / (win_length - 1) - 1.0)


@_register_window("none")
def _rect(win_length):
    return np.ones(win_length)


def get_window(window: str, win_length: int) -> np.ndarray:
    """Symmetric window matching torch.hann_window(periodic=False) et al.

    (features.py:267-277 builds the same symmetric windows.)
    """
    if window not in _WINDOW_FNS:
        raise ValueError(f"Unsupported window {window!r}; options: {sorted(_WINDOW_FNS)}")
    return _WINDOW_FNS[window](win_length)


# ---------------------------------------------------------------------------
# Framed STFT as a windowed-DFT matmul
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _windowed_dft_matrix(
    n_fft: int, win_length: int, window: str
) -> np.ndarray:
    """[n_fft, 2 * n_freqs] matrix computing windowed rDFT (real | imag).

    The window (zero-padded centered to n_fft, exactly as torch.stft pads
    win_length < n_fft windows) is folded into the DFT basis so the whole
    STFT is one matmul.
    """
    n_freqs = 1 + n_fft // 2
    win = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    win[left : left + win_length] = get_window(window, win_length)

    n = np.arange(n_fft, dtype=np.float64).reshape(-1, 1)
    k = np.arange(n_freqs, dtype=np.float64).reshape(1, -1)
    angle = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (win.reshape(-1, 1) * basis).astype(np.float32)


def stft_frame_count(num_samples, n_fft: int, hop_length: int, pad_amount: int):
    """floor((len + 2*pad - n_fft)/hop) + 1 — get_seq_len (features.py:368-378)."""
    return (num_samples + 2 * pad_amount - n_fft) // hop_length + 1


def _reflect_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[B, S] (already padded) -> [B, T, n_fft] overlapping frames.

    When hop divides n_fft, frame t is the concatenation of K = n_fft/hop
    hop-sized slabs starting at t*hop, so framing becomes K static slices +
    reshapes — 2.4x faster than the strided gather on TPU (13 ms vs 31 ms
    for the full mel front-end at B32 x 864 frames, measured on v5e).
    Falls back to the gather otherwise."""
    num_frames = (x.shape[-1] - n_fft) // hop_length + 1
    if num_frames > 0 and n_fft % hop_length == 0:
        k_slabs = n_fft // hop_length
        span = num_frames * hop_length
        cols = [
            x[..., k * hop_length : k * hop_length + span].reshape(
                *x.shape[:-1], num_frames, hop_length
            )
            for k in range(k_slabs)
        ]
        return jnp.concatenate(cols, axis=-1)
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    exact_pad: bool = False,
    mag_eps: float = 0.0,
) -> jnp.ndarray:
    """Magnitude STFT, [B, n_freqs, T]; torch.stft-compatible framing.

    center=True reflect-pads n_fft//2 both sides (torch.stft default);
    exact_pad reflect-pads (n_fft - hop)//2 with center=False
    (features.py:261-263, 387-390).  `mag_eps` is the sqrt guard used when
    gradients flow through (features.py:409-410, `use_grads`).
    """
    if x.ndim == 1:
        x = x[None]
    if exact_pad:
        pad = (n_fft - hop_length) // 2
        x = _reflect_pad_1d(x, pad)
    elif center:
        x = _reflect_pad_1d(x, n_fft // 2)

    frames = frame_signal(x, n_fft, hop_length)  # [B, T, n_fft]
    basis = jnp.asarray(_windowed_dft_matrix(n_fft, win_length, window))
    # HIGHEST precision: on TPU the default fp32 matmul rounds through
    # bfloat16, which is far below the bit-parity bar for the mel pipeline
    # (SURVEY.md §7 hard part 5).  HIGHEST selects the fp32-accurate pass.
    proj = jax.lax.dot_general(
        frames,
        basis,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, T, 2F]
    n_freqs = 1 + n_fft // 2
    re, im = proj[..., :n_freqs], proj[..., n_freqs:]
    mag = jnp.sqrt(re * re + im * im + mag_eps)
    return jnp.transpose(mag, (0, 2, 1))  # [B, F, T]


# ---------------------------------------------------------------------------
# Log-mel front-end (FilterbankFeatures parity)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Configuration mirroring FilterbankFeatures' constructor
    (features.py:201-228) with the same defaults."""

    sample_rate: int = 16000
    n_window_size: int = 320
    n_window_stride: int = 160
    window: str = "hann"
    normalize: Optional[str] = "per_feature"
    n_fft: Optional[int] = None
    preemph: Optional[float] = 0.97
    nfilt: int = 64
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    log: bool = True
    log_zero_guard_type: str = "add"
    log_zero_guard_value: float = 2 ** -24
    dither: float = 1e-5
    pad_to: int = 16
    exact_pad: bool = False
    pad_value: float = 0.0
    mag_power: float = 2.0
    mel_norm: Optional[str] = "slaney"
    use_grads: bool = False

    def __post_init__(self):
        if self.exact_pad and self.n_window_stride % 2 == 1:
            raise ValueError("exact_pad requires an even hop size")
        if self.log_zero_guard_type not in ("add", "clamp"):
            raise ValueError(f"bad log_zero_guard_type {self.log_zero_guard_type!r}")

    @property
    def win_length(self) -> int:
        return self.n_window_size

    @property
    def hop_length(self) -> int:
        return self.n_window_stride

    @property
    def fft_length(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.win_length))

    @property
    def pad_amount(self) -> int:
        if self.exact_pad:
            return (self.fft_length - self.hop_length) // 2
        return self.fft_length // 2

    def get_seq_len(self, num_samples):
        return stft_frame_count(num_samples, self.fft_length, self.hop_length, self.pad_amount)

    def filterbank(self) -> np.ndarray:
        return mel_filterbank(
            self.sample_rate,
            self.fft_length,
            self.nfilt,
            fmin=self.lowfreq,
            fmax=self.highfreq or self.sample_rate / 2.0,
            norm=self.mel_norm,
        )


def preemphasis(x: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """x[t] - coeff * x[t-1], first sample kept (features.py:397-400)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def normalize_batch(
    x: jnp.ndarray, seq_len: jnp.ndarray, normalize_type: str, eps: float = 1e-5
) -> jnp.ndarray:
    """Per-utterance feature normalization over valid frames.

    Matches NeMo normalize_batch semantics (unbiased std, +1e-5 guard).
    x: [B, C, T]; seq_len: [B].
    """
    t = x.shape[-1]
    valid = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(x.dtype)  # [B, T]
    n = jnp.maximum(seq_len.astype(x.dtype), 1.0)
    if normalize_type == "per_feature":
        mask = valid[:, None, :]
        mean = jnp.sum(x * mask, axis=-1, keepdims=True) / n[:, None, None]
        var = jnp.sum(jnp.square(x - mean) * mask, axis=-1, keepdims=True)
        std = jnp.sqrt(var / jnp.maximum(n - 1.0, 1.0)[:, None, None])
        return (x - mean) / (std + eps)
    elif normalize_type == "all_features":
        mask = valid[:, None, :]
        c = x.shape[1]
        cnt = n * c
        mean = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / cnt[:, None, None]
        var = jnp.sum(jnp.square(x - mean) * mask, axis=(1, 2), keepdims=True)
        std = jnp.sqrt(var / jnp.maximum(cnt - 1.0, 1.0)[:, None, None])
        return (x - mean) / (std + eps)
    else:
        raise ValueError(f"Unsupported normalize_type: {normalize_type!r}")


def log_mel_spectrogram(
    audio: jnp.ndarray,
    audio_lens: jnp.ndarray,
    cfg: MelConfig,
    *,
    training: bool = False,
    dither_rng: Optional[jax.Array] = None,
    linear_spec: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav -> (log-)mel spectrogram with reference semantics.

    Mirrors FilterbankFeatures.forward (features.py:384-461): dither ->
    preemphasis -> STFT magnitude -> power -> mel matmul -> log guard ->
    normalize -> mask + pad_to.  Returns ([B, nfilt, T], [B] frame lengths).
    """
    if audio.ndim == 1:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    seq_len = cfg.get_seq_len(audio_lens)

    x = audio
    if training and cfg.dither > 0 and dither_rng is not None:
        x = x + cfg.dither * jax.random.normal(dither_rng, x.shape, x.dtype)

    if cfg.preemph is not None:
        x = preemphasis(x, cfg.preemph)

    mag = stft_magnitude(
        x,
        n_fft=cfg.fft_length,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=cfg.window,
        center=not cfg.exact_pad,
        exact_pad=cfg.exact_pad,
        mag_eps=1e-5 if cfg.use_grads else 0.0,
    )  # [B, F, T]

    if cfg.mag_power != 1.0:
        mag = jnp.power(mag, cfg.mag_power)

    if linear_spec:
        return mag, seq_len

    fb = jnp.asarray(cfg.filterbank())  # [nfilt, F]
    mel = jax.lax.dot_general(
        fb,
        mag,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [nfilt, B, T]
    mel = jnp.transpose(mel, (1, 0, 2))  # [B, nfilt, T]

    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            mel = jnp.log(mel + cfg.log_zero_guard_value)
        else:
            mel = jnp.log(jnp.clip(mel, min=cfg.log_zero_guard_value))

    if cfg.normalize:
        mel = normalize_batch(mel, seq_len, cfg.normalize)

    # mask beyond seq_len, then pad time axis to a multiple of pad_to
    t = mel.shape[-1]
    mask = jnp.arange(t)[None, None, :] < seq_len[:, None, None]
    mel = jnp.where(mask, mel, cfg.pad_value)
    if isinstance(cfg.pad_to, int) and cfg.pad_to > 0:
        rem = t % cfg.pad_to
        if rem != 0:
            mel = jnp.pad(
                mel,
                ((0, 0), (0, 0), (0, cfg.pad_to - rem)),
                constant_values=cfg.pad_value,
            )
    return mel, seq_len


def frame_energy(
    audio: jnp.ndarray,
    cfg: MelConfig,
) -> jnp.ndarray:
    """Per-frame energy = L2 norm of the magnitude STFT over frequency.

    Matches the reference sup-data energy (dataset.py:751-753: linalg.norm of
    get_spec, where get_spec is |STFT| with the dataset's window — no
    preemphasis, no power).
    """
    mag = stft_magnitude(
        audio,
        n_fft=cfg.fft_length,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=cfg.window,
        center=True,
    )
    return jnp.sqrt(jnp.sum(jnp.square(mag), axis=1))
