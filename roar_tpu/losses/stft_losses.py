"""STFT-domain losses: spectral convergence, log-magnitude, multi-resolution.

Re-design of roar/collections/tts/losses/stftlosses.py:35-230
(SpectralConvergenceLoss, LogSTFTMagnitudeLoss, STFTLoss,
MultiResolutionSTFTLoss) and roarloss.py:20-200 (MaskedMAE/MSE,
TimeDomainLoss, MultiResolutionMelLoss) on the on-device STFT/mel ops.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from roar_tpu.ops.lengths import mask_from_lens
from roar_tpu.ops.spectrogram import mel_filterbank, stft_magnitude


def spectral_convergence_loss(mag_pred: jnp.ndarray, mag_tgt: jnp.ndarray) -> jnp.ndarray:
    """||Y - X||_F / ||Y||_F."""
    num = jnp.sqrt(jnp.sum(jnp.square(mag_tgt - mag_pred)))
    den = jnp.sqrt(jnp.sum(jnp.square(mag_tgt)))
    return num / jnp.maximum(den, 1e-8)


def log_stft_magnitude_loss(mag_pred: jnp.ndarray, mag_tgt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.abs(jnp.log(jnp.maximum(mag_tgt, 1e-7)) - jnp.log(jnp.maximum(mag_pred, 1e-7)))
    )


def stft_loss(
    audio_pred: jnp.ndarray,
    audio_tgt: jnp.ndarray,
    fft_size: int = 1024,
    hop_size: int = 120,
    win_length: int = 600,
    window: str = "hann",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (spectral_convergence, log_magnitude) for one resolution."""
    mag_p = stft_magnitude(audio_pred, fft_size, hop_size, win_length, window)
    mag_t = stft_magnitude(audio_tgt, fft_size, hop_size, win_length, window)
    return spectral_convergence_loss(mag_p, mag_t), log_stft_magnitude_loss(mag_p, mag_t)


DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def multi_resolution_stft_loss(
    audio_pred: jnp.ndarray,
    audio_tgt: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean spectral convergence, mean log magnitude) over resolutions."""
    sc_total, mag_total = 0.0, 0.0
    for fft, hop, win in resolutions:
        sc, mg = stft_loss(audio_pred, audio_tgt, fft, hop, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mg
    n = len(resolutions)
    return sc_total / n, mag_total / n


def multi_resolution_mel_loss(
    audio_pred: jnp.ndarray,
    audio_tgt: jnp.ndarray,
    sample_rate: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> jnp.ndarray:
    """L1 between log-mels at several STFT resolutions
    (roarloss.py MultiResolutionMelLoss, used by RoarTTS/BigVGAN)."""
    total = 0.0
    for fft, hop, win in resolutions:
        fb = jnp.asarray(mel_filterbank(sample_rate, fft, n_mels, fmin, fmax))
        mag_p = stft_magnitude(audio_pred, fft, hop, win)
        mag_t = stft_magnitude(audio_tgt, fft, hop, win)
        mel_p = jnp.log(jnp.einsum("mf,bft->bmt", fb, mag_p) + 1e-5)
        mel_t = jnp.log(jnp.einsum("mf,bft->bmt", fb, mag_t) + 1e-5)
        total = total + jnp.mean(jnp.abs(mel_p - mel_t))
    return total / len(resolutions)


def masked_mae_loss(pred, target, lens) -> jnp.ndarray:
    """Length-masked mean absolute error over [B, ..., T] (roarloss MaskedMAE)."""
    mask = mask_from_lens(lens, target.shape[-1]).astype(pred.dtype)
    while mask.ndim < pred.ndim:
        mask = mask[:, None]
    err = jnp.abs(pred - target) * mask
    denom = jnp.sum(mask) * (np.prod(pred.shape) / np.prod(mask.shape))
    return jnp.sum(err) / jnp.maximum(denom, 1.0)


def masked_mse_loss(pred, target, lens) -> jnp.ndarray:
    mask = mask_from_lens(lens, target.shape[-1]).astype(pred.dtype)
    while mask.ndim < pred.ndim:
        mask = mask[:, None]
    err = jnp.square(pred - target) * mask
    denom = jnp.sum(mask) * (np.prod(pred.shape) / np.prod(mask.shape))
    return jnp.sum(err) / jnp.maximum(denom, 1.0)


def time_domain_loss(audio_pred, audio_tgt, lens=None) -> jnp.ndarray:
    """L1 on waveforms, optionally length-masked (roarloss TimeDomainLoss)."""
    if lens is None:
        return jnp.mean(jnp.abs(audio_pred - audio_tgt))
    return masked_mae_loss(audio_pred, audio_tgt, lens)
