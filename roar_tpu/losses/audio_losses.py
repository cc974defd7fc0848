"""Time-domain audio losses: SDR / SI-SDR (speech enhancement).

Re-design of roar/collections/asr/losses/audio_losses.py (`SDRLoss`,
:301): negative (scale-invariant) signal-to-distortion ratio with length
masking, averaged over batch/channels.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from roar_tpu.ops.lengths import mask_from_lens


def _masked(x, lens):
    if lens is None:
        return x, None
    mask = mask_from_lens(lens, x.shape[-1]).astype(x.dtype)
    return x * mask, mask


def sdr(
    estimate: jnp.ndarray,
    target: jnp.ndarray,
    lens: Optional[jnp.ndarray] = None,
    scale_invariant: bool = False,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """[B, T] (or [B, C, T]) -> [B] (or [B, C]) SDR in dB."""
    estimate, _ = _masked(estimate, lens)
    target, _ = _masked(target, lens)
    if scale_invariant:
        alpha = jnp.sum(estimate * target, axis=-1, keepdims=True) / (
            jnp.sum(jnp.square(target), axis=-1, keepdims=True) + eps
        )
        target = alpha * target
    noise = estimate - target
    ratio = (jnp.sum(jnp.square(target), axis=-1) + eps) / (
        jnp.sum(jnp.square(noise), axis=-1) + eps
    )
    return 10.0 * jnp.log10(ratio)


def sdr_loss(estimate, target, lens=None, scale_invariant: bool = False) -> jnp.ndarray:
    """Negative mean SDR (the training objective)."""
    return -jnp.mean(sdr(estimate, target, lens, scale_invariant))


def si_sdr_loss(estimate, target, lens=None) -> jnp.ndarray:
    return sdr_loss(estimate, target, lens, scale_invariant=True)
