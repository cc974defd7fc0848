"""Spectrogram-enhancer GAN losses.

Parity with roar/collections/tts/losses/spectrogram_enhancer_losses.py:9-69:
R1 gradient penalty, hinge discriminator loss (reference sign convention:
real -> -1, fake -> +1), generator loss = mean fake logits, and the
quarter-mel-scale L1 consistency loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roar_tpu.ops.lengths import mask_from_lens


def generator_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(fake_logits)


def hinge_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.relu(1.0 + real_logits) + jax.nn.relu(1.0 - fake_logits))


def gradient_penalty_loss(disc_fn, images: jnp.ndarray, weight: float = 10.0) -> jnp.ndarray:
    """R1 penalty: ||d D(x) / d x||^2 -> 1 (spectrogram_enhancer_losses.py:9-33)."""

    def scalar_out(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_out)(images)
    b = images.shape[0]
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    return weight * jnp.mean(jnp.square(norms - 1.0))


def _downsample_2x2_avg(x: jnp.ndarray, factor_h: int, factor_w: int) -> jnp.ndarray:
    """Cheap antialiased downsample by average pooling (stand-in for the
    reference's bilinear interpolate)."""
    b, h, w, c = x.shape
    h2, w2 = h // factor_h * factor_h, w // factor_w * factor_w
    x = x[:, :h2, :w2]
    x = x.reshape(b, h2 // factor_h, factor_h, w2 // factor_w, factor_w, c)
    return x.mean(axis=(2, 4))


def consistency_loss(
    condition: jnp.ndarray,
    output: jnp.ndarray,
    lengths: jnp.ndarray,
    weight: float = 10.0,
) -> jnp.ndarray:
    """L1 distance on a 4x-coarser mel scale, length-masked
    (spectrogram_enhancer_losses.py:45-69).

    condition/output: [B, n_mel, T, 1] image layout (freq = height).
    """
    cond = _downsample_2x2_avg(condition, 4, 1)
    out = _downsample_2x2_avg(output, 4, 1)
    dist = jnp.abs(cond - out)  # [B, M/4, T, 1]
    t = dist.shape[2]
    mask = mask_from_lens(lengths, t).astype(dist.dtype)[:, None, :, None]
    dist = dist * mask
    per = jnp.sum(dist, axis=2) / jnp.maximum(lengths.astype(dist.dtype), 1.0)[:, None, None]
    return weight * jnp.mean(jnp.sum(per, axis=-1))
