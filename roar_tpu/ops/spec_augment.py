"""SpecAugment / SpecCutout as vectorized JAX ops.

The reference uses a Numba CUDA kernel for SpecAugment
(roar/collections/asr/parts/numba/spec_augment.py:12-260) plus a pure-torch
TTS variant (tts/parts/submodules/spectr_augment.py:11-160).  On TPU the
masks are generated vectorized inside jit — no kernel needed
(SURVEY.md §2.9 #3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spec_augment(
    rng: jax.Array,
    spec: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    freq_masks: int = 2,
    time_masks: int = 2,
    freq_width: int = 27,
    time_width: int = 100,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """spec: [B, F, T].  Applies `freq_masks` random frequency bands and
    `time_masks` random time bands per utterance."""
    b, f, t = spec.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    keys = jax.random.split(rng, 4)

    def band_mask(key_start, key_width, size, n_masks, max_width, upper):
        # [B, n_masks] starts/widths -> [B, size] boolean "masked" map
        starts = (
            jax.random.uniform(key_start, (b, n_masks)) * jnp.maximum(upper, 1)[:, None]
        ).astype(jnp.int32)
        widths = jax.random.randint(key_width, (b, n_masks), 0, max_width + 1)
        idx = jnp.arange(size)[None, None, :]
        inside = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
        return jnp.any(inside, axis=1)  # [B, size]

    fmask = band_mask(
        keys[0], keys[1], f, freq_masks, freq_width, jnp.full((b,), f - freq_width)
    )
    tmask = band_mask(
        keys[2], keys[3], t, time_masks, time_width,
        jnp.maximum(lengths - time_width, 1),
    )
    masked = fmask[:, :, None] | tmask[:, None, :]
    return jnp.where(masked, mask_value, spec)


def spec_cutout(
    rng: jax.Array,
    spec: jnp.ndarray,
    rect_masks: int = 5,
    rect_freq: int = 20,
    rect_time: int = 25,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Random rectangles (SpecCutout), spec: [B, F, T]."""
    b, f, t = spec.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    f0 = jax.random.randint(k1, (b, rect_masks), 0, max(f - rect_freq, 1))
    t0 = jax.random.randint(k2, (b, rect_masks), 0, max(t - rect_time, 1))
    fw = jax.random.randint(k3, (b, rect_masks), 0, rect_freq + 1)
    tw = jax.random.randint(k4, (b, rect_masks), 0, rect_time + 1)
    fi = jnp.arange(f)[None, None, :]
    ti = jnp.arange(t)[None, None, :]
    in_f = (fi >= f0[..., None]) & (fi < (f0 + fw)[..., None])  # [B, R, F]
    in_t = (ti >= t0[..., None]) & (ti < (t0 + tw)[..., None])  # [B, R, T]
    rects = jnp.any(in_f[:, :, :, None] & in_t[:, :, None, :], axis=1)  # [B, F, T]
    return jnp.where(rects, mask_value, spec)
