"""Rotary position embeddings (RoPE), pure JAX.

The reference applies RoPE through an external fused CUDA extension
(`rotary_emb`, roar/collections/nlp/parts/submodules/positional_encodings.py:3-80,
cache built by build_rope_cache, tts/parts/utils/helpers.py:999-1031).  On
TPU the elementwise rotation fuses into the surrounding matmuls under XLA, so
a plain jnp implementation is already "fused" — no kernel needed
(SURVEY.md §2.9 #5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: float = 10000.0,
    condense_ratio: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) caches of shape [seq_len, n_elem // 2].

    condense_ratio > 1 implements position-interpolation context extension
    (the reference Config's rope_condense_ratio; positions are divided so a
    16k window reuses the 2k-trained rotation range)."""
    theta = 1.0 / (base ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))
    seq = np.arange(seq_len, dtype=np.float64) / condense_ratio
    angles = np.outer(seq, theta)  # [T, n_elem/2]
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs of head-dim channels.

    x: [B, T, H, D] (D even); cos/sin: [T, D/2].
    """
    d = x.shape[-1]
    x1 = x[..., : d // 2]
    x2 = x[..., d // 2 :]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)
