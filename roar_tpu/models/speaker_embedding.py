"""Speaker-embedding encoder (TitaNet/ECAPA-style) for diarization.

The reference's diarization stack (asr/parts/utils/speaker_utils.py,
offline_clustering.py) assumes an external speaker-embedding model that its
own tree never ships (its asr/models holds only enhancement models).  This
module supplies a working TPU-native extractor so the clustering-based
diarizer (`examples/speaker_tasks/diarize.py`) runs end-to-end:

- 1D depthwise-separable conv blocks with residuals and squeeze-excitation
  channel gating (ECAPA/TitaNet block shape) — all channels-last convs, so
  XLA lowers them to MXU matmuls;
- attentive statistics pooling: a small attention MLP produces per-frame
  weights, the utterance embeds as the weighted (mean ‖ std) over valid
  frames (masked, static shapes under jit);
- final linear -> L2-normalized embedding (cosine-ready for NME-SC
  clustering, ops/clustering.py).

For deterministic pipeline tests (and as a no-training baseline) the
module-level `spectral_embedding` computes a masked mean+std log-mel
signature with the same interface.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _masked_mean_std(x, mask, eps=1e-8):
    """x: [B, T, C]; mask: [B, T, 1] in x.dtype. Returns ([B, C], [B, C])."""
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    mean = jnp.sum(x * mask, axis=1) / denom
    var = jnp.sum(((x - mean[:, None, :]) ** 2) * mask, axis=1) / denom
    return mean, jnp.sqrt(var + eps)


class SqueezeExcite(nn.Module):
    """Channel gating from the masked time-average (ECAPA SE block)."""

    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x, mask):
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        s = jnp.sum(x * mask, axis=1) / denom  # [B, C]
        s = nn.relu(nn.Dense(max(self.channels // self.reduction, 4))(s))
        s = nn.sigmoid(nn.Dense(self.channels)(s))
        return x * s[:, None, :]


class SepConvBlock(nn.Module):
    """Depthwise-separable conv + BN-free LayerNorm + SE, residual."""

    channels: int
    kernel_size: int = 7
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Conv(
            self.channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.channels,
            padding="SAME",
        )(x)
        h = nn.Conv(self.channels, (1,))(h)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        h = SqueezeExcite(self.channels)(h, mask)
        return (x + h) * mask


class AttentiveStatsPool(nn.Module):
    """Attention-weighted mean‖std over time (masked)."""

    attention_dim: int = 128

    @nn.compact
    def __call__(self, x, mask):
        # scores from each frame; padding masked to -inf before softmax
        a = nn.tanh(nn.Dense(self.attention_dim)(x))
        a = nn.Dense(1)(a)  # [B, T, 1]
        a = jnp.where(mask > 0, a, jnp.finfo(a.dtype).min)
        w = nn.softmax(a, axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
        return jnp.concatenate([mean, jnp.sqrt(var + 1e-8)], axis=-1)


class SpeakerEncoder(nn.Module):
    """log-mel [B, T, M] (+ lengths) -> L2-normalized embedding [B, D]."""

    emb_dim: int = 192
    channels: int = 256
    kernel_sizes: Sequence[int] = (7, 7, 7)
    dilations: Sequence[int] = (1, 2, 3)

    @nn.compact
    def __call__(self, mel, mel_lens: Optional[jnp.ndarray] = None):
        b, t, _ = mel.shape
        if mel_lens is None:
            mask = jnp.ones((b, t, 1), mel.dtype)
        else:
            mask = (jnp.arange(t)[None, :] < mel_lens[:, None]).astype(mel.dtype)
            mask = mask[..., None]
        # zero the padding BEFORE the first conv: SAME-padded kernels read
        # past mel_lens, so unmasked pad values would leak into boundary
        # frames and the embedding would depend on padding content
        x = nn.Conv(self.channels, (5,), padding="SAME")(mel * mask) * mask
        x = nn.relu(nn.LayerNorm()(x))
        feats = [x]
        for k, d in zip(self.kernel_sizes, self.dilations):
            x = SepConvBlock(self.channels, k, d)(x, mask)
            feats.append(x)
        # ECAPA-style multi-layer aggregation before pooling
        x = nn.Conv(self.channels, (1,))(jnp.concatenate(feats, axis=-1)) * mask
        pooled = AttentiveStatsPool()(x, mask)
        emb = nn.Dense(self.emb_dim)(pooled)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def spectral_embedding(mel, mel_lens=None):
    """Deterministic no-training baseline: masked (mean ‖ std) of log-mel,
    L2-normalized.  Same [B, T, M] -> [B, 2M] interface as SpeakerEncoder;
    separates spectrally-distinct speakers, used by pipeline tests and as
    `embedding: spectral` in the diarization config."""
    b, t, _ = mel.shape
    if mel_lens is None:
        mask = jnp.ones((b, t, 1), mel.dtype)
    else:
        mask = (jnp.arange(t)[None, :] < mel_lens[:, None]).astype(mel.dtype)[..., None]
    mean, std = _masked_mean_std(mel, mask)
    emb = jnp.concatenate([mean, std], axis=-1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
