"""Shared neural submodules (flax.linen).

Re-designs of roar/collections/tts/modules/submodules.py pieces used by the
shipped models: ConditionalLayerNorm (:494-531), ConditionalInput (:572-619),
SpeakerLookupTable / SpeakerEncoder (:830-922), plus xavier-init Conv/Linear
helpers (LinearNorm/ConvNorm :144-170).

Layout convention: all sequence tensors are [B, T, C] (channels last), the
natural layout for TPU convs and matmuls — unlike the reference's
[B, C, T] torch Conv1d layout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import constant, variance_scaling, zeros

SUPPORTED_CONDITION_TYPES = ("add", "concat", "layernorm")


def check_support_condition_types(condition_types: Sequence[str]) -> None:
    for tp in condition_types:
        if tp not in SUPPORTED_CONDITION_TYPES:
            raise ValueError(f"Unknown conditioning type {tp}")


def xavier_uniform_gain(gain: float):
    """torch.nn.init.xavier_uniform_ with gain (reference ConvNorm/LinearNorm
    w_init_gain semantics)."""
    return variance_scaling(gain * gain, "fan_avg", "uniform")


_GAINS = {"linear": 1.0, "relu": 2.0 ** 0.5, "tanh": 5.0 / 3.0, "sigmoid": 1.0}


class LinearNorm(nn.Module):
    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform_gain(_GAINS[self.w_init_gain]),
        )(x)


class ConvNorm(nn.Module):
    """1D conv over [B, T, C] with 'same' padding and xavier init."""

    features: int
    kernel_size: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_dilation=(self.dilation,),
            kernel_init=xavier_uniform_gain(_GAINS[self.w_init_gain]),
        )(x)


class ConditionalLayerNorm(nn.Module):
    """LayerNorm whose scale/shift come from a conditioning vector.

    Matches submodules.py:494-531: without 'layernorm' in condition_types it
    is a plain affine LayerNorm; with it, elementwise affine is disabled and
    scale/shift are linear maps of the conditioning initialized to
    (weight=0, bias=1) and (weight=0, bias=0) — i.e. identity at init.
    """

    hidden_dim: int
    condition_dim: Optional[int] = None
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, conditioning=None):
        check_support_condition_types(self.condition_types)
        condition = "layernorm" in self.condition_types
        y = nn.LayerNorm(use_scale=not condition, use_bias=not condition)(x)
        if condition:
            if conditioning is None:
                raise ValueError(
                    "conditioning required for ConditionalLayerNorm with "
                    "'layernorm' condition type"
                )
            w = nn.Dense(
                self.hidden_dim, kernel_init=zeros, bias_init=constant(1.0)
            )(conditioning)
            b = nn.Dense(
                self.hidden_dim, kernel_init=zeros, bias_init=zeros
            )(conditioning)
            y = y * w + b
        return y


class ConditionalInput(nn.Module):
    """Adds / concats a (projected) conditioning embedding to inputs
    (submodules.py:572-619)."""

    hidden_dim: int
    condition_dim: int
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, conditioning=None):
        check_support_condition_types(self.condition_types)
        active = [t for t in self.condition_types if t in ("add", "concat")]
        if not active:
            return x
        if conditioning is None:
            raise ValueError("conditioning required for ConditionalInput")
        if "add" in active:
            c = conditioning
            if self.condition_dim != self.hidden_dim:
                c = nn.Dense(self.hidden_dim)(c)
            x = x + c
        if "concat" in active:
            c = jnp.broadcast_to(
                conditioning, (x.shape[0], x.shape[1], conditioning.shape[-1])
            )
            x = nn.Dense(self.hidden_dim)(jnp.concatenate([x, c], axis=-1))
        return x


class SpeakerLookupTable(nn.Module):
    """Trainable speaker embedding table (submodules.py:830-860)."""

    n_speakers: int
    embedding_dim: int

    @nn.compact
    def __call__(self, speaker):
        return nn.Embed(self.n_speakers, self.embedding_dim)(speaker)


class SpeakerEncoder(nn.Module):
    """Combines lookup and/or precomputed speaker embeddings
    (submodules.py:861-922).  Returns [B, 1, D]."""

    lookup: Optional[SpeakerLookupTable] = None
    precomputed_embedding_dim: Optional[int] = None
    embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, batch_size, speaker=None, embedding=None):
        if self.precomputed_embedding_dim is not None:
            if embedding is None:
                raise ValueError("precomputed speaker embedding expected")
            out = nn.Dense(self.embedding_dim)(embedding)
            return out[:, None, :]
        if self.lookup is not None:
            if speaker is None:
                raise ValueError("speaker ids required for lookup embedding")
            return self.lookup(speaker)[:, None, :]
        return None


class MaskedInstanceNorm1d(nn.Module):
    """Instance norm over valid time steps only (submodules.py:54-88)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        # x: [B, T, C]; mask: [B, T, 1] (1 = valid)
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(x - mean) * mask, axis=1, keepdims=True) / cnt
        return (x - mean) / jnp.sqrt(var + self.eps)
