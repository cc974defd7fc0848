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

from typing import Optional, Sequence

import jax
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


class ConditionalRMSNorm(nn.Module):
    """RMSNorm with conditioning-derived scale/shift
    (submodules.py:533-570; the FusedRMSNorm CUDA ext it wraps is one fused
    XLA op here)."""

    hidden_dim: int
    condition_dim: Optional[int] = None
    condition_types: Sequence[str] = ()
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, conditioning=None):
        check_support_condition_types(self.condition_types)
        condition = "layernorm" in self.condition_types
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = (x * (1.0 / jnp.sqrt(var + self.eps))).astype(x.dtype)
        if not condition:
            scale = self.param("scale", constant(1.0), (self.hidden_dim,))
            return y * scale
        if conditioning is None:
            raise ValueError("conditioning required for ConditionalRMSNorm")
        w = nn.Dense(self.hidden_dim, kernel_init=zeros, bias_init=constant(1.0))(
            conditioning
        )
        b = nn.Dense(self.hidden_dim, kernel_init=zeros, bias_init=zeros)(conditioning)
        return y * w + b


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


class ReferenceEncoder(nn.Module):
    """Mel reference encoder (submodules.py:620-750 ReferenceEncoder).

    Strided 2D conv stack over the mel image followed by masked mean pooling
    + projection.  (The torch reference pools with a GRU; mean pooling is the
    recurrence-free TPU equivalent and performs comparably for style
    embeddings.)
    """

    ref_enc_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    gru_rnn_units: int = 128  # output dim (name kept from the reference cfg)

    @nn.compact
    def __call__(self, spec, spec_lens=None):
        # spec: [B, T, n_mel]
        x = spec[..., None]  # [B, T, M, 1]
        t_down = x.shape[1]
        for i, ch in enumerate(self.ref_enc_filters):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", name=f"convs_{i}")(x)
            x = nn.relu(nn.LayerNorm(name=f"norm_{i}")(x))
        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c)
        if spec_lens is not None:
            down = 2 ** len(self.ref_enc_filters)
            lens = jnp.maximum((spec_lens + down - 1) // down, 1)
            mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(x.dtype)[..., None]
            pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1.0
            )
        else:
            pooled = jnp.mean(x, axis=1)
        return nn.tanh(nn.Dense(self.gru_rnn_units, name="proj")(pooled))  # [B, D]


class StyleAttention(nn.Module):
    """Multi-head attention over a learned style-token bank
    (submodules.py:620-680 StyleAttention)."""

    gst_size: int = 128
    n_style_token: int = 10
    n_style_attn_head: int = 4

    @nn.compact
    def __call__(self, ref_emb):
        # ref_emb: [B, D_ref]
        tokens = self.param(
            "style_tokens",
            nn.initializers.normal(0.5),
            (self.n_style_token, self.gst_size // self.n_style_attn_head),
        )
        b = ref_emb.shape[0]
        keys = nn.tanh(tokens)[None].repeat(b, axis=0)  # [B, N, d_k]
        q = nn.Dense(self.gst_size, use_bias=False, name="q_proj")(ref_emb)
        k = nn.Dense(self.gst_size, use_bias=False, name="k_proj")(keys)
        v = nn.Dense(self.gst_size, use_bias=False, name="v_proj")(keys)
        h = self.n_style_attn_head
        d = self.gst_size // h
        q = q.reshape(b, h, 1, d)
        k = k.reshape(b, self.n_style_token, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, self.n_style_token, h, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v).reshape(b, self.gst_size)
        return out  # [B, gst_size]


class GlobalStyleToken(nn.Module):
    """ReferenceEncoder + StyleAttention (submodules.py:681-829)."""

    gst_size: int = 128
    n_style_token: int = 10
    n_style_attn_head: int = 4

    @nn.compact
    def __call__(self, ref_spec, ref_spec_lens=None):
        emb = ReferenceEncoder(gru_rnn_units=self.gst_size, name="reference_encoder")(
            ref_spec, ref_spec_lens
        )
        return StyleAttention(
            self.gst_size, self.n_style_token, self.n_style_attn_head, name="style_attention"
        )(emb)


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


class PartialConv1d(nn.Module):
    """Mask-aware 1D conv: zero padding / padded frames do not bias edges
    (submodules.py:89-143 PartialConv1d).

    The raw conv output is rescaled by (kernel_size / #valid-taps) under the
    sliding window, and re-masked, so the filter response is invariant to how
    much of its support lies in padding.  x: [B, T, C]; mask: [B, T, 1] with
    1 = valid (or None for all-valid).
    """

    features: int
    kernel_size: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is not None:
            x = x * mask
        raw = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=False,
            kernel_init=xavier_uniform_gain(_GAINS[self.w_init_gain]),
            name="conv",
        )(x)
        if mask is None:
            mask = jnp.ones((1, x.shape[1], 1), x.dtype)
        # valid-tap count under the window (no grads flow through the mask)
        ones_kernel = jnp.ones((self.kernel_size, 1, 1), x.dtype)
        update = jax.lax.stop_gradient(
            jax.lax.conv_general_dilated(
                mask, ones_kernel, (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        )
        ratio = self.kernel_size / jnp.where(update == 0, self.kernel_size, update)
        update = jnp.clip(update, 0.0, 1.0)
        ratio = ratio * update
        if self.use_bias:
            bias = self.param("bias", zeros, (self.features,))
            return (raw * ratio + bias[None, None, :]) * update
        return raw * ratio


class LocationLayer(nn.Module):
    """Conv+dense projection of (prev, cumulative) attention weights
    (submodules.py:220-242)."""

    attention_n_filters: int
    attention_kernel_size: int
    attention_dim: int

    @nn.compact
    def __call__(self, attention_weights_cat):
        # attention_weights_cat: [B, T, 2]
        h = ConvNorm(
            self.attention_n_filters,
            kernel_size=self.attention_kernel_size,
            use_bias=False,
            name="location_conv",
        )(attention_weights_cat)
        return LinearNorm(
            self.attention_dim, use_bias=False, w_init_gain="tanh",
            name="location_dense",
        )(h)


class Attention(nn.Module):
    """Tacotron 2 location-sensitive attention (submodules.py:244-318).

    query: [B, attention_rnn_dim]; memory/processed_memory: [B, T, C];
    attention_weights_cat: [B, T, 2]; mask: [B, T] bool, True = PADDING.
    Returns (attention_context [B, C], attention_weights [B, T]).
    """

    attention_rnn_dim: int
    embedding_dim: int
    attention_dim: int
    attention_location_n_filters: int
    attention_location_kernel_size: int

    def setup(self):
        self.query_layer = LinearNorm(
            self.attention_dim, use_bias=False, w_init_gain="tanh"
        )
        self.memory_layer = LinearNorm(
            self.attention_dim, use_bias=False, w_init_gain="tanh"
        )
        self.v = LinearNorm(1, use_bias=False)
        self.location_layer = LocationLayer(
            self.attention_location_n_filters,
            self.attention_location_kernel_size,
            self.attention_dim,
        )

    def get_alignment_energies(self, query, processed_memory, attention_weights_cat):
        processed_query = self.query_layer(query[:, None, :])  # [B, 1, A]
        processed_location = self.location_layer(attention_weights_cat)
        energies = self.v(
            jnp.tanh(processed_query + processed_location + processed_memory)
        )
        return jnp.squeeze(energies, -1)  # [B, T]

    def __call__(
        self, attention_hidden_state, memory, processed_memory,
        attention_weights_cat, mask=None,
    ):
        alignment = self.get_alignment_energies(
            attention_hidden_state, processed_memory, attention_weights_cat
        )
        if mask is not None:
            alignment = jnp.where(mask, -jnp.inf, alignment)
        attention_weights = jax.nn.softmax(alignment, axis=1)
        attention_context = jnp.einsum("bt,btc->bc", attention_weights, memory)
        return attention_context, attention_weights


class Prenet(nn.Module):
    """Tacotron prenet: stacked Linear+ReLU with ALWAYS-ON dropout
    (submodules.py:320-349 — dropout stays active at inference, the
    well-known Tacotron sampling trick, hence deterministic=False default)."""

    sizes: Sequence[int]
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        for size in self.sizes:
            x = nn.relu(LinearNorm(size, use_bias=False)(x))
            x = nn.Dropout(rate=self.p_dropout)(x, deterministic=deterministic)
        return x


def _orthonormal_init(key, shape, dtype=jnp.float32):
    """Random orthonormal matrix with det +1 (submodules.py:371-377)."""
    w = jax.random.normal(key, shape, dtype)
    q, _ = jnp.linalg.qr(w)
    det = jnp.linalg.det(q)
    q = q.at[:, 0].multiply(jnp.sign(det))
    return q


class Invertible1x1Conv(nn.Module):
    """1x1 invertible conv for normalizing flows (WaveGlow leftover,
    submodules.py:358-413): returns (z @ W, log|det W| * B * T) forward, and
    applies W^{-1} in reverse.  z: [B, T, C] channels-last."""

    channels: int

    @nn.compact
    def __call__(self, z, reverse: bool = False):
        w = self.param("weight", _orthonormal_init, (self.channels, self.channels))
        if reverse:
            return z @ jnp.linalg.inv(w).T
        b, t, _ = z.shape
        log_det_w = b * t * jnp.linalg.slogdet(w.astype(jnp.float32))[1]
        return z @ w.T, log_det_w


class WaveGlowWaveNet(nn.Module):
    """WaveNet-like stack for WaveGlow affine coupling (submodules.py:415-493):
    non-causal dilated convs (dilation doubles each layer, never resets),
    gated tanh/sigmoid units, mel conditioning projected once for all layers,
    zero-initialized end conv so couplings start as identity.

    audio: [B, T, n_in]; spect: [B, T, n_mel] -> [B, T, 2*n_in].
    """

    n_in_channels: int
    n_mel_channels: int
    n_layers: int
    n_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, audio, spect):
        h = self.n_channels
        x = nn.WeightNorm(nn.Conv(h, (1,), name="start"))(audio)
        output = jnp.zeros_like(x)
        cond = nn.WeightNorm(
            nn.Conv(2 * h * self.n_layers, (1,), name="cond_layer")
        )(spect)
        for i in range(self.n_layers):
            dilation = 2 ** i
            x_in = nn.WeightNorm(
                nn.Conv(
                    2 * h, (self.kernel_size,), kernel_dilation=(dilation,),
                    padding="SAME", name=f"in_layers_{i}",
                )
            )(x)
            x_in = x_in + cond[..., i * 2 * h : (i + 1) * 2 * h]
            a, g = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * nn.sigmoid(g)
            out_ch = 2 * h if i < self.n_layers - 1 else h
            rs = nn.WeightNorm(
                nn.Conv(out_ch, (1,), name=f"res_skip_layers_{i}")
            )(acts)
            if i < self.n_layers - 1:
                res, skip = jnp.split(rs, 2, axis=-1)
                x = x + res
                output = output + skip
            else:
                output = output + rs
        return nn.Conv(
            2 * self.n_in_channels, (1,), kernel_init=zeros, bias_init=zeros,
            name="end",
        )(output)
