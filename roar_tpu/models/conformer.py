"""Conformer blocks (flax.linen) — encoder/decoder option for FastPitch/JETS.

Re-design of roar/collections/tts/modules/conformer.py:37-505
(ConvolutionalModule, PositionwiseFF, ConformerLayer, FFConformer
Encoder/Decoder): macaron FF(x0.5) -> MHA -> conv module (pointwise -> GLU ->
depthwise k=31 -> norm -> swish -> pointwise) -> FF(x0.5), all pre-norm.

Divergence note: the reference's conv module uses BatchNorm1d
(conformer.py:77); running batch statistics are awkward state in a pjit
training step and modern conformers do as well with per-timestep
channel LayerNorm, so we use LayerNorm here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.models.submodules import ConditionalInput, ConditionalLayerNorm
from roar_tpu.models.transformer import MultiHeadAttn, sinusoidal_positional_embedding


class ConvolutionalModule(nn.Module):
    """Conformer convolution module over [B, T, C] (conformer.py:37-112)."""

    embed_dim: int
    n_channels: int
    kernel_size: int = 31
    dropout: float = 0.1
    pre_lnorm: bool = True
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, conditioning=None, deterministic=True):
        ln = ConditionalLayerNorm(
            self.embed_dim, self.embed_dim, self.condition_types, name="layer_norm"
        )

        def core(z):
            z = nn.Conv(2 * self.n_channels, (1,))(z)  # pointwise in
            z = nn.glu(z, axis=-1)
            z = nn.Conv(
                self.n_channels,
                (self.kernel_size,),
                padding="SAME",
                feature_group_count=self.n_channels,
            )(z)  # depthwise
            z = nn.LayerNorm()(z)  # stands in for BatchNorm1d (see module doc)
            z = nn.silu(z)
            z = nn.Conv(self.embed_dim, (1,))(z)  # pointwise out
            return nn.Dropout(rate=self.dropout)(z, deterministic=deterministic)

        if self.pre_lnorm:
            return core(ln(x, conditioning))
        return ln(core(x), conditioning)


class PositionwiseFF(nn.Module):
    """Swish FF from the Conformer paper (conformer.py:114-165)."""

    embed_dim: int
    hidden_size: int
    dropout_l1: float = 0.0
    dropout_l2: float = 0.0
    pre_lnorm: bool = False

    @nn.compact
    def __call__(self, x, conditioning=None, deterministic=True):
        ln = ConditionalLayerNorm(self.embed_dim, name="layer_norm")

        def core(z):
            z = nn.Dense(self.hidden_size)(z)
            z = nn.silu(z)
            z = nn.Dropout(rate=self.dropout_l1)(z, deterministic=deterministic)
            z = nn.Dense(self.embed_dim)(z)
            return nn.Dropout(rate=self.dropout_l2)(z, deterministic=deterministic)

        if self.pre_lnorm:
            return core(ln(x))
        return ln(core(x))


class ConformerLayer(nn.Module):
    """FF(x0.5) -> MHA -> conv module -> FF(x0.5) (conformer.py:167-283)."""

    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    conv_kernel_size: int = 31
    dropout: float = 0.1
    dropout_att: float = 0.1
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask, conditioning=None, deterministic=True):
        residual = x
        out = PositionwiseFF(
            self.d_model, self.d_inner, dropout_l1=self.dropout, pre_lnorm=True,
            name="ff1",
        )(x, conditioning, deterministic=deterministic)
        residual = out * 0.5 + residual

        out = MultiHeadAttn(
            self.n_head,
            self.d_model,
            self.d_head,
            self.dropout_att,
            condition_types=self.condition_types,
            use_rope=self.use_rope,
            use_flash=self.use_flash,
            name="self_attn",
        )(
            residual,
            key_mask=mask[..., 0] > 0,
            conditioning=conditioning,
            deterministic=deterministic,
        )
        residual = out + residual

        out = ConvolutionalModule(
            self.d_model,
            self.d_model,
            kernel_size=self.conv_kernel_size,
            dropout=self.dropout,
            pre_lnorm=True,
            condition_types=self.condition_types,
            name="convolutional_block",
        )(residual, conditioning, deterministic=deterministic)
        residual = out + residual

        out = PositionwiseFF(
            self.d_model, self.d_inner, dropout_l1=self.dropout,
            dropout_l2=self.dropout, pre_lnorm=False, name="ff2",
        )(residual, conditioning, deterministic=deterministic)
        out = out * 0.5 + residual
        return out * mask


class FFConformerDecoder(nn.Module):
    """Conformer stack over pre-embedded input (conformer.py:330-406)."""

    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int = 31
    dropout: float = 0.1
    dropatt: float = 0.1
    dropemb: float = 0.0
    pre_lnorm: bool = True
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(
        self, x, mask, conditioning=None, deterministic=True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = x.shape[1]
        pos = sinusoidal_positional_embedding(t, self.d_model, x.dtype)
        x = x + pos[None] * mask
        x = ConditionalInput(
            self.d_model, self.d_model, self.condition_types, name="cond_input"
        )(x, conditioning)
        x = nn.Dropout(rate=self.dropemb)(x, deterministic=deterministic)
        for i in range(self.n_layer):
            x = ConformerLayer(
                self.n_head,
                self.d_model,
                self.d_head,
                self.d_inner,
                conv_kernel_size=self.kernel_size,
                dropout=self.dropout,
                dropout_att=self.dropatt,
                condition_types=self.condition_types,
                use_rope=self.use_rope,
                use_flash=self.use_flash,
                name=f"layers_{i}",
            )(x, mask, conditioning, deterministic=deterministic)
        return x, mask


class FFConformerEncoder(nn.Module):
    """Token embedding + conformer stack (conformer.py:408-457)."""

    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int = 31
    dropout: float = 0.1
    dropatt: float = 0.1
    n_embed: int = 256
    d_embed: Optional[int] = None
    padding_idx: int = 0
    dropemb: float = 0.0
    pre_lnorm: bool = True
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False

    def setup(self):
        self.word_emb = nn.Embed(self.n_embed, self.d_embed or self.d_model)
        self.stack = FFConformerDecoder(
            self.n_layer,
            self.n_head,
            self.d_model,
            self.d_head,
            self.d_inner,
            self.kernel_size,
            self.dropout,
            self.dropatt,
            self.dropemb,
            self.pre_lnorm,
            self.condition_types,
            self.use_rope,
            self.use_flash,
        )

    def embed(self, tokens):
        mask = (tokens != self.padding_idx)[..., None]
        emb = self.word_emb(tokens)
        # mask in the embedding's dtype — an fp32 mask would promote the
        # whole bf16 conformer stack back to fp32 (mixed-precision leak)
        emb = emb * mask.astype(emb.dtype)
        return emb, mask

    def __call__(self, tokens, conditioning=None, deterministic=True):
        emb, mask = self.embed(tokens)
        return self.stack(
            emb, mask.astype(emb.dtype), conditioning, deterministic=deterministic
        )
