"""FastPitch "FFT" transformer blocks (flax.linen).

Re-design of roar/collections/tts/modules/transformer.py:49-357
(PositionwiseConvFF, TransformerLayer, FFTransformerDecoder/Encoder) and
modules/attention.py:27-100 (MultiHeadAttn), TPU-first:

- [B, T, C] layout throughout; convs are nn.Conv (feature-last), attention is
  one fused einsum-softmax-einsum that XLA maps to the MXU.
- Padding keys are masked ADDITIVELY with a large negative bias.  (The
  reference passes a 0/1 float mask to torch SDPA — attention.py:78-82 —
  which torch interprets as an additive +1 bonus on padding keys; we
  implement the evidently intended key masking instead.)
- Dropout is handled with flax `deterministic` flags; attention-prob dropout
  (`dropatt`) matches the reference's SDPA dropout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roar_tpu.models.submodules import ConditionalInput, ConditionalLayerNorm

_MASK_NEG = -1e9


def sinusoidal_positional_embedding(
    length: int, d_model: int, dtype=jnp.float32
) -> jnp.ndarray:
    """[length, d_model] = concat(sin(pos*inv_freq), cos(pos*inv_freq))
    (modules/postional_embedding.py:6-27)."""
    inv_freq = 1.0 / (10000.0 ** (np.arange(0.0, d_model, 2.0) / d_model))
    pos = np.arange(length, dtype=np.float64)
    sinusoid = np.outer(pos, inv_freq)
    emb = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    return jnp.asarray(emb, dtype)


def _flash_attention_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_block_sizes(t_pad: int):
    """Tuned BlockSizes for the Pallas flash kernel at padded length t_pad.

    The kernel requires every block size to DIVIDE the (128-padded)
    sequence length, so we pick the largest multiple of 128 that divides
    t_pad, capped at 1024 (measured sweet spot, DESIGN.md 7c) — e.g.
    t_pad 4096 -> 1024, 896 -> 896, 1152 (=128*9) -> 384."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    b = 128
    for cand in range(min(1024, t_pad), 127, -128):
        if t_pad % cand == 0:
            b = cand
            break
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b,
        block_k_dkv=b, block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def flash_self_attention(q, k, v, key_mask, scale):
    """Pallas TPU flash attention with padding handled via segment ids.

    q/k/v: [B, T, H, D].  Padding tokens get segment id 1 (valid = 0) so
    cross-segment attention is masked inside the kernel.  The kernel tiles
    the sequence into 128-wide blocks, so T is padded up to a multiple of
    128 here (pad positions get a third segment id, masking them from both
    real tokens and the key-padding segment) and the output is sliced back.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    t = q.shape[1]
    block = 128
    t_pad = -(-t // block) * block
    if key_mask is None:
        key_mask = jnp.ones(q.shape[:2], bool)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        key_mask = jnp.pad(key_mask, [(0, 0), (0, t_pad - t)])
        ids = jnp.where(key_mask, 0, 1).astype(jnp.int32)
        # block-padding positions: distinct segment so they attend nothing
        ids = ids.at[:, t:].set(2)
    else:
        ids = jnp.where(key_mask, 0, 1).astype(jnp.int32)

    qt = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    seg = SegmentIds(q=ids, kv=ids)
    # tuned wide blocks (capped at 1024, constrained to divide t_pad):
    # measured on v5e, the kernel's small default blocks lose to SDPA
    # everywhere, while 1024-wide blocks beat SDPA 2.7x at T=4096 (and at
    # T>=8192 SDPA's [B,H,T,T] logits don't fit HBM at all) — see
    # scripts/benchmarks/attention_bench.py and DESIGN.md 7c
    out = flash_attention(
        qt, kt, vt, segment_ids=seg, sm_scale=scale,
        block_sizes=_flash_block_sizes(t_pad),
    )
    return jnp.swapaxes(out, 1, 2)[:, :t]


class MultiHeadAttn(nn.Module):
    """Fused-QKV self-attention with post/pre conditional LayerNorm.

    Options (covering the reference's FlashSelfAttention/RoPE path,
    attention.py:103-195 + nlp positional_encodings.py):
    - use_rope: rotary position embeddings on q/k (pure-JAX; XLA fuses).
    - use_flash: Pallas TPU flash-attention kernel when running on TPU
      (automatically falls back to the einsum path elsewhere or when
      attention-prob dropout is active, which flash cannot express).
    """

    n_head: int
    d_model: int
    d_head: int
    dropout: float
    dropatt: float = 0.1
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, key_mask=None, conditioning=None, deterministic=True):
        residual = x
        ln = ConditionalLayerNorm(
            self.d_model, self.d_model, self.condition_types, name="layer_norm"
        )
        if self.pre_lnorm:
            x = ln(x, conditioning)

        b, t, _ = x.shape
        qkv = nn.Dense(3 * self.n_head * self.d_head, name="qkv_net")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, self.n_head, self.d_head)

        q, k, v = heads(q), heads(k), heads(v)

        if self.use_rope:
            from roar_tpu.ops.rope import apply_rope, build_rope_cache

            cos, sin = build_rope_cache(t, self.d_head)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        scale = 1.0 / float(np.sqrt(self.d_head))
        drop_active = self.dropatt > 0.0 and not deterministic
        if self.use_flash and not drop_active and _flash_attention_available():
            attn = flash_self_attention(q, k, v, key_mask, scale)
            attn = attn.reshape(b, t, self.n_head * self.d_head)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            if key_mask is not None:
                # key_mask: [B, T] True = valid
                bias = jnp.where(key_mask[:, None, None, :], 0.0, _MASK_NEG)
                scores = scores + bias.astype(scores.dtype)
            probs = nn.softmax(scores, axis=-1)
            if self.dropatt > 0.0:
                probs = nn.Dropout(rate=self.dropatt)(
                    probs, deterministic=deterministic
                )
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
                b, t, self.n_head * self.d_head
            )
        out = nn.Dense(self.d_model, use_bias=False, name="o_net")(attn)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)

        if self.pre_lnorm:
            return residual + out
        return ln(residual + out, conditioning)


class PositionwiseConvFF(nn.Module):
    """Conv1d(k) -> ReLU -> Conv1d(k) FFN with residual + conditional LN
    (transformer.py:49-103)."""

    d_model: int
    d_inner: int
    kernel_size: int
    dropout: float
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, conditioning=None, deterministic=True):
        ln = ConditionalLayerNorm(
            self.d_model, self.d_model, self.condition_types, name="layer_norm"
        )

        def core(z):
            z = nn.Conv(self.d_inner, (self.kernel_size,), padding="SAME")(z)
            z = nn.relu(z)
            z = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME")(z)
            return nn.Dropout(rate=self.dropout)(z, deterministic=deterministic)

        if self.pre_lnorm:
            return x + core(ln(x, conditioning))
        return ln(x + core(x), conditioning)


class AdapterBlock(nn.Module):
    """Residual bottleneck adapter (the reference's adapter modules,
    roar/core/classes/mixins/adapter_mixins.py): LN -> down -> relu -> up,
    up zero-initialized so the adapter is identity at insertion."""

    dim: int

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        z = nn.LayerNorm()(x)
        z = nn.relu(nn.Dense(self.dim, name="down")(z))
        z = nn.Dense(d_model, kernel_init=nn.initializers.zeros, name="up")(z)
        return x + z


class TransformerLayer(nn.Module):
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float = 0.1
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False
    adapter_dim: int = 0

    @nn.compact
    def __call__(self, x, mask, conditioning=None, deterministic=True):
        # mask: [B, T, 1] float (1 = valid)
        out = MultiHeadAttn(
            self.n_head,
            self.d_model,
            self.d_head,
            self.dropout,
            self.dropatt,
            self.pre_lnorm,
            self.condition_types,
            self.use_rope,
            self.use_flash,
            name="dec_attn",
        )(x, key_mask=mask[..., 0] > 0, conditioning=conditioning, deterministic=deterministic)
        out = out * mask
        out = PositionwiseConvFF(
            self.d_model,
            self.d_inner,
            self.kernel_size,
            self.dropout,
            self.pre_lnorm,
            self.condition_types,
            name="pos_ff",
        )(out, conditioning, deterministic=deterministic)
        if self.adapter_dim > 0:
            out = AdapterBlock(self.adapter_dim, name="adapter")(out)
        return out * mask


class FFTransformerDecoder(nn.Module):
    """Stack of TransformerLayers over pre-embedded input
    (transformer.py:148-223)."""

    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float
    dropemb: float = 0.0
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False
    adapter_dim: int = 0
    remat: bool = False

    @nn.compact
    def __call__(
        self, x, mask, conditioning=None, deterministic=True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # mask: [B, T, 1]
        t = x.shape[1]
        pos = sinusoidal_positional_embedding(t, self.d_model, x.dtype)
        x = x + pos[None] * mask
        x = ConditionalInput(
            self.d_model, self.d_model, self.condition_types, name="cond_input"
        )(x, conditioning)
        x = nn.Dropout(rate=self.dropemb)(x, deterministic=deterministic)
        # remat: recompute each layer's activations in the backward pass
        # instead of storing them — trades spare MXU FLOPs for HBM traffic
        # (the train step is bandwidth-bound; see scripts/benchmarks).
        layer_cls = (
            nn.remat(TransformerLayer, static_argnums=(4,))
            if self.remat
            else TransformerLayer
        )
        for i in range(self.n_layer):
            x = layer_cls(
                self.n_head,
                self.d_model,
                self.d_head,
                self.d_inner,
                self.kernel_size,
                self.dropout,
                self.dropatt,
                self.pre_lnorm,
                self.condition_types,
                self.use_rope,
                self.use_flash,
                self.adapter_dim,
                name=f"layers_{i}",
            )(x, mask, conditioning, deterministic)  # positional: remat static_argnums
        return x, mask


class FFTransformerEncoder(nn.Module):
    """Token-embedding front + FFTransformerDecoder (transformer.py:306-357).

    The padding token embeds to zero (padding_idx semantics) and defines the
    sequence mask.
    """

    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float
    n_embed: int
    d_embed: Optional[int] = None
    padding_idx: int = 0
    dropemb: float = 0.0
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False
    adapter_dim: int = 0
    remat: bool = False

    def setup(self):
        self.word_emb = nn.Embed(self.n_embed, self.d_embed or self.d_model)
        self.stack = FFTransformerDecoder(
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
            self.adapter_dim,
            self.remat,
        )

    def embed(self, tokens):
        mask = (tokens != self.padding_idx)[..., None]
        emb = self.word_emb(tokens)
        # mask in the embedding's own dtype: an fp32 mask here would promote
        # the whole bf16 encoder stack back to fp32 (mixed-precision leak)
        emb = emb * mask.astype(emb.dtype)
        return emb, mask

    def __call__(self, tokens, conditioning=None, deterministic=True):
        emb, mask = self.embed(tokens)
        return self.stack(
            emb, mask.astype(emb.dtype), conditioning, deterministic=deterministic
        )
