"""Bidirectional LLaMa-style BERT encoder + MLM head.

Re-design of the reference BERT module
(roar/collections/nlp/modules/bert/bert.py:32-224): a bidirectional
encoder built from the same LLaMa-family pieces as the GPT stack —
RoPE positions, optional GQA, RMSNorm, SwiGLU FF — plus the classic BERT
surface: `BertEmbeddings` (embed + LayerNorm + dropout), `BertPooler`
(first-token tanh projection), and `BertOnlyMLMHead` (prediction-head
transform + decoder tied to the input embedding).  The reference's fused
xentropy CUDA loss (nlp/losses/fused_cross_entropy.py) is
`masked_mlm_loss` here — one fused XLA softmax-xent on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roar_tpu.models.gpt import LLaMAMLP, RMSNorm
from roar_tpu.ops.rope import apply_rope, build_rope_cache


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """BertEncoder hyperparameters (bert.py:64-127 constructor args)."""

    vocab_size: int = 30522
    n_layer: int = 6
    n_head: int = 8
    d_model: int = 512
    d_inner: int = 2048
    n_query_groups: Optional[int] = None  # None -> MHA
    rotary_percentage: float = 0.25
    rope_base: int = 10_000
    dropout: float = 0.1
    dropatt: float = 0.1
    norm_eps: float = 1e-5
    padding_idx: int = 0
    add_pooling_layer: bool = True
    max_len: int = 2048
    # >0 adds an additive segment (token-type) embedding for NSP-style
    # sentence pairs (bert_dataset.py input_type_ids); 0 keeps the param
    # tree of segment-free checkpoints unchanged
    type_vocab_size: int = 0

    @property
    def head_size(self) -> int:
        return self.d_model // self.n_head

    @property
    def groups(self) -> int:
        return self.n_query_groups or self.n_head

    @property
    def rope_n_elem(self) -> int:
        return int(self.rotary_percentage * self.head_size)


class BertEmbeddings(nn.Module):
    """Token embedding + LayerNorm + dropout (bert.py:32-45; positions come
    from RoPE inside attention, as in the reference's BiLLaMa blocks)."""

    vocab_size: int
    d_model: int
    dropout: float = 0.0
    type_vocab_size: int = 0

    @nn.compact
    def __call__(self, tokens, token_type_ids=None, deterministic=True):
        x = nn.Embed(self.vocab_size, self.d_model, name="word_embeddings")(tokens)
        if self.type_vocab_size > 0 and token_type_ids is not None:
            x = x + nn.Embed(
                self.type_vocab_size, self.d_model, name="token_type_embeddings"
            )(token_type_ids)
        x = nn.LayerNorm(name="LayerNorm")(x)
        return nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)


class BiLLaMaSelfAttention(nn.Module):
    """Bidirectional (no causal mask) RoPE/GQA attention with padding mask
    (the BiDirectionalLLaMaSelfAttention layer of bert.py:108-127)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        cfg = self.cfg
        b, t, _ = x.shape
        hs, nh, ng = cfg.head_size, cfg.n_head, cfg.groups
        qkv = nn.Dense((nh + 2 * ng) * hs, use_bias=False, name="attn")(x)
        q, k, v = jnp.split(qkv, [nh * hs, (nh + ng) * hs], axis=-1)
        q = q.reshape(b, t, nh, hs)
        k = k.reshape(b, t, ng, hs)
        v = v.reshape(b, t, ng, hs)

        cos, sin = build_rope_cache(cfg.max_len, cfg.rope_n_elem, base=cfg.rope_base)
        cos, sin = jnp.asarray(cos)[:t], jnp.asarray(sin)[:t]
        ne = cfg.rope_n_elem
        if ne > 0:
            q = jnp.concatenate([apply_rope(q[..., :ne], cos, sin), q[..., ne:]], -1)
            k = jnp.concatenate([apply_rope(k[..., :ne], cos, sin), k[..., ne:]], -1)

        rep = nh // ng
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hs)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        if cfg.dropatt > 0:
            probs = nn.Dropout(rate=cfg.dropatt)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, nh * hs)
        return nn.Dense(cfg.d_model, use_bias=False, name="proj")(out)


class BertBlock(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        cfg = self.cfg
        h = BiLLaMaSelfAttention(cfg, name="attn")(
            RMSNorm(cfg.norm_eps, name="norm_1")(x), pad_mask, deterministic
        )
        x = x + nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        m = LLaMAMLP(cfg.d_inner, name="mlp")(RMSNorm(cfg.norm_eps, name="norm_2")(x))
        return x + nn.Dropout(rate=cfg.dropout)(m, deterministic=deterministic)


class BertPooler(nn.Module):
    """First-token tanh projection (bert.py:47-62)."""

    d_model: int

    @nn.compact
    def __call__(self, hidden):
        return jnp.tanh(nn.Dense(self.d_model, name="dense")(hidden[:, 0]))


class BertEncoder(nn.Module):
    """tokens [B, T] -> (sequence_output [B, T, D], pooled [B, D] | None).

    Padding positions (token == padding_idx) are masked out of attention
    (bert.py:137-141 attention_mask)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, tokens, token_type_ids=None, deterministic=True):
        cfg = self.cfg
        pad_mask = tokens != cfg.padding_idx
        x = BertEmbeddings(
            cfg.vocab_size, cfg.d_model, cfg.dropout, cfg.type_vocab_size,
            name="word_emb",
        )(tokens, token_type_ids, deterministic)
        for i in range(cfg.n_layer):
            x = BertBlock(cfg, name=f"layers_{i}")(x, pad_mask, deterministic)
        x = RMSNorm(cfg.norm_eps, name="ln_f")(x)
        pooled = BertPooler(cfg.d_model, name="pooler")(x) if cfg.add_pooling_layer else None
        return x, pooled


class BertOnlyMLMHead(nn.Module):
    """Prediction-head transform + decoder tied to the word embedding
    (bert.py:181-224): dense -> gelu -> LayerNorm -> embedding^T + bias."""

    d_model: int

    @nn.compact
    def __call__(self, hidden, embedding: jnp.ndarray):
        h = nn.Dense(self.d_model, name="transform_dense")(hidden)
        h = nn.gelu(h)
        h = nn.LayerNorm(name="transform_ln")(h)
        vocab = embedding.shape[0]
        bias = self.param("bias", nn.initializers.zeros, (vocab,))
        return h @ embedding.T + bias


class BertForMaskedLM(nn.Module):
    """Encoder + tied MLM head; returns logits [B, T, vocab]."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, tokens, token_type_ids=None, deterministic=True):
        seq, _ = BertEncoder(self.cfg, name="bert")(
            tokens, token_type_ids, deterministic
        )
        emb = self.variables["params"]["bert"]["word_emb"]["word_embeddings"][
            "embedding"
        ]
        return BertOnlyMLMHead(self.cfg.d_model, name="mlm")(seq, emb)


class BertForPreTraining(nn.Module):
    """Encoder + tied MLM head + NSP head — the BERT pretraining graph fed
    by ``data/lm_dataset.py`` (MLM logits [B, T, vocab], NSP logits
    [B, 2] from the pooled first token)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, tokens, token_type_ids=None, deterministic=True):
        seq, pooled = BertEncoder(self.cfg, name="bert")(
            tokens, token_type_ids, deterministic
        )
        emb = self.variables["params"]["bert"]["word_emb"]["word_embeddings"][
            "embedding"
        ]
        mlm = BertOnlyMLMHead(self.cfg.d_model, name="mlm")(seq, emb)
        nsp = nn.Dense(2, name="seq_relationship")(pooled)
        return mlm, nsp


class BertPretrainingModel:
    """MLM+NSP pretraining task for the supervised engine
    (``training/run.py`` train_supervised): loss = masked-LM cross entropy
    + next-sentence cross entropy, the composition the reference's BERT
    stack trains against (bert_dataset.py outputs; fused xentropy loss
    nlp/losses/fused_cross_entropy.py)."""

    def __init__(self, cfg):
        mcfg = {k: v for k, v in (cfg or {}).items()
                if k in {f.name for f in dataclasses.fields(BertConfig)}}
        mcfg.setdefault("type_vocab_size", 2)
        self.config = BertConfig(**mcfg)
        self.module = BertForPreTraining(self.config)
        self.nsp_weight = float((cfg or {}).get("nsp_weight", 1.0))

    def init_params(self, rng, batch):
        tokens = jnp.asarray(batch["input_ids"])
        types = jnp.asarray(batch["input_type_ids"])

        @jax.jit
        def _init(rng, tokens, types):
            return self.module.init(rng, tokens, types)

        return _init(rng, tokens, types)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0,
                deterministic: bool = False):
        mlm_logits, nsp_logits = self.module.apply(
            params,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["input_type_ids"]),
            deterministic=deterministic,
            rngs={"dropout": rng} if rng is not None else None,
        )
        mlm = masked_mlm_loss(
            mlm_logits, jnp.asarray(batch["output_ids"]),
            jnp.asarray(batch["output_mask"]) > 0,
        )
        nsp_logits = nsp_logits.astype(jnp.float32)
        labels = jnp.asarray(batch["is_next"])
        logz = jax.nn.logsumexp(nsp_logits, axis=-1)
        gold = jnp.take_along_axis(nsp_logits, labels[:, None], axis=-1)[:, 0]
        nsp = jnp.mean(logz - gold)
        loss = mlm + self.nsp_weight * nsp
        nsp_acc = jnp.mean(
            (jnp.argmax(nsp_logits, -1) == labels).astype(jnp.float32)
        )
        return loss, {"loss": loss, "mlm_loss": mlm, "nsp_loss": nsp,
                      "nsp_acc": nsp_acc}


def masked_mlm_loss(logits, labels, loss_mask):
    """Masked-LM cross entropy over positions where loss_mask is True —
    the TPU equivalent of the reference's fused xentropy loss
    (nlp/losses/fused_cross_entropy.py): XLA fuses logsumexp+gather."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    nll = logz - gold
    mask = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
