"""One-TTS-Alignment encoder (flax.linen).

Re-design of roar/collections/tts/modules/aligner.py:9-233
`AlignmentEncoder`: conv projections of text (keys) and mel (queries), L2 or
cosine distance, temperature-scaled attention with an optional beta-binomial
log-prior, masked softmax over the text axis.  Layout is [B, T, C].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.models.submodules import ConditionalInput, ConvNorm
from roar_tpu.ops.mas import binarize_attention

_MASK_NEG = -1e9


class AlignmentEncoder(nn.Module):
    n_mel_channels: int = 80
    n_text_channels: int = 512
    n_att_channels: int = 80
    temperature: float = 0.0005
    condition_types: Sequence[str] = ()
    dist_type: str = "l2"

    def setup(self):
        if self.dist_type not in ("l2", "cosine"):
            raise ValueError(f"Unknown distance type '{self.dist_type}'")
        self.cond_input = ConditionalInput(
            self.n_text_channels, self.n_text_channels, self.condition_types
        )
        self.key_proj = [
            ConvNorm(self.n_text_channels * 2, kernel_size=3, w_init_gain="relu"),
            ConvNorm(self.n_att_channels, kernel_size=1),
        ]
        self.query_proj = [
            ConvNorm(self.n_mel_channels * 2, kernel_size=3, w_init_gain="relu"),
            ConvNorm(self.n_mel_channels, kernel_size=1),
            ConvNorm(self.n_att_channels, kernel_size=1),
        ]

    def _project(self, queries, keys):
        # queries: [B, T_mel, n_mel]; keys: [B, T_text, n_text]
        k = nn.relu(self.key_proj[0](keys))
        k = self.key_proj[1](k)
        q = nn.relu(self.query_proj[0](queries))
        q = nn.relu(self.query_proj[1](q))
        q = self.query_proj[2](q)
        return q, k

    def _distance(self, q, k):
        """[B, T_mel, T_text] distance."""
        if self.dist_type == "l2":
            # ||q - k||^2 = |q|^2 + |k|^2 - 2 q.k  (expanded form keeps the
            # T_mel x T_text contraction on the MXU instead of materializing
            # the [B, C, T1, T2] difference tensor the reference builds)
            q2 = jnp.sum(jnp.square(q), axis=-1)[:, :, None]
            k2 = jnp.sum(jnp.square(k), axis=-1)[:, None, :]
            qk = jnp.einsum("bqc,bkc->bqk", q, k)
            return q2 + k2 - 2.0 * qk
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-8)
        return -jnp.einsum("bqc,bkc->bqk", qn, kn)

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        attn_prior: Optional[jnp.ndarray] = None,
        conditioning: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (attn [B, 1, T_mel, T_text], attn_logprob same shape).

        queries: [B, T_mel, n_mel]; keys: [B, T_text, n_text];
        key_mask: [B, T_text] bool (True = valid); attn_prior:
        [B, T_mel, T_text].
        """
        keys = self.cond_input(keys, conditioning)
        q, k = self._project(queries, keys)
        attn = -self.temperature * self._distance(q, k)

        if attn_prior is not None:
            attn = nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + 1e-8)

        attn_logprob = attn[:, None]

        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, :], attn, _MASK_NEG)
        attn = nn.softmax(attn, axis=-1)
        return attn[:, None], attn_logprob

    @staticmethod
    def get_durations(attn_soft, text_lens, mel_lens):
        """Binarize and reduce to per-token durations (aligner.py:123-134)."""
        attn_hard = binarize_attention(attn_soft, text_lens, mel_lens)
        return jnp.sum(attn_hard[:, 0], axis=1)
