"""AlignerModel: standalone speech-text alignment trainer.

Re-design of roar/collections/tts/models/aligner.py:30-300: token embedding
+ AlignmentEncoder trained with forward-sum loss, adding the binarization
loss after `bin_loss_start_ratio * max_epochs` with a linear warmup of its
scale (aligner.py:135-165).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.config import instantiate
from roar_tpu.models.aligner import AlignmentEncoder
from roar_tpu.models.fastpitch_model import preprocessor_config
from roar_tpu.ops.forward_sum import bin_loss, forward_sum_loss
from roar_tpu.ops.lengths import mask_from_lens
from roar_tpu.ops.mas import binarize_attention
from roar_tpu.ops.spectrogram import log_mel_spectrogram


class AlignerNet(nn.Module):
    """Embedding + AlignmentEncoder."""

    n_tokens: int
    symbols_embedding_dim: int = 384
    n_mel_channels: int = 80
    n_att_channels: int = 80
    temperature: float = 0.0005
    dist_type: str = "l2"

    def setup(self):
        self.embed = nn.Embed(self.n_tokens, self.symbols_embedding_dim)
        self.alignment_encoder = AlignmentEncoder(
            n_mel_channels=self.n_mel_channels,
            n_text_channels=self.symbols_embedding_dim,
            n_att_channels=self.n_att_channels,
            temperature=self.temperature,
            dist_type=self.dist_type,
        )

    def __call__(self, spec, text, text_len, attn_prior=None):
        keys = self.embed(text)
        key_mask = mask_from_lens(text_len, text.shape[1])
        return self.alignment_encoder(
            spec, keys, key_mask=key_mask, attn_prior=attn_prior
        )


class AlignerModel:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        tok_cfg = cfg.get("text_tokenizer")
        self.tokenizer = instantiate(tok_cfg) if tok_cfg else None
        n_tokens = cfg.get("n_symbols") or len(self.tokenizer.tokens)
        self.mel_cfg = preprocessor_config(cfg.get("preprocessor", {}))
        enc_cfg = cfg.get("alignment_encoder", {}) or {}
        self.net = AlignerNet(
            n_tokens=n_tokens,
            symbols_embedding_dim=cfg.get("symbols_embedding_dim", 384),
            n_mel_channels=self.mel_cfg.nfilt,
            n_att_channels=enc_cfg.get("n_att_channels", self.mel_cfg.nfilt),
            temperature=enc_cfg.get("temperature", 0.0005),
            dist_type=enc_cfg.get("dist_type", "l2"),
        )
        self.bin_loss_start_ratio = cfg.get("bin_loss_start_ratio", 0.2)
        self.bin_loss_warmup_epochs = cfg.get("bin_loss_warmup_epochs", 100)
        self.max_epochs = cfg.get("max_epochs", 100)

    def _spec(self, batch):
        mel, mel_lens = log_mel_spectrogram(
            batch["audio"], batch["audio_len"], self.mel_cfg
        )
        spec = jnp.swapaxes(mel, 1, 2)
        if "align_prior_matrix" in batch:
            t_mel = batch["align_prior_matrix"].shape[1]
            spec = spec[:, :t_mel] if spec.shape[1] >= t_mel else jnp.pad(
                spec, ((0, 0), (0, t_mel - spec.shape[1]), (0, 0))
            )
            mel_lens = jnp.minimum(mel_lens, t_mel)
        return spec, mel_lens

    def init_params(self, rng, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, batch):
            spec, _ = self._spec(batch)
            return self.net.init(
                rng, spec, batch["text"], batch["text_len"],
                batch.get("align_prior_matrix"),
            )

        return _init(rng, batch)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0, deterministic: bool = True):
        spec, mel_lens = self._spec(batch)
        attn_soft, attn_logprob = self.net.apply(
            params, spec, batch["text"], batch["text_len"],
            batch.get("align_prior_matrix"),
        )
        fs = forward_sum_loss(attn_logprob, batch["text_len"], mel_lens)
        loss = fs
        metrics = {"forward_sum_loss": fs}

        # bin loss gated on epoch ratio with linear warmup (aligner.py:152-165)
        # `epoch` may be a traced value, so the gate is a jnp scale factor.
        bin_start = math.ceil(self.bin_loss_start_ratio * self.max_epochs)
        epoch_f = jnp.asarray(epoch, jnp.float32)
        scale = jnp.clip(
            (epoch_f - bin_start) / max(self.bin_loss_warmup_epochs, 1), 0.0, 1.0
        )
        scale = jnp.where(epoch_f >= bin_start, jnp.maximum(scale, 1.0 / max(self.bin_loss_warmup_epochs, 1)), 0.0)
        attn_hard = binarize_attention(attn_soft, batch["text_len"], mel_lens)
        lb = bin_loss(attn_hard, attn_soft) * scale
        loss = loss + lb
        metrics["bin_loss"] = lb
        metrics["loss"] = loss
        return loss, metrics

    def align(self, params, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (durations [B, T_text], soft attention)."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        spec, mel_lens = self._spec(batch)
        attn_soft, _ = self.net.apply(
            params, spec, batch["text"], batch["text_len"],
            batch.get("align_prior_matrix"),
        )
        attn_hard = binarize_attention(attn_soft, batch["text_len"], mel_lens)
        return jnp.sum(attn_hard[:, 0], axis=1), attn_soft
