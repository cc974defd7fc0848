"""GPTLMModel: causal-LM pretraining task for the supervised engine.

The reference's GPT/TinyLLaMa stack (roar/collections/nlp/modules/gpt/
gpt.py:63-430 + the 1506-LoC config registry) is WIP with no training
entry point; this wraps the working `models/gpt.py` GPT module in the same
task shape the other families use (`loss_fn` + `init_params` consumed by
`training/run.py train_supervised`): packed next-token cross entropy, the
loss the reference's fused xentropy (nlp/losses/fused_cross_entropy.py)
computes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from roar_tpu.models.gpt import GPT, GPTConfig, config_from_name


class GPTLMModel:
    """Config keys: either ``config_name`` (registry entry, fnmatch
    patterns allowed — models/gpt.py GPT_CONFIGS) or explicit GPTConfig
    fields; both accept field overrides (``vocab_size`` is normally set
    from the tokenizer by the CLI)."""

    def __init__(self, cfg: Optional[Dict[str, Any]] = None):
        cfg = dict(cfg or {})
        field_names = {f.name for f in dataclasses.fields(GPTConfig)}
        overrides = {k: v for k, v in cfg.items() if k in field_names}
        name = cfg.get("config_name")
        self.config = (
            config_from_name(name, **overrides) if name else GPTConfig(**overrides)
        )
        self.module = GPT(self.config)
        # fused lm_head + cross entropy (ops/fused_ce.py): identical math,
        # but the [B, S, V] logits never land in HBM.  On by default; the
        # unfused formulation stays as the A/B + parity baseline.
        self.fused_ce = bool(cfg.get("fused_ce", True))

    def init_params(self, rng, batch):
        tokens = jnp.asarray(batch["input_ids"])

        @jax.jit
        def _init(rng, tokens):
            return self.module.init(rng, tokens)

        return _init(rng, tokens)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0,
                deterministic: bool = False):
        """Packed causal cross entropy.  ``labels`` are the next-token ids
        (CausalLMDataset); an optional ``loss_mask`` (0/1) supports padded
        or instruction-masked batches."""
        labels = jnp.asarray(batch["labels"])
        if self.fused_ce:
            from roar_tpu.ops.fused_ce import fused_cross_entropy

            hidden = self.module.apply(
                params, jnp.asarray(batch["input_ids"]), return_hidden=True)
            p = params["params"] if "params" in params else params
            head = p["lm_head"]
            loss, acc = fused_cross_entropy(
                hidden, head["kernel"], labels, bias=head.get("bias"),
                loss_mask=batch.get("loss_mask"))
            return loss, {
                "loss": loss,
                "ppl": jnp.exp(jnp.minimum(loss, 20.0)),
                "token_acc": acc,
            }
        logits = self.module.apply(params, jnp.asarray(batch["input_ids"]))
        logits = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        nll = logz - gold
        mask = batch.get("loss_mask")
        if mask is not None:
            m = jnp.asarray(mask, jnp.float32)
            loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * m) / jnp.maximum(
                jnp.sum(m), 1.0
            )
        else:
            loss = jnp.mean(nll)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {
            "loss": loss,
            "ppl": jnp.exp(jnp.minimum(loss, 20.0)),
            "token_acc": acc,
        }
