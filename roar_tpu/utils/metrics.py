"""Common metrics.

Re-design of roar/collections/common/metrics/*.py (classification accuracy,
perplexity, global-average loss) as stateless jnp functions plus a tiny
streaming accumulator.
"""

from __future__ import annotations


import jax.numpy as jnp


def accuracy(logits, labels, mask=None, top_k: int = 1) -> jnp.ndarray:
    if top_k == 1:
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    else:
        topk = jnp.argsort(logits, axis=-1)[..., -top_k:]
        correct = jnp.any(topk == labels[..., None], axis=-1).astype(jnp.float32)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(correct)


def perplexity(log_probs, labels, mask=None) -> jnp.ndarray:
    """exp(mean NLL); log_probs [..., C]."""
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    if mask is not None:
        mask = mask.astype(nll.dtype)
        mean_nll = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        mean_nll = jnp.mean(nll)
    return jnp.exp(mean_nll)


class GlobalAverageLossMetric:
    """Streaming weighted mean (common/metrics GlobalAverageLossMetric)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0.0

    def update(self, loss: float, num_measurements: float = 1.0) -> None:
        self.total += float(loss) * num_measurements
        self.count += num_measurements

    def compute(self) -> float:
        return self.total / max(self.count, 1.0)

    def reset(self) -> None:
        self.total, self.count = 0.0, 0.0
