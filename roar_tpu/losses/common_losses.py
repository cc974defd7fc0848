"""Common classification/regression losses.

Re-design of roar/collections/common/losses/*.py (CrossEntropyLoss,
SmoothedCrossEntropyLoss, NLLLoss, MSELoss, AggregatorLoss).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits, labels, mask=None, label_smoothing: float = 0.0):
    """logits [..., C], integer labels [...]; optional mask [...]."""
    n_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, n_classes)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) + label_smoothing / n_classes
    nll = -jnp.sum(one_hot * log_probs, axis=-1)
    if mask is not None:
        mask = mask.astype(nll.dtype)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(nll)


def smoothed_cross_entropy_loss(logits, labels, mask=None, smoothing: float = 0.1):
    return cross_entropy_loss(logits, labels, mask, label_smoothing=smoothing)


def nll_loss(log_probs, labels, mask=None):
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    if mask is not None:
        mask = mask.astype(nll.dtype)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(nll)


def mse_loss(preds, labels, mask=None):
    err = jnp.square(preds - labels)
    if mask is not None:
        mask = mask.astype(err.dtype)
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(err)


def aggregate_losses(losses: Sequence[jnp.ndarray], weights: Optional[Sequence[float]] = None):
    """Weighted sum of losses (AggregatorLoss)."""
    if weights is None:
        weights = [1.0] * len(losses)
    total = 0.0
    for l, w in zip(losses, weights):
        total = total + w * l
    return total
