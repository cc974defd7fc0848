"""Fused last-layer cross entropy: lm_head projection + log-softmax NLL
without ever materializing the [tokens, vocab] logits in HBM.

Why: the causal-LM loss is the one place a small-model training step
touches a [B*S, V] tensor (tiny-llama at B1/S4096/V32000: 0.5 GB of fp32
logits per microbatch, then log_softmax + gather + the backward's dlogits
— several more full passes).  The matmul FLOPs are unavoidable; the HBM
round-trips are not.  This op chunks the token axis and keeps each
[chunk, V] logits tile transient: the forward saves only the per-token
logsumexp (+ gold logit), and the custom VJP recomputes each tile once to
form (softmax - onehot) on the fly, accumulating dW in a scan carry.
Peak live loss memory drops from O(tokens * V) to O(chunk * V) + the dW
accumulator (which IS the lm_head gradient, so it exists either way).

Matches the reference's fused-xentropy intent
(roar/collections/nlp/losses/fused_cross_entropy.py — a Triton kernel
that also recomputes logits tiles in backward); here the tiles are plain
XLA matmuls under `lax.scan`, which the TPU compiler pipelines, so no
Pallas is needed to keep the MXU busy.

Numerics: identical math to
    logits = x @ w + b; nll = logsumexp(logits) - logits[gold]
with fp32 logsumexp/softmax regardless of x/w dtype (matmuls accumulate
fp32 via preferred_element_type); pinned against the unfused formulation
in tests/test_gpt.py (values and gradients).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _chunk_tokens(n: int, chunk: int) -> int:
    """Largest divisor of n that is <= chunk (static shapes: every scan
    step sees the same tile)."""
    c = min(chunk, n)
    while n % c:
        c -= 1
    return c


def _tile_fwd(x_c, w, b, tgt_c):
    """One [C, D] tile -> (lse [C], gold [C], argmax-correct [C]) fp32."""
    logits = jnp.dot(x_c, w, preferred_element_type=jnp.float32)
    if b is not None:
        logits = logits + b.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, tgt_c[:, None], axis=-1)[:, 0]
    correct = (jnp.argmax(logits, axis=-1) == tgt_c).astype(jnp.float32)
    return lse, gold, correct


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_nll(x, w, b, targets, weights, chunk: int):
    """Returns (weighted NLL sum [scalar fp32], correct-count sum).

    x: [N, D] hidden states, w: [D, V], b: [V] or None,
    targets: [N] int, weights: [N] fp32 per-token loss weights.
    """
    n = x.shape[0]
    c = _chunk_tokens(n, chunk)

    def body(carry, args):
        loss_sum, corr_sum = carry
        x_c, tgt_c, w_c = args
        lse, gold, correct = _tile_fwd(x_c, w, b, tgt_c)
        loss_sum = loss_sum + jnp.sum((lse - gold) * w_c)
        corr_sum = corr_sum + jnp.sum(correct * w_c)
        return (loss_sum, corr_sum), None

    xs = (x.reshape(n // c, c, -1), targets.reshape(n // c, c),
          weights.reshape(n // c, c))
    (loss, corr), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), xs)
    return loss, corr


def _fused_nll_fwd(x, w, b, targets, weights, chunk: int):
    n = x.shape[0]
    c = _chunk_tokens(n, chunk)

    def body(carry, args):
        loss_sum, corr_sum = carry
        x_c, tgt_c, w_c = args
        lse, gold, correct = _tile_fwd(x_c, w, b, tgt_c)
        loss_sum = loss_sum + jnp.sum((lse - gold) * w_c)
        corr_sum = corr_sum + jnp.sum(correct * w_c)
        return (loss_sum, corr_sum), lse

    xs = (x.reshape(n // c, c, -1), targets.reshape(n // c, c),
          weights.reshape(n // c, c))
    (loss, corr), lses = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)), xs)
    return (loss, corr), (x, w, b, targets, weights, lses)


def _fused_nll_bwd(chunk: int, res, cts):
    x, w, b, targets, weights, lses = res
    dloss, _ = cts  # the correct-count output is metrics-only (no grad)
    n, d = x.shape
    v = w.shape[1]
    c = _chunk_tokens(n, chunk)

    def body(dw_acc_db, args):
        dw_acc, db_acc = dw_acc_db
        x_c, tgt_c, w_c, lse = args
        # recompute the tile's logits (the remat that keeps [N, V] dead)
        logits = jnp.dot(x_c, w, preferred_element_type=jnp.float32)
        if b is not None:
            logits = logits + b.astype(jnp.float32)
        p = jnp.exp(logits - lse[:, None])  # softmax via the saved lse
        onehot = jax.nn.one_hot(tgt_c, v, dtype=jnp.float32)
        dlogits = (p - onehot) * (w_c * dloss)[:, None]
        dx_c = jnp.dot(dlogits.astype(x_c.dtype), w.T.astype(x_c.dtype),
                       preferred_element_type=jnp.float32).astype(x_c.dtype)
        dw_acc = dw_acc + jnp.dot(x_c.T.astype(jnp.float32), dlogits,
                                  preferred_element_type=jnp.float32)
        if db_acc is not None:
            db_acc = db_acc + jnp.sum(dlogits, axis=0)
        return (dw_acc, db_acc), dx_c

    xs = (x.reshape(n // c, c, d), targets.reshape(n // c, c),
          weights.reshape(n // c, c), lses)
    db0 = None if b is None else jnp.zeros((v,), jnp.float32)
    (dw, db), dx = jax.lax.scan(
        body, (jnp.zeros((d, v), jnp.float32), db0), xs)
    dx = dx.reshape(n, d)
    db_out = None if b is None else db.astype(b.dtype)
    return dx, dw.astype(w.dtype), db_out, None, None


_fused_nll.defvjp(_fused_nll_fwd, _fused_nll_bwd)


def fused_cross_entropy(
    hidden: jnp.ndarray,
    w: jnp.ndarray,
    labels: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    loss_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean next-token NLL of ``hidden @ w (+ bias)`` against ``labels``.

    Args:
        hidden: [..., D] pre-lm_head hidden states (any float dtype; the
            logits tiles accumulate fp32).
        w: [D, V] lm_head kernel (flax ``nn.Dense`` layout).
        labels: [...] int target ids, same leading shape as hidden.
        bias: optional [V] lm_head bias (phi's ``lm_head_bias``).
        loss_mask: optional [...] 0/1 weights; mean is over the mask sum.
        chunk: target tokens per tile (rounded down to a divisor of the
            token count so shapes stay static).

    Returns:
        (loss, token_accuracy) — both scalar fp32, exactly matching the
        unfused ``logsumexp(logits) - logits[gold]`` formulation.
    """
    d = hidden.shape[-1]
    x = hidden.reshape(-1, d)
    tgt = labels.reshape(-1)
    if loss_mask is None:
        wts = jnp.ones(x.shape[:1], jnp.float32)
    else:
        wts = loss_mask.reshape(-1).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(wts), 1.0)
    loss_sum, corr_sum = _fused_nll(x, w, bias, tgt, wts, chunk)
    return loss_sum / denom, corr_sum / denom
