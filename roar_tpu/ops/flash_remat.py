"""Remat-friendly causal flash attention: save the kernel's residuals.

Under layer-granular ``jax.checkpoint`` (GPT ``remat=True``), the upstream
Pallas flash kernel's VJP residuals (softmax row max ``m`` and normalizer
``l``) live inside its ``custom_vjp`` and are therefore *recomputed* in the
backward pass — the whole forward kernel runs again (measured: 116 ms of a
1673 ms tiny-llama-1.1B step, per-op trace in DESIGN.md §7i).  Those
residuals are small once sliced ([B, H, S] fp32 + the bf16 output ≈ 17
MB/layer at B=1 S=4096), so the right trade is to SAVE them across the
remat boundary instead.

This module re-wraps the upstream kernel in a ``custom_vjp`` whose forward
returns the residuals through ``jax.ad_checkpoint.checkpoint_name`` marks;
with ``jax.checkpoint_policies.save_only_these_names(*FLASH_SAVEABLE)``
(GPTConfig ``remat_policy="flash"``) the backward pass consumes the stored
(out, l, m) and runs only the two backward kernels.  Everything else in the
block (norms, projections, MLP) still rematerializes.

The backward math mirrors the upstream ``_flash_attention_bwd`` exactly
(same kernels, same block sizes), so gradients are bit-identical to the
recompute path; pinned by tests/test_gpt.py::test_flash_remat_policy.

Reference model being trained: /root/reference/roar/collections/nlp/modules/gpt/gpt.py
(the reference has no TPU/remat analogue; this is net-new TPU engineering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from jax.experimental.pallas.ops.tpu import flash_attention as _fa

# Names a remat policy should save to skip the forward-kernel recompute.
FLASH_SAVEABLE = ("flash_out", "flash_lse_l", "flash_lse_m")


def flash_remat_policy():
    """Checkpoint policy: save flash outputs+residuals, recompute the rest."""
    return jax.checkpoint_policies.save_only_these_names(*FLASH_SAVEABLE)


@functools.lru_cache(maxsize=None)
def _make_flash_saveable(causal: bool, sm_scale: float, bs_key):
    bs = _fa.BlockSizes(*bs_key)

    @jax.custom_vjp
    def flash(q, k, v):
        return _fa._flash_attention(
            q, k, v, None, None, False, causal, sm_scale, bs, False
        )

    def fwd(q, k, v):
        o, l, m = _fa._flash_attention(
            q, k, v, None, None, True, causal, sm_scale, bs, False
        )
        o = checkpoint_name(o, "flash_out")
        l = checkpoint_name(l, "flash_lse_l")
        m = checkpoint_name(m, "flash_lse_m")
        return o, (q, k, v, o, l, m)

    def bwd(res, do):
        q, k, v, o, l, m = res
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
        dk, dv = _fa._flash_attention_bwd_dkv(
            q, k, v, None, None, l, m, do, di,
            block_q_major=bs.block_q_major_dkv,
            block_k_major=bs.block_k_major_dkv,
            block_k=bs.block_k_dkv,
            block_q=bs.block_q_dkv,
            sm_scale=sm_scale,
            causal=causal,
            mask_value=_fa.DEFAULT_MASK_VALUE,
            debug=False,
        )
        dq, _ds = _fa._flash_attention_bwd_dq(
            q, k, v, None, None, l, m, do, di,
            block_q_major=bs.block_q_dq,
            block_k_major=bs.block_k_major_dq,
            block_k=bs.block_k_dq,
            sm_scale=sm_scale,
            causal=causal,
            mask_value=_fa.DEFAULT_MASK_VALUE,
            debug=False,
        )
        return dq, dk, dv

    flash.defvjp(fwd, bwd)
    return flash


def flash_attention_saveable(q, k, v, *, causal, sm_scale, block_sizes):
    """Upstream-kernel flash attention whose residuals survive remat.

    q/k/v: [B, H, S, D] (kernel-native layout).  No segment-id support —
    callers with padding masks keep the plain upstream path (segment ids
    are integer inputs a custom_vjp cannot carry cleanly, and the padded
    GPT training batches that need them are not the remat hot path).
    """
    bs_key = (
        block_sizes.block_q, block_sizes.block_k_major, block_sizes.block_k,
        block_sizes.block_b, block_sizes.block_q_major_dkv,
        block_sizes.block_k_major_dkv, block_sizes.block_k_dkv,
        block_sizes.block_q_dkv, block_sizes.block_k_major_dq,
        block_sizes.block_k_dq, block_sizes.block_q_dq,
    )
    return _make_flash_saveable(bool(causal), float(sm_scale), bs_key)(q, k, v)
