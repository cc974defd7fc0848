"""Monotonic Alignment Search (MAS), on-device.

The reference binarizes soft alignments with a Numba CPU kernel every
training step, paying a device->host->device round trip
(roar/collections/tts/parts/utils/helpers.py:90-102 `binarize_attention_parallel`
-> :198-224 `mas_width1` / :227-235 `b_mas`).  Here the same width-1 Viterbi
DP runs on the TPU as two `lax.scan`s (forward DP over mel frames, reverse
backtrack), vectorized over the batch — no host sync, fully jittable and
differentiable-free (it is used under stop_gradient anyway).

Width-1 recurrence (mel-major):
    log_p[0, :]  = log_attn[0, :] with log_p[0, 1:] = -inf
    log_p[i, j]  = log_attn[i, j] + max(log_p[i-1, j], log_p[i-1, j-1])
Backtrack from (out_len-1, in_len-1), stepping j -> j-1 when
log_p[i-1, j-1] >= log_p[i-1, j].
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite -inf stand-in: keeps max/compare well-defined in fp32

# Loop-unroll factor for the DP/backtrack scans — a measured WASH, kept at
# 1: unroll=8 gave 83.4 vs 82.5 ms (b32) and 144.6 vs 146.4 ms (b64) on the
# full FastPitch step (bf16, v5e), i.e. the 864-step scans are not the
# step's latency floor (per-phase attribution in DESIGN.md §7h).  Shared
# knob with ops/forward_sum.py for future A/Bs.
_SCAN_UNROLL = int(os.environ.get("ROAR_ALIGN_SCAN_UNROLL", "1"))


def mas_width1(
    log_attn: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
) -> jnp.ndarray:
    """Batched width-1 MAS.

    Args:
        log_attn: [B, T_mel, T_text] log of the soft attention (padded).
        text_lens: [B] valid text lengths (``in_lens`` in the reference).
        mel_lens: [B] valid mel lengths (``out_lens``).

    Returns:
        [B, T_mel, T_text] float32 hard alignment (0/1), zero outside the
        valid region — matching `b_mas` (helpers.py:227-235).
    """
    b, t_mel, t_text = log_attn.shape
    text_idx = jnp.arange(t_text)
    mel_idx = jnp.arange(t_mel)

    # Mask invalid text columns to -inf so the DP never selects them.
    col_valid = text_idx[None, :] < text_lens[:, None]  # [B, T_text]
    la = jnp.where(col_valid[:, None, :], log_attn, _NEG_INF)

    first = jnp.where(text_idx[None, :] == 0, la[:, 0, :], _NEG_INF)  # [B, T_text]

    def fwd_step(prev, row):
        # prev: [B, T_text] log_p of previous mel frame; row: [B, T_text]
        shifted = jnp.concatenate(
            [jnp.full((b, 1), _NEG_INF, prev.dtype), prev[:, :-1]], axis=1
        )
        cur = row + jnp.maximum(prev, shifted)
        return cur, cur

    rows = jnp.swapaxes(la[:, 1:, :], 0, 1)  # [T_mel-1, B, T_text]
    _, log_p_rest = jax.lax.scan(fwd_step, first, rows, unroll=_SCAN_UNROLL)
    log_p = jnp.concatenate([first[None], log_p_rest], axis=0)  # [T_mel, B, T_text]

    # Backtrack from i = t_mel-1 down to 1; rows >= mel_len are inactive and
    # simply carry j along (their one-hot rows are masked out afterwards).
    j_init = text_lens - 1  # [B]

    def bwd_step(j, inputs):
        i, prev_log_p = inputs  # scalar step index, [B, T_text] = log_p[i-1]
        onehot = jax.nn.one_hot(j, t_text, dtype=jnp.float32)
        take = jnp.take_along_axis(prev_log_p, j[:, None], axis=1)[:, 0]
        take_m1 = jnp.take_along_axis(
            prev_log_p, jnp.maximum(j - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (take_m1 >= take) & (j > 0)
        active = i < mel_lens
        j_next = jnp.where(active & move, j - 1, j)
        return j_next, (onehot, active)

    # Step k visits mel frame i = t_mel-1-k with log_p[i-1] as the lookup row.
    j_final, (onehots, actives) = jax.lax.scan(
        bwd_step, j_init, (mel_idx[1:][::-1], log_p[:-1][::-1]),
        unroll=_SCAN_UNROLL,
    )

    # onehots[k] corresponds to mel frame i = t_mel-1-k; un-reverse.
    opt_rest = onehots[::-1] * actives[::-1][..., None].astype(jnp.float32)
    opt_rest = jnp.swapaxes(opt_rest, 0, 1)  # [B, T_mel-1, T_text] frames 1..
    opt_first = jax.nn.one_hot(j_final, t_text, dtype=jnp.float32)[:, None, :]
    opt = jnp.concatenate([opt_first, opt_rest], axis=1)

    # Zero out anything outside the valid rectangle.
    row_valid = (mel_idx[None, :] < mel_lens[:, None])[..., None]
    return opt * row_valid * col_valid[:, None, :]


def binarize_attention(
    attn_soft: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Hard alignment from soft attention probabilities.

    Drop-in for `binarize_attention_parallel` (helpers.py:90-102), minus the
    CPU round trip.  attn_soft: [B, 1, T_mel, T_text] or [B, T_mel, T_text].
    """
    squeeze = attn_soft.ndim == 4
    a = attn_soft[:, 0] if squeeze else attn_soft
    hard = mas_width1(jnp.log(jnp.clip(a, min=eps)), text_lens, mel_lens)
    hard = jax.lax.stop_gradient(hard)
    return hard[:, None] if squeeze else hard
