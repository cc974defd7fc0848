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

import functools
import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite -inf stand-in: keeps max/compare well-defined in fp32

# Loop-unroll factor for the DP/backtrack scans — a measured WASH, kept at
# 1: unroll=8 gave 83.4 vs 82.5 ms (b32) and 144.6 vs 146.4 ms (b64) on the
# full FastPitch step (bf16, v5e), i.e. the 864-step scans are not the
# step's latency floor (per-phase attribution in DESIGN.md §7g).  Shared
# knob with ops/forward_sum.py for future A/Bs.
_SCAN_UNROLL = int(os.environ.get("ROAR_ALIGN_SCAN_UNROLL", "1"))

# Block size for the blocked (two-level banded max-plus) MAS formulation in
# `mas_width1_blocked`; 0 selects the plain sequential scans.  Output is
# bit-identical either way (test_mas.py), so this is purely a schedule
# knob — see DESIGN.md §7h for the measured A/B on the chip.
_MAS_BLOCK = int(os.environ.get("ROAR_MAS_BLOCK", "0"))


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


def _shift_right(x, e: int, fill):
    """x[..., j] -> x[..., j-e] with `fill` for j < e (static shift)."""
    if e == 0:
        return x
    if e >= x.shape[-1]:
        return jnp.full(x.shape, fill, x.dtype)
    pad = jnp.full(x.shape[:-1] + (e,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-e]], axis=-1)


def _combine_banded_maxplus(b_late, b_early):
    """Compose banded max-plus operators: `early` applied first.

    An operator T acts as  (T o p)[j] = max_d band[d][..., j] + p[..., j-d].
    Band layout: band[d][..., j] := T[j, j-d].  Composition
    C = late (x) early  has  bandC[d][j] = max_e bandL[e][j] + bandE[d-e][j-e]
    (lower-banded: the DP only ever moves j forward).  Shapes
    [n, P, ..., T] -> [n, Pl+Pe-1, ..., T]; the d/e loops are static
    (P <= block+1) and XLA fuses each d-row into one kernel.
    """
    pl, pe = b_late.shape[1], b_early.shape[1]
    # a sub-diagonal d >= T_text can never land on a valid (j, j-d) pair,
    # so the band is capped at T_text rows (keeps the shift widths legal
    # and drops dead work when block > T_text)
    rows = []
    for d in range(min(pl + pe - 1, b_late.shape[-1])):
        terms = [
            b_late[:, e] + _shift_right(b_early[:, d - e], e, _NEG_INF)
            for e in range(max(0, d - (pe - 1)), min(pl - 1, d) + 1)
        ]
        rows.append(functools.reduce(jnp.maximum, terms))
    return jnp.stack(rows, axis=1)


def mas_width1_blocked(
    log_attn: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    block: int = 32,
) -> jnp.ndarray:
    """`mas_width1` with O(sqrt-ish) sequential depth instead of O(T_mel).

    Same output — bit-identical, see test_mas.py equivalence over
    shapes/lengths — different schedule.  The per-frame Viterbi update
    p[j] = row[j] + max(p[j], p[j-1]) is a banded max-plus linear operator,
    so a block of `block` frames composes (associatively, via
    `_combine_banded_maxplus` trees, parallel across blocks) into one
    banded operator; one short `lax.scan` applies block operators
    sequentially, and a second K-step scan — vectorized across all blocks —
    rebuilds the interior DP rows the backtrack needs.  The backtrack
    itself is frame-i map composition  j -> j - move[i, j] (gather
    composition, same two-level tree + short scans).  Sequential depth:
    863+863 dependent tiny ops -> ~(T/K + K) per direction.

    MEASURED NEGATIVE on v5e (kept as the documented answer to "is the MAS
    scan floor reducible?"): at FastPitch shapes (b32, 864x160) the
    sequential scans take 3.55 ms; this formulation takes 56-88 ms across
    block sizes 16-256, because depth reduction multiplies bytes — each
    composed operator carries a band of width ~block, so HBM traffic
    scales x block while the scan touches one [B, T_text] row per frame.
    The scan is already at the per-op dispatch floor (~4.1 us/frame);
    parallelizing the dependency chain cannot win.  Full math and the A/B
    table: DESIGN.md §7h.  Selectable anyway via ROAR_MAS_BLOCK for other
    shapes/hardware.
    """
    b, t_mel, t_text = log_attn.shape
    if t_mel <= 2 or block < 2:
        return mas_width1(log_attn, text_lens, mel_lens)
    # power-of-2 block for the pairwise tree
    k = 1 << max(1, int(block).bit_length() - 1)

    text_idx = jnp.arange(t_text)
    mel_idx = jnp.arange(t_mel)
    col_valid = text_idx[None, :] < text_lens[:, None]  # [B, T_text]
    la = jnp.where(col_valid[:, None, :], log_attn, _NEG_INF)
    first = jnp.where(text_idx[None, :] == 0, la[:, 0, :], _NEG_INF)

    # ---- forward DP over frames 1..t_mel-1, blocked ----
    rows = jnp.swapaxes(la[:, 1:, :], 0, 1)  # [R, B, T_text]
    r = t_mel - 1
    g = -(-r // k)  # blocks
    pad = g * k - r
    # identity operator pad: stay-cost 0, advance-cost -inf
    rows_p = jnp.concatenate(
        [rows, jnp.zeros((pad, b, t_text), rows.dtype)], axis=0
    )
    ident_tail = (jnp.arange(g * k) < r)[:, None, None]  # real-frame mask
    band0 = rows_p  # T[j,j]; pad rows are 0 = identity stay-cost
    band1 = jnp.where(ident_tail, rows_p, _NEG_INF)  # T[j,j-1]
    ops = jnp.stack([band0, band1], axis=1)  # [G*K, 2, B, T]
    while ops.shape[0] > g:
        ops = _combine_banded_maxplus(ops[1::2], ops[0::2])

    def block_step(p, op):  # op: [P, B, T]
        terms = [op[d] + _shift_right(p, d, _NEG_INF) for d in range(op.shape[0])]
        p_new = functools.reduce(jnp.maximum, terms)
        return p_new, p  # emit the block-START value

    _, p_starts = jax.lax.scan(block_step, first, ops)  # [G, B, T]

    # interior rows, vectorized across blocks: frame (1 + g*k + j)
    rows_blk = rows_p.reshape(g, k, b, t_text).swapaxes(0, 1)  # [K, G, B, T]

    def intra_step(p, row):
        cur = row + jnp.maximum(p, _shift_right(p, 1, _NEG_INF))
        return cur, cur

    _, intra = jax.lax.scan(intra_step, p_starts, rows_blk)  # [K, G, B, T]
    log_p_rest = intra.swapaxes(0, 1).reshape(g * k, b, t_text)[:r]
    log_p = jnp.concatenate([first[None], log_p_rest], axis=0)  # [T_mel, B, T]

    # ---- backtrack as blocked map composition ----
    # frame i in 1..t_mel-1 maps j -> j-1 iff log_p[i-1, j-1] >= log_p[i-1, j]
    # (and j>0 and the frame is active); inactive frames are identity.
    prev = log_p[:-1]  # [R, B, T]; prev[i-1] belongs to frame i
    move = (_shift_right(prev, 1, jnp.inf) >= prev) & (text_idx > 0)
    active = (mel_idx[1:, None] < mel_lens[None, :])[..., None]  # [R, B, 1]
    step_back = (move & active).astype(jnp.int32)
    fmaps = text_idx[None, None, :] - step_back  # [R, B, T], frame 1..T-1

    # application order: frame t_mel-1 first, then t_mel-2, ...
    fmaps_app = fmaps[::-1]
    fmaps_app = jnp.concatenate(
        [
            fmaps_app,
            jnp.broadcast_to(text_idx, (pad, b, t_text)).astype(jnp.int32),
        ],
        axis=0,
    )  # pad with identity maps at the END of application order

    def compose(m_first, m_then):
        # (then o first)(j) = then[first[j]]
        return jnp.take_along_axis(m_then, m_first, axis=-1)

    mops = fmaps_app
    while mops.shape[0] > g:
        mops = compose(mops[0::2], mops[1::2])  # [n/2, B, T]

    j_init = text_lens - 1  # j at frame t_mel-1

    def mblock_step(j, mop):  # mop: [B, T]
        j_new = jnp.take_along_axis(mop, j[:, None], axis=-1)[:, 0]
        return j_new, j  # emit j at block ENTRY

    _, j_starts = jax.lax.scan(mblock_step, j_init, mops)  # [G, B]

    maps_blk = fmaps_app.reshape(g, k, b, t_text).swapaxes(0, 1)  # [K, G, B, T]

    def mintra_step(j, m):  # j: [G, B], m: [G, B, T]
        j_new = jnp.take_along_axis(m, j[..., None], axis=-1)[..., 0]
        return j_new, j_new

    _, j_intra = jax.lax.scan(mintra_step, j_starts, maps_blk)  # [K, G, B]
    # j after applying s+1 maps = j at frame t_mel-2-s
    j_seq = j_intra.swapaxes(0, 1).reshape(g * k, b)[:r]  # s = 0..R-1
    j_at = jnp.concatenate([j_seq[::-1], j_init[None]], axis=0)  # frames 0..T-1

    opt = jax.nn.one_hot(j_at, t_text, dtype=jnp.float32)  # [T_mel, B, T]
    opt = jnp.swapaxes(opt, 0, 1)
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
    la = jnp.log(jnp.clip(a, min=eps))
    if _MAS_BLOCK > 1:
        hard = mas_width1_blocked(la, text_lens, mel_lens, block=_MAS_BLOCK)
    else:
        hard = mas_width1(la, text_lens, mel_lens)
    hard = jax.lax.stop_gradient(hard)
    return hard[:, None] if squeeze else hard
