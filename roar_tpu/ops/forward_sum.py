"""Forward-sum (One-TTS-Alignment) loss via a log-domain forward algorithm.

The reference evaluates this with cuDNN CTC
(roar/collections/tts/losses/aligner_loss.py:14-71 `ForwardSumLoss`): the
attention log-prob matrix is padded with a blank column (logprob -1), masked
beyond the text length, log-softmaxed over the text axis, and scored with
`torch.nn.CTCLoss(zero_infinity=True)` against the target sequence
[1, 2, ..., K].

Because the targets are strictly increasing (no repeated labels), the general
CTC recursion specializes cleanly; we implement the standard 2K+1-state
alpha recursion as a `lax.scan` over mel frames — fully on-device, jittable,
differentiable, and batched.  Reduction matches torch CTCLoss defaults:
mean over the batch of (nll / target_length), with zero_infinity clamping.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# Loop-unroll factor for the alpha-recursion scan — a measured WASH, kept
# at 1 (unroll=8: ±1% on the full FastPitch step at b32/b64; the scans are
# not the step's floor — per-phase attribution in DESIGN.md §7h).  Shared
# knob with ops/mas.py for future A/Bs.
_SCAN_UNROLL = int(os.environ.get("ROAR_ALIGN_SCAN_UNROLL", "1"))


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= _NEG_INF, _NEG_INF, out)


def ctc_forward_sum(
    log_probs: jnp.ndarray,
    query_lens: jnp.ndarray,
    key_lens: jnp.ndarray,
) -> jnp.ndarray:
    """Negative log-likelihood of the monotonic-alignment CTC lattice.

    Args:
        log_probs: [B, T_query, K+1] log-probabilities over symbols
            {blank=0, 1..K} (already log-softmaxed).
        query_lens: [B] number of valid query (mel) frames.
        key_lens: [B] number of target labels (text tokens); the target
            sequence for row b is [1, ..., key_lens[b]].

    Returns:
        [B] negative log-likelihoods (not length-normalized).
    """
    b, t_query, kp1 = log_probs.shape
    k = kp1 - 1
    n_states = 2 * k + 1  # blank, label1, blank, label2, ..., labelK, blank

    state_idx = jnp.arange(n_states)
    is_label = (state_idx % 2) == 1
    # symbol emitted by each state: blanks -> 0, label state s -> (s+1)//2
    sym = jnp.where(is_label, (state_idx + 1) // 2, 0)

    def emit(lp_t):  # lp_t: [B, K+1] -> [B, n_states]
        return lp_t[:, sym]

    lp0 = emit(log_probs[:, 0])
    alpha0 = jnp.full((b, n_states), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp0[:, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(k >= 1, lp0[:, 1], _NEG_INF))

    # Labels are all distinct, so the skip (s-2) transition is always legal
    # for label states; blanks only take (s) and (s-1).
    can_skip = is_label

    def step(carry, inputs):
        alpha, t = carry, inputs[0]
        lp_t = inputs[1]  # [B, K+1]
        a1 = alpha
        a2 = jnp.concatenate([jnp.full((b, 1), _NEG_INF), alpha[:, :-1]], axis=1)
        a3 = jnp.concatenate([jnp.full((b, 2), _NEG_INF), alpha[:, :-2]], axis=1)
        a3 = jnp.where(can_skip[None, :], a3, _NEG_INF)
        new = _logaddexp3(a1, a2, a3) + emit(lp_t)
        active = (t < query_lens)[:, None]
        alpha = jnp.where(active, new, alpha)
        return alpha, None

    ts = jnp.arange(1, t_query)
    alpha, _ = jax.lax.scan(
        step, alpha0, (ts, jnp.swapaxes(log_probs[:, 1:], 0, 1)),
        unroll=_SCAN_UNROLL,
    )

    # Final states: last label (2*key_len - 1) and trailing blank (2*key_len).
    last_label = jnp.take_along_axis(alpha, (2 * key_lens - 1)[:, None], axis=1)[:, 0]
    last_blank = jnp.take_along_axis(alpha, (2 * key_lens)[:, None], axis=1)[:, 0]
    m = jnp.maximum(last_label, last_blank)
    m_safe = jnp.maximum(m, _NEG_INF)
    ll = m_safe + jnp.log(jnp.exp(last_label - m_safe) + jnp.exp(last_blank - m_safe))
    ll = jnp.where(m <= _NEG_INF, _NEG_INF, ll)
    return -ll


def forward_sum_loss(
    attn_logprob: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    blank_logprob: float = -1.0,
    loss_scale: float = 1.0,
) -> jnp.ndarray:
    """ForwardSumLoss (aligner_loss.py:14-71) — scalar loss.

    attn_logprob: [B, 1, T_mel, T_text] (or [B, T_mel, T_text]) unnormalized
    attention log-probs from the alignment encoder.
    """
    if attn_logprob.ndim == 4:
        attn_logprob = attn_logprob[:, 0]
    b, t_mel, t_text = attn_logprob.shape

    # Pad blank symbol column at index 0 with constant logprob.
    padded = jnp.pad(
        attn_logprob, ((0, 0), (0, 0), (1, 0)), constant_values=blank_logprob
    )
    # Mask symbols beyond key_len (key_inds > key_lens), then log_softmax.
    key_inds = jnp.arange(t_text + 1)
    invalid = key_inds[None, None, :] > text_lens[:, None, None]
    padded = jnp.where(invalid, -1e15, padded)
    log_probs = jax.nn.log_softmax(padded, axis=-1)

    nll = ctc_forward_sum(log_probs, mel_lens, text_lens)
    # torch.nn.CTCLoss default reduction: mean over batch of nll/target_len,
    # zero_infinity=True clamps non-finite entries to 0.  The infeasibility
    # test runs on the UNNORMALIZED nll (our -inf is the finite _NEG_INF
    # = -1e30, and 1e30/target_len can dip below any per-length threshold —
    # an infeasible utterance, text longer than its mel frames, must
    # contribute 0 exactly like torch's zero_infinity).
    per = nll / jnp.maximum(text_lens.astype(nll.dtype), 1.0)
    per = jnp.where(jnp.isfinite(nll) & (nll < 1e29), per, 0.0)
    return loss_scale * jnp.mean(per)


def bin_loss(
    hard_attention: jnp.ndarray,
    soft_attention: jnp.ndarray,
    loss_scale: float = 1.0,
) -> jnp.ndarray:
    """Binarization KL term (aligner_loss.py:74-99 `BinLoss`):
    -sum(log(soft at hard==1)) / sum(hard)."""
    picked = jnp.where(
        hard_attention == 1.0, jnp.log(jnp.clip(soft_attention, min=1e-12)), 0.0
    )
    total = jnp.sum(hard_attention)
    return loss_scale * (-jnp.sum(picked) / jnp.maximum(total, 1.0))
