"""Length / duration utilities: masks, length regulation, feature averaging,
segment slicing.

TPU-first re-implementations of the reference helpers:
- get_mask_from_lengths  (roar/collections/tts/parts/utils/helpers.py:105-127)
- regulate_len           (helpers.py:613-667) — cumsum+matmul length regulator
- average_features       (roar/collections/tts/modules/fastpitch.py:27-51)
- log_to_duration        (modules/fastpitch.py:54-57)
- rand_slice_segments / slice_segments (helpers.py:700-744)

All functions are shape-static and jittable: the data-dependent output length
of length regulation is handled by a caller-supplied static `max_len` plus a
returned `dec_lens` mask, which is the idiomatic XLA answer to the
reference's dynamic `dec_lens.max()`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mask_from_lens(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, max_len] bool mask, True for valid positions."""
    return jnp.arange(max_len)[None, :] < lens[:, None]


def regulate_len(
    durations: jnp.ndarray,
    enc_out: jnp.ndarray,
    pace: float = 1.0,
    max_len: Optional[int] = None,
    replicate_to_nearest_multiple: bool = False,
    group_size: int = 1,
    dur_lens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand encoder states by token durations (FastPitch length regulator).

    durations: [B, T_text] (float or int); enc_out: [B, T_text, C].
    Returns (enc_rep [B, max_len, C], dec_lens [B]).

    `max_len` must be static under jit (bucketed decoder length); positions
    beyond dec_lens are zero (the `mult` matrix has no active interval there),
    matching the reference's padding semantics (helpers.py:613-667).
    """
    if max_len is None:
        raise ValueError("regulate_len requires a static max_len under jit")
    dtype = enc_out.dtype
    reps = jnp.floor(durations.astype(jnp.float32) / pace + 0.5).astype(jnp.int32)
    if replicate_to_nearest_multiple and group_size > 1:
        if dur_lens is None:
            raise ValueError("group_size > 1 requires dur_lens")
        dec_lens = jnp.sum(reps, axis=1)
        to_pad = group_size * ((dec_lens + 1) // group_size) - dec_lens
        last = jax.nn.one_hot(dur_lens - 1, reps.shape[1], dtype=reps.dtype)
        reps = reps + last * to_pad[:, None]
    dec_lens = jnp.sum(reps, axis=1)

    reps_cumsum = jnp.cumsum(
        jnp.pad(reps, ((0, 0), (1, 0))), axis=1
    ).astype(jnp.float32)[:, None, :]  # [B, 1, T_text+1]
    rng = jnp.arange(max_len, dtype=jnp.float32)[None, :, None]  # [1, max_len, 1]
    mult = (reps_cumsum[:, :, :-1] <= rng) & (reps_cumsum[:, :, 1:] > rng)
    enc_rep = jax.lax.dot_general(
        mult.astype(dtype),
        enc_out,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    dec_lens = jnp.minimum(dec_lens, max_len)
    return enc_rep, dec_lens


def average_features(feats: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Average frame-level features over each token's duration span.

    feats: [B, n_formants, T_mel]; durs: [B, T_text] int or float.
    Returns [B, n_formants, T_text].  Nonzero-aware mean, exactly as
    modules/fastpitch.py:27-51 (`average_features`): frames with value 0 are
    excluded from the denominator; all-zero spans average to 0.

    Float durations (the durs_predicted inference path) follow the
    reference's `torch.cumsum(durs, dim=1).long()` exactly: the CUMULATIVE
    sums are truncated, so fractional durations accumulate into later bins
    — truncating each duration first would zero every sub-frame token.
    """
    if jnp.issubdtype(durs.dtype, jnp.integer):
        ends = jnp.cumsum(durs.astype(jnp.int32), axis=1)  # [B, T_text]
    else:
        ends = jnp.cumsum(durs, axis=1).astype(jnp.int32)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    t_mel = feats.shape[-1]
    # Clamp indices into the padded cumsum (positions beyond T_mel clip).
    ends = jnp.clip(ends, 0, t_mel)
    starts = jnp.clip(starts, 0, t_mel)

    nonzero_cums = jnp.pad(
        jnp.cumsum((feats != 0.0).astype(jnp.float32), axis=2), ((0, 0), (0, 0), (1, 0))
    )
    cums = jnp.pad(jnp.cumsum(feats.astype(jnp.float32), axis=2), ((0, 0), (0, 0), (1, 0)))

    def gather_spans(c):  # c: [B, n_formants, T_mel+1]
        e = jnp.take_along_axis(c, ends[:, None, :], axis=2)
        s = jnp.take_along_axis(c, starts[:, None, :], axis=2)
        return e - s

    sums = gather_spans(cums)
    nelems = gather_spans(nonzero_cums)
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


def log_to_duration(
    log_dur: jnp.ndarray, min_dur: float, max_dur: float, mask: jnp.ndarray
) -> jnp.ndarray:
    """exp(log_dur) - 1, clamped to [min_dur, max_dur], zero where masked
    (modules/fastpitch.py:54-57)."""
    dur = jnp.clip(jnp.exp(log_dur) - 1.0, min_dur, max_dur)
    return dur * mask.astype(dur.dtype)


def slice_segments(
    x: jnp.ndarray, start_idxs: jnp.ndarray, segment_size: int
) -> jnp.ndarray:
    """[B, C, T] -> [B, C, segment_size] slices at per-batch offsets
    (helpers.py:700-712) — a static-size dynamic_slice per batch element."""

    def take(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, s, segment_size, axis=-1)

    return jax.vmap(take)(x, start_idxs.astype(jnp.int32))


def rand_slice_segments(
    rng: jax.Array,
    x: jnp.ndarray,
    x_lengths: Optional[jnp.ndarray] = None,
    segment_size: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random fixed-size segments (helpers.py:728-744).

    Returns (segments [B, C, segment_size], start_idxs [B]).
    """
    b, _, t = x.shape
    if x_lengths is None:
        x_lengths = jnp.full((b,), t, jnp.int32)
    ids_str_max = jnp.maximum(x_lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_str_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def mask_sequence_tensor(tensor: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero out positions beyond per-row lengths along the LAST axis
    (ref helpers.py:852-876 mask_sequence_tensor).  Accepts [B, L],
    [B, D, L], or [B, D1, D2, L]."""
    if tensor.ndim not in (2, 3, 4):
        raise ValueError(
            "Can only mask tensors of shape B x L, B x D x L, or B x D1 x D2 x L"
        )
    max_len = tensor.shape[-1]
    mask = jnp.arange(max_len) < lengths.reshape(
        (-1,) + (1,) * (tensor.ndim - 1)
    )
    return tensor * mask.astype(tensor.dtype)
