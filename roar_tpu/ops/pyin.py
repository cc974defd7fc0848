"""Batched pYIN pitch tracking on device (JAX/XLA).

The reference extracts F0 with ``librosa.pyin`` on CPU dataloader workers —
the single hottest kernel of sup-data extraction
(roar/collections/tts/data/dataset.py:695-708, SURVEY.md §2.9 #9).  This is a
from-scratch, batched, jit-compiled implementation of the pYIN algorithm
(Mauch & Dixon 2014) with librosa-compatible semantics and defaults:

1. CMNDF (cumulative-mean-normalized difference) per frame, computed with an
   FFT autocorrelation — one big batched rFFT instead of librosa's per-frame
   numpy loop.
2. Parabolic interpolation of trough positions.
3. Trough priors: beta-distributed threshold sweep + Boltzmann weighting over
   trough rank (all threshold constants precomputed host-side with scipy).
4. HMM over 2*n_pitch_bins states (voiced bins + unvoiced twins) with a
   triangle-window local transition kernel and voiced<->unvoiced switch
   probability; Viterbi decoded with a `lax.scan` + backtrack.

Everything is static-shape and batched over utterances, so a whole manifest
shard can be pushed through one jit call on a TPU chip.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TINY = 1.1754944e-38  # float32 tiny, matches np.finfo(np.float32).tiny
_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class PyinConfig:
    """pYIN parameters; defaults mirror librosa.pyin's signature."""

    sample_rate: int = 22050
    fmin: float = 65.40639132514966  # C2, librosa note_to_hz('C2')
    fmax: float = 2093.004522404789  # C7
    frame_length: int = 2048
    win_length: Optional[int] = None  # -> frame_length // 2
    hop_length: Optional[int] = None  # -> frame_length // 4
    n_thresholds: int = 100
    beta_a: float = 2.0
    beta_b: float = 18.0
    boltzmann_parameter: float = 2.0
    resolution: float = 0.1
    max_transition_rate: float = 35.92
    switch_prob: float = 0.01
    no_trough_prob: float = 0.01
    fill_na: float = 0.0
    center: bool = True

    @property
    def win(self) -> int:
        return self.win_length or self.frame_length // 2

    @property
    def hop(self) -> int:
        return self.hop_length or self.frame_length // 4

    @property
    def min_period(self) -> int:
        return max(int(math.ceil(self.sample_rate / self.fmax)), 1)

    @property
    def max_period(self) -> int:
        return min(
            int(math.floor(self.sample_rate / self.fmin)),
            self.frame_length - self.win - 1,
        )

    @property
    def n_periods(self) -> int:
        return self.max_period - self.min_period + 1

    @property
    def n_bins_per_semitone(self) -> int:
        return int(math.ceil(1.0 / self.resolution))

    @property
    def n_pitch_bins(self) -> int:
        return (
            int(
                math.floor(
                    12 * self.n_bins_per_semitone * math.log2(self.fmax / self.fmin)
                )
            )
            + 1
        )

    @property
    def max_semitones_per_frame(self) -> int:
        return round(self.max_transition_rate * 12 * self.hop / self.sample_rate)

    @property
    def transition_width(self) -> int:
        return self.max_semitones_per_frame * self.n_bins_per_semitone + 1

    def num_frames(self, num_samples: int) -> int:
        if self.center:
            return num_samples // self.hop + 1
        return (num_samples - self.frame_length) // self.hop + 1

    def freqs(self) -> np.ndarray:
        """Pitch-bin center frequencies [n_pitch_bins]."""
        return self.fmin * 2.0 ** (
            np.arange(self.n_pitch_bins) / (12 * self.n_bins_per_semitone)
        )


# ---------------------------------------------------------------------------
# Host-side static tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _beta_probs(n_thresholds: int, a: float, b: float) -> np.ndarray:
    """P(threshold bucket) under Beta(a, b), [n_thresholds]."""
    from scipy.stats import beta as beta_dist

    thresholds = np.linspace(0.0, 1.0, n_thresholds + 1)
    cdf = beta_dist.cdf(thresholds, a, b)
    return np.diff(cdf).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _band_tables(n_pitch_bins: int, transition_width: int):
    """(log_tri [W], log_norm [N]) for the banded triangle transition.

    local[i, j] = tri(j - i) / norm(i) for |j - i| <= W//2; the banded
    Viterbi folds -log_norm into the source value and max-convolves with
    log_tri — mathematically identical to the dense matrix but ~W/N of the
    work per step.
    """
    n, width = n_pitch_bins, transition_width
    half = width // 2
    offsets = np.arange(-half, half + 1)
    tri = 1.0 - np.abs(offsets) / float(half + 1)
    norm = np.zeros(n)
    for i in range(n):
        j = i + offsets
        valid = (j >= 0) & (j < n)
        norm[i] = tri[valid].sum()
    return (
        np.log(tri).astype(np.float32),
        np.log(norm).astype(np.float32),
    )


@functools.lru_cache(maxsize=8)
def _transition_matrix(
    n_pitch_bins: int, transition_width: int, switch_prob: float
) -> np.ndarray:
    """[2N, 2N] row-stochastic transition matrix.

    Local pitch movement is a row-normalized triangle window of
    `transition_width` bins; voiced<->unvoiced switching is a 2x2 kron factor
    — the same construction librosa builds with transition_local + kron.
    """
    n = n_pitch_bins
    width = transition_width
    local = np.zeros((n, n), dtype=np.float64)
    half = width // 2
    offsets = np.arange(-half, half + 1)
    tri = 1.0 - np.abs(offsets) / float(half + 1)  # triangle window, peak 1
    for i in range(n):
        j = i + offsets
        valid = (j >= 0) & (j < n)
        row = np.zeros(n)
        row[j[valid]] = tri[valid]
        local[i] = row / row.sum()
    switch = np.array(
        [[1.0 - switch_prob, switch_prob], [switch_prob, 1.0 - switch_prob]]
    )
    return np.kron(switch, local).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + CMNDF
# ---------------------------------------------------------------------------


def frame_audio(audio: jnp.ndarray, cfg: PyinConfig) -> jnp.ndarray:
    """[B, T, frame_length] frames; center pads with zeros (librosa's
    pyin pad_mode='constant').  Slice+reshape framing when hop divides the
    frame length (see ops/spectrogram.frame_signal)."""
    from roar_tpu.ops.spectrogram import frame_signal

    if cfg.center:
        pad = cfg.frame_length // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    return frame_signal(audio, cfg.frame_length, cfg.hop)


@functools.lru_cache(maxsize=8)
def _acf_dft_tables(fl: int, w: int, n_lags: int):
    """Real-DFT matmul tables for the windowed autocorrelation.

    TPU has no FFT unit — XLA FFTs run as slow generic kernels — so the
    rfft/irfft pair is expressed as three matmuls on the MXU, and the
    inverse transform keeps only the `n_lags` outputs the CMNDF needs
    (indices w .. w+n_lags-1) instead of all fl.
    """
    nfq = fl // 2 + 1
    n = np.arange(fl, dtype=np.float64)[:, None]
    k = np.arange(nfq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fl
    cos_f = np.cos(ang).astype(np.float32)  # [fl, nfq]
    sin_f = np.sin(ang).astype(np.float32)
    # inverse rows for selected output positions m = w .. w+n_lags-1
    m = np.arange(w, w + n_lags, dtype=np.float64)[None, :]
    k2 = np.arange(nfq, dtype=np.float64)[:, None]
    ang2 = 2.0 * np.pi * k2 * m / fl
    wgt = np.full((nfq, 1), 2.0)
    wgt[0] = 1.0
    if fl % 2 == 0:
        wgt[-1] = 1.0
    inv_cos = (wgt * np.cos(ang2) / fl).astype(np.float32)  # [nfq, n_lags]
    inv_sin = (-wgt * np.sin(ang2) / fl).astype(np.float32)
    return cos_f, sin_f, inv_cos, inv_sin


def cumulative_mean_normalized_difference(
    frames: jnp.ndarray, cfg: PyinConfig
) -> jnp.ndarray:
    """CMNDF d'(tau) for tau in [min_period, max_period].

    frames: [..., frame_length] -> [..., n_periods].
    Difference function d(tau) = r_t(0) + r_{t+tau}(0) - 2*acf(tau), with the
    autocorrelation computed in the frequency domain — as windowed-DFT
    matmuls restricted to the needed lags (see _acf_dft_tables).
    """
    fl, w = cfg.frame_length, cfg.win
    x = frames.astype(jnp.float32)
    n_lags = cfg.max_period + 1

    cos_f, sin_f, inv_cos, inv_sin = map(
        jnp.asarray, _acf_dft_tables(fl, w, n_lags)
    )
    head_rev = jnp.flip(x[..., : w + 1], axis=-1)
    re_a = x @ cos_f
    im_a = -(x @ sin_f)
    re_b = head_rev @ cos_f[: w + 1]
    im_b = -(head_rev @ sin_f[: w + 1])
    re_p = re_a * re_b - im_a * im_b
    im_p = re_a * im_b + im_a * re_b
    acf = re_p @ inv_cos + im_p @ inv_sin  # [..., n_lags] = irfft rows [w:]
    acf = jnp.where(jnp.abs(acf) < 1e-6, 0.0, acf)

    # Rolling window energy: E(tau) = sum_{i=tau+1}^{tau+w} x_i^2
    # (librosa alignment: cumsum[w+tau] - cumsum[tau])
    energy_cum = jnp.cumsum(jnp.square(x), axis=-1)
    energy = energy_cum[..., w : w + n_lags] - energy_cum[..., : n_lags]
    energy = jnp.where(jnp.abs(energy) < 1e-6, 0.0, energy)

    d = energy[..., :1] + energy - 2.0 * acf  # [..., n_lags]

    tau = jnp.arange(1, cfg.max_period + 1, dtype=jnp.float32)
    cum_mean = jnp.cumsum(d[..., 1 : cfg.max_period + 1], axis=-1) / tau
    numerator = d[..., cfg.min_period : cfg.max_period + 1]
    denominator = cum_mean[..., cfg.min_period - 1 : cfg.max_period]
    return numerator / (denominator + _TINY)


def parabolic_shifts(yin: jnp.ndarray) -> jnp.ndarray:
    """Sub-bin shift of each local extremum via parabola vertex; zero at the
    edges, for shifts >1 bin, and where curvature is non-positive."""
    y0 = yin[..., :-2]
    y1 = yin[..., 1:-1]
    y2 = yin[..., 2:]
    a = (y0 + y2 - 2.0 * y1) / 2.0
    b = (y2 - y0) / 2.0
    shift = -b / (2.0 * a + _TINY)
    shift = jnp.where(jnp.abs(shift) <= 1.0, shift, 0.0)
    pad = [(0, 0)] * (yin.ndim - 1) + [(1, 1)]
    return jnp.pad(shift, pad)


# ---------------------------------------------------------------------------
# Trough priors
# ---------------------------------------------------------------------------


def _boltzmann_pmf(k: jnp.ndarray, lam: float, n: jnp.ndarray) -> jnp.ndarray:
    """Boltzmann (truncated discrete exponential) pmf."""
    n = jnp.maximum(n.astype(jnp.float32), 1.0)
    return (
        (1.0 - jnp.exp(-lam))
        * jnp.exp(-lam * k.astype(jnp.float32))
        / (1.0 - jnp.exp(-lam * n))
    )


def trough_probabilities(yin: jnp.ndarray, cfg: PyinConfig) -> jnp.ndarray:
    """Per-period candidate probabilities, dense [..., n_periods].

    Non-trough positions carry probability 0.  Implements the pYIN trough
    prior: for each of `n_thresholds` beta-distributed tolerance thresholds,
    troughs below the threshold are ranked and weighted by a Boltzmann
    distribution over rank; the global minimum absorbs `no_trough_prob` of
    the mass of thresholds that admit no trough.
    """
    beta_probs = jnp.asarray(_beta_probs(cfg.n_thresholds, cfg.beta_a, cfg.beta_b))
    thresholds = jnp.linspace(0.0, 1.0, cfg.n_thresholds + 1)[1:]  # upper edges

    # local minima along the period axis (edges handled as librosa: index 0
    # is a trough iff yin[0] < yin[1]; last index never via localmin)
    prev_ = yin[..., :-2]
    cur = yin[..., 1:-1]
    next_ = yin[..., 2:]
    interior = (cur < prev_) & (cur <= next_)
    first = (yin[..., :1] < yin[..., 1:2])
    is_trough = jnp.concatenate(
        [first, interior, jnp.zeros_like(yin[..., :1], dtype=bool)], axis=-1
    )

    heights = jnp.where(is_trough, yin, jnp.inf)

    # [..., P, n_thresholds]: does this trough fall below each threshold?
    below = is_trough[..., :, None] & (heights[..., :, None] < thresholds)
    rank = jnp.cumsum(below, axis=-2) - 1  # rank of trough under threshold
    n_troughs = jnp.sum(below, axis=-2, keepdims=True)  # [..., 1, n_thresh]
    pmf = _boltzmann_pmf(rank, cfg.boltzmann_parameter, n_troughs)
    pmf = jnp.where(below, pmf, 0.0)
    probs = jnp.einsum("...pt,t->...p", pmf, beta_probs)

    # Global-minimum trough absorbs no-trough mass of the empty thresholds.
    global_min = jnp.argmin(heights, axis=-1)  # [...]
    min_height = jnp.min(heights, axis=-1)
    beta_cdf = jnp.cumsum(beta_probs)
    # number of thresholds with no trough below them == count(threshold <= h_min)
    n_empty = jnp.sum(thresholds[None] <= min_height[..., None], axis=-1)
    empty_mass = jnp.where(
        n_empty > 0, beta_cdf[jnp.maximum(n_empty - 1, 0)], 0.0
    )
    bonus = cfg.no_trough_prob * empty_mass
    onehot = jax.nn.one_hot(global_min, yin.shape[-1], dtype=probs.dtype)
    has_trough = jnp.any(is_trough, axis=-1, keepdims=True)
    probs = probs + jnp.where(has_trough, onehot * bonus[..., None], 0.0)
    return probs


def trough_probabilities_compact(
    yin: jnp.ndarray, cfg: PyinConfig, max_troughs: int = 128
) -> jnp.ndarray:
    """trough_probabilities with the period axis compacted to trough slots.

    The dense version materializes [frames, n_periods, n_thresholds]
    (~900M elements at bench shapes) although only the trough positions
    (typically 20-100 of ~330 periods) carry probability.  Here troughs are
    gathered into `max_troughs` slots (period order preserved via argsort of
    masked period indices), the identical rank/Boltzmann/threshold math runs
    on [frames, K, n_thresholds], and the result is scattered back — a
    ~P/K-fold cut of the dominant sup-data tensor.  Frames with more than
    `max_troughs` troughs (adversarial noise; >109 cannot occur for
    localmin-spaced troughs at K=128 with the default 327 periods) would
    drop the deepest-lag tail, so K defaults comfortably above the
    structural bound P/3 + 1.
    """
    beta_probs = jnp.asarray(_beta_probs(cfg.n_thresholds, cfg.beta_a, cfg.beta_b))
    thresholds = jnp.linspace(0.0, 1.0, cfg.n_thresholds + 1)[1:]

    p = yin.shape[-1]
    k_slots = min(max_troughs, p)
    prev_ = yin[..., :-2]
    cur = yin[..., 1:-1]
    next_ = yin[..., 2:]
    interior = (cur < prev_) & (cur <= next_)
    first = yin[..., :1] < yin[..., 1:2]
    is_trough = jnp.concatenate(
        [first, interior, jnp.zeros_like(yin[..., :1], dtype=bool)], axis=-1
    )
    heights = jnp.where(is_trough, yin, jnp.inf)

    # Compact the first K troughs into slots in period order WITHOUT
    # sort+gather: both serialize on TPU and measured as ~94% of this whole
    # stage (138.6 of 147 ms at bench shapes).  A trough's slot index is
    # simply its rank among troughs = cumsum(is_trough) - 1, so compaction
    # is a one-hot contraction over the period axis — same trick as the
    # writeback below, bit-identical results (each slot sums exactly one
    # product of the exact height with 1.0; fp32 accumulation is exact).
    tf32 = is_trough.astype(jnp.float32)
    slot_of = jnp.cumsum(tf32, axis=-1) - 1.0  # [F, P] rank among troughs
    onehot_slot = tf32[..., None] * (
        slot_of[..., None] == jnp.arange(k_slots, dtype=jnp.float32)
    )  # [F, P, K] — fused into the matmul operand, never hits HBM whole
    h_masked = jnp.where(is_trough, yin, 0.0)
    h_k = jnp.einsum(
        "...p,...pk->...k", h_masked, onehot_slot,
        precision=jax.lax.Precision.HIGHEST,
    )
    pos_f = jnp.einsum(
        "...p,...pk->...k",
        jnp.broadcast_to(jnp.arange(p, dtype=jnp.float32), yin.shape),
        onehot_slot,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_troughs_row = jnp.sum(tf32, axis=-1, keepdims=True)
    slot_valid = jnp.arange(k_slots)[None, :] < n_troughs_row
    pos_c = pos_f.astype(jnp.int32)
    h_k = jnp.where(slot_valid, h_k, jnp.inf)

    below = (
        slot_valid[..., :, None] & (h_k[..., :, None] < thresholds)
    ).astype(jnp.float32)
    # rank under each threshold = strictly-lower-triangular matmul over the
    # slot axis (MXU) — the log-depth cumsum runs on the VPU and is slower
    # at these shapes
    tril = jnp.asarray(np.tril(np.ones((k_slots, k_slots), np.float32), -1))
    rank = jnp.einsum("ij,...jt->...it", tril, below)
    n_troughs = jnp.sum(below, axis=-2, keepdims=True)
    pmf = _boltzmann_pmf(rank, cfg.boltzmann_parameter, n_troughs)
    pmf = jnp.where(below > 0, pmf, 0.0)
    probs_k = jnp.einsum("...pt,t->...p", pmf, beta_probs)

    # global-minimum bonus: computed over the FULL period axis (identical to
    # the dense version even if the min were beyond slot K)
    global_min = jnp.argmin(heights, axis=-1)
    min_height = jnp.min(heights, axis=-1)
    beta_cdf = jnp.cumsum(beta_probs)
    n_empty = jnp.sum(thresholds[None] <= min_height[..., None], axis=-1)
    empty_mass = jnp.where(n_empty > 0, beta_cdf[jnp.maximum(n_empty - 1, 0)], 0.0)
    bonus = cfg.no_trough_prob * empty_mass
    has_trough = jnp.any(is_trough, axis=-1)

    # slot probabilities back onto the period axis WITHOUT a scatter: TPU
    # scatters serialize (measured 10-100x slower than the whole rest of the
    # stage); the writeback is a batched one-hot contraction over the slot
    # axis instead — XLA fuses the (pos == q) comparison into the matmul
    # operand, so the [F, K, P] one-hot never hits HBM.  Bit-identical to
    # the scatter (slots land on distinct periods).
    onehot_pos = (
        pos_c[..., :, None] == jnp.arange(p)[None, None, :]
    ).astype(probs_k.dtype)
    probs_masked = jnp.where(slot_valid, probs_k, 0.0)
    # precision=HIGHEST: each output picks exactly ONE prob (slots land on
    # distinct periods), so MXU bf16 operand truncation would round every
    # trough probability; fp32 keeps the writeback bit-exact vs the scatter
    # at negligible cost (the contraction is ~3 GFLOP).
    out = jnp.einsum(
        "...k,...kq->...q", probs_masked, onehot_pos,
        precision=jax.lax.Precision.HIGHEST,
    )
    onehot = jax.nn.one_hot(global_min, p, dtype=out.dtype)
    out = out + jnp.where(has_trough[..., None], onehot * bonus[..., None], 0.0)
    return out


# ---------------------------------------------------------------------------
# Observations + Viterbi
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _bin_window_tables(cfg: "PyinConfig"):
    """Static per-period pitch-bin windows + the scatter matrix.

    lo[p]: lowest bin reachable by period p given shift in [-1, 1];
    W: max window width over periods; S [P*W, n_bins]: S[p*W + w, b] = 1 iff
    lo[p] + w == b.  (Window bounds use shift = -/+1 with one bin of
    rounding slack; parabolic_shifts guarantees |shift| <= 1.)"""
    n_bins = cfg.n_pitch_bins
    p_count = cfg.n_periods
    p_idx = np.arange(p_count, dtype=np.float64)

    def bin_of(periods):
        f0 = cfg.sample_rate / np.maximum(periods, 1e-6)
        b = 12 * cfg.n_bins_per_semitone * np.log2(f0 / cfg.fmin)
        return np.clip(np.round(b), 0, n_bins - 1).astype(np.int64)

    hi = np.minimum(bin_of(cfg.min_period + p_idx - 1.0) + 1, n_bins - 1)
    lo = np.maximum(bin_of(cfg.min_period + p_idx + 1.0) - 1, 0)
    width = int((hi - lo).max()) + 1
    smat = np.zeros((p_count * width, n_bins), np.float32)
    for p in range(p_count):
        for w in range(width):
            b = lo[p] + w
            if 0 <= b < n_bins:
                smat[p * width + w, b] = 1.0
    return lo.astype(np.int32), width, smat


def observation_probs(
    probs: jnp.ndarray, shifts: jnp.ndarray, cfg: PyinConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map period-candidate probabilities to pitch-bin observations.

    probs, shifts: [F, n_periods] (F = flattened frames).
    Returns (obs [F, 2*n_pitch_bins], voiced_prob [F]).
    """
    f, p = probs.shape
    n_bins = cfg.n_pitch_bins
    periods = (
        cfg.min_period + jnp.arange(p, dtype=jnp.float32)[None, :] + shifts
    )
    f0 = cfg.sample_rate / jnp.maximum(periods, 1e-6)
    bin_idx = 12 * cfg.n_bins_per_semitone * jnp.log2(f0 / cfg.fmin)
    bin_idx = jnp.clip(jnp.round(bin_idx), 0, n_bins - 1).astype(jnp.int32)

    # Bin accumulation WITHOUT scatter (TPU scatters serialize — this was
    # the hottest op of the whole sup-data pipeline): each period's
    # reachable bins form a static window [lo_p, lo_p + W) because the
    # parabolic shift is bounded by +-1 period, so the scatter is exactly a
    # windowed one-hot times a precomputed 0/1 matrix — one MXU matmul.
    lo_np, w_width, smat_np = _bin_window_tables(cfg)
    lo = jnp.asarray(lo_np)
    smat = jnp.asarray(smat_np)
    w_idx = bin_idx - lo[None, :]
    contrib = probs[:, :, None] * (
        w_idx[:, :, None] == jnp.arange(w_width)[None, None, :]
    )
    voiced = contrib.reshape(f, p * w_width) @ smat
    voiced_prob = jnp.clip(jnp.sum(voiced, axis=-1), 0.0, 1.0)
    unvoiced = jnp.broadcast_to(
        ((1.0 - voiced_prob) / n_bins)[:, None], (f, n_bins)
    )
    return jnp.concatenate([voiced, unvoiced], axis=-1), voiced_prob


def banded_viterbi_decode(
    log_obs: jnp.ndarray, cfg: PyinConfig
) -> jnp.ndarray:
    """Viterbi decode specialized to pYIN's kron(switch, banded-triangle)
    transition: per step, a width-W max-convolution over pitch bins instead
    of a dense [2N, 2N] max-plus product (~W/2N of the work).

    log_obs: [B, T, 2N].  Returns states [B, T] int32, identical (up to
    float ties) to dense Viterbi with `_transition_matrix`.
    """
    b, t, n2 = log_obs.shape
    n = n2 // 2
    half = cfg.transition_width // 2
    w = cfg.transition_width
    log_tri, log_norm = _band_tables(n, cfg.transition_width)
    log_tri = jnp.asarray(log_tri)
    log_norm = jnp.asarray(log_norm)
    log_stay = float(np.log1p(-cfg.switch_prob))
    log_switch = float(np.log(cfg.switch_prob))

    p_init = np.full(n2, _NEG_INF, np.float32)
    p_init[n:] = np.log(1.0 / n)
    v0 = jnp.asarray(p_init)[None] + log_obs[:, 0]

    log_tri_host = _band_tables(n, cfg.transition_width)[0]

    def step(v, obs_t):
        v_v, v_u = v[:, :n], v[:, n:]
        # fold source-row normalization
        u_v = v_v - log_norm[None]
        u_u = v_u - log_norm[None]
        w_same = jnp.maximum(u_v + log_stay, u_u + log_switch)   # -> voiced
        w_cross = jnp.maximum(u_v + log_switch, u_u + log_stay)  # -> unvoiced
        src_is_u_same = (u_u + log_switch) > (u_v + log_stay)
        src_is_u_cross = (u_u + log_stay) > (u_v + log_switch)

        def band_max(wvals):
            # Unrolled static slices instead of a [B, N, W] gather: TPU
            # lowers gathers poorly; W shifted adds + running max/argmax are
            # pure fused VPU work (first max wins ties, like argmax).
            padded = jnp.pad(
                wvals, ((0, 0), (half, half)), constant_values=_NEG_INF
            )
            best = jnp.full_like(wvals, _NEG_INF)
            best_off = jnp.zeros(wvals.shape, jnp.int32)
            for o in range(w):
                cand = padded[:, o : o + n] + float(log_tri_host[o])
                take = cand > best
                best = jnp.where(take, cand, best)
                best_off = jnp.where(take, o, best_off)
            src = jnp.arange(n, dtype=jnp.int32)[None, :] - half + best_off
            return best, jnp.clip(src, 0, n - 1)

        best_v, src_v = band_max(w_same)
        best_u, src_u = band_max(w_cross)

        # resolve which half each source came from
        ptr_v = src_v + jnp.take_along_axis(src_is_u_same, src_v, axis=1).astype(jnp.int32) * n
        ptr_u = src_u + jnp.take_along_axis(src_is_u_cross, src_u, axis=1).astype(jnp.int32) * n
        new_v = jnp.concatenate([best_v, best_u], axis=1) + obs_t
        ptr = jnp.concatenate([ptr_v, ptr_u], axis=1).astype(jnp.int32)
        return new_v, ptr

    v_final, ptrs = jax.lax.scan(step, v0, jnp.swapaxes(log_obs[:, 1:], 0, 1))
    last = jnp.argmax(v_final, axis=-1).astype(jnp.int32)

    def back(state, ptr_t):
        prev = jnp.take_along_axis(ptr_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, prevs = jax.lax.scan(back, last, ptrs[::-1])
    states = jnp.concatenate([prevs[::-1], last[None]], axis=0)
    return states.swapaxes(0, 1)


def viterbi_decode(
    log_obs: jnp.ndarray, log_trans: jnp.ndarray, log_init: jnp.ndarray
) -> jnp.ndarray:
    """Max-product decoding. log_obs: [B, T, N]; log_trans: [N, N];
    log_init: [N].  Returns states [B, T] int32."""
    b, t, n = log_obs.shape

    v0 = log_init[None, :] + log_obs[:, 0]  # [B, N]

    def step(v, obs_t):
        # scores[b, i, j] = v[b, i] + log_trans[i, j]
        scores = v[:, :, None] + log_trans[None]
        ptr = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [B, N]
        v_new = jnp.max(scores, axis=1) + obs_t
        return v_new, ptr

    v_final, ptrs = jax.lax.scan(step, v0, jnp.swapaxes(log_obs[:, 1:], 0, 1))
    last = jnp.argmax(v_final, axis=-1).astype(jnp.int32)  # [B]

    def back(state, ptr_t):
        prev = jnp.take_along_axis(ptr_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    # ptrs[k] maps the state at frame k+1 back to frame k; walking them in
    # reverse yields states T-2 .. 0.
    _, prevs = jax.lax.scan(back, last, ptrs[::-1])
    states = jnp.concatenate([prevs[::-1], last[None]], axis=0)  # [T, B]
    return states.swapaxes(0, 1)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def pyin(
    audio: jnp.ndarray,
    audio_lens: jnp.ndarray,
    cfg: PyinConfig,
    frame_chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched pYIN.

    Args:
        audio: [B, S] float32 (padded).
        audio_lens: [B] valid sample counts.
        cfg: parameters.
        frame_chunk: trough-prior frames processed per map step (bounds the
            [chunk, n_periods, n_thresholds] intermediate).

    Returns:
        f0 [B, T] (fill_na where unvoiced / beyond length),
        voiced_mask [B, T] bool,
        voiced_prob [B, T] float32.
    """
    if audio.ndim == 1:
        audio = audio[None]
    b = audio.shape[0]

    frames = frame_audio(audio.astype(jnp.float32), cfg)  # [B, T, fl]
    t = frames.shape[1]
    yin = cumulative_mean_normalized_difference(frames, cfg)  # [B, T, P]
    shifts = parabolic_shifts(yin)

    # Trough priors in frame chunks to bound the threshold intermediate.
    # The compact kernel gathers troughs into K slots before the threshold
    # math; K=160 exceeds the structural bound on trough count (localmin
    # spacing gives at most n_periods/3 + 1 interior troughs), so results
    # are exact while the dominant tensor shrinks ~2x.
    p = cfg.n_periods
    k_slots = min(160, p)
    flat_yin = yin.reshape(-1, p)
    f = flat_yin.shape[0]
    pad_f = (-f) % frame_chunk
    flat_yin = jnp.pad(flat_yin, ((0, pad_f), (0, 0)), constant_values=jnp.inf)
    chunks = flat_yin.reshape(-1, frame_chunk, p)
    probs = jax.lax.map(
        lambda c: trough_probabilities_compact(c, cfg, k_slots), chunks
    )
    probs = probs.reshape(-1, p)[:f]

    obs, voiced_prob = observation_probs(probs, shifts.reshape(-1, p), cfg)
    n_states = 2 * cfg.n_pitch_bins
    obs = obs.reshape(b, t, n_states)
    # -700 floor for zero-probability entries mirrors float64
    # log(x + tiny) semantics (fp32 tiny would give only -87)
    log_obs = jnp.where(obs > 0, jnp.log(jnp.maximum(obs, 1e-37)), -700.0)

    use_pallas = False
    try:
        use_pallas = jax.default_backend() == "tpu"
    except Exception:
        pass
    if use_pallas:
        # single-launch Pallas kernel: DP state stays in VMEM across all
        # steps (the XLA scan is dispatch-latency bound)
        from roar_tpu.ops.pyin_pallas import banded_viterbi_decode_pallas

        states = banded_viterbi_decode_pallas(log_obs, cfg)
    else:
        states = banded_viterbi_decode(log_obs, cfg)  # [B, T]

    freqs = jnp.asarray(cfg.freqs().astype(np.float32))
    f0 = freqs[states % cfg.n_pitch_bins]
    voiced = states < cfg.n_pitch_bins

    # Mask frames beyond each utterance's valid frame count.
    n_frames = cfg.num_frames(audio_lens)
    valid = jnp.arange(t)[None, :] < n_frames[:, None]
    voiced = voiced & valid
    f0 = jnp.where(voiced, f0, cfg.fill_na)
    voiced_prob = jnp.where(valid, voiced_prob.reshape(b, t), 0.0)
    return f0, voiced, voiced_prob
