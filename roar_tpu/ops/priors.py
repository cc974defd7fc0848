"""Beta-binomial alignment priors.

Reimplements the reference prior math
(roar/collections/tts/parts/utils/tts_dataset_utils.py:128-150) in JAX, plus
the cached/zoomed `BetaBinomialInterpolator` (:69-93) in numpy/scipy for the
host-side data path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln


def _logbeta(x, y):
    return gammaln(x) + gammaln(y) - gammaln(x + y)


def _logcombinations(n, k):
    return gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)


def _logbetabinom(n, a, b, x):
    return _logcombinations(n, x) + _logbeta(x + a, n - x + b) - _logbeta(a, b)


@functools.partial(jax.jit, static_argnums=(0, 1))
def beta_binomial_prior(
    phoneme_count: int, mel_count: int, scaling_factor: float = 1.0
) -> jnp.ndarray:
    """[mel_count, phoneme_count] beta-binomial alignment prior.

    Row m (1-indexed) is BetaBinomial(n=P-1, a=scale*m, b=scale*(M+1-m))
    evaluated over phoneme indices 0..P-1 — identical to
    beta_binomial_prior_distribution (tts_dataset_utils.py:140-150).
    """
    x = jnp.arange(0, phoneme_count, dtype=jnp.float32)[None, :]
    y = jnp.arange(1, mel_count + 1, dtype=jnp.float32)[:, None]
    a = scaling_factor * y
    b = scaling_factor * (mel_count + 1 - y)
    n = jnp.float32(phoneme_count - 1)
    return jnp.exp(_logbetabinom(n, a, b, x))


def beta_binomial_prior_np(
    phoneme_count: int, mel_count: int, scaling_factor: float = 1.0
) -> np.ndarray:
    """Numpy twin of :func:`beta_binomial_prior` for host-side data loading."""
    from scipy.special import gammaln as np_gammaln

    x = np.arange(0, phoneme_count, dtype=np.float64)[None, :]
    y = np.arange(1, mel_count + 1, dtype=np.float64)[:, None]
    a = scaling_factor * y
    b = scaling_factor * (mel_count + 1 - y)
    n = float(phoneme_count - 1)

    def logbeta(p, q):
        return np_gammaln(p) + np_gammaln(q) - np_gammaln(p + q)

    out = (
        np_gammaln(n + 1)
        - np_gammaln(x + 1)
        - np_gammaln(n - x + 1)
        + logbeta(x + a, n - x + b)
        - logbeta(a, b)
    )
    return np.exp(out).astype(np.float32)


class BetaBinomialInterpolator:
    """Cached prior with bilinear zoom, as the reference interpolator
    (tts_dataset_utils.py:69-93): sizes are rounded to a coarse grid, the
    prior is computed once per rounded size, then zoomed to the exact size.
    """

    def __init__(self, round_mel_len_to: int = 50, round_text_len_to: int = 10, cache_size: int = 500):
        self.round_mel_len_to = round_mel_len_to
        self.round_text_len_to = round_text_len_to
        self._bank = functools.lru_cache(maxsize=cache_size)(beta_binomial_prior_np)

    @staticmethod
    def round(val: int, to: int) -> int:
        return max(1, int(np.round((val + 1) / to))) * to

    def __call__(self, w: int, h: int) -> np.ndarray:
        """w = mel length, h = text length; returns [w, h] prior."""
        from scipy import ndimage

        bw = self.round(w, self.round_mel_len_to)
        bh = self.round(h, self.round_text_len_to)
        # Reference quirk kept for parity (tts_dataset_utils.py:91): the bank
        # is evaluated with the MEL length as the "phoneme_count" argument and
        # the TEXT length as "mel_count", then transposed to [mel, text].
        ret = ndimage.zoom(self._bank(bw, bh).T, zoom=(w / bw, h / bh), order=1)
        assert ret.shape[0] == w and ret.shape[1] == h, ret.shape
        return ret.astype(np.float32)
