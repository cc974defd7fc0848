"""Piecewise rational-quadratic spline transforms (for VITS ConvFlow).

Re-design of roar/collections/tts/parts/utils/splines.py:6-460: monotonic
rational-quadratic splines (Durkan et al., Neural Spline Flows) with linear
tails, forward and inverse, fully vectorized jnp (the searchsorted bin lookup
is a one-hot sum — static shapes, TPU-friendly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted_onehot(cum: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Index of the bin containing x. cum: [..., K+1] ascending; x: [...]."""
    # number of bin edges strictly below x, minus 1, clipped into range
    idx = jnp.sum((x[..., None] >= cum[..., :-1]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, cum.shape[-1] - 2)


def rational_quadratic_spline(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotonic RQ spline on [left,right] -> [bottom,top].

    x: [...]; *widths/heights: [..., K]; derivatives: [..., K+1].
    Returns (y, logabsdet) elementwise.
    """
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_idx = _searchsorted_onehot(cumheights if inverse else cumwidths, x)[..., None]

    def take(a):
        return jnp.take_along_axis(a, bin_idx, axis=-1)[..., 0]

    in_cw = take(cumwidths)
    in_w = take(widths)
    in_ch = take(cumheights)
    in_h = take(heights)
    delta = in_h / in_w
    in_d = take(derivatives[..., :-1])
    in_dp1 = take(derivatives[..., 1:])

    if inverse:
        a = (x - in_ch) * (in_d + in_dp1 - 2 * delta) + in_h * (delta - in_d)
        b = in_h * in_d - (x - in_ch) * (in_d + in_dp1 - 2 * delta)
        c = -delta * (x - in_ch)
        disc = jnp.square(b) - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        y = root * in_w + in_cw
        theta_om = root * (1 - root)
        denom = delta + (in_d + in_dp1 - 2 * delta) * theta_om
        dnum = jnp.square(delta) * (
            in_dp1 * jnp.square(root) + 2 * delta * theta_om + in_d * jnp.square(1 - root)
        )
        logabsdet = -(jnp.log(dnum) - 2 * jnp.log(denom))
        return y, logabsdet

    theta = (x - in_cw) / in_w
    theta_om = theta * (1 - theta)
    numer = in_h * (delta * jnp.square(theta) + in_d * theta_om)
    denom = delta + (in_d + in_dp1 - 2 * delta) * theta_om
    y = in_ch + numer / denom
    dnum = jnp.square(delta) * (
        in_dp1 * jnp.square(theta) + 2 * delta * theta_om + in_d * jnp.square(1 - theta)
    )
    logabsdet = jnp.log(dnum) - 2 * jnp.log(denom)
    return y, logabsdet


def unconstrained_rational_quadratic_spline(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RQ spline with identity linear tails outside [-tail_bound, tail_bound]
    (splines.py 'linear' tails; derivative params are interior, boundary
    derivatives pinned so the spline meets the identity tails smoothly)."""
    inside = (x >= -tail_bound) & (x <= tail_bound)

    # pad boundary derivatives: softplus(c) = 1 - min_derivative at the edges
    import numpy as np

    constant = float(np.log(np.expm1(1.0 - min_derivative)))
    derivs = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    x_in = jnp.where(inside, x, 0.0)  # keep spline math in-domain
    y_in, ld_in = rational_quadratic_spline(
        x_in,
        unnormalized_widths,
        unnormalized_heights,
        derivs,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    y = jnp.where(inside, y_in, x)
    logabsdet = jnp.where(inside, ld_in, 0.0)
    return y, logabsdet
