"""BigVGAN: Snake-activated, anti-aliased GAN vocoder + MRD.

Re-design of roar/collections/tts/modules/bigvgan_modules.py (AMPBlock1/2,
Snake/SnakeBeta from parts/utils/activations.py:13-100, alias-free
resampling from modules/alias_free_torch/*, MultiResolutionDiscriminator /
DiscriminatorR :718-843) and models/bigvgan.py.

TPU notes: the kaiser-sinc anti-aliasing filters are precomputed host-side
and applied as grouped convolutions; snake activations are elementwise jnp
(XLA fuses them into the surrounding convs).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roar_tpu.models.hifigan import wn_conv, _normal_init
from roar_tpu.ops.spectrogram import stft_magnitude


# ---------------------------------------------------------------------------
# Snake activations (activations.py:13-100)
# ---------------------------------------------------------------------------


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (1/alpha) * sin^2(alpha * x), per-channel alpha."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x + (1/beta) * sin^2(alpha * x) with separate magnitude parameter."""
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * x))


class Snake(nn.Module):
    channels: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return snake(x, alpha[None, None, :])


class SnakeBeta(nn.Module):
    channels: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,))
        if self.alpha_logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return snake_beta(x, alpha[None, None, :], beta[None, None, :])


# ---------------------------------------------------------------------------
# Alias-free resampling (alias_free_torch/filter.py:32, resample.py:12-43)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Lowpass windowed-sinc FIR (kaiser window), [kernel_size]."""
    from scipy.signal.windows import kaiser

    even = kernel_size % 2 == 0
    delta_f = 4 * half_width
    a = 2.285 * (kernel_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    win = kaiser(kernel_size, beta)
    if even:
        t = np.arange(-kernel_size // 2, kernel_size // 2) + 0.5
    else:
        t = np.arange(kernel_size) - (kernel_size - 1) / 2
    f = 2 * cutoff * win * np.sinc(2 * cutoff * t)
    f = f / np.sum(f)
    return f.astype(np.float32)


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12) -> jnp.ndarray:
    """Alias-free upsample by zero-stuffing + lowpass, [B, T, C] -> [B, T*r, C]."""
    b, t, c = x.shape
    filt = jnp.asarray(ratio * kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size * ratio))
    stuffed = jnp.zeros((b, t * ratio, c), x.dtype).at[:, ::ratio].set(x)
    k = filt.shape[0]
    pad = k // 2
    kernel = jnp.tile(filt[:, None, None], (1, 1, c))  # [k, 1, C] depthwise
    out = jax.lax.conv_general_dilated(
        stuffed, kernel,
        window_strides=(1,), padding=[(pad, pad - (1 - k % 2))],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )
    return out


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12) -> jnp.ndarray:
    """Alias-free downsample: lowpass + stride, [B, T, C] -> [B, T//r, C]."""
    b, t, c = x.shape
    filt = jnp.asarray(kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size * ratio))
    k = filt.shape[0]
    pad = k // 2
    kernel = jnp.tile(filt[:, None, None], (1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(ratio,), padding=[(pad, pad - (1 - k % 2))],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


class Activation1d(nn.Module):
    """Anti-aliased activation: upsample 2x -> snake -> downsample 2x
    (the 'AMP' trick)."""

    channels: int
    snake_logscale: bool = True
    use_beta: bool = True

    @nn.compact
    def __call__(self, x):
        act = (SnakeBeta if self.use_beta else Snake)(
            self.channels, self.snake_logscale, name="act"
        )
        x = upsample1d(x, 2)
        x = act(x)
        return downsample1d(x, 2)


# ---------------------------------------------------------------------------
# AMP blocks + generator (bigvgan_modules.py AMPBlock1/2, Generator)
# ---------------------------------------------------------------------------


class AMPBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilation: Sequence[int]
    use_beta: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = Activation1d(self.channels, use_beta=self.use_beta, name=f"act1_{i}")(x)
            xt = wn_conv(self.channels, self.kernel_size, dilation=d, name=f"convs1_{i}")(xt)
            xt = Activation1d(self.channels, use_beta=self.use_beta, name=f"act2_{i}")(xt)
            xt = wn_conv(self.channels, self.kernel_size, dilation=1, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class AMPBlock2(nn.Module):
    channels: int
    kernel_size: int
    dilation: Sequence[int]
    use_beta: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = Activation1d(self.channels, use_beta=self.use_beta, name=f"act_{i}")(x)
            xt = wn_conv(self.channels, self.kernel_size, dilation=d, name=f"convs_{i}")(xt)
            x = xt + x
        return x


class BigVGANGenerator(nn.Module):
    """HiFi-GAN topology with AMP blocks + snake activations."""

    resblock: int = 1
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    initial_input_size: int = 80
    snake_logscale: bool = True

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_rates))

    @nn.compact
    def __call__(self, x):
        block_cls = AMPBlock1 if self.resblock == 1 else AMPBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        x = nn.WeightNorm(
            nn.Conv(self.upsample_initial_channel, (7,), padding="SAME"), name="conv_pre"
        )(x)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            # feature_axes=1: torch weight_norm dim=0 is the in axis for
            # ConvTranspose1d — see models/hifigan.py Generator ups
            x = nn.WeightNorm(
                nn.ConvTranspose(ch, (k,), strides=(u,), padding="SAME",
                                 kernel_init=_normal_init),
                feature_axes=1,
                name=f"ups_{i}",
            )(x)
            xs = jnp.zeros_like(x)
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                xs = xs + block_cls(ch, rk, rd, name=f"resblocks_{i}_{j}")(x)
            x = xs / num_kernels
        x = Activation1d(x.shape[-1], name="act_post")(x)
        x = wn_conv(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# Multi-resolution discriminator (bigvgan_modules.py:718-843)
# ---------------------------------------------------------------------------


class DiscriminatorR(nn.Module):
    """2D convs over the magnitude STFT at one resolution."""

    fft_size: int = 1024
    hop_size: int = 120
    win_length: int = 600

    @nn.compact
    def __call__(self, audio) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        mag = stft_magnitude(audio, self.fft_size, self.hop_size, self.win_length)
        x = jnp.swapaxes(mag, 1, 2)[..., None]  # [B, T, F, 1]
        fmap = []
        specs = [(32, (3, 9), (1, 1)), (32, (3, 9), (1, 2)), (32, (3, 9), (1, 2)),
                 (32, (3, 9), (1, 2)), (32, (3, 3), (1, 1))]
        for i, (ch, k, s) in enumerate(specs):
            x = nn.WeightNorm(
                nn.Conv(ch, k, strides=s, padding="SAME", kernel_init=_normal_init),
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 3), padding="SAME"), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240)
    )

    @nn.compact
    def __call__(self, y, y_hat):
        real_scores, fake_scores, real_fmaps, fake_fmaps = [], [], [], []
        for i, (fft, hop, win) in enumerate(self.resolutions):
            d = DiscriminatorR(fft, hop, win, name=f"disc_r{i}")
            sr, fr = d(y)
            sg, fg = d(y_hat)
            real_scores.append(sr)
            fake_scores.append(sg)
            real_fmaps.append(fr)
            fake_fmaps.append(fg)
        return real_scores, fake_scores, real_fmaps, fake_fmaps
