"""ISTFT and Griffin-Lim phase reconstruction (for audio previews / GlowVocoder).

Re-design of the reference's numpy griffin_lim
(roar/collections/tts/parts/utils/helpers.py:238-344): fully on-device —
iterative phase recovery as a `lax.fori_loop` over STFT/ISTFT round trips,
with the ISTFT expressed as inverse-DFT matmul + overlap-add.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.ops.spectrogram import get_window, mel_filterbank


@functools.lru_cache(maxsize=8)
def _inverse_dft_matrix(n_fft: int) -> np.ndarray:
    """[2F, n_fft] matrix: (real | imag) spectrum -> time frame.

    Rows weight the irfft reconstruction x[n] = (1/N) * sum_k w_k *
    (re_k cos - im_k sin) with w = 2 except DC/Nyquist.
    """
    n_freqs = 1 + n_fft // 2
    k = np.arange(n_freqs, dtype=np.float64).reshape(-1, 1)
    n = np.arange(n_fft, dtype=np.float64).reshape(1, -1)
    angle = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_freqs, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    cos_part = w * np.cos(angle) / n_fft
    sin_part = -w * np.sin(angle) / n_fft
    return np.concatenate([cos_part, sin_part], axis=0).astype(np.float32)


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with overlap-add; re/im: [B, F, T] (center=True framing).

    Returns [B, length or T*hop] audio.
    """
    b, f, t = re.shape
    spec = jnp.concatenate([re, im], axis=1)  # [B, 2F, T]
    inv = jnp.asarray(_inverse_dft_matrix(n_fft))  # [2F, n_fft]
    frames = jnp.einsum("bft,fn->btn", spec, inv)  # [B, T, n_fft]

    win = np.zeros(n_fft, np.float32)
    left = (n_fft - win_length) // 2
    win[left : left + win_length] = get_window(window, win_length)
    frames = frames * win[None, None, :]

    out_len = n_fft + hop_length * (t - 1)
    idx = (np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    audio = jnp.zeros((b, out_len), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1)
    )
    # window-square normalization
    wsq = jnp.zeros((out_len,), jnp.float32).at[idx].add(
        jnp.tile(jnp.asarray(win) ** 2, t)
    )
    audio = audio / jnp.maximum(wsq, 1e-8)[None]

    pad = n_fft // 2
    audio = audio[:, pad : out_len - pad]
    if length is not None:
        if audio.shape[1] < length:  # torch.istft zero-fills to `length`
            audio = jnp.pad(audio, ((0, 0), (0, length - audio.shape[1])))
        audio = audio[:, :length]
    return audio


def griffin_lim(
    magnitudes: jnp.ndarray,
    n_iters: int = 50,
    n_fft: int = 1024,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
) -> jnp.ndarray:
    """Magnitude spectrogram [B, F, T] -> audio via Griffin-Lim."""
    from roar_tpu.ops.spectrogram import frame_signal, _windowed_dft_matrix, _reflect_pad_1d

    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    b, f, t = magnitudes.shape
    basis = jnp.asarray(_windowed_dft_matrix(n_fft, win_length, window))
    n_freqs = 1 + n_fft // 2

    def stft_complex(x):
        xp = _reflect_pad_1d(x, n_fft // 2)
        frames = frame_signal(xp, n_fft, hop_length)
        proj = jnp.einsum("btn,nf->btf", frames, basis)
        re = jnp.swapaxes(proj[..., :n_freqs], 1, 2)[:, :, :t]
        im = jnp.swapaxes(proj[..., n_freqs:], 1, 2)[:, :, :t]
        return re, im

    def body(i, carry):
        re, im = carry
        audio = istft(re, im, n_fft, hop_length, win_length, window)
        re2, im2 = stft_complex(audio)
        mag = jnp.sqrt(re2 * re2 + im2 * im2 + 1e-12)
        scale = magnitudes / jnp.maximum(mag, 1e-8)
        return re2 * scale, im2 * scale

    key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, (b, f, t), minval=-np.pi, maxval=np.pi)
    re0 = magnitudes * jnp.cos(phase)
    im0 = magnitudes * jnp.sin(phase)
    re, im = jax.lax.fori_loop(0, n_iters, body, (re0, im0))
    return istft(re, im, n_fft, hop_length, win_length, window)


def mel_to_audio_griffin_lim(
    log_mel: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    log_zero_guard: float = 1e-5,
    n_iters: int = 50,
) -> jnp.ndarray:
    """log-mel [B, n_mels, T] -> audio preview via mel pseudo-inverse +
    Griffin-Lim (helpers.py:238-344 behavior)."""
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)  # [M, F]
    pinv = jnp.asarray(np.linalg.pinv(fb))  # [F, M]
    mel_lin = jnp.exp(log_mel) - log_zero_guard
    mag = jnp.einsum("fm,bmt->bft", pinv, jnp.maximum(mel_lin, 0.0))
    mag = jnp.maximum(mag, 0.0)
    return griffin_lim(mag, n_iters=n_iters, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
