"""Speech enhancement: encoder -> mask estimator -> decoder.

Re-design of roar/collections/asr/models/enhancement_models.py:26-480
(`EncMaskDecAudioToAudioModel`): STFT encoder, a neural mask estimator over
the magnitude spectrum, multiplicative masking of the complex spectrum, and
ISTFT decoding — trained with (SI-)SDR (losses/audio_losses.py).
The reference's RNN mask estimators become a conv + transformer stack
(TPU-friendly, no recurrence).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.losses.audio_losses import sdr_loss
from roar_tpu.models.transformer import TransformerLayer
from roar_tpu.ops.griffin_lim import istft
from roar_tpu.ops.lengths import mask_from_lens
from roar_tpu.ops.spectrogram import _reflect_pad_1d, _windowed_dft_matrix, frame_signal


class MaskEstimator(nn.Module):
    """log-magnitude [B, T, F] -> sigmoid mask [B, T, F]."""

    n_freqs: int
    d_model: int = 256
    n_layers: int = 3
    n_head: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = nn.Dense(self.d_model)(x)
        for i in range(self.n_layers):
            x = TransformerLayer(
                self.n_head,
                self.d_model,
                self.d_model // self.n_head,
                2 * self.d_model,
                kernel_size=3,
                dropout=self.dropout,
                dropatt=self.dropout,
                name=f"layers_{i}",
            )(x, mask, deterministic=deterministic)
        return nn.sigmoid(nn.Dense(self.n_freqs)(x))


class EncMaskDecEnhancementModel:
    """Audio-to-audio enhancement task."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        self.sample_rate = cfg.get("sample_rate", 16000)
        self.n_fft = cfg.get("n_fft", 512)
        self.hop_length = cfg.get("hop_length", 128)
        self.win_length = cfg.get("win_length", self.n_fft)
        self.window = cfg.get("window", "hann")
        self.n_freqs = 1 + self.n_fft // 2
        self.loss_type = cfg.get("loss", "si_sdr")
        self.mask_estimator = MaskEstimator(
            n_freqs=self.n_freqs,
            d_model=cfg.get("d_model", 256),
            n_layers=cfg.get("n_layers", 3),
            n_head=cfg.get("n_head", 4),
            dropout=cfg.get("dropout", 0.1),
        )

    # -- encoder / decoder -------------------------------------------------
    def encode(self, audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio [B, S] -> (re, im) [B, F, T]."""
        basis = jnp.asarray(
            _windowed_dft_matrix(self.n_fft, self.win_length, self.window)
        )
        xp = _reflect_pad_1d(audio, self.n_fft // 2)
        frames = frame_signal(xp, self.n_fft, self.hop_length)
        proj = jnp.einsum("btn,nf->btf", frames, basis)
        re = jnp.swapaxes(proj[..., : self.n_freqs], 1, 2)
        im = jnp.swapaxes(proj[..., self.n_freqs :], 1, 2)
        return re, im

    def decode(self, re, im, length: int) -> jnp.ndarray:
        return istft(
            re, im, self.n_fft, self.hop_length, self.win_length, self.window,
            length=length,
        )

    # -- forward -------------------------------------------------------------
    def forward(self, params, audio, audio_len, deterministic=True, rngs=None):
        re, im = self.encode(audio)
        logmag = jnp.log1p(jnp.sqrt(re * re + im * im))  # [B, F, T]
        feats = jnp.swapaxes(logmag, 1, 2)  # [B, T, F]
        t = feats.shape[1]
        frame_lens = audio_len // self.hop_length + 1
        fmask = mask_from_lens(frame_lens, t)[..., None].astype(feats.dtype)
        mask = self.mask_estimator.apply(
            params, feats, fmask, deterministic=deterministic, rngs=rngs
        )  # [B, T, F]
        mask = jnp.swapaxes(mask, 1, 2)  # [B, F, T]
        out = self.decode(re * mask, im * mask, audio.shape[-1])
        return out

    def init_params(self, rng, batch):
        audio = jnp.asarray(batch["input_signal"])

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, audio):
            re, im = self.encode(audio)
            feats = jnp.swapaxes(jnp.log1p(jnp.sqrt(re * re + im * im)), 1, 2)
            fmask = jnp.ones(feats.shape[:2] + (1,), feats.dtype)
            return self.mask_estimator.init(rng, feats, fmask)

        return _init(rng, audio)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0, deterministic: bool = False):
        est = self.forward(
            params, batch["input_signal"], batch["input_length"],
            deterministic=deterministic,
            rngs={"dropout": rng} if rng is not None else None,
        )
        loss = sdr_loss(
            est, batch["target_signal"], batch["input_length"],
            scale_invariant=(self.loss_type == "si_sdr"),
        )
        return loss, {"loss": loss}
