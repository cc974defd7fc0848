"""WaveGlow flow vocoder (mel -> audio by inverting a normalizing flow).

The reference carries WaveGlow's building blocks as leftovers
(roar/collections/tts/modules/submodules.py:358-493 Invertible1x1Conv +
WaveNet) and the GlowVocoder base (models/base.py:105-223) but ships no
model around them.  This completes the family as a TPU-first flow vocoder:

- audio is grouped n_group samples per step (squeeze), mel is upsampled
  with a ConvTranspose and grouped to match — all channels-last;
- each flow = Invertible1x1Conv + affine coupling whose scale/shift come
  from WaveGlowWaveNet (zero-init end conv => identity couplings at init);
- every n_early_every flows, n_early_size channels exit to z (multi-scale);
- training maximizes the exact log-likelihood: sum(z^2)/(2 sigma^2) minus
  coupling log|s| and 1x1-conv log-dets;
- inference draws z ~ N(0, sigma^2) and runs the flows in reverse — one
  jitted program, no autoregression.

Everything is static-shape: audio length must be a multiple of
n_group * hop_length.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roar_tpu.models.submodules import Invertible1x1Conv, WaveGlowWaveNet


class WaveGlowModule(nn.Module):
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    # coupling WN hyperparameters
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    hop_length: int = 256

    def setup(self):
        self.upsample = nn.ConvTranspose(
            self.n_mel_channels,
            kernel_size=(self.hop_length * 4,),
            strides=(self.hop_length,),
            padding="SAME",
        )
        convs: List[Invertible1x1Conv] = []
        wns: List[WaveGlowWaveNet] = []
        halves: List[Tuple[int, int]] = []
        remaining = self.n_group
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                remaining -= self.n_early_size
            n_half = remaining // 2
            halves.append((remaining, n_half))
            convs.append(Invertible1x1Conv(remaining, name=f"convinv_{k}"))
            wns.append(
                WaveGlowWaveNet(
                    n_in_channels=n_half,
                    n_mel_channels=self.n_mel_channels * self.n_group,
                    n_layers=self.n_layers,
                    n_channels=self.n_channels,
                    kernel_size=self.kernel_size,
                    name=f"wn_{k}",
                )
            )
        self.convinv = convs
        self.wn = wns
        self._halves = tuple(halves)

    # ------------------------------------------------------------------

    def _group(self, x, channels):
        """[B, T*g] or [B, T*g, C] -> [B, T, g*C] (squeeze operation)."""
        b = x.shape[0]
        if x.ndim == 2:
            x = x[..., None]
        t = x.shape[1] // self.n_group
        x = x[:, : t * self.n_group]
        return x.reshape(b, t, self.n_group * x.shape[-1])

    def _upsampled_mel(self, mel, audio_steps: int):
        """mel [B, T_mel, n_mel] -> grouped conditioning [B, T, g*n_mel]."""
        up = self.upsample(mel)  # [B, ~T_mel*hop, n_mel]
        if up.shape[1] < audio_steps * self.n_group:
            up = jnp.pad(
                up, ((0, 0), (0, audio_steps * self.n_group - up.shape[1]), (0, 0))
            )
        up = up[:, : audio_steps * self.n_group]
        return self._group(up, self.n_mel_channels)

    def __call__(self, audio, mel) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward (training) pass.

        audio: [B, S] with S % (n_group) == 0; mel: [B, T_mel, n_mel].
        Returns (z [B, T, n_group], total log_det) where log|s| terms and
        1x1 log-dets are summed into log_det.
        """
        x = self._group(audio, 1)  # [B, T, g]
        spect = self._upsampled_mel(mel, x.shape[1])

        z_out = []
        log_det = 0.0
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                z_out.append(x[..., : self.n_early_size])
                x = x[..., self.n_early_size :]
            x, ld = self.convinv[k](x)
            log_det = log_det + ld
            n_half = self._halves[k][1]
            xa, xb = x[..., :n_half], x[..., n_half:]
            out = self.wn[k](xa, spect)
            log_s, t_shift = out[..., n_half:], out[..., :n_half]
            xb = jnp.exp(log_s) * xb + t_shift
            log_det = log_det + jnp.sum(log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
        z_out.append(x)
        return jnp.concatenate(z_out, axis=-1), log_det

    def _early_offsets(self):
        """(flow_index -> z channel offset) for early-output chunks, plus
        the offset of the final chunk, matching forward's concat order."""
        offsets = {}
        ofs = 0
        for k in range(self.n_flows):
            if k % self.n_early_every == 0 and k > 0:
                offsets[k] = ofs
                ofs += self.n_early_size
        return offsets, ofs

    def reverse(self, z, mel):
        """Exact inverse of __call__: z [B, T, n_group] -> audio [B, T*g].

        Feeding forward's z reproduces the input audio (copy synthesis);
        feeding N(0, sigma^2) noise is generation (see infer)."""
        b, steps, _ = z.shape
        spect = self._upsampled_mel(mel, steps)
        offsets, final_ofs = self._early_offsets()
        x = z[..., final_ofs:]
        for k in reversed(range(self.n_flows)):
            n_half = self._halves[k][1]
            xa, xb = x[..., :n_half], x[..., n_half:]
            out = self.wn[k](xa, spect)
            log_s, t_shift = out[..., n_half:], out[..., :n_half]
            xb = (xb - t_shift) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
            x = self.convinv[k](x, reverse=True)
            if k in offsets:
                chunk = z[..., offsets[k] : offsets[k] + self.n_early_size]
                x = jnp.concatenate([chunk, x], axis=-1)
        return x.reshape(b, steps * self.n_group)

    def infer(self, mel, sigma: float = 1.0, rng: Optional[jax.Array] = None):
        """mel [B, T_mel, n_mel] -> audio [B, T_mel*hop]."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        b = mel.shape[0]
        steps = (mel.shape[1] * self.hop_length) // self.n_group
        z = sigma * jax.random.normal(rng, (b, steps, self.n_group), mel.dtype)
        return self.reverse(z, mel)


def waveglow_loss(z, log_det, sigma: float = 1.0):
    """Negative log-likelihood per element (the WaveGlow objective)."""
    n = z.size
    return (jnp.sum(z * z) / (2 * sigma * sigma) - log_det) / n


class WaveGlowModel:
    """Task wrapper: supervised flow training + GlowVocoder-style serving."""

    def __init__(self, cfg: Dict):
        from roar_tpu.models.fastpitch_model import preprocessor_config

        self.cfg = cfg
        self.sigma = cfg.get("sigma", 1.0)
        self.mel_cfg = preprocessor_config(cfg.get("preprocessor", {}))
        wg = cfg.get("waveglow", {})
        self.module = WaveGlowModule(
            n_mel_channels=self.mel_cfg.nfilt,
            n_flows=wg.get("n_flows", 12),
            n_group=wg.get("n_group", 8),
            n_early_every=wg.get("n_early_every", 4),
            n_early_size=wg.get("n_early_size", 2),
            n_layers=wg.get("n_wn_layers", 8),
            n_channels=wg.get("n_wn_channels", 256),
            kernel_size=wg.get("wn_kernel_size", 3),
            hop_length=self.mel_cfg.hop_length,
        )

    def _mel(self, audio, lens):
        from roar_tpu.ops.spectrogram import log_mel_spectrogram

        mel, mel_lens = log_mel_spectrogram(audio, lens, self.mel_cfg)
        return jnp.swapaxes(mel, 1, 2), mel_lens  # [B, T, n_mel]

    def init_params(self, rng, batch):
        audio = jnp.asarray(batch["audio"])
        lens = jnp.asarray(batch["audio_len"])

        @jax.jit
        def _init(rng, audio, lens):
            mel, _ = self._mel(audio, lens)
            return self.module.init(rng, audio, mel)

        return _init(rng, audio, lens)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0, deterministic=False):
        audio = batch["audio"]
        mel, _ = self._mel(audio, batch["audio_len"])
        z, log_det = self.module.apply(params, audio, mel)
        loss = waveglow_loss(z, log_det, self.sigma)
        return loss, {"loss": loss, "z_mean_sq": jnp.mean(z * z)}

    def convert_spectrogram_to_audio(self, params, mel, sigma: Optional[float] = None, rng=None):
        mel = jnp.asarray(mel)
        return self.module.apply(
            params, mel, sigma if sigma is not None else self.sigma, rng,
            method=WaveGlowModule.infer,
        )
