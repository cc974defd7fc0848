"""Spectrogram enhancer: GAN that sharpens synthesized mels.

Re-design of roar/collections/tts/models/spectrogram_enhancer.py:30-360.
The reference model instantiates its generator/discriminator from external
`_target_` paths that are NOT in its tree; here the modules are provided
in-tree: a StyleGAN-flavored conditional generator (mapping MLP -> per-block
FiLM style modulation + noise injection over the 2D mel image, residual on
the condition) and a strided-conv discriminator, trained with hinge loss,
R1 gradient penalty and the quarter-scale consistency loss.

Spectrograms are treated as [B, n_mel, T, 1] images normalized to [0, 1]
(normalize/unnormalize as spectrogram_enhancer.py:53-70).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.losses.enhancer_losses import (
    consistency_loss,
    generator_loss,
    gradient_penalty_loss,
    hinge_loss,
)
from roar_tpu.ops.lengths import mask_from_lens
from roar_tpu.training.gan import GANTrainState, create_gan_state, make_gan_train_step


class MappingNetwork(nn.Module):
    style_dim: int = 128
    n_layers: int = 4

    @nn.compact
    def __call__(self, z):
        w = z
        for _ in range(self.n_layers):
            w = nn.leaky_relu(nn.Dense(self.style_dim)(w), 0.2)
        return w


class StyledBlock(nn.Module):
    """Conv block with FiLM-style modulation from w + noise injection."""

    channels: int

    @nn.compact
    def __call__(self, x, w, noise):
        scale = nn.Dense(self.channels)(w)[:, None, None, :]
        shift = nn.Dense(self.channels)(w)[:, None, None, :]
        x = nn.Conv(self.channels, (3, 3), padding="SAME")(x)
        noise_gain = self.param("noise_gain", nn.initializers.zeros, (self.channels,))
        x = x + noise * noise_gain[None, None, None, :]
        x = nn.LayerNorm()(x)
        x = x * (1.0 + scale) + shift
        return nn.leaky_relu(x, 0.2)


class EnhancerGenerator(nn.Module):
    n_bands: int = 80
    channels: int = 64
    n_blocks: int = 4
    style_dim: int = 128

    @nn.compact
    def __call__(self, condition, zs, noise):
        """condition: [B, n_mel, T, 1] in [0,1]; zs: [B, latent]; noise:
        [B, n_mel, T, 1].  Returns enhanced [B, n_mel, T, 1] in [0,1]."""
        w = MappingNetwork(self.style_dim, name="mapping")(zs)
        x = nn.Conv(self.channels, (3, 3), padding="SAME")(condition)
        for i in range(self.n_blocks):
            x = StyledBlock(self.channels, name=f"block_{i}")(x, w, noise)
        delta = nn.Conv(1, (1, 1))(x)
        return jnp.clip(condition + delta, 0.0, 1.0)


class EnhancerDiscriminator(nn.Module):
    channels: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        """x: [B, n_mel, T, 1] -> logits [B]."""
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(1)(x)[:, 0]


class SpectrogramEnhancerModel:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        self.n_bands = cfg.get("n_bands", 80)
        self.latent_dim = cfg.get("latent_dim", 128)
        self.spectrogram_min_value = cfg.get("spectrogram_min_value", -13.18)
        self.spectrogram_max_value = cfg.get("spectrogram_max_value", 4.78)
        self.consistency_weight = cfg.get("consistency_loss_weight", 10.0)
        self.gp_weight = cfg.get("gradient_penalty_loss_weight", 10.0)
        self.gp_every = cfg.get("gradient_penalty_loss_every_n_steps", 4)
        self.generator = EnhancerGenerator(
            n_bands=self.n_bands,
            channels=cfg.get("channels", 64),
            n_blocks=cfg.get("n_blocks", 4),
            style_dim=self.latent_dim,
        )
        self.discriminator = EnhancerDiscriminator()

    # -- normalization (spectrogram_enhancer.py:53-70) -------------------
    def normalize(self, spec):
        return (spec - self.spectrogram_min_value) / (
            self.spectrogram_max_value - self.spectrogram_min_value
        )

    def unnormalize(self, spec):
        return spec * (
            self.spectrogram_max_value - self.spectrogram_min_value
        ) + self.spectrogram_min_value

    def _as_image(self, spec):
        # [B, n_mel, T] -> [B, n_mel, T, 1]
        return spec[..., None]

    def _mask(self, x, lengths):
        t = x.shape[2]
        return x * mask_from_lens(lengths, t).astype(x.dtype)[:, None, :, None]

    # -- forward ---------------------------------------------------------
    def enhance(self, g_params, spec, lengths, rng):
        """spec: [B, n_mel, T] log-mel (unnormalized).  Returns same shape."""
        cond = self._as_image(self.normalize(spec))
        r1, r2 = jax.random.split(rng)
        zs = jax.random.normal(r1, (spec.shape[0], self.latent_dim))
        noise = jax.random.normal(r2, cond.shape)
        out = self.generator.apply(g_params, cond, zs, noise)
        out = self._mask(out, lengths)
        return self.unnormalize(out[..., 0])

    # -- GAN losses --------------------------------------------------------
    def _gen_forward(self, g_params, batch, rng):
        cond = self._as_image(self.normalize(batch["input_spectrogram"]))
        r1, r2 = jax.random.split(rng)
        zs = jax.random.normal(r1, (cond.shape[0], self.latent_dim))
        noise = jax.random.normal(r2, cond.shape)
        fake = self.generator.apply(g_params, cond, zs, noise)
        return cond, self._mask(fake, batch["lengths"])

    def d_loss_fn(self, d_params, d_stats, g_params, batch, rng, epoch):
        real = self._mask(
            self._as_image(self.normalize(batch["target_spectrogram"])),
            batch["lengths"],
        )
        _, fake = self._gen_forward(g_params, batch, rng)
        fake = jax.lax.stop_gradient(fake)
        real_logits = self.discriminator.apply(d_params, real)
        fake_logits = self.discriminator.apply(d_params, fake)
        loss = hinge_loss(real_logits, fake_logits)
        gp = gradient_penalty_loss(
            lambda x: self.discriminator.apply(d_params, x), real, self.gp_weight
        )
        loss = loss + gp
        return loss, ({"hinge_loss": loss, "gp_loss": gp}, d_stats)

    def g_loss_fn(self, g_params, d_params, d_stats, batch, rng, epoch):
        cond, fake = self._gen_forward(g_params, batch, rng)
        fake_logits = self.discriminator.apply(d_params, fake)
        g_adv = generator_loss(fake_logits)
        cons = consistency_loss(
            self._mask(cond, batch["lengths"]), fake, batch["lengths"],
            self.consistency_weight,
        )
        loss = g_adv + cons
        return loss, {"g_adv_loss": g_adv, "consistency_loss": cons}

    # -- state / step ------------------------------------------------------
    def init_state(self, rng, batch, g_opt, d_opt) -> GANTrainState:
        spec = jnp.asarray(batch["input_spectrogram"])

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, spec):
            r1, r2, r3 = jax.random.split(rng, 3)
            cond = self._as_image(self.normalize(spec))
            zs = jnp.zeros((cond.shape[0], self.latent_dim))
            noise = jnp.zeros(cond.shape)
            g_params = self.generator.init(r1, cond, zs, noise)
            d_params = self.discriminator.init(r2, cond)
            return g_params, d_params

        g_params, d_params = _init(rng, spec)
        return create_gan_state(g_params, d_params, g_opt, d_opt, d_stats={})

    def make_train_step(self, g_opt, d_opt, precision=None):
        return make_gan_train_step(
            self.d_loss_fn, self.g_loss_fn, g_opt, d_opt, precision=precision
        )
