"""HiFi-GAN losses (LSGAN + feature matching + L1 mel).

Parity with roar/collections/tts/losses/hifigan_losses.py:9-115:
- feature_matching_loss: 2 * sum of mean |fmap_r - fmap_g|
- discriminator_loss: sum over discriminators of mean (1-r)^2 + mean g^2
- generator_loss: sum of mean (1-g)^2
- l1 mel loss (unmasked mean)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def feature_matching_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(
    disc_real_outputs: Sequence[jnp.ndarray],
    disc_generated_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r = jnp.mean(jnp.square(1.0 - dr))
        g = jnp.mean(jnp.square(dg))
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(
    disc_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def l1_mel_loss(spect_predicted, spect_tgt) -> jnp.ndarray:
    return jnp.mean(jnp.abs(spect_predicted - spect_tgt))
