"""FastPitch regression losses (masked MSEs).

Parity with roar/collections/tts/losses/fastpitchloss.py:19-139:
- DurationLoss: masked MSE on log(dur + 1), scale 0.1
- PitchLoss / EnergyLoss: masked MSE, scale 0.1
- MelLoss: MSE masked by spect_tgt != 0 (the reference's implicit pad mask)

All tensors are [B, T] or [B, T, C] (channels last).
"""

from __future__ import annotations

import jax.numpy as jnp

from roar_tpu.ops.lengths import mask_from_lens


def duration_loss(log_durs_predicted, durs_tgt, lens, loss_scale: float = 0.1):
    mask = mask_from_lens(lens, durs_tgt.shape[1]).astype(jnp.float32)
    log_durs_tgt = jnp.log(durs_tgt.astype(jnp.float32) + 1.0)
    loss = jnp.square(log_durs_predicted - log_durs_tgt)
    return loss_scale * jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def pitch_loss(pitch_predicted, pitch_tgt, lens, loss_scale: float = 0.1):
    mask = mask_from_lens(lens, pitch_tgt.shape[1]).astype(jnp.float32)
    ldiff = pitch_tgt.shape[1] - pitch_predicted.shape[1]
    if ldiff > 0:
        pitch_predicted = jnp.pad(pitch_predicted, ((0, 0), (0, ldiff)))
    loss = jnp.square(pitch_tgt - pitch_predicted)
    return loss_scale * jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def energy_loss(energy_predicted, energy_tgt, lens, loss_scale: float = 0.1):
    if energy_tgt is None:
        return jnp.float32(0.0)
    mask = mask_from_lens(lens, energy_tgt.shape[1]).astype(jnp.float32)
    loss = jnp.square(energy_tgt - energy_predicted)
    return loss_scale * jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mel_loss(spect_predicted, spect_tgt):
    """spect_*: [B, T, n_mel] channels-last; mask = target != 0
    (fastpitchloss.py:112-139)."""
    ldiff = spect_tgt.shape[1] - spect_predicted.shape[1]
    if ldiff > 0:
        spect_predicted = jnp.pad(spect_predicted, ((0, 0), (0, ldiff), (0, 0)))
    elif ldiff < 0:
        spect_predicted = spect_predicted[:, : spect_tgt.shape[1]]
    mask = (spect_tgt != 0).astype(jnp.float32)
    loss = jnp.square(spect_predicted - spect_tgt)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
