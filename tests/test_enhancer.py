"""Spectrogram enhancer tests."""

import numpy as np

import jax
import jax.numpy as jnp

from roar_tpu.models.spectrogram_enhancer import SpectrogramEnhancerModel
from roar_tpu.training.optim import build_optimizer
import pytest


def make_batch(rng, b=2, n_mel=32, t=64):
    base = rng.standard_normal((b, n_mel, t)).astype(np.float32) * 2 - 6
    return {
        "input_spectrogram": jnp.asarray(base),
        "target_spectrogram": jnp.asarray(base + 0.5 * rng.standard_normal((b, n_mel, t)).astype(np.float32)),
        "lengths": jnp.asarray([t, t - 10]),
    }


def test_enhancer_gan_step():
    model = SpectrogramEnhancerModel({"n_bands": 32, "latent_dim": 16, "channels": 16, "n_blocks": 2})
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1), 0)
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
        assert float(metrics["gp_loss"]) >= 0


@pytest.mark.slow
def test_enhancer_enhance_shape_and_masking():
    model = SpectrogramEnhancerModel({"n_bands": 32, "latent_dim": 16, "channels": 16, "n_blocks": 2})
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    out = model.enhance(
        state.g_params, batch["input_spectrogram"], batch["lengths"], jax.random.PRNGKey(2)
    )
    assert out.shape == batch["input_spectrogram"].shape
    # masked region collapses to the unnormalized zero level
    masked = np.asarray(out)[1, :, 54:]
    assert np.allclose(masked, model.unnormalize(0.0), atol=1e-5)
