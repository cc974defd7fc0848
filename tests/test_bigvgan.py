"""BigVGAN module tests."""

import numpy as np

import jax
import pytest
import jax.numpy as jnp

from roar_tpu.models.bigvgan import (
    BigVGANGenerator,
    MultiResolutionDiscriminator,
    Snake,
    SnakeBeta,
    downsample1d,
    snake,
    upsample1d,
)


def test_snake_activation():
    x = jnp.linspace(-2, 2, 64)[None, :, None]
    y = np.asarray(snake(x, jnp.ones((1, 1, 1))))
    # snake(x, 1) = x + sin^2(x)
    np.testing.assert_allclose(y, np.asarray(x) + np.sin(np.asarray(x)) ** 2, atol=1e-6)

    s = Snake(channels=4)
    p = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))
    out = s.apply(p, jnp.ones((1, 8, 4)))
    assert out.shape == (1, 8, 4)
    sb = SnakeBeta(channels=4)
    p = sb.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))
    assert sb.apply(p, jnp.ones((1, 8, 4))).shape == (1, 8, 4)


def test_alias_free_resample_roundtrip():
    sr = 16000
    t = np.arange(2048) / sr
    x = np.sin(2 * np.pi * 400 * t).astype(np.float32)[None, :, None]
    up = upsample1d(jnp.asarray(x), 2)
    assert up.shape == (1, 4096, 1)
    down = downsample1d(up, 2)
    assert down.shape == (1, 2048, 1)
    # roundtrip preserves the band-limited signal away from edges
    got = np.asarray(down)[0, 128:-128, 0]
    ref = x[0, 128:-128, 0]
    assert np.corrcoef(got, ref)[0, 1] > 0.99


@pytest.mark.slow
def test_bigvgan_generator_shapes():
    g = BigVGANGenerator(
        resblock=2,
        upsample_rates=(8, 4, 4),
        upsample_kernel_sizes=(16, 8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        initial_input_size=20,
    )
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 20)), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), mel)
    audio = g.apply(params, mel)
    assert audio.shape == (1, 8 * 128)
    assert np.abs(np.asarray(audio)).max() <= 1.0


@pytest.mark.slow
def test_multi_resolution_discriminator():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    mrd = MultiResolutionDiscriminator(resolutions=((512, 128, 512), (256, 64, 256)))
    params = mrd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, fs, fr, fg = mrd.apply(params, y, y_hat)
    assert len(rs) == 2 and len(fr) == 2
    assert all(np.isfinite(np.asarray(s)).all() for s in rs + fs)
