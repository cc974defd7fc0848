"""VITS tests: spline + coupling invertibility, SDP, full synthesizer, GAN step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.ops.splines import unconstrained_rational_quadratic_spline


@pytest.mark.slow
def test_spline_invertibility():
    rng = np.random.default_rng(0)
    shape = (4, 16)
    x = jnp.asarray(rng.uniform(-8, 8, shape).astype(np.float32))  # incl. tails
    uw = jnp.asarray(rng.standard_normal(shape + (10,)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal(shape + (10,)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal(shape + (9,)).astype(np.float32))
    y, ld = unconstrained_rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x2, ld_inv = unconstrained_rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    # logdets cancel
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-3)
    # identity outside the tail bound
    outside = np.abs(np.asarray(x)) > 5.0
    np.testing.assert_allclose(np.asarray(y)[outside], np.asarray(x)[outside])


def test_spline_monotonic():
    rng = np.random.default_rng(1)
    xs = jnp.linspace(-4.9, 4.9, 200)[None]
    uw = jnp.asarray(np.tile(rng.standard_normal(10), (1, 200, 1)).astype(np.float32))[0][None]
    uw = jnp.broadcast_to(jnp.asarray(rng.standard_normal(10), jnp.float32), (1, 200, 10))
    uh = jnp.broadcast_to(jnp.asarray(rng.standard_normal(10), jnp.float32), (1, 200, 10))
    ud = jnp.broadcast_to(jnp.asarray(rng.standard_normal(9), jnp.float32), (1, 200, 9))
    y, _ = unconstrained_rational_quadratic_spline(xs, uw, uh, ud)
    assert (np.diff(np.asarray(y)[0]) > 0).all()


def test_residual_coupling_invertible():
    from roar_tpu.models.vits import ResidualCouplingBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    mask = jnp.ones((2, 20, 1))
    block = ResidualCouplingBlock(8, hidden_channels=16, n_layers=2, n_flows=2)
    params = block.init(jax.random.PRNGKey(0), x, mask)
    y, logdet = block.apply(params, x, mask, reverse=False)
    x2, _ = block.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # mean-only coupling: logdet == 0
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-5)


@pytest.mark.slow
def test_conv_flow_invertible():
    from roar_tpu.models.vits import ConvFlow

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 2)).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    flow = ConvFlow(2, filter_channels=16, n_layers=2, num_bins=6)
    params = flow.init(jax.random.PRNGKey(0), x, mask)
    y, ld = flow.apply(params, x, mask, reverse=False)
    x2, _ = flow.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)


def vits_cfg():
    return {
        "n_symbols": 40,
        "inter_channels": 16,
        "hidden_channels": 16,
        "n_heads": 2,
        "n_layers": 1,
        "segment_size": 8,
        "use_sdp": True,
        "debug": True,
        "preprocessor": {
            "sample_rate": 22050, "nfilt": 16, "features": 16,
            "n_window_size": 256, "n_window_stride": 64, "n_fft": 256,
            "highfreq": 8000, "preemph": None, "normalize": None,
            "mag_power": 1.0, "log_zero_guard_type": "clamp",
            "log_zero_guard_value": 1e-05, "dither": 0.0, "pad_to": 0,
            "exact_pad": True,
        },
        "waveform_generator": {
            "resblock": 2, "upsample_rates": [8, 4, 2],
            "upsample_kernel_sizes": [16, 8, 4],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1]],
        },
    }


@pytest.fixture(scope="module")
def vits_setup():
    from roar_tpu.models.vits_model import VITSModel

    model = VITSModel(vits_cfg())
    rng = np.random.default_rng(4)
    b, t_text, n = 2, 8, 4096
    audio = (0.3 * np.sin(2 * np.pi * 200 * np.arange(b * n).reshape(b, n) / 22050)
             + 0.01 * rng.standard_normal((b, n))).astype(np.float32)
    batch = {
        "audio": jnp.asarray(audio),
        "audio_len": jnp.asarray([n, n - 512]),
        "text": jnp.asarray(rng.integers(1, 40, (b, t_text)).astype(np.int32)),
        "text_len": jnp.asarray([t_text, t_text - 2]),
    }
    return model, batch


@pytest.mark.slow
def test_vits_forward_and_kl(vits_setup):
    from roar_tpu.models.vits_model import kl_loss

    model, batch = vits_setup
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    out = model._forward(g_params, batch, jax.random.PRNGKey(1), deterministic=True)
    seg = model.segment_size * model.hop_length
    assert out["audio"].shape == (2, seg)
    # alignment is monotonic and covers the valid region
    attn = np.asarray(out["attn"])
    assert attn.shape[1] == out["z"].shape[1]
    durs = attn.sum(1)
    assert (durs.sum(-1) == np.asarray(out["spec_lens"])).all()
    kl = float(kl_loss(out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["y_mask"]))
    assert np.isfinite(kl)
    assert np.isfinite(np.asarray(out["l_length"])).all()


@pytest.mark.slow
def test_vits_gan_step(vits_setup):
    from roar_tpu.training.optim import build_optimizer

    model, batch = vits_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    for k in ("d_loss", "g_loss", "g_mel_loss", "kl_loss", "dur_loss"):
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))


@pytest.mark.slow
def test_vits_inference(vits_setup):
    model, batch = vits_setup
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    wav, y_lens = model.convert_text_to_waveform(
        g_params, batch["text"], max_len=64, rng=jax.random.PRNGKey(2)
    )
    assert wav.shape == (2, 64 * model.hop_length)
    assert (np.asarray(y_lens) > 0).all()
