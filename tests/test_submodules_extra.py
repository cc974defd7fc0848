"""Tests for the Tacotron/WaveGlow-family submodules and GlowVocoder denoise
(reference submodules.py:89-493, models/base.py:105-223)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roar_tpu.models.submodules import (
    Attention,
    Invertible1x1Conv,
    LocationLayer,
    PartialConv1d,
    Prenet,
    WaveGlowWaveNet,
)


class TestPartialConv1d:
    def test_mask_invariance_at_edges(self):
        """A fully-valid signal and the same signal embedded in a longer
        padded buffer must produce identical outputs over the valid span
        interior (the point of partial convolution)."""
        m = PartialConv1d(features=4, kernel_size=5)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)

        y_short = m.apply(params, x)  # mask=None => all valid

        x_pad = jnp.pad(x, ((0, 0), (0, 8), (0, 0)))
        mask = jnp.zeros((2, 24, 1)).at[:, :16].set(1.0)
        y_pad = m.apply(params, x_pad, mask)

        np.testing.assert_allclose(
            np.asarray(y_short), np.asarray(y_pad[:, :16]), atol=1e-5
        )
        # padding region is fully zeroed
        assert np.abs(np.asarray(y_pad[:, 16 + 2 :])).max() < 1e-6

    def test_matches_plain_conv_when_all_valid(self):
        m = PartialConv1d(features=2, kernel_size=3, use_bias=True)
        x = jnp.ones((1, 8, 2))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x, jnp.ones((1, 8, 1)))
        # interior taps see a full window: ratio == 1 there
        assert np.isfinite(np.asarray(y)).all()


class TestTacotronAttention:
    def test_shapes_and_masking(self):
        b, t, c, a = 2, 11, 8, 6
        attn = Attention(
            attention_rnn_dim=5,
            embedding_dim=c,
            attention_dim=a,
            attention_location_n_filters=4,
            attention_location_kernel_size=3,
        )
        rng = np.random.default_rng(0)
        query = jnp.asarray(rng.standard_normal((b, 5)), jnp.float32)
        memory = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        processed = jnp.asarray(rng.standard_normal((b, t, a)), jnp.float32)
        cat = jnp.asarray(rng.standard_normal((b, t, 2)), jnp.float32)
        mask = jnp.zeros((b, t), bool).at[:, 8:].set(True)  # True = pad

        params = attn.init(jax.random.PRNGKey(0), query, memory, processed, cat, mask)
        ctx, w = attn.apply(params, query, memory, processed, cat, mask)
        assert ctx.shape == (b, c) and w.shape == (b, t)
        np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, atol=1e-5)
        assert np.asarray(w[:, 8:]).max() == 0.0

    def test_location_layer_shape(self):
        loc = LocationLayer(4, 31, 6)
        x = jnp.ones((2, 9, 2))
        params = loc.init(jax.random.PRNGKey(0), x)
        assert loc.apply(params, x).shape == (2, 9, 6)


class TestPrenet:
    def test_dropout_always_on(self):
        """Reference Prenet applies dropout even at inference
        (submodules.py:333-349) — two rng draws must differ."""
        pre = Prenet(sizes=[16, 16])
        x = jnp.ones((3, 8))
        params = pre.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
        y1 = pre.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
        y2 = pre.apply(params, x, rngs={"dropout": jax.random.PRNGKey(3)})
        assert y1.shape == (3, 16)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_deterministic_mode(self):
        pre = Prenet(sizes=[4])
        x = jnp.ones((1, 8))
        params = pre.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
        y1 = pre.apply(params, x, deterministic=True)
        y2 = pre.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


class TestInvertible1x1Conv:
    def test_roundtrip_and_logdet(self):
        c = 8
        m = Invertible1x1Conv(channels=c)
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.standard_normal((2, 5, c)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), z)
        y, log_det = m.apply(params, z)
        z_back = m.apply(params, y, reverse=True)
        np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=1e-4)
        # init is orthonormal with det +1 => logdet == 0
        np.testing.assert_allclose(float(log_det), 0.0, atol=1e-3)

    def test_logdet_scales_with_weight(self):
        c = 4
        m = Invertible1x1Conv(channels=c)
        z = jnp.ones((3, 7, c))
        params = m.init(jax.random.PRNGKey(0), z)
        w = 2.0 * np.eye(c, dtype=np.float32)
        params = {"params": {"weight": jnp.asarray(w)}}
        _, log_det = m.apply(params, z)
        np.testing.assert_allclose(
            float(log_det), 3 * 7 * c * np.log(2.0), rtol=1e-5
        )


class TestWaveGlowWaveNet:
    @pytest.mark.slow
    def test_zero_init_end_and_shapes(self):
        m = WaveGlowWaveNet(
            n_in_channels=4, n_mel_channels=10, n_layers=3, n_channels=16,
            kernel_size=3,
        )
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, 12, 4)), jnp.float32)
        spect = jnp.asarray(rng.standard_normal((2, 12, 10)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), audio, spect)
        out = m.apply(params, audio, spect)
        assert out.shape == (2, 12, 8)
        # end conv zero-init => identity coupling at init
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


class TestGlowVocoderDenoise:
    def test_denoise_reduces_bias_energy(self):
        """A GlowVocoder whose 'generator' emits a constant hum: denoise with
        strength 1 must strip most of the hum's energy."""
        from roar_tpu.models.base import GlowVocoder

        class MelCfg:
            n_fft, hop_length, win_length, n_mels = 256, 64, 256, 20

        hum_hz = 8  # bins
        sr_len = 64 * 87 + 1

        class Hummer(GlowVocoder):
            stft_config = MelCfg()

            def convert_spectrogram_to_audio(self, params, spec):
                t = np.arange(sr_len, dtype=np.float32)
                hum = 0.1 * np.sin(2 * np.pi * hum_hz / 256 * t)
                return jnp.asarray(hum)[None, :]

        voc = Hummer()
        audio = voc.convert_spectrogram_to_audio(None, None)
        den = voc.denoise(None, audio, strength=1.0)
        assert den.shape[-1] == audio.shape[-1]
        e_before = float(jnp.mean(audio**2))
        e_after = float(jnp.mean(den[:, 300:-300] ** 2))
        # magnitude-domain subtraction of the frame-0 bias estimate: a large
        # (not exact) energy reduction is the contract (models/base.py:210-223)
        assert e_after < 0.5 * e_before

        # strength=0 is an (st)ft round-trip: identity up to window effects
        ident = voc.denoise(None, audio, strength=0.0)
        np.testing.assert_allclose(
            np.asarray(ident[:, 300:-300]), np.asarray(audio[:, 300:-300]), atol=1e-3
        )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
