"""Tests for the WaveGlow flow vocoder (roar_tpu/models/waveglow.py —
completes the reference's WaveGlow leftovers: submodules.py:358-493 +
GlowVocoder base)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roar_tpu.models.waveglow import WaveGlowModel, WaveGlowModule, waveglow_loss


def tiny_module():
    return WaveGlowModule(
        n_mel_channels=10, n_flows=4, n_group=4, n_early_every=2,
        n_early_size=1, n_layers=2, n_channels=16, kernel_size=3,
        hop_length=16,
    )


def tiny_inputs(seed=0):
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.standard_normal((2, 128)) * 0.3, jnp.float32)
    mel = jnp.asarray(rng.standard_normal((2, 8, 10)), jnp.float32)
    return audio, mel


class TestWaveGlowModule:
    @pytest.mark.slow
    def test_forward_shapes_and_identity_init(self):
        mod = tiny_module()
        audio, mel = tiny_inputs()
        params = mod.init(jax.random.PRNGKey(0), audio, mel)
        z, log_det = mod.apply(params, audio, mel)
        assert z.shape == (2, 32, 4)
        # zero-init couplings + orthonormal 1x1 convs: log_det ~ 0 at init
        assert abs(float(log_det)) < 1.0

    @pytest.mark.slow
    def test_exact_invertibility(self):
        """reverse(forward(audio)) == audio.  Exact in the algebra (verified
        3e-16 in float64); fp32 exp/log couplings leave ~1e-2 drift with
        randomly perturbed weights."""
        mod = tiny_module()
        audio, mel = tiny_inputs()
        params = mod.init(jax.random.PRNGKey(0), audio, mel)
        params = jax.tree_util.tree_map(
            lambda x: x
            + 0.05 * jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype)
            if x.ndim > 1
            else x,
            params,
        )
        z, _ = mod.apply(params, audio, mel)
        back = mod.apply(params, z, mel, method=WaveGlowModule.reverse)
        np.testing.assert_allclose(np.asarray(back), np.asarray(audio), atol=2e-2)

    @pytest.mark.slow
    def test_infer_shape_and_determinism(self):
        mod = tiny_module()
        audio, mel = tiny_inputs()
        params = mod.init(jax.random.PRNGKey(0), audio, mel)
        wav = jax.jit(
            lambda m: mod.apply(params, m, 0.7, jax.random.PRNGKey(3),
                                method=WaveGlowModule.infer)
        )(mel)
        assert wav.shape == (2, 128)
        assert np.isfinite(np.asarray(wav)).all()
        wav2 = mod.apply(params, mel, 0.7, jax.random.PRNGKey(3),
                         method=WaveGlowModule.infer)
        np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-5)

    @pytest.mark.slow
    def test_loss_and_grads(self):
        mod = tiny_module()
        audio, mel = tiny_inputs()
        params = mod.init(jax.random.PRNGKey(0), audio, mel)

        def loss(p):
            z, ld = mod.apply(p, audio, mel)
            return waveglow_loss(z, ld, sigma=1.0)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        assert all(
            bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
        )


class TestWaveGlowModel:
    @pytest.mark.slow
    def test_train_objective_and_synthesis(self):
        model = WaveGlowModel(
            {
                "sigma": 1.0,
                "preprocessor": {
                    "sample_rate": 22050, "n_fft": 256, "n_window_size": 256,
                    "n_window_stride": 64, "nfilt": 20, "dither": 0.0,
                    "normalize": None, "preemph": None, "pad_to": 0,
                },
                "waveglow": {
                    "n_flows": 2, "n_group": 4, "n_early_every": 4,
                    "n_early_size": 2, "n_wn_layers": 2, "n_wn_channels": 8,
                    "wn_kernel_size": 3,
                },
            }
        )
        rng = np.random.default_rng(0)
        batch = {
            "audio": rng.standard_normal((2, 1024)).astype(np.float32) * 0.2,
            "audio_len": np.asarray([1024, 1024], np.int32),
        }
        params = model.init_params(jax.random.PRNGKey(0), batch)
        loss, metrics = model.loss_fn(
            params, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        assert np.isfinite(float(loss))
        assert "z_mean_sq" in metrics

        mel = np.zeros((1, 4, 20), np.float32)
        wav = model.convert_spectrogram_to_audio(params, mel)
        assert wav.shape == (1, 4 * 64)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
