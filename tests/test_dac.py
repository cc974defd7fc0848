"""Tests for the DAC residual-VQ audio codec (working replacement for the
reference's dead models/dac.py — see roar_tpu/models/dac.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from roar_tpu.models.dac import DAC, DACModel, ResidualVectorQuantize


def tiny_dac():
    return DAC(
        encoder_dim=8, encoder_rates=(2, 4), latent_dim=16,
        decoder_dim=32, n_codebooks=3, codebook_size=16, codebook_dim=4,
    )


class TestDACCodec:
    @pytest.mark.slow
    def test_roundtrip_shapes(self):
        dac = tiny_dac()
        assert dac.hop_length == 8
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64)), jnp.float32
        )
        params = dac.init(jax.random.PRNGKey(0), audio)
        out = jax.jit(lambda a: dac.apply(params, a))(audio)
        assert out["audio"].shape == (2, 64)
        assert out["codes"].shape == (2, 3, 8)
        assert out["latents"].shape == (2, 8, 16)
        assert np.isfinite(float(out["vq/commitment_loss"]))

    @pytest.mark.slow
    def test_decode_from_codes_matches_forward(self):
        """Compression contract: decoding the integer codes reproduces the
        forward reconstruction (up to straight-through fp reassociation)."""
        dac = tiny_dac()
        audio = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 64)), jnp.float32
        )
        params = dac.init(jax.random.PRNGKey(0), audio)
        out = dac.apply(params, audio)
        decoded = dac.apply(params, out["codes"], method=DAC.decode_from_codes)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(out["audio"]), atol=2e-3
        )

    @pytest.mark.slow
    def test_straight_through_gradients_reach_encoder(self):
        dac = tiny_dac()
        audio = jnp.ones((1, 64))
        params = dac.init(jax.random.PRNGKey(0), audio)

        def loss(p):
            o = dac.apply(p, audio)
            return jnp.mean(jnp.square(o["audio"] - audio))

        g = jax.grad(loss)(params)
        enc_leaves = jax.tree_util.tree_leaves(g["params"]["encoder"])
        assert any(float(jnp.abs(x).max()) > 0 for x in enc_leaves)

    @pytest.mark.slow
    def test_quantizer_dropout_masks_stages(self):
        """n_quantizers=1 must equal using only the first codebook."""
        rvq = ResidualVectorQuantize(
            input_dim=8, n_codebooks=4, codebook_size=8, codebook_dim=4
        )
        z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)), jnp.float32)
        params = rvq.init(jax.random.PRNGKey(0), z)
        zq_all, codes, _, _ = rvq.apply(params, z)
        zq_1, _, _, _ = rvq.apply(params, z, jnp.asarray([1, 1]))
        # with all stages, output differs from 1-stage output
        assert not np.allclose(np.asarray(zq_all), np.asarray(zq_1))
        # 1-stage output == decode of first codebook's codes
        dec1 = rvq.apply(params, codes[:, :1], method=ResidualVectorQuantize.decode_codes)
        np.testing.assert_allclose(np.asarray(zq_1), np.asarray(dec1), atol=2e-5)

    @pytest.mark.slow
    def test_per_example_nq(self):
        dac = tiny_dac()
        audio = jnp.ones((2, 64))
        params = dac.init(jax.random.PRNGKey(0), audio)
        out = dac.apply(params, audio, jnp.asarray([1, 3]))
        assert np.isfinite(np.asarray(out["audio"])).all()


class TestDACModel:
    @pytest.mark.slow
    def test_gan_step_runs_and_metrics_finite(self):
        model = DACModel(
            {
                "sample_rate": 22050,
                "encoder_dim": 4,
                "encoder_rates": (2, 4),
                "latent_dim": 8,
                "decoder_dim": 16,
                "n_codebooks": 2,
                "codebook_size": 8,
                "codebook_dim": 4,
                "debug": True,
            }
        )
        rng = jax.random.PRNGKey(0)
        audio = np.random.default_rng(0).standard_normal((2, 2048)).astype(np.float32)
        batch = {"audio": audio, "audio_len": np.asarray([2048, 2048], np.int32)}
        g_opt = optax.adam(1e-4)
        d_opt = optax.adam(1e-4)
        state = model.init_state(rng, batch, g_opt, d_opt)
        step = model.make_train_step(g_opt, d_opt)
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                              rng, 0)
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert "g_vq_loss" in metrics and "d_loss_mrd" in metrics

    @pytest.mark.slow
    def test_encode_decode_api(self):
        model = DACModel(
            {
                "encoder_dim": 4, "encoder_rates": (2, 4), "latent_dim": 8,
                "decoder_dim": 16, "n_codebooks": 2, "codebook_size": 8,
                "codebook_dim": 4,
            }
        )
        audio = jnp.ones((1, 64))
        g_params = model.codec.init(jax.random.PRNGKey(0), audio)
        codes = model.encode(g_params, audio)
        assert codes.shape == (1, 2, 8)
        assert codes.dtype in (jnp.int32, jnp.int64)
        wav = model.decode(g_params, codes)
        assert wav.shape == (1, 64)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
