"""JETS tests: module shapes, GAN step, inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.models.jets_model import JETSModel
from roar_tpu.ops.priors import beta_binomial_prior_np
from roar_tpu.training.optim import build_optimizer


def jets_cfg():
    d = 32
    return {
        "learn_alignment": True,
        "bin_loss_warmup_epochs": 2,
        "symbols_embedding_dim": d,
        "n_symbols": 40,
        "segment_size": 8,
        "preprocessor": {
            "sample_rate": 22050,
            "nfilt": 16,
            "features": 16,
            "n_window_size": 512,
            "n_window_stride": 128,
            "n_fft": 512,
            "highfreq": 8000,
            "preemph": None,
            "normalize": None,
            "mag_power": 1.0,
            "log": True,
            "log_zero_guard_type": "clamp",
            "log_zero_guard_value": 1e-05,
            "dither": 0.0,
            "pad_to": 0,
            "exact_pad": True,
        },
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": d, "d_head": 16, "d_inner": 64},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": d, "d_head": 16, "d_inner": 64},
        "alignment_module": {"n_text_channels": d, "n_att_channels": 16},
        "duration_predictor": {"input_size": d, "filter_size": 16},
        "pitch_predictor": {"input_size": d, "filter_size": 16},
        "debug": True,
        "waveform_generator": {
            "resblock": 2,
            "upsample_rates": [8, 4, 4],
            "upsample_kernel_sizes": [16, 8, 8],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
    }


@pytest.fixture(scope="module")
def jets_setup():
    model = JETSModel(jets_cfg())
    rng = np.random.default_rng(0)
    b, t_text = 2, 10
    sr, hop = 22050, 128
    n_samples = 8192
    t_mel = n_samples // hop  # exact_pad: frames = samples/hop
    audio = (0.3 * np.sin(2 * np.pi * 180 * np.arange(b * n_samples).reshape(b, n_samples) / sr)
             + 0.01 * rng.standard_normal((b, n_samples))).astype(np.float32)
    batch = {
        "audio": jnp.asarray(audio),
        "audio_len": jnp.asarray([n_samples, n_samples - 1024]),
        "text": jnp.asarray(rng.integers(1, 40, size=(b, t_text)).astype(np.int32)),
        "text_len": jnp.asarray([t_text, t_text - 2]),
        "pitch": jnp.asarray(rng.standard_normal((b, t_mel)).astype(np.float32)),
        "align_prior_matrix": jnp.asarray(
            np.broadcast_to(beta_binomial_prior_np(t_text, t_mel), (b, t_mel, t_text)).copy()
        ),
    }
    return model, batch


@pytest.mark.slow
def test_jets_gan_step(jets_setup):
    model, batch = jets_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)

    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub, 0)
        for k in ("d_loss", "g_loss", "g_mel_loss", "ctc_loss", "dur_loss", "pitch_loss"):
            assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    assert int(jax.device_get(state.step)) == 3


@pytest.mark.slow
def test_jets_shared_forward_step_matches_generic(jets_setup):
    """The single-forward vjp step (training/gan.py
    make_shared_forward_gan_step) must be numerically identical to the
    generic two-forward step: same losses and same post-step params."""
    model, batch = jets_setup
    # SGD, not Adam: Adam normalizes each update to ~lr regardless of gradient
    # magnitude, so fp-reassociation noise on near-zero gradients flips update
    # signs and the comparison becomes meaningless. Under SGD the param diff is
    # proportional to the (tiny) gradient diff.
    g_opt = build_optimizer({"name": "sgd", "lr": 1e-3}, gradient_clip_val=1000.0)
    d_opt = build_optimizer({"name": "sgd", "lr": 1e-3}, gradient_clip_val=1000.0)

    results = {}
    for shared in (False, True):
        state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
        step = model.make_train_step(g_opt, d_opt, shared_forward=shared)
        rng = jax.random.PRNGKey(1)
        for i in range(2):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub, 0)
        results[shared] = (jax.device_get(state.g_params),
                           jax.device_get(state.d_params),
                           {k: float(v) for k, v in metrics.items()})

    (gp0, dp0, m0), (gp1, dp1, m1) = results[False], results[True]
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-4, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(gp0), jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(dp0), jax.tree_util.tree_leaves(dp1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_jets_segment_shapes(jets_setup):
    model, batch = jets_setup
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    out = model._forward(g_params, batch, jax.random.PRNGKey(2), deterministic=True)
    seg_samples = model.segment_size * model.hop_length
    assert out["wav"].shape == (2, seg_samples)
    assert out["z_start_idxs"].shape == (2,)
    # durations from MAS sum to mel lens
    np.testing.assert_array_equal(
        np.asarray(out["attn_hard_dur"]).sum(-1), np.asarray(out["mel_lens"])
    )


@pytest.mark.slow
def test_jets_inference(jets_setup):
    model, batch = jets_setup
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    wav, frames = model.convert_text_to_waveform(
        g_params, batch["text"], max_mel_len=128
    )
    assert wav.shape == (2, 128 * model.hop_length)
    assert (np.asarray(frames) <= 128).all()


@pytest.mark.slow
def test_roar_tts_gan_step(jets_setup):
    from roar_tpu.models.roar_tts import RoarTTSModel

    model = RoarTTSModel(jets_cfg())
    _, batch = jets_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    from roar_tpu.training.gan import create_gan_state

    g_params, d_params, d_stats = model.init_params(jax.random.PRNGKey(0), batch)
    state = create_gan_state(g_params, d_params, g_opt, d_opt, d_stats)
    step = model.make_train_step(g_opt, d_opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    for k in ("d_loss", "g_loss", "g_mel_loss", "d_loss_mrd"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.slow
def test_jets_conformer_rope_gan_step(jets_setup):
    """Conformer/RoPE encoder+decoder variant (configs/jets_22050_conformer.yaml,
    BASELINE configs[4]): one GAN step trains and inference runs."""
    cfg = jets_cfg()
    for k in ("input_fft", "output_fft"):
        cfg[k] = {
            **cfg[k],
            "encoder_type": "conformer",
            "kernel_size": 7,
            "use_rope": True,
            "use_flash": True,  # runtime-gated to TPU; SDPA fallback on CPU
        }
    model = JETSModel(cfg)
    _, batch = jets_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4}, gradient_clip_val=1000.0)
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    for k in ("d_loss", "g_loss", "g_mel_loss", "ctc_loss"):
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    # conformer layers actually in the graph (conv module param present)
    flat = jax.tree_util.tree_leaves_with_path(state.g_params)
    assert any("convolutional_block" in jax.tree_util.keystr(p) for p, _ in flat)
    wav, _ = model.convert_text_to_waveform(
        state.g_params, batch["text"], max_mel_len=64
    )
    assert wav.shape == (2, 64 * model.hop_length)
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_speech_prompt_encoder():
    from roar_tpu.models.roar_tts import SpeechPromptEncoder

    enc = SpeechPromptEncoder(out_dim=32)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32))
    lens = jnp.asarray([50, 30])
    params = enc.init(jax.random.PRNGKey(0), prompt, lens)
    out = enc.apply(params, prompt, lens)
    assert out.shape == (2, 1, 32)
    # prompt content changes the embedding (note: a pure rescale is
    # normalized away by the conv-stack LayerNorms at init, so perturb
    # additively)
    prompt2 = prompt + jnp.asarray(
        rng.standard_normal(prompt.shape).astype(np.float32)
    )
    out2 = enc.apply(params, prompt2, lens)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
