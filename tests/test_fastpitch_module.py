"""FastPitch model graph tests: shapes, jit, grads, train-vs-infer paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roar_tpu.losses import (
    bin_loss,
    duration_loss,
    forward_sum_loss,
    mel_loss,
    pitch_loss,
)
from roar_tpu.models import (
    AlignerConfig,
    FastPitchModule,
    FFTConfig,
    PredictorConfig,
)
from roar_tpu.ops.priors import beta_binomial_prior


def tiny_model(n_speakers=1, energy=False):
    d = 32
    # multi-speaker models condition like fastpitch_22050_align.yaml:162-186
    ct = ("add", "layernorm") if n_speakers > 1 else ()
    fft = FFTConfig(
        n_layer=2, n_head=1, d_model=d, d_head=16, d_inner=64, kernel_size=3,
        condition_types=ct,
    )
    return FastPitchModule(
        n_symbols=40,
        encoder=fft,
        decoder=fft,
        duration_predictor=PredictorConfig(input_size=d, filter_size=16, condition_types=ct),
        pitch_predictor=PredictorConfig(input_size=d, filter_size=16, condition_types=ct),
        energy_predictor=PredictorConfig(input_size=d, filter_size=16) if energy else None,
        aligner=AlignerConfig(n_text_channels=d, n_att_channels=16),
        n_speakers=n_speakers,
        symbols_embedding_dim=d,
        n_mel_channels=20,
        speaker_emb_condition_prosody=bool(ct),
        speaker_emb_condition_decoder=bool(ct),
    )


def make_batch(rng, b=2, t_text=12, t_mel=40, n_mel=20):
    text = rng.integers(1, 40, size=(b, t_text)).astype(np.int32)
    text[0, -3:] = 0  # padding
    text_lens = np.array([t_text - 3, t_text], np.int32)
    spec = rng.standard_normal((b, t_mel, n_mel)).astype(np.float32)
    mel_lens = np.array([t_mel, t_mel - 6], np.int32)
    pitch = rng.standard_normal((b, t_mel)).astype(np.float32)
    prior = np.stack(
        [np.asarray(beta_binomial_prior(t_text, t_mel)) for _ in range(b)]
    )
    return (
        jnp.asarray(text),
        jnp.asarray(text_lens),
        jnp.asarray(spec),
        jnp.asarray(mel_lens),
        jnp.asarray(pitch),
        jnp.asarray(prior),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = np.random.default_rng(0)
    text, text_lens, spec, mel_lens, pitch, prior = make_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        text,
        pitch=pitch,
        spec=spec,
        attn_prior=prior,
        mel_lens=mel_lens,
        input_lens=text_lens,
    )
    return model, params, (text, text_lens, spec, mel_lens, pitch, prior)


@pytest.mark.slow
def test_forward_shapes(model_and_params):
    model, params, (text, text_lens, spec, mel_lens, pitch, prior) = model_and_params
    out = model.apply(
        params,
        text,
        pitch=pitch,
        spec=spec,
        attn_prior=prior,
        mel_lens=mel_lens,
        input_lens=text_lens,
    )
    b, t_mel, _ = spec.shape
    t_text = text.shape[1]
    assert out["spect"].shape == (b, t_mel, 20)
    assert out["attn_soft"].shape == (b, 1, t_mel, t_text)
    assert out["attn_hard_dur"].shape == (b, t_text)
    # durations from MAS must sum to the true mel lengths
    np.testing.assert_array_equal(
        np.asarray(out["attn_hard_dur"]).sum(-1), np.asarray(mel_lens)
    )
    # soft attention rows (valid region) sum to 1 over text
    a = np.asarray(out["attn_soft"])[0, 0]
    np.testing.assert_allclose(a[: int(mel_lens[0])].sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_forward_jits_and_losses_finite(model_and_params):
    model, params, (text, text_lens, spec, mel_lens, pitch, prior) = model_and_params

    @jax.jit
    def loss_fn(params):
        out = model.apply(
            params,
            text,
            pitch=pitch,
            spec=spec,
            attn_prior=prior,
            mel_lens=mel_lens,
            input_lens=text_lens,
        )
        l_mel = mel_loss(out["spect"], spec)
        l_dur = duration_loss(out["log_durs_predicted"], out["attn_hard_dur"], text_lens)
        l_pitch = pitch_loss(out["pitch_predicted"], out["pitch"], text_lens)
        l_fs = forward_sum_loss(out["attn_logprob"], text_lens, mel_lens)
        l_bin = bin_loss(out["attn_hard"], out["attn_soft"])
        return l_mel + l_dur + l_pitch + l_fs + l_bin

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # MAS / binarization must not receive gradients (stop_gradient) — check
    # the aligner still gets gradient via forward-sum loss path
    aligner_grads = jax.tree_util.tree_leaves(
        grads["params"]["aligner_module"]
    )
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in aligner_grads)


def test_infer_path(model_and_params):
    model, params, (text, text_lens, *_ ) = model_and_params
    out = model.apply(params, text, max_mel_len=64, method=model.infer)
    assert out["spect"].shape == (2, 64, 20)
    assert (np.asarray(out["num_frames"]) <= 64).all()
    # padded text rows produce zero predicted duration
    durs = np.asarray(out["durs_predicted"])
    assert (durs[0, -3:] == 0).all()


def test_multispeaker_conditioning():
    model = tiny_model(n_speakers=3)
    rng = np.random.default_rng(1)
    text, text_lens, spec, mel_lens, pitch, prior = make_batch(rng)
    speaker = jnp.asarray([0, 2])
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        text,
        pitch=pitch,
        speaker=speaker,
        spec=spec,
        attn_prior=prior,
        mel_lens=mel_lens,
        input_lens=text_lens,
    )
    out0 = model.apply(
        params, text, pitch=pitch, speaker=jnp.asarray([0, 0]), spec=spec,
        attn_prior=prior, mel_lens=mel_lens, input_lens=text_lens,
    )
    out1 = model.apply(
        params, text, pitch=pitch, speaker=jnp.asarray([1, 1]), spec=spec,
        attn_prior=prior, mel_lens=mel_lens, input_lens=text_lens,
    )
    assert not np.allclose(np.asarray(out0["spect"]), np.asarray(out1["spect"]))


@pytest.mark.slow
def test_single_speaker_strips_inert_conditioning():
    """The shipped recipes set condition_types for speaker conditioning;
    with n_speakers=1 (no conditioning source) the task wrapper drops them
    with a warning instead of erroring at trace time."""
    import warnings

    from roar_tpu.models.fastpitch_model import FastPitchModel

    cfg = {
        "n_mel_channels": 16, "symbols_embedding_dim": 32, "n_symbols": 40,
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                      "d_inner": 64, "condition_types": ["add", "layernorm"]},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                       "d_inner": 64, "condition_types": ["add", "layernorm"]},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16,
                             "condition_types": ["add"]},
        "duration_predictor": {"input_size": 32, "filter_size": 16,
                               "condition_types": ["add", "layernorm"]},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "speaker_encoder": {"lookup_module": {"n_speakers": 1}},
        "preprocessor": {"sample_rate": 22050, "features": 16,
                         "n_window_size": 512, "n_window_stride": 128,
                         "n_fft": 512},
    }
    with pytest.warns(UserWarning, match="dropping condition_types"):
        model = FastPitchModel(cfg)
    batch = {
        "text": jnp.ones((2, 16), jnp.int32),
        "text_len": jnp.full((2,), 16, jnp.int32),
        "audio": jnp.zeros((2, 8192), jnp.float32),
        "audio_len": jnp.full((2,), 8192, jnp.int32),
        "pitch": jnp.zeros((2, 64), jnp.float32),
        "align_prior_matrix": jnp.ones((2, 64, 16), jnp.float32) / 16,
        "speaker_id": jnp.zeros((2,), jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, batch, None, 0, deterministic=True)
    assert np.isfinite(float(loss))
    # multispeaker configs are untouched
    cfg2 = dict(cfg)
    cfg2["speaker_encoder"] = {"lookup_module": {"n_speakers": 3}}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m2 = FastPitchModel(cfg2)
    assert m2.module.encoder.condition_types == ("add", "layernorm")


@pytest.mark.slow
def test_adapter_dim_from_config():
    """adapter_dim in the input/output_fft config blocks reaches FFTConfig
    (regression: the adapter finetune example trained 0 params)."""
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.training.finetune import count_trainable

    cfg = {
        "n_mel_channels": 16, "symbols_embedding_dim": 32, "n_symbols": 40,
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                      "d_inner": 64, "adapter_dim": 8},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": 32, "d_head": 16,
                       "d_inner": 64, "adapter_dim": 8},
        "alignment_module": {"n_text_channels": 32, "n_att_channels": 16},
        "duration_predictor": {"input_size": 32, "filter_size": 16},
        "pitch_predictor": {"input_size": 32, "filter_size": 16},
        "preprocessor": {"sample_rate": 22050, "features": 16,
                         "n_window_size": 512, "n_window_stride": 128,
                         "n_fft": 512},
    }
    model = FastPitchModel(cfg)
    assert model.module.encoder.adapter_dim == 8
    batch = {
        "text": jnp.ones((2, 16), jnp.int32),
        "text_len": jnp.full((2,), 16, jnp.int32),
        "audio": jnp.zeros((2, 8192), jnp.float32),
        "audio_len": jnp.full((2,), 8192, jnp.int32),
        "pitch": jnp.zeros((2, 64), jnp.float32),
        "align_prior_matrix": jnp.ones((2, 64, 16), jnp.float32) / 16,
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    n_train, n_total = count_trainable(params, [r"adapter"])
    assert n_train > 0
    assert n_train < n_total


def test_energy_predictor_path():
    model = tiny_model(energy=True)
    rng = np.random.default_rng(2)
    text, text_lens, spec, mel_lens, pitch, prior = make_batch(rng)
    energy = jnp.abs(jnp.asarray(rng.standard_normal((2, 40)).astype(np.float32)))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        text, pitch=pitch, energy=energy, spec=spec,
        attn_prior=prior, mel_lens=mel_lens, input_lens=text_lens,
    )
    out = model.apply(
        params, text, pitch=pitch, energy=energy, spec=spec,
        attn_prior=prior, mel_lens=mel_lens, input_lens=text_lens,
    )
    assert out["energy_pred"].shape == (2, 12)
    assert out["energy_tgt"].shape == (2, 12)
    assert np.isfinite(np.asarray(out["energy_tgt"])).all()


@pytest.mark.slow
def test_dropout_stochasticity(model_and_params):
    model, params, (text, text_lens, spec, mel_lens, pitch, prior) = model_and_params
    kwargs = dict(
        pitch=pitch, spec=spec, attn_prior=prior, mel_lens=mel_lens,
        input_lens=text_lens, deterministic=False,
    )
    o1 = model.apply(params, text, rngs={"dropout": jax.random.PRNGKey(1)}, **kwargs)
    o2 = model.apply(params, text, rngs={"dropout": jax.random.PRNGKey(2)}, **kwargs)
    assert not np.allclose(np.asarray(o1["spect"]), np.asarray(o2["spect"]))
    o3 = model.apply(params, text, rngs={"dropout": jax.random.PRNGKey(1)}, **kwargs)
    np.testing.assert_allclose(np.asarray(o1["spect"]), np.asarray(o3["spect"]))


@pytest.mark.slow
def test_conformer_encoder_variant():
    d = 32
    fft = FFTConfig(
        n_layer=1, n_head=2, d_model=d, d_head=16, d_inner=64, kernel_size=31,
        encoder_type="conformer", use_rope=True,
    )
    model = FastPitchModule(
        n_symbols=40, encoder=fft, decoder=fft,
        duration_predictor=PredictorConfig(input_size=d, filter_size=16),
        pitch_predictor=PredictorConfig(input_size=d, filter_size=16),
        aligner=AlignerConfig(n_text_channels=d, n_att_channels=16),
        symbols_embedding_dim=d, n_mel_channels=20,
    )
    rng = np.random.default_rng(5)
    text, text_lens, spec, mel_lens, pitch, prior = make_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, text, pitch=pitch, spec=spec,
        attn_prior=prior, mel_lens=mel_lens, input_lens=text_lens,
    )
    out = model.apply(
        params, text, pitch=pitch, spec=spec, attn_prior=prior,
        mel_lens=mel_lens, input_lens=text_lens,
    )
    assert out["spect"].shape == (2, 40, 20)
    assert np.isfinite(np.asarray(out["spect"])).all()


def test_rope_cache_properties():
    from roar_tpu.ops.rope import apply_rope, build_rope_cache

    cos, sin = build_rope_cache(16, 8)
    assert cos.shape == (16, 4)
    # rotation preserves norms
    x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 16, 2, 8)), jnp.float32)
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        atol=1e-4,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.asarray(x)[:, 0], atol=1e-6)


@pytest.mark.slow
def test_gst_reference_conditioning():
    d = 32
    ct = ("add",)
    fft = FFTConfig(n_layer=1, n_head=1, d_model=d, d_head=16, d_inner=64,
                    kernel_size=3, condition_types=ct)
    model = FastPitchModule(
        n_symbols=40, encoder=fft, decoder=fft,
        duration_predictor=PredictorConfig(input_size=d, filter_size=16),
        pitch_predictor=PredictorConfig(input_size=d, filter_size=16),
        aligner=AlignerConfig(n_text_channels=d, n_att_channels=16),
        symbols_embedding_dim=d, n_mel_channels=20,
        use_gst=True,
        speaker_emb_condition_decoder=True,
    )
    rng = np.random.default_rng(7)
    text, text_lens, spec, mel_lens, pitch, prior = make_batch(rng)
    ref = jnp.asarray(rng.standard_normal((2, 64, 20)).astype(np.float32))
    ref_lens = jnp.asarray([64, 48])
    kwargs = dict(pitch=pitch, spec=spec, attn_prior=prior, mel_lens=mel_lens,
                  input_lens=text_lens, reference_spec=ref, reference_spec_lens=ref_lens)
    params = model.init({"params": jax.random.PRNGKey(0)}, text, **kwargs)
    out1 = model.apply(params, text, **kwargs)
    # different reference audio -> different output
    ref2 = jnp.asarray(rng.standard_normal((2, 64, 20)).astype(np.float32)) * 3
    kwargs2 = dict(kwargs)
    kwargs2["reference_spec"] = ref2
    out2 = model.apply(params, text, **kwargs2)
    assert not np.allclose(np.asarray(out1["spect"]), np.asarray(out2["spect"]))
    assert np.isfinite(np.asarray(out1["spect"])).all()


def test_flash_attention_matches_sdpa():
    """Pallas flash attention == SDPA einsum path, including non-multiple-
    of-128 lengths (the wrapper pads to the kernel's 128-block tiles with a
    separate segment id) and padded keys.  TPU-only: the kernel has no CPU
    lowering."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("Pallas flash attention kernel is TPU-only")
    import jax.numpy as jnp

    from roar_tpu.models.transformer import MultiHeadAttn

    rng = np.random.default_rng(0)
    b, t, d_model, n_head, d_head = 2, 200, 64, 2, 32  # t % 128 != 0
    x = jnp.asarray(rng.standard_normal((b, t, d_model)).astype(np.float32))
    lens = jnp.asarray([200, 150])
    key_mask = jnp.arange(t)[None, :] < lens[:, None]

    sdpa = MultiHeadAttn(n_head, d_model, d_head, 0.0, use_flash=False)
    flash = MultiHeadAttn(n_head, d_model, d_head, 0.0, use_flash=True)
    params = sdpa.init(jax.random.PRNGKey(0), x, key_mask=key_mask)
    out_s = np.asarray(sdpa.apply(params, x, key_mask=key_mask))
    out_f = np.asarray(flash.apply(params, x, key_mask=key_mask))
    # compare valid positions only (padding rows are masked downstream)
    mask = np.asarray(key_mask)[..., None]
    # kernel-internal rounding differs from the einsum path; 5e-3 on
    # unit-variance activations (measured max 2.4e-3 on a v5e chip)
    np.testing.assert_allclose(out_f * mask, out_s * mask, atol=5e-3, rtol=1e-2)


def test_flash_block_sizes_divide_padded_length():
    """The Pallas kernel requires block sizes to DIVIDE the padded length
    (regression: hardcoded 1024 blocks crashed any padded length >1024 not
    a multiple of 1024, e.g. mel 1100 -> pad 1152)."""
    from roar_tpu.models.transformer import _flash_block_sizes

    for t in [128, 384, 896, 1024, 1152, 1536, 2176, 4096, 8192, 123 * 128]:
        bs = _flash_block_sizes(t)
        assert t % bs.block_q == 0, (t, bs.block_q)
        assert t % bs.block_k_major == 0
        assert 128 <= bs.block_q <= 1024
    # the measured sweet spot is reached whenever it divides
    assert _flash_block_sizes(4096).block_q == 1024
    assert _flash_block_sizes(1152).block_q == 384  # 1152 = 128*9; largest 128-multiple divisor <= 1024
