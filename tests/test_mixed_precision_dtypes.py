"""bf16 leak guards: with params+batch cast to bfloat16, the compute-heavy
outputs of every major model must BE bfloat16.

One strong-typed fp32 operand anywhere (an fp32 mask, a NumPy float64
scalar, fp32 spectral-norm stats) silently promotes everything downstream
back to fp32 under NumPy promotion rules — the step then pays fp32 HBM
traffic while claiming bf16 (measured 1.3x step-time regression before the
r3 fixes, DESIGN.md §7d).  `jax.eval_shape` makes the check free: no
compute, just dtype propagation through the real graphs.

Deliberately-fp32 paths (aligner/CTC, pitch/energy loss targets, the mel
front-end) are asserted fp32 so accuracy choices are pinned too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.training.trainer import cast_floating

B, T_TEXT, T_MEL = 2, 16, 64


def _bf16(tree):
    return cast_floating(tree, jnp.bfloat16)


def _abstract_params(module_init, *args, **kwargs):
    """Params as bf16 ShapeDtypeStructs via eval_shape — no init compute.
    dtype propagation only needs shapes+dtypes, so the whole test runs
    without compiling or executing anything."""
    shapes = jax.eval_shape(module_init, *args, **kwargs)
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape,
            jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype,
        ),
        shapes,
    )


@pytest.fixture(scope="module")
def jets_setup():
    from roar_tpu.config import load_config
    from roar_tpu.models.jets_model import JETSModel

    cfg = load_config(
        "configs/jets_22050_align.yaml",
        overrides=[
            "train_dataset=x", "validation_datasets=x", "sup_data_path=x",
            "pitch_mean=170.0", "pitch_std=60.0",
            "model.speaker_encoder.lookup_module.n_speakers=4",
            # tiny graph: dtype propagation is size-independent
            "model.input_fft.n_layer=1", "model.output_fft.n_layer=1",
            "model.symbols_embedding_dim=64", "model.input_fft.d_inner=96",
            "model.output_fft.d_inner=96",
            "model.waveform_generator.upsample_initial_channel=32",
        ],
    )
    model = JETSModel(cfg["model"])
    hop = model.hop_length
    batch = {
        "text": jnp.ones((B, T_TEXT), jnp.int32),
        "text_len": jnp.full((B,), T_TEXT, jnp.int32),
        "audio": jnp.zeros((B, T_MEL * hop), jnp.float32),
        "audio_len": jnp.full((B,), T_MEL * hop, jnp.int32),
        "pitch": jnp.zeros((B, T_MEL), jnp.float32),
        "align_prior_matrix": jnp.ones((B, T_MEL, T_TEXT), jnp.float32) / T_TEXT,
        "speaker_id": jnp.zeros((B,), jnp.int32),
    }
    g, d, ds = _abstract_params(model.init_params, jax.random.PRNGKey(0), batch)
    return model, batch, g, d, ds


def test_jets_forward_stays_bf16(jets_setup):
    model, batch, g, _, _ = jets_setup
    key = jax.random.PRNGKey(1)
    out = jax.eval_shape(
        lambda p, b: model._forward(p, b, key), g, _bf16(batch)
    )
    for k in ("wav", "log_durs_predicted", "pitch_predicted", "energy_pred",
              "durs_predicted"):
        assert out[k].dtype == jnp.bfloat16, (k, out[k].dtype)
    # accuracy-critical aligner/CTC path deliberately stays fp32
    for k in ("attn_soft", "attn_logprob", "attn_hard", "pitch"):
        assert out[k].dtype == jnp.float32, (k, out[k].dtype)


def test_jets_discriminators_stay_bf16(jets_setup):
    model, _, _, d, ds = jets_setup
    seg = model.segment_size * model.hop_length
    y = jax.ShapeDtypeStruct((B, seg), jnp.bfloat16)
    mpd_out, msd_out, _ = jax.eval_shape(
        lambda dp, dst, y: model._disc_all(dp, dst, y, y, update_stats=False),
        d, ds, y,
    )
    assert all(o.dtype == jnp.bfloat16 for o in mpd_out[0]), "MPD promoted"
    assert all(o.dtype == jnp.bfloat16 for o in msd_out[0]), (
        "MSD promoted (fp32 spectral-norm stats?)"
    )


def test_hifigan_generator_stays_bf16():
    from roar_tpu.models.hifigan_model import HifiGanModel

    model = HifiGanModel({
        "preprocessor": {"nfilt": 32, "sample_rate": 22050},
        "generator": {"upsample_initial_channel": 32},
        "l1_loss_factor": 45,
    })
    seg = 2048
    batch = {
        "audio": jnp.zeros((B, seg), jnp.float32),
        "audio_len": jnp.full((B,), seg, jnp.int32),
    }
    g, d, ds = _abstract_params(model.init_params, jax.random.PRNGKey(0), batch)
    diff, _ = jax.eval_shape(
        lambda p, b: model.forward_split(p, b, None, 0), g, _bf16(batch)
    )
    assert diff["fake"].dtype == jnp.bfloat16, (
        "generator promoted (fp32 front-end mel reaching the generator?)"
    )


def test_gpt_logits_stay_bf16():
    from roar_tpu.models.gpt import GPT, GPTConfig

    cfg = GPTConfig(
        vocab_size=64, block_size=32, n_layer=2, n_head=4, n_embd=64,
        n_query_groups=2, intermediate_size=176, rotary_percentage=1.0,
    )
    model = GPT(cfg)
    tok = jnp.ones((B, 16), jnp.int32)
    params = _abstract_params(model.init, jax.random.PRNGKey(0), tok)
    out = jax.eval_shape(lambda p: model.apply(p, tok), params)
    assert out.dtype == jnp.bfloat16, (
        "GPT promoted (strong-typed numpy scalar in attention scale?)"
    )


def test_fastpitch_forward_stays_bf16():
    from roar_tpu.config import load_config
    from roar_tpu.models.fastpitch_model import FastPitchModel

    cfg = load_config(
        "configs/fastpitch_22050_align.yaml",
        overrides=[
            "train_dataset=x", "validation_datasets=x", "sup_data_path=x",
            "pitch_mean=170.0", "pitch_std=60.0",
            "model.input_fft.n_layer=1", "model.output_fft.n_layer=1",
            "model.symbols_embedding_dim=64", "model.input_fft.d_inner=96",
            "model.output_fft.d_inner=96",
        ],
    )
    model = FastPitchModel(cfg["model"])
    hop = model.mel_cfg.hop_length
    batch = {
        "text": jnp.ones((B, T_TEXT), jnp.int32),
        "text_len": jnp.full((B,), T_TEXT, jnp.int32),
        "audio": jnp.zeros((B, T_MEL * hop), jnp.float32),
        "audio_len": jnp.full((B,), T_MEL * hop, jnp.int32),
        "pitch": jnp.zeros((B, T_MEL), jnp.float32),
        "align_prior_matrix": jnp.ones((B, T_MEL, T_TEXT), jnp.float32) / T_TEXT,
    }
    params = _abstract_params(model.init_params, jax.random.PRNGKey(0), batch)

    def fwd(p, b):
        # mirror loss_fn's forward (fastpitch_model.py:244-262): fp32 spec
        # from the mel front-end feeds only the aligner
        spec, mel_lens = model._spec_from_batch(b["audio"], b["audio_len"], b)
        return model.module.apply(
            p, b["text"], pitch=b.get("pitch"),
            spec=spec, attn_prior=b.get("align_prior_matrix"),
            mel_lens=mel_lens, input_lens=b["text_len"], deterministic=True,
        )

    out = jax.eval_shape(fwd, params, _bf16(batch))
    assert out["spect"].dtype == jnp.bfloat16, out["spect"].dtype
    assert out["attn_logprob"].dtype == jnp.float32
