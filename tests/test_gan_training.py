"""GAN training tests: HiFi-GAN alternating step runs, losses move, stats update."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.models.hifigan_model import HifiGanModel
from roar_tpu.training.optim import build_optimizer


@pytest.fixture(scope="module")
def hifigan_setup():
    cfg = {
        "preprocessor": {
            "sample_rate": 22050,
            "nfilt": 32,
            "n_window_size": 512,
            "n_window_stride": 128,
            "n_fft": 512,
            "lowfreq": 0,
            "highfreq": 8000,
            "pad_to": 0,
            "pad_value": -11.52,
            "normalize": None,
            "preemph": None,
            "dither": 0.0,
            "log": True,
            "log_zero_guard_type": "clamp",
            "log_zero_guard_value": 1e-05,
            "mag_power": 1.0,
            "exact_pad": True,
        },
        "generator": {
            "resblock": 2,
            "upsample_rates": [8, 4, 4],
            "upsample_kernel_sizes": [16, 8, 8],
            "upsample_initial_channel": 48,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
        "l1_loss_factor": 45,
        "debug": True,
    }
    model = HifiGanModel(cfg)
    rng = np.random.default_rng(0)
    seg = 2048
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(2 * seg).reshape(2, seg) / 22050)
             + 0.01 * rng.standard_normal((2, seg))).astype(np.float32)
    batch = {"audio": jnp.asarray(audio), "audio_len": jnp.asarray([seg, seg])}
    return model, batch


def test_hifigan_generator_upsample_matches_hop(hifigan_setup):
    model, batch = hifigan_setup
    # upsample factor must equal hop length so mel -> audio has right length
    assert model.generator.upsample_factor == model.mel_cfg.hop_length


@pytest.mark.slow
def test_hifigan_gan_step_runs_and_improves(hifigan_setup):
    model, batch = hifigan_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt, ema_decay=0.999)
    step = model.make_train_step(g_opt, d_opt, ema_decay=0.999)

    rng = jax.random.PRNGKey(1)
    mels = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub, 0)
        mels.append(float(metrics["g_mel_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
    assert int(jax.device_get(state.step)) == 8
    # mel (reconstruction) component should move downward
    assert mels[-1] < mels[0], mels


@pytest.mark.slow
def test_hifigan_shared_forward_step_matches_generic(hifigan_setup):
    """The single-forward vjp step must match the generic two-forward step
    exactly (same losses, same post-step params, same spectral-norm stats)."""
    model, batch = hifigan_setup
    # SGD, not Adam — Adam turns fp-noise-scale gradient differences into
    # ±lr-scale update differences (see test_jets.py shared-forward test).
    g_opt = build_optimizer({"name": "sgd", "lr": 1e-3})
    d_opt = build_optimizer({"name": "sgd", "lr": 1e-3})

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
                           jax.device_get(state.d_stats),
                           {k: float(v) for k, v in metrics.items()})

    (gp0, dp0, ds0, m0), (gp1, dp1, ds1, m1) = results[False], results[True]
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-4, atol=1e-6, err_msg=k)
    for tree0, tree1 in ((gp0, gp1), (dp0, dp1), (ds0, ds1)):
        for a, b in zip(jax.tree_util.tree_leaves(tree0), jax.tree_util.tree_leaves(tree1)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_hifigan_gan_step_bf16(hifigan_setup):
    """precision='bf16' computes with bfloat16 casts while keeping fp32
    master weights, optimizer state, and spectral-norm stats."""
    model, batch = hifigan_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt, precision="bf16")

    rng = jax.random.PRNGKey(1)
    mels = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub, 0)
        mels.append(float(metrics["g_mel_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
    assert mels[-1] < mels[0], mels
    # masters stay fp32
    for leaf in jax.tree_util.tree_leaves(state.g_params) + jax.tree_util.tree_leaves(
        state.d_params
    ) + jax.tree_util.tree_leaves(state.d_stats):
        assert leaf.dtype == jnp.float32, leaf.dtype


@pytest.mark.slow
def test_spectral_norm_stats_update(hifigan_setup):
    model, batch = hifigan_setup
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)
    before = jax.tree_util.tree_leaves(jax.device_get(state.d_stats))
    state, _ = step(state, batch, jax.random.PRNGKey(2), 0)
    after = jax.tree_util.tree_leaves(jax.device_get(state.d_stats))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


@pytest.mark.slow
def test_convert_spectrogram_to_audio(hifigan_setup):
    model, batch = hifigan_setup
    g_params, _, _ = model.init_params(jax.random.PRNGKey(0), batch)
    mel = jnp.zeros((1, 10, 32))
    audio = model.convert_spectrogram_to_audio(g_params, mel)
    assert audio.shape == (1, 10 * model.generator.upsample_factor)


@pytest.mark.slow
def test_remat_disc_step_matches_default(hifigan_setup, monkeypatch):
    """ROAR_REMAT_DISC=1 (jax.checkpoint around the joint MPD+MSD apply,
    training/gan.py maybe_remat_disc) replays the same ops in backward —
    losses, post-step params, and spectral-norm stats must match the
    default step."""
    model, batch = hifigan_setup
    g_opt = build_optimizer({"name": "sgd", "lr": 1e-3})
    d_opt = build_optimizer({"name": "sgd", "lr": 1e-3})

    results = {}
    for remat in ("0", "1"):
        monkeypatch.setenv("ROAR_REMAT_DISC", remat)
        state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
        step = model.make_train_step(g_opt, d_opt)
        rng = jax.random.PRNGKey(1)
        for _ in range(2):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub, 0)
        results[remat] = (
            jax.device_get(state.g_params),
            jax.device_get(state.d_params),
            jax.device_get(state.d_stats),
            {k: float(v) for k, v in metrics.items()},
        )

    (gp0, dp0, ds0, m0), (gp1, dp1, ds1, m1) = results["0"], results["1"]
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-4, atol=1e-6, err_msg=k)
    for tree0, tree1 in ((gp0, gp1), (dp0, dp1), (ds0, ds1)):
        for a, b in zip(
            jax.tree_util.tree_leaves(tree0), jax.tree_util.tree_leaves(tree1)
        ):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_hifigan_gan_step_vocoder_tp_equivalence(hifigan_setup):
    """Vocoder-channel tensor parallelism (SURVEY §2.10), multi-step
    falsifying form (VERDICT r4 #8): TEN full GAN steps — generator + MPD +
    MSD, both optimizer updates — on three configurations:

      A  mesh(data=8, model=1), the baseline
      A' mesh(data=8, model=1) from an init perturbed by RELATIVE 1e-7
         noise — the measured scale of the tp run's step-0 fp deviation —
         whose per-step growth CALIBRATES how fast the adversarial
         dynamics amplify legitimate fp noise (measured here: 1e-7 at
         step 0 grows to O(0.1) by step 9, Lyapunov-style; a same-mesh
         reversed-device-order control was measured to be BIT-IDENTICAL
         on this backend, i.e. useless as an envelope)
      B  mesh(data=4, model=2) with VOCODER_TP_RULES param placement

    The rules are GSPMD shardings, so a wrong spec silently changes
    numerics instead of crashing.  The discriminating statistics: (1) the
    step-0 deviation must sit at fp-noise scale (a sign-flipped or
    misplaced sharding shows up ~1e4x above it), and (2) every later
    step's deviation must stay inside the noise-growth envelope the
    control measures — a systematic error rides the same amplification,
    so its curve sits a constant factor above the control's until
    saturation, escaping the envelope at every pre-saturation step."""
    from roar_tpu.parallel import (
        VOCODER_TP_RULES,
        make_mesh,
        shard_batch,
        tp_param_shardings,
    )

    model, batch2 = hifigan_setup
    # widen the batch to 8 so BOTH data axes divide it exactly — shard_batch
    # pads ragged batches by duplicating the last row, which would change
    # the mean loss between the two meshes
    audio = jnp.concatenate(
        [batch2["audio"] * s for s in (1.0, 0.9, -0.8, 0.7)]
    )
    batch = {"audio": audio, "audio_len": jnp.concatenate([batch2["audio_len"]] * 4)}

    g_opt = build_optimizer({"name": "sgd", "lr": 1e-3})
    d_opt = build_optimizer({"name": "sgd", "lr": 1e-3})
    n_steps = 10
    noise_rel = 1e-7

    def run(mesh, perturb=False):
        state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)
        if perturb:
            leaves, treedef = jax.tree_util.tree_flatten(state.g_params)
            keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
            leaves = [
                x * (1.0 + noise_rel * jax.random.normal(k, x.shape, x.dtype))
                if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x, k in zip(leaves, keys)
            ]
            state = state.replace(
                g_params=jax.tree_util.tree_unflatten(treedef, leaves))
        shardings = tp_param_shardings(state, mesh, VOCODER_TP_RULES)
        state = jax.tree_util.tree_map(jax.device_put, state, shardings)
        sbatch = shard_batch(batch, mesh)
        step = model.make_train_step(g_opt, d_opt)
        losses = []
        for i in range(n_steps):
            state, metrics = step(state, sbatch, jax.random.PRNGKey(1), 0)
            losses.append([float(metrics["d_loss"]), float(metrics["g_loss"]),
                           float(metrics["g_mel_loss"])])
        return (np.asarray(losses), jax.device_get(state.g_params),
                jax.device_get(state.d_params))

    l_a, gp_a, dp_a = run(make_mesh(data=8, model=1))
    l_c, gp_c, dp_c = run(make_mesh(data=8, model=1), perturb=True)
    l_b, gp_b, dp_b = run(make_mesh(data=4, model=2))

    scale = np.abs(l_a) + 1e-9
    ctrl = np.abs(l_a - l_c) / scale   # noise-growth calibration curve
    err = np.abs(l_a - l_b) / scale

    # (1) step 0: raw fp-noise scale, no growth yet (measured ~1e-7 here)
    assert (err[0] <= 2e-4).all(), f"step-0 tp deviation too large: {err[0]}"
    # (2) later steps: inside the measured noise-growth envelope.  The
    # control saturates near O(1) once trajectories decorrelate; past that
    # point (ctrl > 0.05) the comparison carries no signal and the row is
    # skipped (err saturates at the same place).
    grow = np.maximum.accumulate(np.maximum(256.0 * ctrl, 2e-4), axis=0)
    live = ctrl <= 0.05
    bad = live & (err > grow)
    assert not bad.any(), (
        f"tp run left the noise-growth envelope:\nerr={err}\nctrl={ctrl}\n"
        f"tol={grow}\nlive={live}"
    )


@pytest.mark.slow
def test_vocoder_tp_rules_shard_the_channel_pyramid():
    """Fast-tier structural check: VOCODER_TP_RULES actually place the
    generator/discriminator channel dims on the 'model' axis (and leave
    odd-width leaves + spectral-norm stats replicated)."""
    from roar_tpu.parallel import VOCODER_TP_RULES, make_mesh, tp_param_shardings
    from jax.sharding import PartitionSpec as P

    model = HifiGanModel({
        "preprocessor": {
            "sample_rate": 22050, "nfilt": 32, "n_window_size": 512,
            "n_window_stride": 128, "n_fft": 512, "lowfreq": 0,
            "highfreq": 8000, "pad_to": 0, "pad_value": -11.52,
            "normalize": None, "preemph": None, "dither": 0.0, "log": True,
            "log_zero_guard_type": "clamp", "log_zero_guard_value": 1e-05,
            "mag_power": 1.0, "exact_pad": True,
        },
        "generator": {
            "resblock": 1,
            "upsample_rates": [8, 4, 4],
            "upsample_kernel_sizes": [16, 8, 8],
            "upsample_initial_channel": 64,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3, 5]],
        },
    })
    audio = jnp.zeros((1, 2048), jnp.float32)
    g_params, d_params, d_stats = model.init_params(
        jax.random.PRNGKey(0), {"audio": audio, "audio_len": jnp.asarray([2048])}
    )
    mesh = make_mesh(data=4, model=2)
    flat = dict(
        (jax.tree_util.keystr(kp), s.spec)
        for kp, s in jax.tree_util.tree_leaves_with_path(
            tp_param_shardings(g_params, mesh, VOCODER_TP_RULES)
        )
    )
    def spec_of(frag):
        hits = [v for k, v in flat.items() if frag in k]
        assert hits, frag
        return hits[0]

    assert spec_of("ConvTranspose_0']['kernel") == P(None, None, "model")
    assert spec_of("resblocks_0_0']['Conv_0']['kernel") == P(None, None, "model")
    assert spec_of("resblocks_0_0']['Conv_1']['kernel") == P(None, "model", None)
    assert spec_of("Conv_0']['kernel") in (P(None, None, "model"),)
    # conv_post output width 1: replicated by the even-divide guard? no —
    # row-parallel on its input channels
    assert spec_of("Conv_1']['kernel") == P(None, "model", None)

    dflat = dict(
        (jax.tree_util.keystr(kp), s.spec)
        for kp, s in jax.tree_util.tree_leaves_with_path(
            tp_param_shardings(d_params, mesh, VOCODER_TP_RULES)
        )
    )
    def dspec(frag):
        hits = [v for k, v in dflat.items() if frag in k]
        assert hits, frag
        return hits[0]

    assert dspec("disc_p2']['Conv_0']['kernel") == P(None, None, None, "model")
    assert dspec("disc_p2']['Conv_1']['kernel") == P(None, None, "model", None)
    assert dspec("disc_s0']['Conv_2']['kernel") == P(None, None, "model")
    assert dspec("disc_s0']['Conv_7']['kernel") == P(None, "model", None)
    # spectral-norm stats replicated
    stats_specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            tp_param_shardings(d_stats, mesh, VOCODER_TP_RULES)
        )
    ]
    assert all(sp == P() for sp in stats_specs)
