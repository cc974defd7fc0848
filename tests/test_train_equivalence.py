"""Training-STEP equivalence vs the ACTUAL reference (VERDICT r4 #1).

Forward-parity transplant tests (test_convert.py) cannot catch a wrong
loss scale, mask convention, warmup schedule, or optimizer-semantics
drift.  These tests run the reference's OWN ``training_step`` methods
(torch CPU — ``FastPitchModel.training_step``,
roar/collections/tts/models/fastpitch.py:395-537, and
``HifiGanModel.training_step``,
roar/collections/tts/models/hifigan.py:181-249) through minimal shims
carrying exactly the attributes those methods touch, against our jitted
loss / GAN steps from a transplanted identical init on bit-identical
batches, and compare

- every per-component loss (captured from the reference's own
  ``self.log`` calls),
- gradients, mapped through the same layout transforms as the weights,
- a multi-step plain-SGD trajectory (losses per step + final params).

Tolerances: both stacks are fp32; the mel front-ends are independently
implemented (windowed-DFT matmul vs torch.stft) with golden-test parity
of ~1e-3 absolute on log-mels, so per-loss tolerances are rtol=2e-3-ish
and the trajectory bound widens linearly with steps.  The binarized
alignment (MAS) is compared EXACTLY — a flipped Viterbi path would
change the duration targets discretely and is a bug, not noise.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
from reference_import import import_reference_module  # noqa: E402

pytestmark = pytest.mark.slow

SR = 22050
N_FFT = 256
HOP = 32
N_MEL = 16
D = 32
VOCAB = 40
B = 2
T_TEXT = 9
N_FRAMES = 24
AUDIO_LEN = N_FRAMES * HOP  # 768 -> exactly 24 frames under exact_pad

PREPROC_CFG = {
    "sample_rate": SR, "nfilt": N_MEL, "n_window_size": N_FFT,
    "n_window_stride": HOP, "n_fft": N_FFT, "lowfreq": 0, "highfreq": 8000,
    "preemph": None, "normalize": None, "mag_power": 1.0,
    "log_zero_guard_type": "clamp", "log_zero_guard_value": 1e-05,
    "dither": 0.0, "pad_to": 0, "exact_pad": True,
}


def _make_batch(seed: int = 11):
    """One bit-identical batch for both stacks.  Full-length rows: the
    reference feeds torch SDPA a 0/1 FLOAT key mask (+1 bonus on padded
    keys — documented divergence, README 'attention masking'), so ragged
    rows legitimately differ; masking semantics are pinned by the
    masked-region-inert tests instead."""
    rng = np.random.default_rng(seed)
    text = rng.integers(1, VOCAB, size=(B, T_TEXT)).astype(np.int64)
    text_lens = np.full((B,), T_TEXT, np.int64)
    # band-limited-ish audio so mels have structure
    t = np.arange(AUDIO_LEN) / SR
    audio = np.stack([
        0.5 * np.sin(2 * np.pi * (150 + 40 * i) * t)
        + 0.1 * rng.standard_normal(AUDIO_LEN)
        for i in range(B)
    ]).astype(np.float32)
    audio_lens = np.full((B,), AUDIO_LEN, np.int64)
    pitch = rng.standard_normal((B, N_FRAMES)).astype(np.float32)
    energy = np.abs(rng.standard_normal((B, N_FRAMES))).astype(np.float32) + 0.1

    from roar_tpu.ops.priors import beta_binomial_prior_np

    prior = np.stack([
        beta_binomial_prior_np(T_TEXT, N_FRAMES) for _ in range(B)
    ]).astype(np.float32)  # [B, T_mel, T_text]
    return dict(text=text, text_lens=text_lens, audio=audio,
                audio_lens=audio_lens, pitch=pitch, energy=energy,
                prior=prior)


# ---------------------------------------------------------------------------
# FastPitch
# ---------------------------------------------------------------------------


def _build_ref_fastpitch(seed: int = 0):
    """Reference FastPitchModule (encoder+decoder+3 predictors+aligner)
    plus the loss modules and FilterbankFeatures preprocessor, assembled
    into a shim that runs the REAL FastPitchModel.training_step."""
    ref_fp = import_reference_module("roar.collections.tts.modules.fastpitch")
    ref_tr = import_reference_module("roar.collections.tts.modules.transformer")
    ref_al = import_reference_module("roar.collections.tts.modules.aligner")
    ref_models = import_reference_module("roar.collections.tts.models.fastpitch")
    ref_losses = import_reference_module("roar.collections.tts.losses.fastpitchloss")
    ref_aloss = import_reference_module("roar.collections.tts.losses.aligner_loss")
    ref_feat = import_reference_module(
        "roar.collections.asr.parts.preprocessing.features"
    )

    torch.manual_seed(seed)
    tenc = ref_tr.FFTransformerEncoder(
        n_layer=1, n_head=1, d_model=D, d_head=16, d_inner=64,
        kernel_size=3, dropout=0.0, dropatt=0.0,
        n_embed=VOCAB, d_embed=D, padding_idx=0,
    )
    tdec = ref_tr.FFTransformerDecoder(
        n_layer=1, n_head=1, d_model=D, d_head=16, d_inner=64,
        kernel_size=3, dropout=0.0, dropatt=0.0,
    )
    mk_pred = lambda: ref_fp.TemporalPredictor(
        D, filter_size=16, kernel_size=3, dropout=0.0)
    aligner = ref_al.AlignmentEncoder(
        n_mel_channels=N_MEL, n_text_channels=D, n_att_channels=16,
        temperature=0.0005, dist_type="l2",
    )
    tmod = ref_fp.FastPitchModule(
        encoder_module=tenc, decoder_module=tdec,
        duration_predictor=mk_pred(), pitch_predictor=mk_pred(),
        energy_predictor=mk_pred(), aligner=aligner, speaker_encoder=None,
        n_speakers=1, symbols_embedding_dim=D,
        pitch_embedding_kernel_size=3, energy_embedding_kernel_size=3,
        n_mel_channels=N_MEL,
    ).train()

    preproc = ref_feat.FilterbankFeatures(**PREPROC_CFG).eval()

    class _Shim:
        # the genuine article, bound to this shim
        training_step = ref_models.FastPitchModel.training_step

        def __init__(self):
            self.fastpitch = tmod
            self.learn_alignment = True
            self.ds_class = (
                "roar.collections.tts.data.text_to_speech_dataset."
                "TextToSpeechDataset"
            )
            self.log_images = False
            self.log_train_images = False
            self.current_epoch = 0
            self.bin_loss_warmup_epochs = 4
            self.mel_loss_fn = ref_losses.MelLoss()
            self.pitch_loss_fn = ref_losses.PitchLoss(loss_scale=0.1)
            self.duration_loss_fn = ref_losses.DurationLoss(loss_scale=0.1)
            self.energy_loss_fn = ref_losses.EnergyLoss(loss_scale=0.1)
            self.forward_sum_loss_fn = ref_aloss.ForwardSumLoss(loss_scale=1.0)
            self.bin_loss_fn = ref_aloss.BinLoss(loss_scale=1.0)
            self.logged = {}

        def preprocessor(self, *, input_signal, length):
            return preproc(input_signal, length)

        def __call__(self, **kw):
            return self.fastpitch(**kw)

        def log(self, name, value):
            self.logged[name] = float(value.detach())

    return _Shim()


def _our_fastpitch():
    from roar_tpu.models.fastpitch_model import FastPitchModel

    cfg = {
        "learn_alignment": True,
        "n_symbols": VOCAB, "padding_idx": 0,
        "preprocessor": dict(PREPROC_CFG),
        "input_fft": {"n_layer": 1, "n_head": 1, "d_model": D, "d_head": 16,
                      "d_inner": 64, "kernel_size": 3, "dropout": 0.0,
                      "dropatt": 0.0},
        "output_fft": {"n_layer": 1, "n_head": 1, "d_model": D, "d_head": 16,
                       "d_inner": 64, "kernel_size": 3, "dropout": 0.0,
                       "dropatt": 0.0},
        "duration_predictor": {"input_size": D, "filter_size": 16,
                               "kernel_size": 3, "dropout": 0.0},
        "pitch_predictor": {"input_size": D, "filter_size": 16,
                            "kernel_size": 3, "dropout": 0.0},
        "energy_predictor": {"input_size": D, "filter_size": 16,
                             "kernel_size": 3, "dropout": 0.0},
        "alignment_module": {"n_text_channels": D, "n_att_channels": 16},
        "symbols_embedding_dim": D, "n_mel_channels": N_MEL,
        "bin_loss_warmup_epochs": 4,
    }
    return FastPitchModel(cfg)


def _transplant_fastpitch(ours, shim, batch_np):
    from roar_tpu.training.convert import (
        apply_mapped_params, map_fastpitch_state_dict,
    )

    our_batch = {
        "text": jnp.asarray(batch_np["text"], jnp.int32),
        "text_len": jnp.asarray(batch_np["text_lens"], jnp.int32),
        "audio": jnp.asarray(batch_np["audio"]),
        "audio_len": jnp.asarray(batch_np["audio_lens"], jnp.int32),
        "pitch": jnp.asarray(batch_np["pitch"]),
        "energy": jnp.asarray(batch_np["energy"]),
        "align_prior_matrix": jnp.asarray(batch_np["prior"]),
    }
    params = ours.init_params(jax.random.PRNGKey(0), our_batch)
    sd = {k: v.detach().numpy() for k, v in shim.fastpitch.state_dict().items()}
    mapped = map_fastpitch_state_dict(sd, n_layers=1)
    new_params, loaded, _ = apply_mapped_params(params, mapped)
    n_expected = len([k for k in sd if "pos_emb" not in k
                      and "pitch_mean" not in k and "pitch_std" not in k])
    assert len(loaded) == n_expected, (len(loaded), n_expected)
    return new_params, our_batch


def _ref_batch_dict(batch_np):
    return {
        "audio": torch.tensor(batch_np["audio"]),
        "audio_lens": torch.tensor(batch_np["audio_lens"]),
        "text": torch.tensor(batch_np["text"]),
        "text_lens": torch.tensor(batch_np["text_lens"]),
        "align_prior_matrix": torch.tensor(batch_np["prior"]),
        "pitch": torch.tensor(batch_np["pitch"]),
        "energy": torch.tensor(batch_np["energy"]),
    }


# per-loss comparison tolerances (fp32 + independent mel front-ends)
_LOSS_TOL = dict(rtol=3e-3, atol=3e-5)


def test_fastpitch_training_step_losses_and_grads_match_reference():
    shim = _build_ref_fastpitch()
    shim.current_epoch = 2  # mid-warmup: bin weight = 2/4 = 0.5
    ours = _our_fastpitch()
    batch_np = _make_batch()
    params, our_batch = _transplant_fastpitch(ours, shim, batch_np)

    # ---- reference: its own training_step + backward ----
    ref_loss = shim.training_step(_ref_batch_dict(batch_np), 0)
    ref_loss.backward()
    ref = shim.logged

    # ---- ours ----
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: ours.loss_fn(p, our_batch, epoch=2, deterministic=True),
        has_aux=True,
    )(params)

    # every component the reference logs, within stated tolerances
    pairs = [
        ("t_mel_loss", "mel_loss"), ("t_dur_loss", "dur_loss"),
        ("t_pitch_loss", "pitch_loss"), ("t_energy_loss", "energy_loss"),
        ("t_ctc_loss", "ctc_loss"), ("t_bin_loss", "bin_loss"),
        ("t_loss", "loss"),
    ]
    for ref_name, our_name in pairs:
        np.testing.assert_allclose(
            float(metrics[our_name]), ref[ref_name], err_msg=ref_name,
            **_LOSS_TOL,
        )

    # the binarized alignment must agree EXACTLY (a flipped Viterbi path
    # is a discrete bug, not fp noise) — recompute both forwards
    with torch.no_grad():
        t_out = shim.fastpitch(
            text=torch.tensor(batch_np["text"]), durs=None,
            pitch=torch.tensor(batch_np["pitch"]),
            energy=torch.tensor(batch_np["energy"]), speaker=None, pace=1.0,
            spec=shim.preprocessor(
                input_signal=torch.tensor(batch_np["audio"]),
                length=torch.tensor(batch_np["audio_lens"]))[0],
            attn_prior=torch.tensor(batch_np["prior"]),
            mel_lens=torch.tensor([N_FRAMES] * B),
            input_lens=torch.tensor(batch_np["text_lens"]),
        )
    t_attn_hard_dur = t_out[8].numpy()
    spec, mel_lens = ours._spec_from_batch(
        our_batch["audio"], our_batch["audio_len"], our_batch)
    out = ours.module.apply(
        params, our_batch["text"], pitch=our_batch["pitch"],
        energy=our_batch["energy"], spec=spec,
        attn_prior=our_batch["align_prior_matrix"], mel_lens=mel_lens,
        input_lens=our_batch["text_len"], deterministic=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out["attn_hard_dur"]), t_attn_hard_dur)

    # ---- gradients, mapped through the same layout transforms ----
    from roar_tpu.training.convert import map_fastpitch_state_dict

    ref_grads = {
        k: p.grad.detach().numpy()
        for k, p in shim.fastpitch.named_parameters() if p.grad is not None
    }
    mapped_g = map_fastpitch_state_dict(ref_grads, n_layers=1)

    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(grads)
    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp):
        np.asarray(v)
        for kp, v in leaves
    }
    compared = 0
    for path, g_ref in mapped_g.items():
        g_ours = flat.get(path)
        assert g_ours is not None, path
        scale = max(1e-3, float(np.abs(g_ref).max()))
        np.testing.assert_allclose(
            g_ours, g_ref, rtol=5e-3, atol=5e-3 * scale, err_msg=path)
        compared += 1
    assert compared >= 50  # whole tree, not a token sample


def test_fastpitch_sgd_trajectory_matches_reference():
    """20 plain-SGD steps from the transplanted init on one repeated batch:
    per-step total losses must track within a linearly widening band, and
    the final parameters must still map onto each other."""
    shim = _build_ref_fastpitch()
    shim.current_epoch = 2
    ours = _our_fastpitch()
    batch_np = _make_batch()
    params, our_batch = _transplant_fastpitch(ours, shim, batch_np)

    lr = 0.02
    opt_t = torch.optim.SGD(shim.fastpitch.parameters(), lr=lr)

    import optax

    opt_j = optax.sgd(lr)
    opt_state = opt_j.init(params)

    @jax.jit
    def step(p, s):
        (loss, m), g = jax.value_and_grad(
            lambda q: ours.loss_fn(q, our_batch, epoch=2, deterministic=True),
            has_aux=True,
        )(p)
        updates, s = opt_j.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    n_steps = 20
    ref_losses, our_losses = [], []
    for i in range(n_steps):
        opt_t.zero_grad()
        loss_t = shim.training_step(_ref_batch_dict(batch_np), i)
        loss_t.backward()
        opt_t.step()
        ref_losses.append(float(loss_t.detach()))

        params, opt_state, loss_j = step(params, opt_state)
        our_losses.append(float(loss_j))

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    # training must actually move
    assert ref_losses[-1] < ref_losses[0]
    # per-step band: fp32 + independent mel front-ends diverge slowly;
    # rtol widens linearly from 3e-3 to 2e-2 across 20 steps
    for i in range(n_steps):
        rtol = 3e-3 + (2e-2 - 3e-3) * i / (n_steps - 1)
        np.testing.assert_allclose(
            our_losses[i], ref_losses[i], rtol=rtol,
            err_msg=f"step {i}: ref={ref_losses[i]} ours={our_losses[i]}")

    # final params still correspond under the weight mapping
    from roar_tpu.training.convert import map_fastpitch_state_dict

    sd = {k: v.detach().numpy() for k, v in shim.fastpitch.state_dict().items()}
    mapped = map_fastpitch_state_dict(sd, n_layers=1)
    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(params)
    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp):
        np.asarray(v)
        for kp, v in leaves
    }
    for path, w_ref in mapped.items():
        w_ours = flat.get(path)
        assert w_ours is not None, path
        scale = max(1e-3, float(np.abs(w_ref).max()))
        np.testing.assert_allclose(
            w_ours, w_ref, rtol=2e-2, atol=2e-2 * scale, err_msg=path)


# ---------------------------------------------------------------------------
# HiFi-GAN: the reference's own two-optimizer manual training_step
# (roar/collections/tts/models/hifigan.py:181-249) vs our jitted
# shared-forward GAN step.  Parameterization correspondence is what makes
# this a real trajectory test: weight-norm transplants carry torch's raw
# (g, v) (convert._wn_raw), and the MSD spectral-norm transplant carries
# weight_orig + u verbatim (map_hifigan_msd_state_dict(raw=True)), so
# gradients and SGD updates live in the same coordinates on both sides.
# ---------------------------------------------------------------------------

HG_SR = 22050
HG_NMEL = 16
HG_NFFT = 256
HG_HOP = 32
HG_SEG = 1024  # 32 hops -> 32 mel frames under exact_pad
HG_B = 2

HG_PRE = {
    "sample_rate": HG_SR, "nfilt": HG_NMEL, "n_window_size": HG_NFFT,
    "n_window_stride": HG_HOP, "n_fft": HG_NFFT, "lowfreq": 0,
    "highfreq": 8000, "preemph": None, "normalize": None, "mag_power": 1.0,
    "log_zero_guard_type": "clamp", "log_zero_guard_value": 1e-05,
    "dither": 0.0, "pad_to": 0, "exact_pad": True,
}

HG_GEN = {
    "resblock": 2, "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4], "upsample_initial_channel": 16,
    "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
}


def _make_audio_batch(seed: int = 3):
    rng = np.random.default_rng(seed)
    t = np.arange(HG_SEG) / HG_SR
    audio = np.stack([
        0.4 * np.sin(2 * np.pi * (180 + 60 * i) * t)
        + 0.05 * rng.standard_normal(HG_SEG)
        for i in range(HG_B)
    ]).astype(np.float32)
    return audio


def _build_ref_hifigan(lr: float, seed: int = 0):
    ref_mod = import_reference_module("roar.collections.tts.modules.hifigan_modules")
    ref_models = import_reference_module("roar.collections.tts.models.hifigan")
    ref_losses = import_reference_module("roar.collections.tts.losses.hifigan_losses")
    ref_feat = import_reference_module(
        "roar.collections.asr.parts.preprocessing.features"
    )

    torch.manual_seed(seed)
    gen = ref_mod.Generator(initial_input_size=HG_NMEL, **HG_GEN)
    mpd = ref_mod.MultiPeriodDiscriminator(debug=True)
    msd = ref_mod.MultiScaleDiscriminator(debug=True)
    # input mel: config highfreq; target mel for the L1 loss: highfreq=None
    # (-> Nyquist) + use_grads, exactly models/hifigan.py:54-58
    preproc = ref_feat.FilterbankFeatures(**HG_PRE).eval()
    trg_cfg = dict(HG_PRE, highfreq=None, use_grads=True)
    trg = ref_feat.FilterbankFeatures(**trg_cfg).eval()

    class _Shim:
        training_step = ref_models.HifiGanModel.training_step
        _process_batch = ref_models.HifiGanModel._process_batch

        def __init__(self):
            self.generator, self.mpd, self.msd = gen, mpd, msd
            self.audio_to_melspec_precessor = preproc
            self.trg_melspec_fn = trg
            self.input_as_mel = False
            self.ds_class = (
                "roar.collections.tts.data.vocoder_dataset.VocoderDataset"
            )
            self.feature_loss = ref_losses.FeatureMatchingLoss()
            self.discriminator_loss = ref_losses.DiscriminatorLoss()
            self.generator_loss = ref_losses.GeneratorLoss()
            self.l1_factor = 45
            self.global_step = 0
            self.logged = {}
            self._opts = [
                torch.optim.SGD(gen.parameters(), lr=lr),
                torch.optim.SGD(
                    list(mpd.parameters()) + list(msd.parameters()), lr=lr
                ),
            ]

        def optimizers(self):
            return self._opts

        def manual_backward(self, loss):
            loss.backward()

        def update_lr(self, interval="step"):
            pass

        def log_dict(self, metrics, **kw):
            for k, v in metrics.items():
                if torch.is_tensor(v):
                    self.logged[k] = float(v.detach())

        def log(self, name, value, **kw):
            self.logged[name] = float(value)

    return _Shim()


def _our_hifigan():
    from roar_tpu.models.hifigan_model import HifiGanModel

    return HifiGanModel({
        "preprocessor": dict(HG_PRE),
        "generator": dict(HG_GEN),
        "l1_loss_factor": 45,
        "debug": True,
    })


def _transplant_hifigan(model, shim, batch_np, g_opt, d_opt):
    from roar_tpu.training.convert import (
        apply_mapped_params,
        map_hifigan_generator_state_dict,
        map_hifigan_mpd_state_dict,
        map_hifigan_msd_state_dict,
    )

    batch = {
        "audio": jnp.asarray(batch_np),
        "audio_len": jnp.full((HG_B,), HG_SEG, jnp.int32),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)

    g_sd = {k: v.detach().numpy() for k, v in shim.generator.state_dict().items()}
    g_map = map_hifigan_generator_state_dict(g_sd, num_kernels=1, resblock=2)
    new_g, loaded_g, _ = apply_mapped_params(state.g_params, g_map)
    assert len(loaded_g) == len(g_map) and loaded_g

    mpd_sd = {k: v.detach().numpy() for k, v in shim.mpd.state_dict().items()}
    mpd_map = {
        k.replace("params/", "params/mpd/"): v
        for k, v in map_hifigan_mpd_state_dict(mpd_sd).items()
    }
    msd_sd = {k: v.detach().numpy() for k, v in shim.msd.state_dict().items()}
    msd_p, msd_s = map_hifigan_msd_state_dict(msd_sd, raw=True)
    msd_map = {k.replace("params/", "params/msd/"): v for k, v in msd_p.items()}
    new_d, loaded_d, _ = apply_mapped_params(
        {"params": state.d_params["params"]}, {**mpd_map, **msd_map}
    )
    assert len(loaded_d) == len(mpd_map) + len(msd_map)
    new_s, loaded_s, _ = apply_mapped_params(
        {"batch_stats": state.d_stats["msd"]}, msd_s
    )
    assert len(loaded_s) == len(msd_s) and loaded_s
    state = state.replace(
        g_params=new_g, d_params=new_d,
        d_stats={"msd": new_s["batch_stats"]},
    )
    return state, batch


# reference-logged name(s) -> our metric name
_HG_PAIRS = [
    (("d_loss_mpd",), "d_loss_mpd"),
    (("d_loss_msd",), "d_loss_msd"),
    (("d_loss",), "d_loss"),
    (("g_loss_fm_mpd", "g_loss_fm_msd"), "g_fm_loss"),
    (("g_loss_gen_mpd", "g_loss_gen_msd"), "g_adv_loss"),
    (("g_loss",), "g_loss"),
]


def test_hifigan_training_step_and_sgd_trajectory_match_reference(monkeypatch):
    """10 SGD steps of the full D+G alternating update from a transplanted
    identical init on one repeated batch: every reference-logged loss
    component must track ours per step, and the final G/MPD/MSD parameters
    must still map onto each other.

    Spectral-norm note: torch's power iteration persists u on all FOUR
    scale-0 forwards per step (D and G phases), ours persists on the two
    D-phase forwards only (the G phase recomputes sigma transiently from
    the D-phase u).  At a converged u both updates are fixed-point no-ops,
    so the torch MSD is warmed up before transplanting and the remaining
    drift is absorbed by the widening per-step band."""
    # two-call discriminator path: its per-forward spectral-norm power
    # iteration count (2 per D phase) matches torch's call structure
    monkeypatch.setenv("ROAR_DISC_JOINT", "0")
    # lr keeps the 45x-scaled mel term's first steps gentle: at 1e-3 the
    # mel L1 drops 3.0 -> 1.4 in ONE step and the L1's sign(pred - target)
    # subgradient starts flipping on elements where the two independent
    # mel front-ends differ (~1e-3), turning fp noise into O(1e-2)
    # trajectory spread that says nothing about parameterization bugs
    lr = 1e-4
    shim = _build_ref_hifigan(lr)
    batch_np = _make_audio_batch()

    # converge scale-0 spectral-norm u (one persisted iteration per forward)
    at = torch.tensor(batch_np).unsqueeze(1)
    with torch.no_grad():
        for _ in range(200):
            shim.msd(y=at, y_hat=at)

    model = _our_hifigan()
    import optax

    g_opt = optax.sgd(lr)
    d_opt = optax.sgd(lr)
    state, batch = _transplant_hifigan(model, shim, batch_np, g_opt, d_opt)
    step = model.make_train_step(g_opt, d_opt)

    ref_batch = {
        "audio": torch.tensor(batch_np),
        "audio_lens": torch.full((HG_B,), HG_SEG, dtype=torch.long),
    }

    n_steps = 10
    for i in range(n_steps):
        shim.logged = {}
        shim.training_step(ref_batch, i)
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 0)

        # band widens linearly: fp32 + independent mel front-ends + the
        # documented spectral-norm iteration-count difference.  Step 0 is
        # TIGHT (measured ≤1e-4 on every component — the real transplant +
        # loss-semantics pin); later steps absorb trajectory spread.
        rtol = 1e-3 + (1.5e-2 - 1e-3) * i / (n_steps - 1)
        for ref_names, our_name in _HG_PAIRS:
            ref_v = sum(shim.logged[n] for n in ref_names)
            np.testing.assert_allclose(
                float(metrics[our_name]), ref_v, rtol=rtol, atol=1e-4,
                err_msg=f"step {i}: {our_name}",
            )
        # mel L1: ours is pre-scaled by l1_factor
        np.testing.assert_allclose(
            float(metrics["g_mel_loss"]), shim.logged["g_l1_loss"] * 45,
            rtol=rtol, err_msg=f"step {i}: g_mel_loss",
        )

    # ---- final parameters still correspond under the same mappers ----
    from roar_tpu.training.convert import (
        map_hifigan_generator_state_dict,
        map_hifigan_mpd_state_dict,
        map_hifigan_msd_state_dict,
    )
    from jax.tree_util import tree_flatten_with_path

    def _flat(tree):
        leaves, _ = tree_flatten_with_path(tree)
        return {
            "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp):
            np.asarray(v)
            for kp, v in leaves
        }

    g_sd = {k: v.detach().numpy() for k, v in shim.generator.state_dict().items()}
    mpd_sd = {k: v.detach().numpy() for k, v in shim.mpd.state_dict().items()}
    msd_sd = {k: v.detach().numpy() for k, v in shim.msd.state_dict().items()}
    msd_p, _ = map_hifigan_msd_state_dict(msd_sd, raw=True)
    want = dict(map_hifigan_generator_state_dict(g_sd, num_kernels=1, resblock=2))
    want.update({
        k.replace("params/", "params/mpd/"): v
        for k, v in map_hifigan_mpd_state_dict(mpd_sd).items()
    })
    want.update({k.replace("params/", "params/msd/"): v for k, v in msd_p.items()})

    got = _flat(state.g_params)
    got.update(_flat(state.d_params))
    compared = 0
    for path, w_ref in want.items():
        w_ours = got.get(path)
        assert w_ours is not None, path
        scale = max(1e-3, float(np.abs(w_ref).max()))
        np.testing.assert_allclose(
            w_ours, w_ref, rtol=2e-2, atol=2e-2 * scale, err_msg=path)
        compared += 1
    assert compared >= 150  # G + 5-period MPD + 3-scale MSD, whole trees
