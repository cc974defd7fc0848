"""Speech enhancement model + audio/common loss tests."""

import numpy as np

import jax
import jax.numpy as jnp

from roar_tpu.losses.audio_losses import sdr, sdr_loss, si_sdr_loss
from roar_tpu.losses.common_losses import (
    aggregate_losses,
    cross_entropy_loss,
    mse_loss,
    nll_loss,
)
from roar_tpu.models.enhancement import EncMaskDecEnhancementModel
from roar_tpu.training import Trainer, build_optimizer
import pytest


def test_sdr_values():
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    # perfect estimate -> huge SDR; scaled estimate -> si-sdr still huge
    v = np.asarray(sdr(target, target))
    assert (v > 60).all()
    v2 = np.asarray(sdr(2.0 * target, target, scale_invariant=True))
    assert (v2 > 60).all()
    v3 = np.asarray(sdr(2.0 * target, target, scale_invariant=False))
    assert (v3 < 10).all()
    assert float(si_sdr_loss(target, target)) < -60


def test_common_losses():
    logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    labels = jnp.asarray([0, 1])
    ce = float(cross_entropy_loss(logits, labels))
    assert 0 < ce < 1
    assert float(cross_entropy_loss(logits, labels, label_smoothing=0.1)) > ce
    lp = jax.nn.log_softmax(logits)
    np.testing.assert_allclose(float(nll_loss(lp, labels)), ce, atol=1e-6)
    assert float(mse_loss(jnp.ones(3), jnp.ones(3))) == 0
    assert float(aggregate_losses([jnp.asarray(1.0), jnp.asarray(2.0)], [1.0, 0.5])) == 2.0


@pytest.mark.slow
def test_enhancement_denoises_tone():
    """Training the mask estimator on one (noisy -> clean) pair improves SDR."""
    sr = 16000
    model = EncMaskDecEnhancementModel(
        {"sample_rate": sr, "n_fft": 256, "hop_length": 64,
         "d_model": 64, "n_layers": 1, "n_head": 2}
    )
    rng = np.random.default_rng(0)
    t = np.arange(8192) / sr
    clean = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    noisy = clean + 0.2 * rng.standard_normal(clean.shape).astype(np.float32)
    batch = {
        "input_signal": jnp.asarray(noisy),
        "input_length": jnp.asarray([8192]),
        "target_signal": jnp.asarray(clean),
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    opt = build_optimizer({"name": "adamw", "lr": 1e-3})
    trainer = Trainer(
        loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e), optimizer=opt
    )
    state = trainer.init_state(params)
    first = None
    for i in range(15):
        state, metrics = trainer.run_epoch(state, [batch], epoch=i)
        if first is None:
            first = metrics["loss"]
    assert metrics["loss"] < first  # SDR improved (loss = -SDR)
    out = model.forward(state.params, batch["input_signal"], batch["input_length"])
    assert out.shape == clean.shape
    # enhanced SDR should beat the noisy input's SDR
    sdr_in = float(np.asarray(sdr(jnp.asarray(noisy), jnp.asarray(clean)))[0])
    sdr_out = float(np.asarray(sdr(out, jnp.asarray(clean)))[0])
    assert sdr_out > sdr_in


# ---------------------------------------------------------------------------
# Multi-channel mask-based MVDR beamformer (models/enhancement.py) — the
# processor the reference's beamforming.yaml targets but does not ship.
# ---------------------------------------------------------------------------


def _mic_scene(sr=16000, n=16384, num_mics=2, snr_amp=0.6, seed=0):
    """Broadband target (lowpassed noise) reaching mic c with a 3c-sample
    delay + independent white noise per mic — coherent target, spatially
    white noise, target energy in EVERY frequency bin (a narrowband tone
    would leave most bins noise-only, where a distortionless beamformer
    rightly does nothing).  Returns (noisy [C, n], clean [n])."""
    rng = np.random.default_rng(seed)
    src = rng.standard_normal(n + 3 * num_mics).astype(np.float32)
    k = np.hanning(17).astype(np.float32)
    src = np.convolve(src, k / k.sum(), mode="same") * 3.0
    clean = src[:n]
    mics = [
        src[3 * c : n + 3 * c] + snr_amp * rng.standard_normal(n).astype(np.float32)
        for c in range(num_mics)
    ]
    return np.stack(mics).astype(np.float32), clean


@pytest.mark.slow
def test_mvdr_oracle_mask_beats_reference_channel():
    """With oracle TF masks, MVDR over 4 mics must improve SI-SDR well past
    the raw reference channel (theoretical array gain for spatially-white
    noise is 10*log10(C) = 6 dB; measured ~4.7 dB with estimated SCMs)."""
    from roar_tpu.models.enhancement import (
        MaskBasedBeamformer,
        MaskBasedBeamformerModel,
    )

    noisy, clean = _mic_scene(num_mics=4)
    model = MaskBasedBeamformerModel({"sample_rate": 16000, "n_fft": 512,
                                      "hop_length": 256})
    re, im = model._encode_channels(jnp.asarray(noisy)[None])  # [1, 4, F, T]
    # oracle mask from the known clean component at the reference mic
    cre, cim = model.encode(jnp.asarray(clean)[None])
    cmag = jnp.sqrt(cre**2 + cim**2)
    nmag = jnp.sqrt(re[:, 0] ** 2 + im[:, 0] ** 2)
    mask = jnp.clip(cmag / (nmag + 1e-8), 0.0, 1.0)

    bf = MaskBasedBeamformer(ref_channel=0)
    out_re, out_im = bf(re, im, mask)
    est = model.decode(out_re, out_im, noisy.shape[-1])

    from roar_tpu.losses.audio_losses import sdr

    si_in = float(np.asarray(sdr(jnp.asarray(noisy[0])[None],
                                 jnp.asarray(clean)[None],
                                 scale_invariant=True))[0])
    si_out = float(np.asarray(sdr(est, jnp.asarray(clean)[None],
                                  scale_invariant=True))[0])
    assert si_out > si_in + 3.5, (si_in, si_out)


def test_mvdr_weights_identity_noise():
    """With Phi_n = I the Souden solution reduces to
    Phi_s / trace(Phi_s) · u_ref — checked against the closed form."""
    from roar_tpu.models.enhancement import mvdr_souden_weights

    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 3, 2, 2)) + 1j * rng.standard_normal((1, 3, 2, 2))
    phi_s = jnp.asarray(a @ np.conj(np.swapaxes(a, -1, -2)), jnp.complex64)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.complex64), phi_s.shape)
    w = mvdr_souden_weights(phi_s, eye, ref_channel=0, diag_loading=0.0)
    expected = phi_s[..., 0] / jnp.trace(phi_s, axis1=-2, axis2=-1)[..., None]
    np.testing.assert_allclose(np.asarray(w), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_beamformer_model_trains():
    """End-to-end: the learned-mask MVDR model takes finite, decreasing
    train steps on a 2-mic batch (beamforming.yaml model section)."""
    from roar_tpu.models.enhancement import MaskBasedBeamformerModel

    model = MaskBasedBeamformerModel({
        "sample_rate": 16000, "n_fft": 256, "hop_length": 128,
        "d_model": 32, "n_layers": 1, "n_head": 2, "dropout": 0.0,
    })
    noisy1, clean1 = _mic_scene(n=4096, seed=0)
    noisy2, clean2 = _mic_scene(n=4096, seed=1)
    batch = {
        "input_signal": np.stack([noisy1, noisy2]),
        "target_signal": np.stack([clean1, clean2]),
        "input_length": np.asarray([4096, 4096], np.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), batch)
    opt = build_optimizer({"name": "adamw", "lr": 3e-4})
    trainer = Trainer(
        loss_fn=lambda p, b, r, e: model.loss_fn(p, b, r, e), optimizer=opt
    )
    state = trainer.init_state(params)
    losses = []
    for _ in range(5):
        state, metrics = trainer.run_epoch(state, [batch])
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
