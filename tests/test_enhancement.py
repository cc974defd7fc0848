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
