"""Pallas grouped-conv kernel vs lax.conv_general_dilated (fwd + both grads).

The kernel (ops/grouped_conv.py) re-lowers the MSD discriminator's grouped
convs channels-first with a tap-packed contraction; these tests pin its
numerics — forward, dX, dW — to XLA's reference grouped conv across every
stride/group/padding shape class the discriminator uses, plus ragged
widths and non-centered padding.  Run in interpret mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roar_tpu.ops.grouped_conv import (
    grouped_conv1d_cf,
    pallas_grouped_conv_supported,
)

INTERPRET = jax.default_backend() != "tpu"


def ref_conv_cf(x, w, s, pad, g):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s,), padding=[(pad, pad)],
        feature_group_count=g, dimension_numbers=("NCW", "WIO", "NCW"),
    )


SHAPES = [
    # (B, W, cin, cout, k, s, g, pad)
    (2, 64, 8, 8, 5, 1, 4, 2),      # stride-1, like conv5
    (2, 64, 8, 16, 5, 2, 4, 2),     # stride-2, like conv1/conv2
    (2, 64, 16, 16, 9, 4, 4, 4),    # stride-4, like conv3/conv4
    (2, 64, 8, 8, 5, 1, 1, 2),      # g=1 degenerate
    (2, 64, 8, 8, 5, 1, 4, 1),      # pad < (k-1)//2: out_w < W
    (1, 66, 8, 8, 9, 1, 2, 4),      # non-power-of-two width
    (3, 64, 8, 8, 41, 2, 4, 20),    # full 41-tap MSD kernel width
]


@pytest.mark.parametrize("shape", SHAPES, ids=[str(s) for s in SHAPES])
def test_forward_matches_lax(shape):
    b, wid, cin, cout, k, s, g, pad = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, cin, wid)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    ref = ref_conv_cf(x, w, s, pad, g)
    got = grouped_conv1d_cf(x, w, s, pad, g, INTERPRET)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


_GRAD_SHAPES = SHAPES[:3] + SHAPES[4:]
# fast tier keeps one stride-2 grad case + the full 41-tap kernel width;
# the rest are slow (interpret-mode VJP compiles are ~15 s each)
_GRAD_FAST = {str(SHAPES[1]), str(SHAPES[6])}


@pytest.mark.parametrize(
    "shape",
    [pytest.param(s, id=str(s),
                  marks=() if str(s) in _GRAD_FAST else (pytest.mark.slow,))
     for s in _GRAD_SHAPES],
)
def test_gradients_match_lax(shape):
    b, wid, cin, cout, k, s, g, pad = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, cin, wid)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    out_w = (wid + 2 * pad - k) // s + 1
    # non-uniform cotangent so tap/phase packing mistakes can't cancel
    cot = jnp.asarray(
        rng.standard_normal((b, cout, out_w)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(ref_conv_cf(x, w, s, pad, g) * cot)

    def loss_new(x, w):
        return jnp.sum(grouped_conv1d_cf(x, w, s, pad, g, INTERPRET) * cot)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_new, gw_new = jax.grad(loss_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


FOLD_SHAPES = [
    # (B, W, cin, cout, k, s, g, pad, f) — output-phase packing cases:
    # every stride class, ragged width, odd out_w, pad < (k-1)//2
    (2, 64, 32, 32, 5, 1, 2, 2, 2),
    (2, 64, 32, 32, 5, 1, 2, 2, 4),
    (1, 66, 32, 32, 9, 1, 2, 4, 2),
    (2, 64, 32, 32, 5, 1, 2, 1, 2),
    (2, 64, 16, 16, 9, 4, 4, 4, 2),
    (2, 63, 32, 32, 5, 1, 2, 2, 2),
    (2, 128, 16, 32, 41, 2, 4, 20, 8),
]


@pytest.mark.parametrize("shape", FOLD_SHAPES,
                         ids=[str(s) for s in FOLD_SHAPES])
def test_out_fold_matches_lax(shape):
    """Output-phase packing (out_fold > 1) is exact: forward and both
    grads match XLA's grouped conv for every stride/fold/raggedness class
    the MSD uses (the fold only changes the matmul M-blocking)."""
    b, wid, cin, cout, k, s, g, pad, f = shape
    from roar_tpu.ops.grouped_conv import pallas_grouped_conv_supported

    assert pallas_grouped_conv_supported(wid, k, s, pad, cin, cout, g, f)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, cin, wid)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    ref = ref_conv_cf(x, w, s, pad, g)
    out_w = ref.shape[-1]
    cot = jnp.asarray(rng.standard_normal((b, cout, out_w)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(ref_conv_cf(x, w, s, pad, g) * cot)

    def loss_new(x, w):
        return jnp.sum(
            grouped_conv1d_cf(x, w, s, pad, g, INTERPRET, f) * cot)

    got = grouped_conv1d_cf(x, w, s, pad, g, INTERPRET, f)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_new, gw_new = jax.grad(loss_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_best_out_fold_msd_shapes():
    """best_out_fold reproduces the measured per-shape gating on the 12
    real MSD shapes (grouped_conv_bench.py pallas vs pallas_pp A/B): the
    wide even-width scale-0 shapes fold to a full 128-row M; every
    narrow or odd-width shape (where folding measured a loss) stays f=1."""
    from roar_tpu.ops.grouped_conv import best_out_fold

    expected = {  # (W, cin, cout, k, s, g) -> measured-best fold
        (8192, 128, 128, 41, 2, 4): 4,     # +23.9%
        (4096, 128, 256, 41, 2, 16): 8,    # +20.3%
        (2048, 256, 512, 41, 4, 16): 4,    # +6.5%
        (512, 512, 1024, 41, 4, 16): 1,    # folded N sub-tile: measured loss
        (128, 1024, 1024, 41, 1, 16): 1,   # same
        (4097, 128, 128, 41, 2, 4): 1,     # odd out_w: ragged fold loses
        (2049, 128, 256, 41, 2, 16): 1,
        (1025, 256, 512, 41, 4, 16): 1,
        (257, 512, 1024, 41, 4, 16): 1,
        (65, 1024, 1024, 41, 1, 16): 1,
        (129, 512, 1024, 41, 4, 16): 1,
        (33, 1024, 1024, 41, 1, 16): 1,
    }
    for (w, cin, cout, k, s, g), want in expected.items():
        f = best_out_fold(w, k, s, (k - 1) // 2, cin, cout, g)
        assert f == want, (w, cin, cout, s, g, f, want)


def test_bf16_forward_close():
    b, wid, cin, cout, k, s, g, pad = 2, 128, 16, 32, 41, 2, 4, 20
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, cin, wid)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.bfloat16)
    ref = ref_conv_cf(x.astype(jnp.float32), w.astype(jnp.float32), s, pad, g)
    got = grouped_conv1d_cf(x, w, s, pad, g, INTERPRET).astype(jnp.float32)
    # bf16 inputs, fp32 accumulation in both paths
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_unsupported_shapes_are_rejected():
    # channels not divisible by groups
    assert not pallas_grouped_conv_supported(64, 5, 1, 2, 9, 8, 4)
    # width not divisible by stride
    assert not pallas_grouped_conv_supported(63, 5, 2, 2, 8, 8, 4)
    # padding beyond the fold (out_w > W/s)
    assert not pallas_grouped_conv_supported(64, 5, 1, 4, 8, 8, 4)
    # folded channel count below the sublane tile
    assert not pallas_grouped_conv_supported(64, 5, 1, 2, 8, 8, 4)


def test_all_msd_shapes_supported():
    """Every grouped conv the MSD discriminator runs (all 3 scales of the
    HiFi-GAN/JETS MSD stack, hifigan.py DiscriminatorS specs) must take the
    Pallas path — the production win depends on the whole segment chaining
    channels-first with no relayout boundary."""
    specs = [  # (cin, cout, k, s, g) at scale-0 widths; scales halve W
        (128, 128, 41, 2, 4),
        (128, 256, 41, 2, 16),
        (256, 512, 41, 4, 16),
        (512, 1024, 41, 4, 16),
        (1024, 1024, 41, 1, 16),
    ]
    for scale in (1, 2, 4):
        w = 8192 // scale
        for cin, cout, k, s, g in specs:
            assert pallas_grouped_conv_supported(
                w, k, s, (k - 1) // 2, cin, cout, g), (w, cin, cout, s, g)
            w //= s


def test_pallas_grouped_auto_disabled_multi_device(monkeypatch):
    """'auto' must fall back to XLA's native grouped conv whenever more than
    one device is visible: pallas_call is opaque to GSPMD, so under a
    data-parallel or vocoder-TP mesh the kernel would fail to partition or
    silently replicate the MSD per device (ADVICE r4).  Forcing '1' stays a
    caller promise (e.g. per-device blocks inside shard_map)."""
    import jax

    from roar_tpu.models import hifigan as hg

    monkeypatch.setattr(hg, "_DENSE_GROUPED", "0")
    monkeypatch.setattr(hg, "_PALLAS_GROUPED", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert jax.device_count() > 1  # the 8-virtual-device test mesh
    assert hg._pallas_grouped_mode() == (False, False)

    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    assert hg._pallas_grouped_mode() == (True, False)

    # explicit force-on is respected regardless of device count
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)
    monkeypatch.setattr(hg, "_PALLAS_GROUPED", "1")
    enabled, interpret = hg._pallas_grouped_mode()
    assert enabled and not interpret
