"""HiFi-GAN module tests: shapes, upsampling factor, GAN losses, grads."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from roar_tpu.losses.hifigan_losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    l1_mel_loss,
)
from roar_tpu.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)


def tiny_generator():
    return Generator(
        resblock=2,
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        initial_input_size=20,
    )


@pytest.mark.slow
def test_generator_upsamples_by_factor():
    g = tiny_generator()
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 20)), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), mel)
    audio = g.apply(params, mel)
    assert audio.shape == (2, 16 * g.upsample_factor)
    assert g.upsample_factor == 256
    assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh range


@pytest.mark.slow
def test_generator_v1_config_shape():
    # v1 from conf/hifigan/model/generator/v1.yaml: rates 8,8,2,2 channels 512
    g = Generator()
    mel = jnp.zeros((1, 8, 80), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), mel)
    audio = g.apply(params, mel)
    assert audio.shape == (1, 8 * 256)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # HiFi-GAN v1 has ~13.9M params (weight-norm doubles count via v+g scale)
    assert 13e6 < n_params < 16e6


@pytest.mark.slow
def test_mpd_msd_shapes_and_losses():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    pv = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, fs, fr, fg = mpd.apply(pv, y, y_hat)
    assert len(rs) == 2 and len(fr) == 2
    assert all(len(f) == 6 for f in fr)

    msd = MultiScaleDiscriminator()
    variables = msd.init(jax.random.PRNGKey(0), y, y_hat)
    assert "batch_stats" in variables  # spectral norm power-iteration state
    (rs2, fs2, fr2, fg2), new_stats = msd.apply(
        variables, y, y_hat, update_stats=True, mutable=["batch_stats"]
    )
    assert len(rs2) == 3

    d_loss, r_l, g_l = discriminator_loss(rs + rs2, fs + fs2)
    g_loss, _ = generator_loss(fs + fs2)
    fm = feature_matching_loss(fr + fr2, fg + fg2)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss)) and np.isfinite(float(fm))
    assert float(fm) > 0


def test_disc_joint_batching_matches_two_call(monkeypatch):
    """ROAR_DISC_JOINT=1 (one concat([y, y_hat]) pass per sub-discriminator)
    must produce bit-identical scores and feature maps to the reference-
    structured two-call path — convs are per-sample, so the only difference
    is batch packing.  Spectral-norm u also matches after ONE update_stats
    pass from the same init (one iteration from identical u on identical
    weights), pinned via the returned batch_stats."""
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal((2, 2048)) * 0.2, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 2048)) * 0.2, jnp.float32)

    # ONE init (the two paths consume the params RNG in different orders,
    # so variables must be shared, not re-initialized per path)
    monkeypatch.setenv("ROAR_DISC_JOINT", "0")
    mpd = MultiPeriodDiscriminator(periods=(2, 3), debug=True)
    pv = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    msd = MultiScaleDiscriminator(debug=True)
    vs = msd.init(jax.random.PRNGKey(0), y, y_hat)

    outs = {}
    for joint in ("0", "1"):
        monkeypatch.setenv("ROAR_DISC_JOINT", joint)
        outs[joint] = (mpd.apply(pv, y, y_hat),
                       msd.apply(vs, y, y_hat, update_stats=False))

    (mpd0, msd0), (mpd1, msd1) = outs["0"], outs["1"]
    for out0, out1 in ((mpd0, mpd1), (msd0, msd1)):
        l0 = jax.tree_util.tree_leaves(out0)
        l1 = jax.tree_util.tree_leaves(out1)
        assert len(l0) == len(l1) and l0
        for t0, t1 in zip(l0, l1):
            np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                       rtol=1e-6, atol=1e-6)


def test_gan_loss_values():
    # perfect discriminator: real -> 1, fake -> 0 gives zero loss
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    d, _, _ = discriminator_loss(real, fake)
    assert float(d) == 0.0
    g, _ = generator_loss([jnp.ones((2, 10))])
    assert float(g) == 0.0
    assert float(l1_mel_loss(jnp.ones((1, 4, 4)), jnp.ones((1, 4, 4)))) == 0.0


@pytest.mark.slow
def test_generator_gradients_flow():
    g = tiny_generator()
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 20)), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), mel)

    def loss(p):
        return jnp.mean(jnp.square(g.apply(p, mel)))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_masked_grouped_conv_matches_native_grouped():
    """MaskedGroupedConv (block-diagonal dense lowering; measured slower
    end-to-end, kept behind ROAR_DENSE_GROUPED=1 — DESIGN.md §7e) must
    match nn.Conv's feature_group_count exactly — same param tree, same
    outputs, same gradients — so the toggle can never change the math."""
    import flax.linen as nn

    from roar_tpu.models.hifigan import MaskedGroupedConv

    rng = np.random.default_rng(0)
    B, L, Cin, Cout, K, G, S = 2, 64, 16, 32, 41, 4, 2
    x = jnp.asarray(rng.standard_normal((B, L, Cin)), jnp.float32)
    kw = dict(strides=(S,), feature_group_count=G,
              padding=[((K - 1) // 2, (K - 1) // 2)])
    ref = nn.Conv(Cout, (K,), **kw)
    new = MaskedGroupedConv(Cout, (K,), **kw)
    p = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(new.init(jax.random.PRNGKey(1), x)))
    np.testing.assert_allclose(
        np.asarray(ref.apply(p, x)), np.asarray(new.apply(p, x)),
        rtol=1e-6, atol=1e-6,
    )
    g_ref = jax.grad(lambda p: float(0) + jnp.sum(jnp.tanh(ref.apply(p, x))))(p)
    g_new = jax.grad(lambda p: float(0) + jnp.sum(jnp.tanh(new.apply(p, x))))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_new)):
        # kernel grads are exact; bias grads differ only by summation
        # order of the fused output reduction
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_dense_grouped_toggle_model_level(monkeypatch):
    """ROAR_DENSE_GROUPED reroutes DiscriminatorS's grouped convs through
    the block-diagonal dense lowering at module scope.  Whatever the
    toggle, params and outputs must be bit-compatible with the native
    path — same param tree (checkpoints interchange) and identical
    scores/fmaps for identical params."""
    import roar_tpu.models.hifigan as hifigan_mod

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 256)) * 0.1, jnp.float32)

    from roar_tpu.ops.grouped_conv import pallas_grouped_conv_supported

    # channels sized so conv1 (g=4) takes the Pallas path while conv2+
    # (g=16, folded channels below the sublane tile) fall back to native —
    # exercising the channels-first enter/exit transposes too
    assert pallas_grouped_conv_supported(256, 41, 2, 20, 32, 32, 4)

    def build(mode, pallas="0"):
        monkeypatch.setattr(hifigan_mod, "_DENSE_GROUPED", mode)
        monkeypatch.setattr(hifigan_mod, "_PALLAS_GROUPED", pallas)
        d = hifigan_mod.DiscriminatorS(conv_channels=(32, 32, 64, 64))
        p = d.init(jax.random.PRNGKey(0), x)
        score, fmap = d.apply(p, x)
        return p, score, fmap

    p_ref, score_ref, fmap_ref = build("0")
    for mode, pallas in (("g16", "0"), ("1", "0"), ("0", "1")):
        p, score, fmap = build(mode, pallas)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(p_ref))
        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(p_ref)):
            assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(fmap, fmap_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_dense_msd_variant_debug_structure():
    """Fast sibling of the full-size dense-MSD test below: at debug channel
    sizes the dense variant must keep the grouped stack's scale count,
    per-layer fmap widths, and finite GAN losses (param-count parity at
    production sizes is pinned by the slow test)."""
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    grouped = MultiScaleDiscriminator(debug=True)
    dense = MultiScaleDiscriminator(debug=True, variant="dense")
    vg = grouped.init(jax.random.PRNGKey(0), y, y_hat)
    vd = dense.init(jax.random.PRNGKey(0), y, y_hat)
    (rs_g, _, fr_g, _), _ = grouped.apply(
        vg, y, y_hat, update_stats=True, mutable=["batch_stats"])
    (rs_d, fs_d, fr_d, _), _ = dense.apply(
        vd, y, y_hat, update_stats=True, mutable=["batch_stats"])
    assert len(rs_d) == len(rs_g) == 3
    for fg, fd in zip(fr_g, fr_d):
        assert len(fd) == len(fg)
        for a, b in zip(fg, fd):
            assert a.shape[1] == b.shape[1]
    from roar_tpu.losses.hifigan_losses import (
        discriminator_loss as dl, generator_loss as gl)
    d_loss, _, _ = dl(rs_d, fs_d)
    g_loss, _ = gl(fs_d)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


@pytest.mark.slow
def test_dense_msd_variant_equal_params_and_structure():
    """The TPU-recommended dense MSD (DESIGN.md §7g item c): g=1 stacks at
    a (48, 96, 192, 384) pyramid.  Same depth / kernel sizes / strides /
    fmap structure as the grouped reference stack, parameter count within
    ~10%, finite scores and GAN losses."""
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)

    def n_params(variables):
        return sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))

    grouped = MultiScaleDiscriminator()
    dense = MultiScaleDiscriminator(variant="dense")
    vg = grouped.init(jax.random.PRNGKey(0), y, y_hat)
    vd = dense.init(jax.random.PRNGKey(0), y, y_hat)
    ng, nd = n_params(vg), n_params(vd)
    assert abs(nd - ng) / ng < 0.12, (ng, nd)

    (rs_g, fs_g, fr_g, _), _ = grouped.apply(
        vg, y, y_hat, update_stats=True, mutable=["batch_stats"])
    (rs_d, fs_d, fr_d, _), _ = dense.apply(
        vd, y, y_hat, update_stats=True, mutable=["batch_stats"])
    # same scale count, per-scale fmap depth, and score widths
    assert len(rs_d) == len(rs_g) == 3
    for fg, fd in zip(fr_g, fr_d):
        assert len(fd) == len(fg)
        for a, b in zip(fg, fd):
            assert a.shape[1] == b.shape[1]  # same W per layer
    from roar_tpu.losses.hifigan_losses import (
        discriminator_loss as dl, generator_loss as gl)
    d_loss, _, _ = dl(rs_d, fs_d)
    g_loss, _ = gl(fs_d)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
