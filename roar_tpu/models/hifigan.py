"""HiFi-GAN generator and discriminators (flax.linen).

Re-design of roar/collections/tts/modules/hifigan_modules.py:26-476 for TPU:
channels-last [B, T, C] layout so 1D convs map straight onto XLA's conv
lowering, weight normalization via flax nn.WeightNorm, spectral norm via
nn.SpectralNorm (mutable 'batch_stats' holds the power-iteration vectors).

`remove_weight_norm` (hifigan_modules.py:246-255) needs no analogue: at
inference the parameters are closed over as compile-time constants
(scripts/export.py, convert_spectrogram_to_audio under jit), so XLA
constant-folds the weight-norm reparameterization — the serving graph
already runs on plain folded kernels.

Generator: conv_pre -> [ConvTranspose upsample -> mean of MRF resblocks] x N
-> conv_post -> tanh (hifigan_modules.py:164-255).
MPD: period-reshaped 2D convs, periods (2,3,5,7,11) (:257-390).
MSD: 3 scales with avg-pool downsampling, first one spectrally normalized
(:392-476).
"""

from __future__ import annotations

import os
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1

# Toggle for the masked-dense grouped-conv lowering (see MaskedGroupedConv).
#   "0"   native grouped convs everywhere
#   "g16" only the g=16 layers dense (the §7e A/B subset — measured LOSS:
#         the g=4 conv stays grouped, so every layer boundary still pays a
#         grouped<->dense relayout copy of the whole activation)
#   "1"   ALL grouped layers dense: the whole discriminator keeps flat
#         [B, W, C] activation layouts — no 8x-padded [B, W, G, C/G] tiles,
#         no relayout copies (DESIGN.md §7g per-op attribution)
_DENSE_GROUPED = os.environ.get("ROAR_DENSE_GROUPED", "0")

# The production lowering for the MSD's grouped convs: the Pallas
# channels-first kernel (ops/grouped_conv.py) — tap-packed contraction,
# W on lanes, no 8x-padded [B, W, G, C/G] tiles, no relayout copies.
#   "auto" (default)  on when running on TPU, off elsewhere (tests/CPU use
#                     XLA's native conv; the kernel itself is pinned to it
#                     by tests/test_grouped_conv.py in interpret mode)
#   "1"               force on (off-TPU runs the interpreter — slow)
#   "0"               force off (e.g. under model-parallel sharding of the
#                     discriminator channels, where an opaque pallas_call
#                     cannot be partitioned by XLA SPMD)
_PALLAS_GROUPED = os.environ.get("ROAR_PALLAS_GROUPED", "auto")

# Output-phase packing for the Pallas grouped convs (out_fold =
# best_out_fold): the kernel matmul emits f output phases as extra M
# rows, lifting M from coutpg (16-64, a starved 128-row MXU) to 128.
# Exact numerics for any fold (tests/test_grouped_conv.py); "0" pins
# f=1 for A/Bs.
_GC_PHASE_PACK = os.environ.get("ROAR_GC_PHASE_PACK", "1")

# Joint real/fake discriminator batching: run each sub-discriminator ONCE
# on concat([y, y_hat]) instead of twice (the reference loops d(y), d(y_hat)
# separately, hifigan_modules.py:375-388/465-476).  Convs are per-sample, so
# scores and feature maps are bit-identical up to the batch split; it halves
# the pallas_call count (amortizing the measured per-call floors, DESIGN.md
# §7g) and doubles the matmul batch of every discriminator conv.  One
# documented semantic nuance: with update_stats=True the MSD's scale-0
# spectral norm runs ONE power iteration per step instead of two (identical
# at a converged u — the fixed point of the iteration; the train-equivalence
# envelope in tests/test_train_equivalence.py covers the transient).
def _disc_joint() -> bool:
    # read at trace time (not import) so equivalence tests can pin the
    # two-call path, whose per-call power-iteration count matches torch
    return os.environ.get("ROAR_DISC_JOINT", "1") not in ("0", "false", "False")

_normal_init = nn.initializers.normal(stddev=0.01)


def _pallas_grouped_mode() -> Tuple[bool, bool]:
    """(enabled, interpret) for the Pallas grouped-conv path.

    "auto" additionally requires a SINGLE device: an opaque ``pallas_call``
    cannot be partitioned by GSPMD, so under any multi-device runtime
    (data-parallel or VOCODER_TP_RULES meshes) the default silently falls
    back to XLA's native grouped conv instead of failing to compile or
    replicating the MSD per device (ADVICE r4).  "1" still forces the
    kernel on for single-program-per-device setups (e.g. inside shard_map)
    where the caller guarantees per-device-local operands.
    """
    if _PALLAS_GROUPED == "0" or _DENSE_GROUPED != "0":
        return False, False
    on_tpu = jax.default_backend() == "tpu"
    if _PALLAS_GROUPED == "1":
        return True, not on_tpu
    return on_tpu and jax.device_count() == 1, False


class PallasGroupedConv(nn.Module):
    """Grouped 1-D conv on CHANNELS-FIRST input via ops/grouped_conv.py.

    Parameters are identical to ``nn.Conv`` (kernel [k, Cin/G, Cout], bias
    [Cout]) so checkpoints, reference transplants and WeightNorm /
    SpectralNorm wrappers are untouched by the lowering; only the
    activation layout differs: x is [B, C, W] and so is the output.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = (1,)
    feature_group_count: int = 1
    padding: Any = None
    kernel_init: Any = _normal_init
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_cf):
        from roar_tpu.ops.grouped_conv import best_out_fold, grouped_conv1d_cf

        k = self.kernel_size[0]
        g = self.feature_group_count
        cin = x_cf.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, cin // g, self.features),
            jnp.float32,
        )
        _, interpret = _pallas_grouped_mode()
        fold = (
            best_out_fold(x_cf.shape[-1], k, self.strides[0],
                          self.padding[0][0], cin, self.features, g)
            if _GC_PHASE_PACK != "0" else 1
        )
        y = grouped_conv1d_cf(
            x_cf, kernel.astype(x_cf.dtype), self.strides[0],
            self.padding[0][0], g, interpret, fold,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)[None, :, None]
        return y


def _lrelu(x, slope=LRELU_SLOPE):
    return nn.leaky_relu(x, negative_slope=slope)


class MaskedGroupedConv(nn.Module):
    """Grouped 1D conv computed as a zero-masked DENSE conv — a measured
    NEGATIVE result, kept behind `ROAR_DENSE_GROUPED=1` (off by default).

    Hypothesis: XLA's TPU grouped-conv lowering starves the 128-wide MXU
    (the per-group contraction dim is Cin/G = 32-64 here), so a
    block-diagonal dense kernel — mathematically identical: output group g
    reads only input group g, the off-diagonal blocks are zero and their
    gradients are zero by construction — should win despite G× the FLOPs.
    In isolation the dense conv does hit ~5x the grouped conv's TF/s, and
    its inflated FLOP count makes the *MFU column look better* (0.47 vs
    0.21).  End-to-end it is 25% SLOWER: 205 vs 164 ms/step on the full
    HiFi-GAN GAN step (b32, 8192-sample segments, bf16, v5e) — 16x the
    FLOPs through convs that are occupancy-bound either way cannot win
    (the step streams only ~10% of achievable HBM bandwidth, §7g, so
    the extra MXU passes are the cost, not the extra bytes).
    Full writeup in DESIGN.md §7e; measured re-diagnosis in §7g.  Parameters stay in nn.Conv's grouped
    layout (kernel [K, Cin/G, Cout], bias [Cout]) so the toggle never
    touches checkpoints, transplants or WeightNorm/SpectralNorm wrappers.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = (1,)
    kernel_dilation: Tuple[int, ...] = (1,)
    feature_group_count: int = 1
    padding: Any = "SAME"
    kernel_init: Any = _normal_init
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size[0]
        g = self.feature_group_count
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, cin // g, self.features), jnp.float32
        )
        kernel = kernel.astype(x.dtype)
        if g == 1:
            dense = kernel
        else:
            # [K, Cin/G, G_out, Cout/G] x eye -> block-diagonal
            # [K, G_in, Cin/G, Cout]; grouped semantics: out group g reads
            # in channels [g*Cin/G, (g+1)*Cin/G)
            w4 = kernel.reshape(k, cin // g, g, self.features // g)
            eye = jnp.eye(g, dtype=x.dtype)
            dense = jnp.einsum("kcgo,gh->khcgo", w4, eye).reshape(
                k, cin, self.features
            )
        pad = self.padding
        y = jax.lax.conv_general_dilated(
            x, dense, window_strides=self.strides,
            padding=pad if isinstance(pad, str) else [tuple(p) for p in pad],
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


def wn_conv(
    features: int,
    kernel_size: int,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    name=None,
    padding="SAME",
    init=True,
):
    conv = nn.Conv(
        features,
        kernel_size=(kernel_size,),
        strides=(stride,),
        kernel_dilation=(dilation,),
        feature_group_count=groups,
        padding=padding,
        kernel_init=_normal_init if init else nn.initializers.lecun_normal(),
    )
    return nn.WeightNorm(conv, name=name)


class ResBlock1(nn.Module):
    """Two-conv residual units with dilated first convs
    (hifigan_modules.py:26-117)."""

    channels: int
    kernel_size: int
    dilation: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = _lrelu(x)
            xt = wn_conv(self.channels, self.kernel_size, dilation=d, name=f"convs1_{i}")(xt)
            xt = _lrelu(xt)
            xt = wn_conv(self.channels, self.kernel_size, dilation=1, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Single-conv residual units (hifigan_modules.py:120-162)."""

    channels: int
    kernel_size: int
    dilation: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = _lrelu(x)
            xt = wn_conv(self.channels, self.kernel_size, dilation=d, name=f"convs_{i}")(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel [B, T, n_mel] -> audio [B, T * prod(upsample_rates)]."""

    resblock: int = 1
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    initial_input_size: int = 80

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_rates))

    @nn.compact
    def __call__(self, x):
        block_cls = ResBlock1 if self.resblock == 1 else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        x = nn.WeightNorm(
            nn.Conv(self.upsample_initial_channel, (7,), padding="SAME"),
            name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = _lrelu(x)
            # feature_axes=1 (the INPUT-channel axis of the [k, in, out]
            # kernel): torch weight_norm's default dim=0 is the in axis for
            # ConvTranspose1d ([in, out, k], hifigan_modules.py:190-199).
            # Same function either way, but matching the grouping keeps the
            # (g, v) training geometry — and therefore gradients and SGD
            # trajectories — aligned with reference checkpoints.
            x = nn.WeightNorm(
                nn.ConvTranspose(
                    ch,
                    kernel_size=(k,),
                    strides=(u,),
                    padding="SAME",
                    kernel_init=_normal_init,
                ),
                feature_axes=1,
                name=f"ups_{i}",
            )(x)
            xs = jnp.zeros_like(x)
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                xs = xs + block_cls(ch, rk, rd, name=f"resblocks_{i}_{j}")(x)
            x = xs / num_kernels
        x = nn.leaky_relu(x, negative_slope=0.01)  # reference uses default slope here
        x = wn_conv(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]  # [B, S]


class DiscriminatorP(nn.Module):
    """Period discriminator (hifigan_modules.py:257-344)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    conv_channels: Sequence[int] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, S] raw audio
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # [B, H, W, C]

        fmap = []
        chs = list(self.conv_channels)
        pad = (self.kernel_size * 1 - 1) // 2
        for i, ch in enumerate(chs):
            x = nn.WeightNorm(
                nn.Conv(
                    ch,
                    (self.kernel_size, 1),
                    strides=(self.stride, 1),
                    padding=((pad, pad), (0, 0)),
                    kernel_init=_normal_init,
                ),
                name=f"convs_{i}",
            )(x)
            x = _lrelu(x)
            fmap.append(x)
        x = nn.WeightNorm(
            nn.Conv(chs[-1], (self.kernel_size, 1), padding=((2, 2), (0, 0))),
            name="convs_4",
        )(x)
        x = _lrelu(x)
        fmap.append(x)
        x = nn.WeightNorm(
            nn.Conv(1, (3, 1), padding=((1, 1), (0, 0))), name="conv_post"
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    debug: bool = False  # tiny channels (reference `debug` flag)

    @nn.compact
    def __call__(self, y, y_hat):
        chs = (8, 12, 32, 64) if self.debug else (32, 128, 512, 1024)
        real_scores, fake_scores, real_fmaps, fake_fmaps = [], [], [], []
        nb = y.shape[0]
        for p in self.periods:
            d = DiscriminatorP(p, conv_channels=chs, name=f"disc_p{p}")
            if _disc_joint() and y.shape == y_hat.shape:
                s2, f2 = d(jnp.concatenate([y, y_hat], axis=0))
                sr, sg = s2[:nb], s2[nb:]
                fr = [t[:nb] for t in f2]
                fg = [t[nb:] for t in f2]
            else:
                sr, fr = d(y)
                sg, fg = d(y_hat)
            real_scores.append(sr)
            fake_scores.append(sg)
            real_fmaps.append(fr)
            fake_fmaps.append(fg)
        return real_scores, fake_scores, real_fmaps, fake_fmaps


class DiscriminatorS(nn.Module):
    """Scale discriminator (hifigan_modules.py:392-430).

    ``dense=True`` is the TPU-recommended variant (DESIGN.md §7g item c):
    the same 7-conv stack with ``feature_group_count=1`` everywhere, at a
    smaller channel pyramid chosen for ~equal parameter count.  The
    reference's grouped design (g=4/16, per-group output channels 16-64
    against a 128-row MXU) caps MXU occupancy at 12-50% under ANY
    lowering; dense convs of the same cost run at MPD-like TFLOP/s."""

    use_spectral_norm: bool = False
    conv_channels: Sequence[int] = (128, 256, 512, 1024)
    dense: bool = False

    def _norm(self, conv, name):
        if self.use_spectral_norm:
            return nn.SpectralNorm(conv, name=name)
        return nn.WeightNorm(conv, name=name)

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        # x: [B, S]
        c0, c1, c2, c3 = self.conv_channels
        g4, g16 = (1, 1) if self.dense else (4, 16)
        specs = [
            (c0, 15, 1, 1),
            (c0, 41, 2, g4),
            (c1, 41, 2, g16),
            (c2, 41, 4, g16),
            (c3, 41, 4, g16),
            (c3, 41, 1, g16),
            (c3, 5, 1, 1),
        ]
        x = x[..., None]  # [B, S, 1]
        fmap = []
        pallas_on, _ = _pallas_grouped_mode()
        x_cf = None  # channels-first alias while inside the Pallas segment
        for i, (ch, k, s, g) in enumerate(specs):
            # Lowering choice per layer (same params, same math, all pinned
            # by equivalence tests; conv names stay the Conv_{i} sequence
            # flax auto-assigns so every path shares checkpoints and
            # reference transplants):
            #  - PallasGroupedConv: the production grouped path on TPU —
            #    chains channels-first so the [B,W,C]<->grouped relayout
            #    copies XLA's lowering inserts never exist (DESIGN.md §7g)
            #  - MaskedGroupedConv: ROAR_DENSE_GROUPED A/B archive (§7e)
            #  - nn.Conv: native XLA (default off-TPU)
            from roar_tpu.ops.grouped_conv import pallas_grouped_conv_supported

            cin = x.shape[-1] if x_cf is None else x_cf.shape[1]
            win = x.shape[1] if x_cf is None else x_cf.shape[-1]
            use_pallas = (
                pallas_on and g > 1
                and pallas_grouped_conv_supported(
                    win, k, s, (k - 1) // 2, cin, ch, g)
            )
            use_dense = (_DENSE_GROUPED == "1" and g > 1) or (
                _DENSE_GROUPED == "g16" and g > 4
            )
            conv_cls = (
                PallasGroupedConv if use_pallas
                else MaskedGroupedConv if use_dense
                else nn.Conv
            )
            conv = conv_cls(
                ch,
                (k,),
                strides=(s,),
                feature_group_count=g,
                padding=[((k - 1) // 2, (k - 1) // 2)],
                kernel_init=_normal_init,
                name=f"Conv_{i}",
            )
            if use_pallas and x_cf is None:
                x_cf = jnp.swapaxes(x, 1, 2)
            if not use_pallas and x_cf is not None:
                x, x_cf = jnp.swapaxes(x_cf, 1, 2), None
            layer = self._norm(conv, f"convs_{i}")
            inp = x_cf if use_pallas else x
            out = (
                layer(inp, update_stats=update_stats)
                if self.use_spectral_norm
                else layer(inp)
            )
            out = _lrelu(out)
            if use_pallas:
                x_cf = out
                # lazy transpose: feeds only the elementwise feature-match
                # loss, where XLA fuses it into the reduction
                fmap.append(jnp.swapaxes(out, 1, 2))
            else:
                x = out
                fmap.append(out)
        if x_cf is not None:
            x, x_cf = jnp.swapaxes(x_cf, 1, 2), None
        post = nn.Conv(1, (3,), padding=[(1, 1)], name=f"Conv_{len(specs)}")
        layer = self._norm(post, "conv_post")
        x = layer(x, update_stats=update_stats) if self.use_spectral_norm else layer(x)
        fmap.append(x)
        b = x.shape[0]
        return x.reshape(b, -1), fmap


def _avg_pool_1d(x, window=4, stride=2, padding=2):
    # x: [B, S]; torch AvgPool1d(4, 2, padding=2) with count_include_pad=True
    xp = jnp.pad(x, ((0, 0), (padding, padding)))
    out = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, window), (1, stride), "VALID"
    )
    return out / window


class MultiScaleDiscriminator(nn.Module):
    debug: bool = False  # tiny channels (reference `debug` flag)
    # "grouped" (reference parity) | "dense" (TPU-recommended, §7g item c):
    # g=1 stacks at a (48, 96, 192, 384) pyramid — 10.84M params/scale vs
    # the grouped stack's 9.87M (+9.9%), same depth/kernels/strides/fmap
    # structure, but every conv is a full-contraction MXU matmul.
    variant: str = "grouped"

    @nn.compact
    def __call__(self, y, y_hat, update_stats: bool = False):
        dense = self.variant == "dense"
        if self.debug:
            chs = (16, 32, 32, 64)
        elif dense:
            chs = (48, 96, 192, 384)
        else:
            chs = (128, 256, 512, 1024)
        real_scores, fake_scores, real_fmaps, fake_fmaps = [], [], [], []
        nb = y.shape[0]
        for i in range(3):
            if i != 0:
                y = _avg_pool_1d(y)
                y_hat = _avg_pool_1d(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0), conv_channels=chs,
                               dense=dense, name=f"disc_s{i}")
            # joint batching needs equal shapes (mixed-length eval calls —
            # e.g. comparing a generator output against a different-length
            # reference — fall back to the two-call path)
            if _disc_joint() and y.shape == y_hat.shape:
                s2, f2 = d(jnp.concatenate([y, y_hat], axis=0),
                           update_stats=update_stats)
                sr, sg = s2[:nb], s2[nb:]
                fr = [t[:nb] for t in f2]
                fg = [t[nb:] for t in f2]
            else:
                sr, fr = d(y, update_stats=update_stats)
                sg, fg = d(y_hat, update_stats=update_stats)
            real_scores.append(sr)
            fake_scores.append(sg)
            real_fmaps.append(fr)
            fake_fmaps.append(fg)
        return real_scores, fake_scores, real_fmaps, fake_fmaps
