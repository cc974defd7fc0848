"""Grouped 1-D convolution as a Pallas TPU kernel (channels-first).

Why this exists: XLA's native grouped-conv lowering keeps the activation in
a ``[B, W, G, C/G]`` layout whose last axis (C/G = 8-64 here) sits on the
128-wide lane dimension — every memory tile and every MXU pass is 2-16x
padded.  The per-op profile (DESIGN.md §7g) measures the native MSD
grouped convs at ~7 TFLOP/s; this kernel reaches ~11 in-step and up to
45 per-call on the widest shape, against a 12-50% MXU-occupancy
architecture ceiling (per-group output channels O = 16-64 vs the
128-row MXU).  The measured alternatives lose or wash: block-diagonal
dense pays G x the FLOPs (§7e), im2col materializes k x the bytes,
space-to-depth alone only re-shuffles the same starved contraction.

This kernel fixes the layout instead: activations run channels-first
``[B, G, C/G, W]`` with the LONG W axis on lanes, and each group's k-tap
contraction is packed into a single ``[coutpg, k*cpg] @ [k*cpg, W_tile]``
matmul whose contraction dim (328-2624) actually fills the MXU.  The tap
matrix ("col") is built in VMEM — never materialized to HBM.  Strides are
folded into channels OUTSIDE the kernel (space-to-depth in plain XLA), so
the kernel itself is always a stride-1 VALID convolution; the backward
passes reuse the same machinery (dX = the same core kernel applied to dy
with a phase-packed transposed weight; dW = a sibling kernel contracting
over batch x width).

Reference behavior matched: torch grouped Conv1d as used by the MSD
discriminator (reference hifigan_modules.py:345-395) — numerics pinned
against ``lax.conv_general_dilated`` in tests/test_grouped_conv.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Tap geometry: output n of a stride-s conv with padding p reads input
# n*s + j - p for tap j.  In the stride-folded (space-to-depth) view the
# input is [s*C, W/s] with row (phase, c) = x[c, m*s + phase]; tap j lands
# at folded offset o_j = floor((j - p) / s) and phase p_j = (j - p) - s*o_j.
# ---------------------------------------------------------------------------


def _tap_geometry(k: int, s: int, pad: int):
    offs = [(j - pad) // s for j in range(k)]
    phases = [(j - pad) - s * o for j, o in zip(range(k), offs)]
    hl, hr = -min(offs), max(offs)
    t = hl + hr + 1
    return offs, phases, hl, hr, t


def _fold_x(x: jnp.ndarray, s: int, g: int, hl: int, hr: int) -> jnp.ndarray:
    """[B, C, W] -> zero-padded folded [B, G, s*cpg, W/s + hl + hr].

    Row order within a group is (phase, c): phase-major so a folded tap
    offset selects one contiguous [s*cpg, W_tile] block per tap.
    """
    b, c, w = x.shape
    cpg = c // g
    wf = -(-w // s) * s  # round W up to a stride multiple (zeros are inert)
    if wf != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wf - w)))
    xf = x.reshape(b, g, cpg, wf // s, s)
    xf = xf.transpose(0, 1, 4, 2, 3).reshape(b, g, s * cpg, wf // s)
    return jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (hl, hr)))


def _pack_w_fwd(w: jnp.ndarray, s: int, g: int, pad: int) -> jnp.ndarray:
    """flax kernel [k, cpg, cout] -> packed [G, coutpg, T*(s*cpg)].

    Packed contraction row of tap j is (o_j + hl, p_j, c) — matching the
    folded activation's (offset, phase, c) rows.  Taps that no (j) maps to
    stay zero (at most ~s/k extra FLOPs).
    """
    k, cpg, cout = w.shape
    coutpg = cout // g
    offs, phases, hl, hr, t = _tap_geometry(k, s, pad)
    wr = w.reshape(k, cpg, g, coutpg)  # output channels are group-major
    packed = jnp.zeros((g, coutpg, t, s, cpg), w.dtype)
    ts = np.asarray([o + hl for o in offs])
    ps = np.asarray(phases)
    # (t, p) pairs are unique per tap j: scatter-free advanced indexing
    packed = packed.at[:, :, ts, ps, :].set(wr.transpose(2, 3, 0, 1))
    return packed.reshape(g, coutpg, t * s * cpg)


def _pack_w_dx(w: jnp.ndarray, s: int, g: int, pad: int) -> jnp.ndarray:
    """Transposed weight for the dX pass: [G, s*cpg, T*coutpg].

    dx_folded row (p, c) at position m sums w[j, c, o] * dy[o, m - o_j]
    over taps j with phase p.  With dy left-padded by hr, tap j reads the
    packed tap slot (hr - o_j).
    """
    k, cpg, cout = w.shape
    coutpg = cout // g
    offs, phases, hl, hr, t = _tap_geometry(k, s, pad)
    wr = w.reshape(k, cpg, g, coutpg)
    packed = jnp.zeros((g, s, cpg, t, coutpg), w.dtype)
    ts = np.asarray([hr - o for o in offs])
    ps = np.asarray(phases)
    # non-adjacent advanced indices (axes 1 and 3) broadcast to the FRONT:
    # the value must be [k, g, cpg, coutpg]
    packed = packed.at[:, ps, :, ts, :].set(wr.transpose(0, 2, 1, 3))
    return packed.reshape(g, s * cpg, t * coutpg)


def _unpack_dw(dwp: jnp.ndarray, k: int, s: int, g: int, pad: int,
               cpg: int, cout: int) -> jnp.ndarray:
    """[G, coutpg, T*(s*cpg)] accumulated grads -> flax [k, cpg, cout]."""
    coutpg = cout // g
    offs, phases, hl, hr, t = _tap_geometry(k, s, pad)
    dwr = dwp.reshape(g, coutpg, t, s, cpg)
    ts = np.asarray([o + hl for o in offs])
    ps = np.asarray(phases)
    dw = dwr[:, :, ts, ps, :]  # [G, coutpg, k, cpg]
    return dw.transpose(2, 3, 0, 1).reshape(k, cpg, cout)


# ---------------------------------------------------------------------------
# Core kernel: stride-1 VALID grouped conv on pre-folded inputs.
# ---------------------------------------------------------------------------


def _tile_w(out_w: int) -> Tuple[int, int, int]:
    """(W_tile, B_block, padded_out_w): every tile is a 128-lane multiple;
    ragged widths round UP and the junk tail columns are sliced off (fwd)
    or fed zeros (dW).  Short widths pack B_block batch items side by side
    so the matmul N stays at 512 — without it the deep MSD layers
    (out_w 33-257 at scales 1/2) degenerate into hundreds of tiny per-
    (batch, group) programs whose launch + [O<=64, K]x[K, 65] matmuls
    waste the MXU (measured: the scale-1/2 stack ran ~3x slower per byte
    than scale 0).  The junk columns cost FLOPs (up to ~4x for out_w 33)
    but replace per-program overhead — a measured win.  Batch packing's
    lane offsets (b*WT) require WT 128-aligned; Mosaic only shifts
    CONSTANT unaligned offsets, which is also why the tap loop in
    _build_col is static."""
    w128 = -(-out_w // 128) * 128
    if w128 >= 512:
        wt = 512
        return wt, 1, -(-out_w // wt) * wt
    return w128, 512 // w128, w128


def _build_col(x_ref, col_ref, xb, cb, base, *, T, SC, WT):
    """col[t*SC:(t+1)*SC, cb*WT:(cb+1)*WT] = x[xb, 0, :, base+t : base+t+WT].

    The tap loop is a STATIC python loop: Mosaic rejects dynamic lane
    offsets that are not provably 128-aligned (and its dynamic lane rotate
    is 32-bit-only, so the pyin-style roll idiom can't serve bf16) — with
    constant offsets it emits shifted loads itself.  A measured
    alternative — tap-accumulation of T small [O,SC]x[SC,WT] matmuls with
    no col scratch — LOST per shape (conv1 5.85 vs 4.45 ms, conv5 3.33 vs
    2.16): the starved contractions cost more than these VMEM copies."""
    for t in range(T):
        col_ref[t * SC:(t + 1) * SC, cb * WT:(cb + 1) * WT] = (
            x_ref[xb, 0, :, base + t:base + t + WT]
        )


def _dma_batch(b: int, bb_pack: int, sc: int, w_in: int,
               itemsize: int) -> int:
    """Batch items per grid program (a multiple of the packing factor).

    The measured per-shape floor was NOT the matmul or the col build — a
    timing probe with each disabled ran every MSD shape at the same
    ~0.45 ms — it was per-program launch overhead on 128-512-program
    grids.  Fewer, fatter programs amortize it: each program DMAs a
    larger batch block and loops the pack/tile schedule internally,
    bounded so the x block stays ~2 MB (double-buffered against y, col
    and w inside ~16 MB VMEM)."""
    budget = 2 * 2 ** 20
    per_item = sc * w_in * itemsize
    bb = (budget // max(per_item, 1)) // bb_pack * bb_pack
    bb = max(bb_pack, min(bb, b))
    while b % bb or bb % bb_pack:
        bb -= 1
    return max(bb, bb_pack)


def _core_kernel(x_ref, w_ref, y_ref, col_ref, *,
                 T, SC, WT, BB_PACK, BB_DMA, N_TILES):
    w = w_ref[0]  # [O, T*SC]

    # fori_loop (not an unrolled python loop) keeps Mosaic code size at
    # tiles x taps whatever BB_DMA is; the batch index is dynamic only on
    # the UNTILED leading dim, so every lane/sublane offset stays static.
    def sub_body(sub, _):
        b0 = sub * BB_PACK
        for tile in range(N_TILES):
            base = tile * WT
            for b in range(BB_PACK):
                _build_col(x_ref, col_ref, b0 + b, b, base,
                           T=T, SC=SC, WT=WT)
            y = jax.lax.dot_general(
                w, col_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for b in range(BB_PACK):
                y_ref[b0 + b, 0, :, base:base + WT] = (
                    y[:, b * WT:(b + 1) * WT].astype(y_ref.dtype)
                )
        return 0

    jax.lax.fori_loop(0, BB_DMA // BB_PACK, sub_body, 0)


def _core(xp: jnp.ndarray, wp: jnp.ndarray, out_w: int,
          interpret: bool) -> jnp.ndarray:
    """xp [B, G, SC, padded_out_w + T - 1], wp [G, O, T*SC]
    -> [B, G, O, padded_out_w] (junk tail columns when out_w was ragged)."""
    b, g, sc, w_in = xp.shape
    _, o, kk = wp.shape
    t = kk // sc
    wt, bb, w_pad = _tile_w(out_w)
    while b % bb:
        bb //= 2
    bb_dma = _dma_batch(b, bb, sc, w_in, xp.dtype.itemsize)
    assert w_in == w_pad + t - 1, (w_in, out_w, w_pad, t)
    kernel = functools.partial(
        _core_kernel, T=t, SC=sc, WT=wt, BB_PACK=bb, BB_DMA=bb_dma,
        N_TILES=w_pad // wt,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, o, w_pad), xp.dtype),
        grid=(b // bb_dma, g),
        in_specs=[
            pl.BlockSpec((bb_dma, 1, sc, w_in), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o, kk), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb_dma, 1, o, w_pad),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kk, bb * wt), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, wp)


def _dw_kernel(x_ref, dy_ref, dwp_ref, col_ref, dyc_ref, acc_ref, *,
               T, SC, WT, BB_PACK, BB_DMA, N_TILES, NB):
    """Per group, accumulate dW over (batch, width) tiles:
    [O, N] x [T*SC, N] lane-contraction -> the packed [O, T*SC] gradient.
    dy's junk tail columns are zero-padded by the wrapper, so ragged
    widths contribute nothing."""
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def sub_body(sub, _):
        b0 = sub * BB_PACK
        for tile in range(N_TILES):
            base = tile * WT
            for b in range(BB_PACK):
                _build_col(x_ref, col_ref, b0 + b, b, base,
                           T=T, SC=SC, WT=WT)
                dyc_ref[:, b * WT:(b + 1) * WT] = (
                    dy_ref[b0 + b, 0, :, base:base + WT]
                )
            acc_ref[:] += jax.lax.dot_general(
                dyc_ref[:], col_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, BB_DMA // BB_PACK, sub_body, 0)

    @pl.when(nb == NB - 1)
    def _():
        dwp_ref[0] = acc_ref[:]


def _dw(xp: jnp.ndarray, dy: jnp.ndarray, t: int,
        interpret: bool) -> jnp.ndarray:
    """xp [B, G, SC, padded_out_w + T - 1], dy [B, G, O, padded_out_w]
    (junk tail zero-filled) -> dwp [G, O, T*SC] fp32."""
    b, g, sc, w_in = xp.shape
    _, _, o, w_pad = dy.shape
    assert w_in == w_pad + t - 1, (w_in, w_pad, t)
    wt, bb, w_pad2 = _tile_w(w_pad)
    assert w_pad2 == w_pad
    while b % bb:
        bb //= 2
    bb_dma = _dma_batch(b, bb, sc, w_in, xp.dtype.itemsize)
    nb = b // bb_dma
    kernel = functools.partial(
        _dw_kernel, T=t, SC=sc, WT=wt, BB_PACK=bb, BB_DMA=bb_dma,
        N_TILES=w_pad // wt, NB=nb,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, o, t * sc), jnp.float32),
        grid=(g, nb),
        in_specs=[
            pl.BlockSpec((bb_dma, 1, sc, w_in), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb_dma, 1, o, w_pad), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, t * sc), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t * sc, bb * wt), xp.dtype),
            pltpu.VMEM((o, bb * wt), xp.dtype),
            pltpu.VMEM((o, t * sc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, dy)


# ---------------------------------------------------------------------------
# Public op with custom VJP.
# ---------------------------------------------------------------------------


def _out_len(w: int, k: int, s: int, pad: int) -> int:
    return (w + 2 * pad - k) // s + 1


def pallas_grouped_conv_supported(win: int, k: int, s: int, pad: int,
                                  cin: int, cout: int, g: int) -> bool:
    """Shape gate for the kernel's tiling + Mosaic alignment rules:
    channel counts must split by G, the folded channel count must be
    sublane-aligned, padding must not exceed the stride fold, and the
    per-program VMEM blocks must fit.  All MSD discriminator shapes
    (including the odd avg-pooled widths of scales 1/2) qualify."""
    if cin % g or cout % g:
        return False
    wf_s = -(-win // s)  # folded width
    out_w = _out_len(win, k, s, pad)
    if out_w > wf_s:
        return False
    _, _, _, _, t = _tap_geometry(k, s, pad)
    sc = s * (cin // g)
    if sc % 16:
        return False
    _, _, w_pad = _tile_w(wf_s)
    x_block = sc * (w_pad + t - 1) * 4
    w_block = (cout // g) * t * sc * 4
    return x_block < 8 * 2 ** 20 and w_block < 4 * 2 ** 20


def _fold_pad(x, s, g, hl, hr):
    """Folded input padded out to the core's contract:
    last dim = padded_out_w(folded_w) + T - 1."""
    t = hl + hr + 1
    xp = _fold_x(x, s, g, hl, hr)  # [..., wf/s + t - 1]
    wf_s = xp.shape[-1] - (t - 1)
    _, _, w_pad = _tile_w(wf_s)
    return jnp.pad(xp, ((0, 0),) * 3 + ((0, w_pad - wf_s),)), wf_s


def _fwd_impl(x, w, s, pad, g, interpret):
    b, cin, win = x.shape
    k, cpg, cout = w.shape
    _, _, hl, hr, t = _tap_geometry(k, s, pad)
    out_w = _out_len(win, k, s, pad)
    assert out_w <= -(-win // s), "padding exceeds the stride fold"
    xp, wf_s = _fold_pad(x, s, g, hl, hr)
    wp = _pack_w_fwd(w.astype(x.dtype), s, g, pad)
    y4 = _core(xp, wp, wf_s, interpret)
    y = y4.reshape(b, cout, y4.shape[-1])
    return y[:, :, :out_w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv1d_cf(x, w, stride: int, padding: int,
                      feature_group_count: int, interpret: bool = False):
    """Grouped 1-D conv, channels-first.

    Args:
        x: [B, Cin, W] activations (W on the TPU lane axis).
        w: [k, Cin/G, Cout] kernel — flax ``nn.Conv`` layout, so parameters
           (and WeightNorm/SpectralNorm wrappers, checkpoints, reference
           transplants) are untouched by the lowering choice.
        stride, padding: symmetric padding, matching
           ``lax.conv_general_dilated(..., padding=[(padding, padding)])``.
        feature_group_count: G.  Output channel oc reads input group
           oc // (Cout/G), exactly XLA's grouped semantics.

    Returns: [B, Cout, out_w] with out_w = (W + 2*padding - k)//stride + 1.
    """
    return _fwd_impl(x, w, stride, padding, feature_group_count, interpret)


def _vjp_fwd(x, w, s, pad, g, interpret):
    b, cin, win = x.shape
    k, cpg, cout = w.shape
    _, _, hl, hr, t = _tap_geometry(k, s, pad)
    out_w = _out_len(win, k, s, pad)
    xp, wf_s = _fold_pad(x, s, g, hl, hr)
    wp = _pack_w_fwd(w.astype(x.dtype), s, g, pad)
    y4 = _core(xp, wp, wf_s, interpret)
    y = y4.reshape(b, cout, y4.shape[-1])[:, :, :out_w]
    # the FOLDED input is the residual — dW consumes it directly, so the
    # fold never runs twice (and the raw x is not otherwise needed)
    return y, (xp, w, win)


def _vjp_bwd(s, pad, g, interpret, res, dy):
    xp, w, win = res
    k, cpg, cout = w.shape
    cin = cpg * g
    coutpg = cout // g
    _, _, hl, hr, t = _tap_geometry(k, s, pad)
    b, _, _, out_w = dy.shape[0], 0, 0, dy.shape[-1]
    wf_s = -(-win // s)
    dy4 = dy.reshape(b, g, coutpg, out_w).astype(xp.dtype)

    # dX: the same core kernel over dy with a phase-packed transposed
    # weight; taps span the mirrored halo (left pad hr), and the folded
    # output needs wf_s columns.
    _, _, w_pad_dx = _tile_w(wf_s)
    dyp = jnp.pad(
        dy4, ((0, 0), (0, 0), (0, 0), (hr, w_pad_dx + t - 1 - out_w - hr))
    )
    wdx = _pack_w_dx(w.astype(xp.dtype), s, g, pad)
    dxf = _core(dyp, wdx, wf_s, interpret)[:, :, :, :wf_s]
    dxf = dxf.reshape(b, g, s, cpg, wf_s).transpose(0, 1, 3, 4, 2)
    dx = dxf.reshape(b, cin, wf_s * s)[:, :, :win]

    # dW: contract the saved folded x against dy over (batch, width);
    # dy's junk tail (ragged width or pad < (k-1)//2) stays zero.
    w_pad_fwd = xp.shape[-1] - (t - 1)
    dyz = jnp.pad(dy4, ((0, 0),) * 3 + ((0, w_pad_fwd - out_w),))
    dwp = _dw(xp, dyz, t, interpret)
    dw = _unpack_dw(dwp, k, s, g, pad, cpg, cout).astype(w.dtype)
    return dx.astype(dy.dtype), dw


grouped_conv1d_cf.defvjp(_vjp_fwd, _vjp_bwd)
