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
# n*s + j - p for tap j.  With OUTPUT-PHASE PACKING by f (n = m*f + q, the
# matmul emits all f output phases of folded position m as extra rows —
# M goes from coutpg to f*coutpg, filling the 128-row MXU for the MSD's
# starved coutpg = 16-64 shapes), the input is folded by F = s*f: row
# (phase, c) = x[c, m*F + phase], and tap (q, j) reads u = q*s + j - pad,
# i.e. folded offset o = u // F and phase p = u % F.  f=1 recovers the
# plain stride fold (q = 0, u = j - pad).
# ---------------------------------------------------------------------------


def _tap_geometry(k: int, s: int, pad: int, f: int = 1):
    """Flat (q, j) tap maps: returns (qs, js, offs, phases, hl, hr, T)."""
    ff = s * f
    qs, js, offs, phases = [], [], [], []
    for q in range(f):
        for j in range(k):
            u = q * s + j - pad
            qs.append(q)
            js.append(j)
            offs.append(u // ff)
            phases.append(u % ff)
    hl, hr = -min(offs), max(offs)
    t = hl + hr + 1
    return (np.asarray(qs), np.asarray(js), np.asarray(offs),
            np.asarray(phases), hl, hr, t)


def _fold_x(x: jnp.ndarray, s: int, g: int, hl: int, hr: int) -> jnp.ndarray:
    """[B, C, W] -> zero-padded folded [B, G, s*cpg, W/s + hl + hr].

    Row order within a group is (phase, c): phase-major so a folded tap
    offset selects one contiguous [s*cpg, W_tile] block per tap.  (s here
    is the TOTAL fold F = stride * out_fold.)
    """
    b, c, w = x.shape
    cpg = c // g
    wf = -(-w // s) * s  # round W up to a stride multiple (zeros are inert)
    if wf != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wf - w)))
    xf = x.reshape(b, g, cpg, wf // s, s)
    xf = xf.transpose(0, 1, 4, 2, 3).reshape(b, g, s * cpg, wf // s)
    return jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (hl, hr)))


def _pack_w_fwd(w: jnp.ndarray, s: int, g: int, pad: int,
                f: int = 1) -> jnp.ndarray:
    """flax kernel [k, cpg, cout] -> packed [G, f*coutpg, T*(F*cpg)].

    Output row (q, oc); packed contraction row of tap (q, j) is
    (o_qj + hl, p_qj, c) — matching the F-folded activation's (offset,
    phase, c) rows.  Slots no (q, j) maps to stay zero (their FLOPs are
    the price of the fatter M; measured win per shape).
    """
    k, cpg, cout = w.shape
    coutpg = cout // g
    qs, js, offs, phases, hl, hr, t = _tap_geometry(k, s, pad, f)
    wr = w.reshape(k, cpg, g, coutpg)  # output channels are group-major
    packed = jnp.zeros((g, f, coutpg, t, s * f, cpg), w.dtype)
    # (q, t, p) triples are unique per (q, j): scatter-free advanced
    # indexing; non-adjacent advanced axes (1, 3, 4) broadcast to the
    # FRONT, so the value is [f*k, g, coutpg, cpg]
    packed = packed.at[:, qs, :, offs + hl, phases, :].set(
        wr.transpose(0, 2, 3, 1)[js])
    return packed.reshape(g, f * coutpg, t * s * f * cpg)


def _pack_w_dx(w: jnp.ndarray, s: int, g: int, pad: int,
               f: int = 1) -> jnp.ndarray:
    """Transposed weight for the dX pass: [G, F*cpg, T*(f*coutpg)].

    dx_folded row (p, c) at position m sums w[j, c, oc] * dyf[(q, oc),
    m - o_qj] over tap pairs (q, j) with phase p.  With dyf left-padded
    by hr, tap (q, j) reads the packed tap slot (hr - o_qj).
    """
    k, cpg, cout = w.shape
    coutpg = cout // g
    qs, js, offs, phases, hl, hr, t = _tap_geometry(k, s, pad, f)
    wr = w.reshape(k, cpg, g, coutpg)
    packed = jnp.zeros((g, s * f, cpg, t, f, coutpg), w.dtype)
    # value broadcast to the front: [f*k, g, cpg, coutpg]
    packed = packed.at[:, phases, :, hr - offs, qs, :].set(
        wr.transpose(0, 2, 1, 3)[js])
    return packed.reshape(g, s * f * cpg, t * f * coutpg)


def _unpack_dw(dwp: jnp.ndarray, k: int, s: int, g: int, pad: int,
               cpg: int, cout: int, f: int = 1) -> jnp.ndarray:
    """[G, f*coutpg, T*(F*cpg)] accumulated grads -> flax [k, cpg, cout].

    Each weight w[j] feeds all f output phases, so its gradient is the
    SUM over q of the (q, j) slots."""
    coutpg = cout // g
    qs, js, offs, phases, hl, hr, t = _tap_geometry(k, s, pad, f)
    dwr = dwp.reshape(g, f, coutpg, t, s * f, cpg)
    taps = dwr[:, qs, :, offs + hl, phases, :]  # [f*k, G, coutpg, cpg]
    dw = jnp.zeros((k, g, coutpg, cpg), dwp.dtype).at[js].add(taps)
    return dw.transpose(0, 3, 1, 2).reshape(k, cpg, cout)


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
                                  cin: int, cout: int, g: int,
                                  out_fold: int = 1) -> bool:
    """Shape gate for the kernel's tiling + Mosaic alignment rules:
    channel counts must split by G, the folded channel count must be
    sublane-aligned, padding must not exceed the total fold, and the
    per-program VMEM blocks must fit.  All MSD discriminator shapes
    (including the odd avg-pooled widths of scales 1/2) qualify."""
    if cin % g or cout % g:
        return False
    f = out_fold
    ff = s * f
    wf = -(-win // ff)  # F-folded width
    out_w = _out_len(win, k, s, pad)
    owf = -(-out_w // f)  # f-folded output width
    if owf > wf:
        return False
    _, _, _, _, _, _, t = _tap_geometry(k, s, pad, f)
    sc = ff * (cin // g)
    if sc % 16:
        return False
    _, _, w_pad = _tile_w(wf)
    x_block = sc * (w_pad + t - 1) * 4
    w_block = f * (cout // g) * t * sc * 4
    return x_block < 8 * 2 ** 20 and w_block < 4 * 2 ** 20


def best_out_fold(win: int, k: int, s: int, pad: int,
                  cin: int, cout: int, g: int) -> int:
    """Largest supported output fold with f*coutpg <= 128: the matmul M
    that actually fills the MXU's 128 rows (DESIGN.md §7g headroom (b)).

    Measured per-shape gating (grouped_conv_bench.py pallas vs pallas_pp,
    all 12 MSD shapes): folding wins ONLY while the matmul N stays healthy
    — f must divide out_w exactly (a ragged fold multiplies the junk-tail
    fraction by f) and the folded width must still fill a 128-lane tile.
    That rule separates the measured winners (+24/+20/+6.5% on the wide
    scale-0 shapes) from every measured loser (-1 to -26% on the narrow /
    odd-width shapes) with no exceptions."""
    coutpg = cout // g
    out_w = _out_len(win, k, s, pad)
    best = 1
    f = 2
    while coutpg * f <= 128:
        if (out_w % f == 0 and out_w // f >= 128
                and pallas_grouped_conv_supported(win, k, s, pad,
                                                  cin, cout, g, f)):
            best = f
        f *= 2
    return best


def _fold_pad(x, s, g, hl, hr):
    """Folded input padded out to the core's contract:
    last dim = padded_out_w(folded_w) + T - 1."""
    t = hl + hr + 1
    xp = _fold_x(x, s, g, hl, hr)  # [..., wf/s + t - 1]
    wf_s = xp.shape[-1] - (t - 1)
    _, _, w_pad = _tile_w(wf_s)
    return jnp.pad(xp, ((0, 0),) * 3 + ((0, w_pad - wf_s),)), wf_s


def _fold_dy(dy, g, coutpg, owf, f):
    """[B, Cout, out_w] cotangent -> f-folded [B, G, f*coutpg, owf] with
    row order (q, oc) matching the packed forward weight's output rows."""
    b, cout, out_w = dy.shape
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, owf * f - out_w)))
    dy5 = dyp.reshape(b, g, coutpg, owf, f).transpose(0, 1, 4, 2, 3)
    return dy5.reshape(b, g, f * coutpg, owf)


def _fwd_impl(x, w, s, pad, g, interpret, f=1):
    b, cin, win = x.shape
    k, cpg, cout = w.shape
    coutpg = cout // g
    _, _, _, _, hl, hr, t = _tap_geometry(k, s, pad, f)
    ff = s * f
    out_w = _out_len(win, k, s, pad)
    owf = -(-out_w // f)
    assert owf <= -(-win // ff), "padding exceeds the total fold"
    xp, wf = _fold_pad(x, ff, g, hl, hr)
    wp = _pack_w_fwd(w.astype(x.dtype), s, g, pad, f)
    y4 = _core(xp, wp, wf, interpret)
    y = y4[:, :, :, :owf].reshape(b, g, f, coutpg, owf)
    y = y.transpose(0, 1, 3, 4, 2).reshape(b, cout, owf * f)
    return y[:, :, :out_w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grouped_conv1d_cf(x, w, stride: int, padding: int,
                      feature_group_count: int, interpret: bool = False,
                      out_fold: int = 1):
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
        out_fold: output-phase packing factor f — the kernel's matmul
           emits f interleaved output phases as extra M rows (M becomes
           f*Cout/G), then the wrapper unfolds them exactly.  Numerics
           are identical for any supported f; pick with best_out_fold.

    Returns: [B, Cout, out_w] with out_w = (W + 2*padding - k)//stride + 1.
    """
    return _fwd_impl(x, w, stride, padding, feature_group_count, interpret,
                     out_fold)


def _vjp_fwd(x, w, s, pad, g, interpret, f):
    b, cin, win = x.shape
    k, cpg, cout = w.shape
    coutpg = cout // g
    _, _, _, _, hl, hr, t = _tap_geometry(k, s, pad, f)
    ff = s * f
    out_w = _out_len(win, k, s, pad)
    owf = -(-out_w // f)
    xp, wf = _fold_pad(x, ff, g, hl, hr)
    wp = _pack_w_fwd(w.astype(x.dtype), s, g, pad, f)
    y4 = _core(xp, wp, wf, interpret)
    y = y4[:, :, :, :owf].reshape(b, g, f, coutpg, owf)
    y = y.transpose(0, 1, 3, 4, 2).reshape(b, cout, owf * f)[:, :, :out_w]
    # the FOLDED input is the residual — dW consumes it directly, so the
    # fold never runs twice (and the raw x is not otherwise needed)
    return y, (xp, w, win)


def _vjp_bwd(s, pad, g, interpret, f, res, dy):
    xp, w, win = res
    k, cpg, cout = w.shape
    cin = cpg * g
    coutpg = cout // g
    _, _, _, _, hl, hr, t = _tap_geometry(k, s, pad, f)
    ff = s * f
    b, out_w = dy.shape[0], dy.shape[-1]
    owf = -(-out_w // f)
    wf = -(-win // ff)
    dy4 = _fold_dy(dy.astype(xp.dtype), g, coutpg, owf, f)

    # dX: the same core kernel over the f-folded dy with a phase-packed
    # transposed weight; taps span the mirrored halo (left pad hr), and
    # the F-folded output needs wf columns.
    _, _, w_pad_dx = _tile_w(wf)
    dyp = jnp.pad(
        dy4, ((0, 0), (0, 0), (0, 0), (hr, w_pad_dx + t - 1 - owf - hr))
    )
    wdx = _pack_w_dx(w.astype(xp.dtype), s, g, pad, f)
    dxf = _core(dyp, wdx, wf, interpret)[:, :, :, :wf]
    dxf = dxf.reshape(b, g, ff, cpg, wf).transpose(0, 1, 3, 4, 2)
    dx = dxf.reshape(b, cin, wf * ff)[:, :, :win]

    # dW: contract the saved folded x against dy over (batch, width);
    # dy's junk tail (ragged width or pad < (k-1)//2) stays zero.
    w_pad_fwd = xp.shape[-1] - (t - 1)
    dyz = jnp.pad(dy4, ((0, 0),) * 3 + ((0, w_pad_fwd - owf),))
    dwp = _dw(xp, dyz, t, interpret)
    dw = _unpack_dw(dwp, k, s, g, pad, cpg, cout, f).astype(w.dtype)
    return dx.astype(dy.dtype), dw


grouped_conv1d_cf.defvjp(_vjp_fwd, _vjp_bwd)
