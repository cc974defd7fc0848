"""Pallas TPU kernel for the pYIN banded Viterbi forward pass.

The XLA `lax.scan` implementation is latency-bound: ~430 sequential steps of
small VPU work with HBM round trips per step.  This kernel runs the whole
recursion in ONE kernel launch with the DP state resident in VMEM,
double-buffered observation DMA, and the width-W triangle-band
max-convolution expressed as W lane-rotations (`pltpu.roll`) + running
max/argmax — no gathers.

Layout: pitch bins padded to a lane multiple (640 for N=601); states are
[voiced | unvoiced] halves.  Backtracking stays in XLA (tiny gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roar_tpu.ops.pyin import PyinConfig, _band_tables

_NEG = -1e30
_LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _viterbi_kernel(
    obs_ref,       # HBM [T, B, 2, NP]
    norm_ref,      # VMEM [1, NP]
    ptr_out,       # HBM [T, B, 2, NP] int32 (row 0 unused)
    vfin_out,      # VMEM [B, 2, NP]
    obs_buf,       # VMEM scratch [2, B, 2, NP]
    ptr_buf,       # VMEM scratch [2, B, 2, NP] int32
    vv_ref,        # VMEM scratch [B, NP]
    vu_ref,        # VMEM scratch [B, NP]
    buf_ref,       # VMEM scratch [B, NP + 2*MARGIN]
    in_sems,       # DMA sems (2,)
    out_sems,      # DMA sems (2,)
    *,
    T: int,
    B: int,
    NP: int,
    W: int,
    MARGIN: int,
    n_valid: int,
    log_stay: float,
    log_switch: float,
    log_init_u: float,
    tri: tuple,  # static per-offset log-triangle weights, len W
):
    half = W // 2
    SIZE = NP + 2 * MARGIN  # shift-buffer width; roll shifts must be >= 0
    norm = norm_ref[...]  # [1, NP] (broadcasts against [B, NP])
    col = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)
    valid_col = col < n_valid

    def obs_dma(slot, t):
        return pltpu.make_async_copy(
            obs_ref.at[t], obs_buf.at[slot], in_sems.at[slot]
        )

    def ptr_dma(slot, t):
        return pltpu.make_async_copy(
            ptr_buf.at[slot], ptr_out.at[t], out_sems.at[slot]
        )

    # init: v = p_init + obs[0]; p_init puts all mass on the unvoiced half
    # (voiced initial states are -inf, matching banded_viterbi_decode)
    obs_dma(0, 0).start()
    obs_dma(0, 0).wait()
    vv_ref[...] = jnp.full((B, NP), _NEG, jnp.float32)
    vu_ref[...] = jnp.where(
        valid_col, obs_buf[0, :, 1, :] + log_init_u, _NEG
    )
    # margins of the shift buffer stay -inf forever
    buf_ref[...] = jnp.full((B, NP + 2 * MARGIN), _NEG, jnp.float32)

    if T > 1:
        obs_dma(1, 1).start()

    def band(wvals, sel_u):
        """max over offsets of wvals[j+o-half] + float(tri[o]); returns
        (best, src_bin, src_is_u)."""

    def step(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < T)
        def _():
            obs_dma(nxt, t + 1).start()

        obs_dma(slot, t).wait()

        u_v = vv_ref[...] - norm
        u_u = vu_ref[...] - norm


        # -> voiced targets
        w_same = jnp.maximum(u_v + log_stay, u_u + log_switch)
        s_same = ((u_u + log_switch) > (u_v + log_stay)).astype(jnp.float32)
        # -> unvoiced targets
        w_cross = jnp.maximum(u_v + log_switch, u_u + log_stay)
        s_cross = ((u_u + log_stay) > (u_v + log_switch)).astype(jnp.float32)

        # Band max-convolution per target half: pass 1 finds the best
        # offset per bin (W rolls of the value buffer), pass 2 rolls the
        # source-half selector and picks it at the winning offset.
        def band_pass(w_vals, s_vals):
            buf_ref[:, MARGIN : MARGIN + NP] = w_vals
            full_w = buf_ref[...]
            best = jnp.full((B, NP), _NEG, jnp.float32)
            off = jnp.zeros((B, NP), jnp.int32)
            sel = jnp.zeros((B, NP), jnp.float32)
            for o in range(W):
                k = o - half + MARGIN
                cand = (
                    pltpu.roll(full_w, shift=SIZE - k, axis=1)[:, :NP]
                    + float(tri[o])
                )
                take = cand > best
                best = jnp.where(take, cand, best)
                off = jnp.where(take, o, off)
            buf_ref[:, MARGIN : MARGIN + NP] = s_vals
            full_s = buf_ref[...]
            for o in range(W):
                k = o - half + MARGIN
                rolled = pltpu.roll(full_s, shift=SIZE - k, axis=1)[:, :NP]
                sel = jnp.where(off == o, rolled, sel)
            src = jnp.clip(col - half + off, 0, n_valid - 1)
            return best, src + (sel > 0.5).astype(jnp.int32) * n_valid

        best_v, ptr_v = band_pass(w_same, s_same)
        best_u, ptr_u = band_pass(w_cross, s_cross)

        vv_new = jnp.where(valid_col, best_v + obs_buf[slot, :, 0, :], _NEG)
        vu_new = jnp.where(valid_col, best_u + obs_buf[slot, :, 1, :], _NEG)
        vv_ref[...] = vv_new
        vu_ref[...] = vu_new

        # write pointers for this step (first ptr DMA is started at t=1,
        # so a slot is first reused at t=3)
        @pl.when(t >= 3)
        def _():
            ptr_dma(slot, t - 2).wait()

        ptr_buf[slot, :, 0, :] = ptr_v
        ptr_buf[slot, :, 1, :] = ptr_u
        ptr_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(1, T, step, 0)
    # drain outstanding ptr DMAs
    last = T - 1

    @pl.when(T >= 2)
    def _():
        ptr_dma(last % 2, last).wait()

    @pl.when(T >= 3)
    def _():
        ptr_dma((last - 1) % 2, last - 1).wait()

    vfin_out[:, 0, :] = vv_ref[...]
    vfin_out[:, 1, :] = vu_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "width", "interpret", "log_stay", "log_switch", "log_init_u",
        "log_tri",
    ),
)
def _viterbi_pallas_call(
    obs, log_norm, *, log_tri, n, width, log_stay, log_switch, log_init_u,
    interpret=False,
):
    """obs: [T, B, 2, NP] padded.  Returns (ptrs [T, B, 2, NP] i32,
    v_final [B, 2, NP])."""
    t, b, _, np_ = obs.shape
    margin = _round_up(width // 2, 8)
    kernel = functools.partial(
        _viterbi_kernel,
        T=t, B=b, NP=np_, W=width, MARGIN=margin, n_valid=n,
        log_stay=log_stay, log_switch=log_switch, log_init_u=log_init_u,
        tri=log_tri,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, b, 2, np_), jnp.int32),
            jax.ShapeDtypeStruct((b, 2, np_), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # obs stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norm
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, b, 2, np_), jnp.float32),
            pltpu.VMEM((2, b, 2, np_), jnp.int32),
            pltpu.VMEM((b, np_), jnp.float32),
            pltpu.VMEM((b, np_), jnp.float32),
            pltpu.VMEM((b, np_ + 2 * margin), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the 4x unrolled width-W roll loops need more scoped VMEM than
            # the 16M default (v5e has 128M physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(obs, log_norm)


def banded_viterbi_decode_pallas(
    log_obs: jnp.ndarray, cfg: PyinConfig, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for ops.pyin.banded_viterbi_decode using the Pallas kernel.

    log_obs: [B, T, 2N] -> states [B, T] int32.
    """
    b, t, n2 = log_obs.shape
    n = n2 // 2
    if t < 3:
        # degenerate sequences: the XLA scan path handles them directly
        from roar_tpu.ops.pyin import banded_viterbi_decode

        return banded_viterbi_decode(log_obs, cfg)
    # Mosaic asserts on sub-8 sublane batches (b=1 crashes the compiler
    # with a layout_rank check); pad the batch dimension to a full sublane
    # tile and slice the result back.
    b_pad = max(b, 8)
    if b_pad != b:
        log_obs = jnp.pad(log_obs, ((0, b_pad - b), (0, 0), (0, 0)))
        return banded_viterbi_decode_pallas(log_obs, cfg, interpret)[:b]
    np_ = _round_up(n, _LANE)
    w = cfg.transition_width
    log_tri_np, log_norm_np = _band_tables(n, w)

    # [T, B, 2, NP] padded observations
    obs = jnp.swapaxes(log_obs, 0, 1).reshape(t, b, 2, n)
    obs = jnp.pad(obs, ((0, 0), (0, 0), (0, 0), (0, np_ - n)), constant_values=_NEG)
    norm = np.zeros((1, np_), np.float32)
    norm[0, :n] = log_norm_np

    ptrs, v_final = _viterbi_pallas_call(
        obs, jnp.asarray(norm),
        log_tri=tuple(float(x) for x in log_tri_np),
        n=n, width=w,
        log_stay=float(np.log1p(-cfg.switch_prob)),
        log_switch=float(np.log(cfg.switch_prob)),
        log_init_u=float(np.log(1.0 / n)),
        interpret=interpret,
    )

    # assemble [B, 2N] views
    vf = jnp.concatenate([v_final[:, 0, :n], v_final[:, 1, :n]], axis=-1)
    last = jnp.argmax(vf, axis=-1).astype(jnp.int32)
    # backtracking also runs as one kernel launch (the XLA alternative is a
    # T-step scan of tiny gathers)
    states = _backtrack_pallas_call(ptrs, last, n=n, interpret=interpret)
    return states.swapaxes(0, 1)


def _backtrack_kernel(
    ptr_ref,      # HBM [T, B, 2, NP] int32
    init_ref,     # VMEM [B, NP] int32 (broadcast final state per row)
    out_ref,      # VMEM [T8, B] int32 states
    buf,          # VMEM scratch [2, B, 2, NP] int32
    sems,         # DMA sems (2,)
    *,
    T: int,
    B: int,
    NP: int,
    n_valid: int,
):
    """Sequential Viterbi backtrack with the pointer rows streamed through
    VMEM: state[t-1] = ptr[t][state[t]].  The lane-select is an iota
    compare + masked max (no gathers)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

    def dma(slot, t):
        return pltpu.make_async_copy(ptr_ref.at[t], buf.at[slot], sems.at[slot])

    state0 = init_ref[:, 0]  # [B]
    out_ref[T - 1, :] = state0
    dma((T - 1) % 2, T - 1).start()
    if T > 2:
        dma((T - 2) % 2, T - 2).start()

    def step(i, state):
        t = T - i  # current frame whose pointers map state_t -> state_{t-1}
        slot = t % 2
        dma(slot, t).wait()

        # select ptr[t, b, state_b]: split state into (half, bin)
        half_sel = (state >= n_valid).astype(jnp.int32)  # [B]
        bin_sel = state - half_sel * n_valid
        row_v = buf[slot, :, 0, :]
        row_u = buf[slot, :, 1, :]
        row = jnp.where((half_sel == 1)[:, None], row_u, row_v)  # [B, NP]
        hit = col == bin_sel[:, None]
        prev = jnp.max(jnp.where(hit, row, jnp.int32(-1)), axis=1)  # [B]
        out_ref[t - 1, :] = prev

        # prefetch t-2 into this slot only AFTER the row has been consumed
        # (t-2 shares slot parity with t); the loop stops at t=1, so never
        # start a t=0 copy that would still be in flight at kernel exit
        @pl.when(t >= 3)
        def _():
            dma((t - 2) % 2, t - 2).start()

        return prev

    jax.lax.fori_loop(1, T, step, state0)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _backtrack_pallas_call(ptrs, last, *, n, interpret=False):
    """ptrs [T, B, 2, NP] int32, last [B] int32 -> states [T, B] int32."""
    t, b, _, np_ = ptrs.shape
    t8 = _round_up(t, 8)
    init = jnp.broadcast_to(last[:, None], (b, np_)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_backtrack_kernel, T=t, B=b, NP=np_, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((t8, b), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b, 2, np_), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ptrs, init)
    return out[:t]
