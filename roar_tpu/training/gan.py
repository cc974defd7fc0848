"""Two-optimizer GAN training as one jitted step.

The reference uses PTL manual optimization with alternating backward passes
(roar/collections/tts/models/hifigan.py:181-249, models/jets.py:616-694).
The functional analogue: one jitted function that (1) takes discriminator
grads against stop-gradiented generator output and applies the D optimizer,
(2) takes generator grads through the freshly-updated discriminator and
applies the G optimizer.  Spectral-norm power-iteration state rides along as
a mutable collection in the state.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def maybe_remat_disc(fn: Callable) -> Callable:
    """Optionally rematerialize the discriminator forward in backward.

    The GAN steps are HBM-bound (DESIGN.md §7d): the MPD/MSD conv feature
    maps saved as autodiff residuals dominate activation bytes.
    `ROAR_REMAT_DISC=1` wraps the joint discriminator apply in
    `jax.checkpoint`, trading a recomputed forward (FLOPs are plentiful at
    ~21% MFU) for not writing/reading those residuals — the classic
    bytes-for-FLOPs swap on a bandwidth-bound step.  Off by default; the
    measured A/B lives in DESIGN.md §7f.
    """
    if os.environ.get("ROAR_REMAT_DISC", "0") not in ("", "0", "false", "False"):
        return jax.checkpoint(fn)
    return fn


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    d_stats: Any = None  # spectral-norm power-iteration vectors
    g_ema: Optional[Any] = None


def create_gan_state(
    g_params, d_params, g_opt, d_opt, d_stats=None, ema_decay=None
) -> GANTrainState:
    # Single jitted init program: eager per-leaf optax zeros_like / EMA
    # copies cost one tiny XLA compile per distinct parameter shape and
    # dominate cold-start (see trainer.create_train_state).
    @jax.jit
    def _init(gp, dp):
        return (
            jnp.zeros((), jnp.int32),
            g_opt.init(gp),
            d_opt.init(dp),
            jax.tree_util.tree_map(jnp.copy, gp) if ema_decay else None,
        )

    step, g_opt_state, d_opt_state, g_ema = _init(g_params, d_params)
    return GANTrainState(
        step=step,
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
        d_stats=d_stats,
        g_ema=g_ema,
    )


def make_gan_train_step(
    d_loss_fn: Callable,
    g_loss_fn: Callable,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    precision: Optional[str] = None,
):
    """Build the jitted alternating step.

    d_loss_fn(d_params, d_stats, g_params, batch, rng, epoch)
        -> (loss, (metrics, new_d_stats))
    g_loss_fn(g_params, d_params, d_stats, batch, rng, epoch)
        -> (loss, metrics)

    precision='bf16' computes both passes with bfloat16 param/batch casts
    and fp32 master weights + optimizer state (the TPU analogue of the
    reference's `precision: 'bf16-mixed'` JETS trainer setting,
    jets yaml:253; bf16 needs no loss scaling).
    """
    from roar_tpu.training.trainer import cast_floating

    use_bf16 = precision in ("bf16", "bfloat16", "bf16-mixed")

    def _cast(tree):
        return cast_floating(tree, jnp.bfloat16) if use_bf16 else tree

    def step_fn(state: GANTrainState, batch, rng, epoch):
        # The SAME rng goes to both losses: tasks that sample inside the
        # generator forward (JETS random segments, dropout) then see
        # identical draws in the D and G passes — matching the reference's
        # single-forward manual optimization (models/jets.py:577-694).
        rng_d = rng_g = rng
        batch = _cast(batch)

        # ---- discriminator update ----
        # d_stats (spectral-norm u/v) is cast too: an fp32 sigma dividing a
        # bf16 kernel would promote the whole spectral-normed conv back to
        # fp32.  Master stats stay fp32 — new_stats is cast back below.
        def d_compute(d_params, d_stats, g_params):
            return d_loss_fn(_cast(d_params), _cast(d_stats), _cast(g_params),
                             batch, rng_d, epoch)

        (d_loss, (d_metrics, new_stats)), d_grads = jax.value_and_grad(
            d_compute, has_aux=True
        )(state.d_params, state.d_stats, state.g_params)
        new_stats = jax.tree_util.tree_map(
            lambda s, old: s.astype(old.dtype), new_stats, state.d_stats
        )
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update (against updated discriminator) ----
        def g_compute(g_params):
            return g_loss_fn(_cast(g_params), _cast(d_params), _cast(new_stats),
                             batch, rng_g, epoch)

        (g_loss, g_metrics), g_grads = jax.value_and_grad(g_compute, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = state.g_ema
        if ema_decay is not None and state.g_ema is not None:
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), state.g_ema, g_params
            )

        metrics = {"d_loss": d_loss, "g_loss": g_loss}
        metrics.update(d_metrics)
        metrics.update(g_metrics)
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            d_stats=new_stats,
            g_ema=g_ema,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_shared_forward_gan_step(
    forward_fn: Callable,
    d_loss_fn: Callable,
    g_loss_fn: Callable,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    precision: Optional[str] = None,
):
    """Alternating GAN step that runs the generator forward ONCE per step.

    `make_gan_train_step` evaluates the generator graph twice — once
    stop-gradiented inside the D loss and once differentiated inside the G
    loss (the functional transcription of the reference's two manual
    backward passes, models/jets.py:616-694).  XLA does not CSE the primal
    across the two independent grad computations, so for JETS the full
    FastPitch graph + vocoder forward is paid twice.  Here the forward runs
    once under `jax.vjp`: its primal output feeds the D update through
    `stop_gradient`, and the saved VJP closure pulls the G-loss cotangents
    back to the generator params.  Same math, one forward.

    Signatures (note: no g_params/rng in the loss fns — the forward is
    already taken):

    forward_fn(g_params, batch, rng, epoch) -> (diff_out, aux)
        diff_out: float pytree, the differentiable generator outputs
        aux: non-differentiable extras (int lengths, segment indices)
    d_loss_fn(d_params, d_stats, diff_out, aux, batch)
        -> (loss, (metrics, new_d_stats))
    g_loss_fn(diff_out, aux, d_params, d_stats, batch, epoch)
        -> (loss, metrics)
    """
    from roar_tpu.training.trainer import cast_floating

    use_bf16 = precision in ("bf16", "bfloat16", "bf16-mixed")

    def _cast(tree):
        return cast_floating(tree, jnp.bfloat16) if use_bf16 else tree

    def step_fn(state: GANTrainState, batch, rng, epoch):
        batch = _cast(batch)

        # ---- one generator forward, residuals saved for the G update ----
        def fwd(gp):
            return forward_fn(_cast(gp), batch, rng, epoch)

        diff_out, f_vjp, aux = jax.vjp(fwd, state.g_params, has_aux=True)

        # ---- discriminator update (stop-gradient generator outputs) ----
        sg_out = jax.lax.stop_gradient(diff_out)

        # d_stats cast at compute time (fp32 master): fp32 spectral-norm u/v
        # would promote the spectral-normed convs out of bf16
        def d_compute(d_params, d_stats):
            return d_loss_fn(_cast(d_params), _cast(d_stats), sg_out, aux, batch)

        (d_loss, (d_metrics, new_stats)), d_grads = jax.value_and_grad(
            d_compute, has_aux=True
        )(state.d_params, state.d_stats)
        new_stats = jax.tree_util.tree_map(
            lambda s, old: s.astype(old.dtype), new_stats, state.d_stats
        )
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update (against updated discriminator) ----
        def g_compute(do):
            return g_loss_fn(do, aux, _cast(d_params), _cast(new_stats), batch, epoch)

        (g_loss, g_metrics), out_bar = jax.value_and_grad(g_compute, has_aux=True)(
            diff_out
        )
        (g_grads,) = f_vjp(out_bar)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        g_ema = state.g_ema
        if ema_decay is not None and state.g_ema is not None:
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), state.g_ema, g_params
            )

        metrics = {"d_loss": d_loss, "g_loss": g_loss}
        metrics.update(d_metrics)
        metrics.update(g_metrics)
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            d_stats=new_stats,
            g_ema=g_ema,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
