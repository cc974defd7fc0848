"""Optimizer + LR-scheduler registries on optax.

Re-implements the reference registries
(roar/core/optim/optimizers.py:16-109 and lr_schedulers.py:447-1142) with the
same names and schedule math, as optax schedules / gradient transforms:

- Optimizers: sgd, adam, adamw, adadelta, adamax, adagrad, rmsprop.
- Schedules: NoamAnnealing, CosineAnnealing, WarmupPolicy, WarmupHoldPolicy,
  SquareAnnealing, SquareRootAnnealing, InverseSquareRootAnnealing,
  PolynomialDecayAnnealing, NoamHoldAnnealing.

`prepare_lr_scheduler` mirrors lr_schedulers.py:826-1090: max_steps is
computed from dataloader length / accumulation / epochs when not given.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import optax

# ---------------------------------------------------------------------------
# Schedules (step -> lr)
# ---------------------------------------------------------------------------


def noam_annealing(
    initial_lr: float,
    d_model: int = 1,
    warmup_steps: int = 1000,
    min_lr: float = 0.0,
) -> Callable:
    norm = d_model ** (-0.5)

    def schedule(step):
        s = step + 1  # NeMo steps its scheduler from 1
        import jax.numpy as jnp

        s = jnp.maximum(s.astype(jnp.float32) if hasattr(s, "astype") else float(s), 1.0)
        lr = initial_lr * norm * jnp.minimum(s ** -0.5, s * (warmup_steps ** -1.5))
        return jnp.maximum(lr, min_lr)

    return schedule


def _warmup_frac(step, warmup_steps):
    import jax.numpy as jnp

    return jnp.minimum((step + 1.0) / max(warmup_steps, 1), 1.0)


def cosine_annealing(
    initial_lr: float,
    max_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
) -> Callable:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        progress = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = min_lr + (initial_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_policy(initial_lr, max_steps, warmup_steps=0, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        return jnp.where(step < warmup_steps, warm, jnp.maximum(initial_lr, min_lr))

    return schedule


def square_annealing(initial_lr, max_steps, warmup_steps=0, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        mult = jnp.clip(
            (max_steps - step) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        ) ** 2
        ann = (initial_lr - min_lr) * mult + min_lr
        return jnp.where(step < warmup_steps, warm, ann)

    return schedule


def square_root_annealing(initial_lr, max_steps, warmup_steps=0, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        mult = jnp.sqrt(
            jnp.clip((max_steps - step) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        )
        ann = jnp.maximum(initial_lr * mult, min_lr)
        return jnp.where(step < warmup_steps, warm, ann)

    return schedule


def inverse_square_root_annealing(initial_lr, max_steps, warmup_steps=0, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        denom = jnp.sqrt(jnp.maximum((step + 1.0) / max(warmup_steps + 1, 1), 1.0))
        return jnp.where(step < warmup_steps, warm, jnp.maximum(initial_lr / denom, min_lr))

    return schedule


def polynomial_decay_annealing(
    initial_lr, max_steps, warmup_steps=0, min_lr=0.0, power=1.0, cycle=False
):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        p = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        ann = (initial_lr - min_lr) * (1.0 - p) ** power + min_lr
        return jnp.where(step < warmup_steps, warm, ann)

    return schedule


def noam_hold_annealing(
    initial_lr, max_steps, warmup_steps=0, hold_steps=0, decay_rate=0.5, min_lr=0.0
):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / max(warmup_steps + 1, 1)
        hold_until = warmup_steps + hold_steps
        decay = initial_lr * (hold_until / jnp.maximum(step, 1.0)) ** decay_rate
        out = jnp.where(step < warmup_steps, warm, initial_lr)
        out = jnp.where(step > hold_until, jnp.maximum(decay, min_lr), out)
        return out

    return schedule


def exponential_lr(initial_lr, max_steps=None, gamma=0.999, min_lr=0.0):
    """Per-step exponential decay (torch ExponentialLR, registered in the
    reference's EPOCH/STEP scheduler tables lr_schedulers.py:1133-1141)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        return jnp.maximum(initial_lr * gamma**step, min_lr)

    return schedule


def step_lr(initial_lr, max_steps=None, step_size=1000, gamma=0.1, min_lr=0.0):
    """Piecewise-constant decay every `step_size` steps (torch StepLR,
    lr_schedulers.py:1133)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        return jnp.maximum(initial_lr * gamma ** jnp.floor(step / step_size), min_lr)

    return schedule


_SCHEDULES: Dict[str, Callable] = {
    "ExponentialLR": exponential_lr,
    "StepLR": step_lr,
    "NoamAnnealing": noam_annealing,
    "CosineAnnealing": cosine_annealing,
    "WarmupPolicy": warmup_policy,
    "WarmupHoldPolicy": warmup_policy,
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": square_root_annealing,
    "InverseSquareRootAnnealing": inverse_square_root_annealing,
    "PolynomialDecayAnnealing": polynomial_decay_annealing,
    "NoamHoldAnnealing": noam_hold_annealing,
}

_SCHED_NEEDS_MAX_STEPS = {
    "CosineAnnealing",
    "WarmupPolicy",
    "WarmupHoldPolicy",
    "SquareAnnealing",
    "SquareRootAnnealing",
    "InverseSquareRootAnnealing",
    "PolynomialDecayAnnealing",
    "NoamHoldAnnealing",
}


def compute_max_steps(
    max_epochs: int,
    steps_per_epoch: int,
    accumulate_grad_batches: int = 1,
) -> int:
    """lr_schedulers.py:1090 equivalent for our loop."""
    return math.ceil(steps_per_epoch / max(accumulate_grad_batches, 1)) * max_epochs


def get_schedule(
    name: str,
    initial_lr: float,
    max_steps: Optional[int] = None,
    **kwargs,
) -> Callable:
    if name not in _SCHEDULES:
        raise ValueError(f"Unknown scheduler {name!r}; options: {sorted(_SCHEDULES)}")
    kwargs = dict(kwargs)
    kwargs.pop("name", None)
    kwargs.pop("last_epoch", None)  # torch artifact, meaningless here
    if name in _SCHED_NEEDS_MAX_STEPS:
        if max_steps is None:
            raise ValueError(f"{name} needs max_steps")
        kwargs.setdefault("max_steps", max_steps)
    # reference WarmupPolicy semantics (lr_schedulers.py:40-80): warmup_ratio
    # is a fraction of max_steps, mutually exclusive with warmup_steps
    ratio = kwargs.pop("warmup_ratio", None)
    if ratio is not None:
        if kwargs.get("warmup_steps") is not None:
            raise ValueError("pass either warmup_steps or warmup_ratio, not both")
        if max_steps is None:
            raise ValueError("warmup_ratio needs max_steps")
        kwargs["warmup_steps"] = int(float(ratio) * max_steps)
    return _SCHEDULES[name](initial_lr=initial_lr, **kwargs)


# ---------------------------------------------------------------------------
# Optimizers
# ---------------------------------------------------------------------------


def get_optimizer(
    name: str,
    learning_rate,
    betas=(0.9, 0.999),
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    momentum: float = 0.9,
    **_unused,
) -> optax.GradientTransformation:
    name = name.lower()
    b1, b2 = betas
    if name == "sgd":
        return optax.sgd(learning_rate, momentum=momentum)
    if name == "adam":
        opt = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
        if weight_decay:
            # torch.optim.Adam weight_decay is L2 regularization added to grads
            return optax.chain(optax.add_decayed_weights(weight_decay), opt)
        return opt
    if name == "adamw":
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        )
    if name == "adadelta":
        return optax.adadelta(learning_rate)
    if name == "adamax":
        return optax.adamax(learning_rate, b1=b1, b2=b2, eps=eps)
    if name == "adagrad":
        return optax.adagrad(learning_rate)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate, momentum=momentum, eps=eps)
    raise ValueError(f"Unknown optimizer {name!r}")


def build_optimizer(
    optim_cfg: Dict[str, Any],
    steps_per_epoch: Optional[int] = None,
    max_epochs: Optional[int] = None,
    max_steps: Optional[int] = None,
    gradient_clip_val: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build optimizer (+schedule, +clip) from a reference-style optim config:
    {name, lr, betas, weight_decay, sched: {name, warmup_steps, ...}}."""
    cfg = dict(optim_cfg or {})
    sched_cfg = cfg.pop("sched", None)
    name = cfg.pop("name", "adamw")
    lr = float(cfg.pop("lr", 1e-3))
    for k in ("weight_decay", "eps", "momentum"):
        if k in cfg:
            cfg[k] = float(cfg[k])
    if "betas" in cfg:
        cfg["betas"] = tuple(float(x) for x in cfg["betas"])

    if sched_cfg:
        sc = dict(sched_cfg)
        sname = sc.pop("name")
        if max_steps is None and sc.get("max_steps") is not None:
            max_steps = sc.pop("max_steps")
        else:
            sc.pop("max_steps", None)
        if max_steps is None and steps_per_epoch is not None and max_epochs is not None:
            max_steps = compute_max_steps(max_epochs, steps_per_epoch)
        # warmup_ratio -> warmup_steps (lr_schedulers.py:459-478 semantics)
        if sc.get("warmup_ratio") is not None:
            if max_steps is None:
                raise ValueError("warmup_ratio requires max_steps to be resolvable")
            sc["warmup_steps"] = int(float(sc.pop("warmup_ratio")) * max_steps)
        else:
            sc.pop("warmup_ratio", None)
        for k in ("min_lr", "decay_rate", "power"):
            if k in sc:
                sc[k] = float(sc[k])
        learning_rate = get_schedule(sname, initial_lr=lr, max_steps=max_steps, **sc)
    else:
        learning_rate = lr

    opt = get_optimizer(name, learning_rate, **cfg)
    if gradient_clip_val:
        opt = optax.chain(optax.clip_by_global_norm(gradient_clip_val), opt)
    return opt
