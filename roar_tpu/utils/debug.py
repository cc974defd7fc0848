"""Debug introspection: activation and gradient norms.

Re-design of roar/utils/debug_hook.py:6-180 (forward/backward hooks logging
activation/grad norms): flax `capture_intermediates` gives per-module
activations functionally, and gradient norms come from the grad pytree —
no mutation hooks needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp


def activation_norms(
    module, variables, *args, filter_fn: Callable = None, **kwargs
) -> Dict[str, float]:
    """Run a flax module capturing intermediates; return L2 norm per module
    output path (the forward-hook analogue)."""
    _, state = module.apply(
        variables, *args,
        capture_intermediates=filter_fn or True,
        mutable=["intermediates"],
        **kwargs,
    )

    out: Dict[str, float] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, tuple):
            for i, v in enumerate(node):
                walk(v, prefix)
        elif hasattr(node, "shape"):
            out[prefix] = float(jnp.linalg.norm(node.astype(jnp.float32)))

    walk(state["intermediates"], "")
    return out


def grad_norms(grads: Any) -> Dict[str, float]:
    """Per-leaf gradient L2 norms keyed by parameter path (the backward-hook
    analogue)."""
    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(grads)
    out = {}
    for kp, v in leaves:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[path] = float(jnp.linalg.norm(v.astype(jnp.float32)))
    return out


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable function with `jax.experimental.checkify` NaN /
    div-by-zero / out-of-bounds-index guards (the sanitizer analogue for
    jitted compute, SURVEY §5.2 build note).

    Returns a function with the same signature that raises
    `jax.experimental.checkify.JaxRuntimeError` (with the failing check's
    location) instead of silently propagating NaNs.  Intended for debug
    runs — the checks add overhead, so don't wrap the production step.
    """
    from jax.experimental import checkify

    errors = errors if errors is not None else (
        checkify.float_checks | checkify.index_checks | checkify.div_checks
    )
    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
