"""Parameter-efficient finetuning: freezing masks and adapter optimizers.

The functional answer to the reference's adapter/freeze machinery
(roar/core/classes/mixins/adapter_mixins.py:35-119 and ModelPT's dynamic
layer freezing, modelPT.py:1794+): instead of mutating modules, training is
restricted to a parameter subset with optax.masked; adapters themselves are
bottleneck modules compiled into the graph via `adapter_dim`
(models/transformer.py TransformerLayer).
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import optax


def param_labels(params: Any, trainable_patterns: Sequence[str]) -> Any:
    """Label each leaf 'trainable' if its '/'-joined path matches any regex
    in `trainable_patterns`, else 'frozen'."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    leaves, treedef = tree_flatten_with_path(params)
    regexes = [re.compile(p) for p in trainable_patterns]
    labels = []
    for kp, _ in leaves:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        labels.append(
            "trainable" if any(r.search(path) for r in regexes) else "frozen"
        )
    return tree_unflatten(treedef, labels)


def masked_optimizer(
    optimizer: optax.GradientTransformation,
    params: Any,
    trainable_patterns: Sequence[str],
) -> optax.GradientTransformation:
    """Only parameters matching `trainable_patterns` are updated; everything
    else is frozen (zero update)."""
    labels = param_labels(params, trainable_patterns)
    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, labels
    )


def count_trainable(params: Any, trainable_patterns: Sequence[str]) -> tuple:
    """(n_trainable, n_total) parameter counts."""
    labels = jax.tree_util.tree_leaves(param_labels(params, trainable_patterns))
    leaves = jax.tree_util.tree_leaves(params)
    n_train = sum(l.size for l, lab in zip(leaves, labels) if lab == "trainable")
    n_total = sum(l.size for l in leaves)
    return n_train, n_total
