"""Training engine: TrainState, jitted+sharded steps, the fit loop.

A small explicit engine replacing the reference's
PyTorch-Lightning + ModelPT lattice (SURVEY.md §7 architecture stance):

- TrainState is an explicit pytree (params, opt_state, step, optional EMA).
- One jitted train_step per task; the batch is sharded over the mesh 'data'
  axis and XLA inserts the gradient all-reduce (replacing DDP/NCCL,
  SURVEY.md §5.8).
- EMA is a shadow pytree updated inside the jitted step (the functional
  analogue of EMAOptimizer, roar/collections/common/callbacks/ema.py:14-370).
- Gradient accumulation is a lax-free Python micro-batch loop at the caller
  level (JETS-style manual optimization, models/jets.py:616-694).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from roar_tpu.parallel.mesh import replicate, shard_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    extra: Optional[Any] = None  # mutable collections (e.g. spectral norm stats)


def create_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    extra: Optional[Any] = None,
) -> TrainState:
    # One jitted program for the whole state init: eager optax.init + EMA
    # copy dispatch one tiny XLA compile per distinct parameter shape
    # (~0.4 s each, never persistent-cached because each is <2 s), which
    # dominated CLI cold-start (~40 s for a ~120-shape model).
    @jax.jit
    def _init(p):
        ema = jax.tree_util.tree_map(jnp.copy, p) if ema_decay else None
        return jnp.zeros((), jnp.int32), optimizer.init(p), ema

    step, opt_state, ema_params = _init(params)
    return TrainState(
        step=step,
        params=params,
        opt_state=opt_state,
        ema_params=ema_params,
        extra=extra,
    )


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating-point leaves of a pytree to `dtype`."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _freeze_flag(step, spec):
    """Traced bool: is a module frozen at (1-indexed) update `step`?

    Matches the reference schedule semantics (modelPT.py:1818-1841
    on_train_batch_start dynamic freezing): scalar N -> frozen while
    step <= N (N == -1: forever); [start, end] -> frozen while
    start <= step <= end (end == -1: open-ended).
    """
    if isinstance(spec, (list, tuple)):
        if len(spec) != 2:
            raise ValueError(
                "freeze_updates modules list cannot have more than two elements"
            )
        start, end = spec
        return jnp.logical_and(step >= start, jnp.logical_or(step <= end, end == -1))
    return jnp.logical_or(step <= spec, spec == -1)


def _freeze_specs(tree, modules: Dict[str, Any]):
    """(treedef, per-leaf schedule list): a module name matches a leaf when
    its '/'-separated components appear as a CONTIGUOUS run of the leaf's
    path components (so 'proj' matches the top-level proj head but not
    key_proj/query_proj); when several names match a leaf the most specific
    (longest) wins.  Unknown module names error, like the reference's
    getattr (modelPT.py:1824); None = never frozen."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [
        tuple(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat
    ]

    def matches(name_parts, path):
        n = len(name_parts)
        return any(path[i : i + n] == name_parts for i in range(len(path) - n + 1))

    name_parts = {
        name: tuple(name.split("/")) for name in modules
    }
    for name, parts in name_parts.items():
        if not any(matches(parts, p) for p in paths):
            raise ValueError(
                f"freeze_updates module '{name}' matches no parameter path; "
                f"top-level params: {sorted({p[0] for p in paths})}"
            )
    specs = []
    for p in paths:
        best = None
        best_len = -1
        for name, parts in name_parts.items():
            if len(parts) > best_len and matches(parts, p):
                best, best_len = modules[name], len(parts)
        specs.append(best)
    return treedef, specs


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    donate: bool = True,
    precision: Optional[str] = None,
    freeze_updates: Optional[Dict[str, Any]] = None,
    steps_per_update: int = 1,
):
    """Build a jitted train step from `loss_fn(params, batch, rng, epoch) ->
    (loss, metrics)`.

    precision='bf16' runs the forward/backward with bfloat16 parameter and
    batch casts while keeping fp32 master weights and optimizer state — the
    TPU analogue of the reference's `precision: 16`/`bf16-mixed` trainer
    settings (fastpitch yaml:232, jets yaml:248); bf16 needs no loss scaling.

    freeze_updates implements the reference's dynamic freezing
    (`model.freeze_updates.modules: {name: N | [start, end]}`,
    modelPT.py:1779-1841) the TPU way: the freeze window is evaluated on the
    TRACED step inside the jitted program and masks both the gradient (so
    optimizer moments stay still) and the update (so the parameter provably
    does not move) — freeze/unfreeze transitions cost zero recompiles.
    """
    use_bf16 = precision in ("bf16", "bfloat16", "bf16-mixed")
    # enabled defaults False to match the reference (modelPT.py on_train_start
    # reads freeze_updates.get('enabled', False)) — a ported config carrying
    # only `modules:` stays inert here exactly as it does upstream.
    freeze_modules = dict((freeze_updates or {}).get("modules") or {}) if (
        freeze_updates and freeze_updates.get("enabled", False)
    ) else {}

    def cast_in(params, batch):
        if not use_bf16:
            return params, batch
        return cast_floating(params, jnp.bfloat16), cast_floating(batch, jnp.bfloat16)

    def step_fn(state: TrainState, batch, rng, epoch):
        def compute_loss(params):
            p, b = cast_in(params, batch)
            return loss_fn(p, b, rng, epoch)

        (loss, metrics), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        if use_bf16:
            grads = cast_floating(grads, jnp.float32)
        if freeze_modules:
            # reference: trainer.global_step + 1 counts OPTIMIZER updates;
            # with gradient accumulation state.step counts micro-batches, so
            # divide by steps_per_update (optax.MultiSteps k) to keep the
            # freeze window measured in updates
            num_updates = state.step // steps_per_update + 1
            treedef, specs = _freeze_specs(grads, freeze_modules)
            keeps = [
                None
                if spec is None
                else 1.0 - _freeze_flag(num_updates, spec).astype(jnp.float32)
                for spec in specs
            ]

            def mask_frozen(tree):
                leaves = treedef.flatten_up_to(tree)
                return jax.tree_util.tree_unflatten(
                    treedef,
                    [l if k is None else l * k for l, k in zip(leaves, keeps)],
                )

            grads = mask_frozen(grads)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        if freeze_modules:
            updates = mask_frozen(updates)
            # keep frozen params' optimizer slots (Adam mu/nu, SGD trace, ...)
            # untouched during the window — the reference's requires_grad=False
            # path never feeds the param to the optimizer at all, so its
            # moments do not decay; emulate that by reverting every
            # param-structured subtree of the opt state to its old value on
            # frozen leaves (keep is a traced 0/1 scalar per leaf)
            params_struct = jax.tree_util.tree_structure(grads)

            def _is_param_tree(t):
                try:
                    return jax.tree_util.tree_structure(t) == params_struct
                except Exception:
                    return False

            def _merge_param_tree(new_t, old_t):
                new_leaves = treedef.flatten_up_to(new_t)
                old_leaves = treedef.flatten_up_to(old_t)
                return jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        n if k is None else jnp.where(k > 0.5, n, o)
                        for n, o, k in zip(new_leaves, old_leaves, keeps)
                    ],
                )

            new_flat, opt_td = jax.tree_util.tree_flatten(
                new_opt_state, is_leaf=_is_param_tree
            )
            old_flat = opt_td.flatten_up_to(state.opt_state)
            new_opt_state = jax.tree_util.tree_unflatten(
                opt_td,
                [
                    _merge_param_tree(n, o) if _is_param_tree(n) else n
                    for n, o in zip(new_flat, old_flat)
                ],
            )
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params,
                new_params,
            )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


@dataclasses.dataclass
class Trainer:
    """Minimal epoch/step loop with mesh-sharded batches.

    The task supplies loss_fn; data supplies an iterator of numpy batches.
    """

    loss_fn: Callable
    optimizer: optax.GradientTransformation
    mesh: Optional[Any] = None
    ema_decay: Optional[float] = None
    seed: int = 0
    log_every: int = 50
    callbacks: Tuple = ()
    precision: Optional[str] = None
    accumulate_grad_batches: int = 1
    tp_rules: Optional[Any] = None  # parallel/tp.py rules: shard params over 'model'
    # Stop condition, matching the reference's `trainer.max_steps`
    # (Lightning Trainer arg in every shipped YAML, e.g. jets.yaml trainer
    # block): training halts once the global step count reaches it, even
    # mid-epoch.  Counted host-side to avoid a device sync per step.
    max_steps: Optional[int] = None
    # Dynamic freezing schedules (ref model.freeze_updates, modelPT.py:1779):
    # {"enabled": bool, "modules": {param-path-substring: N | [start, end]}}
    freeze_updates: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        opt = self.optimizer
        if self.accumulate_grad_batches > 1:
            # micro-batch gradient accumulation (JETS-style manual optim,
            # models/jets.py:616-694) as an optimizer wrapper
            opt = optax.MultiSteps(opt, every_k_schedule=self.accumulate_grad_batches)
            self.optimizer = opt
        self._train_step = make_train_step(
            self.loss_fn, self.optimizer, self.ema_decay, precision=self.precision,
            freeze_updates=self.freeze_updates,
            steps_per_update=max(self.accumulate_grad_batches, 1),
        )
        self._rng = jax.random.PRNGKey(self.seed)
        self._jitted_evals: Dict[Any, Callable] = {}
        self.reached_max_steps = False

    def init_state(self, params, extra=None) -> TrainState:
        if self.mesh is not None and self.tp_rules is not None and self.mesh.shape.get("model", 1) > 1:
            from roar_tpu.parallel.tp import shard_params

            params = shard_params(params, self.mesh, self.tp_rules)
            state = create_train_state(params, self.optimizer, self.ema_decay, extra)
            # opt state / ema inherit the params' shardings lazily; replicate
            # only the scalar step
            return state
        state = create_train_state(params, self.optimizer, self.ema_decay, extra)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def _place(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    def run_epoch(
        self,
        state: TrainState,
        batches: Iterable[Dict[str, np.ndarray]],
        epoch: int = 0,
        logger=None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        last_metrics: Dict[str, float] = {}
        t0 = time.perf_counter()
        start_step = int(jax.device_get(state.step)) if self.max_steps else 0
        for i, batch in enumerate(batches):
            self._rng, step_rng = jax.random.split(self._rng)
            state, metrics = self._train_step(
                state, self._place(batch), step_rng, epoch
            )
            if logger is not None and (i % self.log_every == 0):
                host = {k: float(v) for k, v in metrics.items()}
                host["train_step_timing"] = (time.perf_counter() - t0) / (i + 1)
                logger.log_metrics(host, step=int(jax.device_get(state.step)))
            last_metrics = metrics
            for cb in self.callbacks:
                cb(state, metrics)
            if self.max_steps is not None and start_step + i + 1 >= self.max_steps:
                self.reached_max_steps = True
                break
        return state, {k: float(v) for k, v in last_metrics.items()}

    def evaluate(
        self,
        eval_fn: Callable,
        state: TrainState,
        batches: Iterable[Dict[str, np.ndarray]],
        use_ema: bool = False,
        extra_args: Tuple = (),
        jit: bool = True,
    ) -> Dict[str, float]:
        """Average eval_fn(params, batch, *extra_args) metrics over batches.

        The engine enforces compiled validation: a non-jitted eval_fn is
        jax.jit-ed here and cached per function object, so validation never
        runs op-by-op (the reference's Lightning validation loop is always
        inside its compiled module graph).  Pass per-epoch scalars (e.g. the
        epoch number) through ``extra_args`` as traced values instead of
        re-wrapping eval_fn in a fresh closure each epoch — a fresh closure
        defeats both this cache and jax.jit's own trace cache.  ``jit=False``
        opts out for eval fns with host-side effects."""
        if jit and not isinstance(eval_fn, jax.stages.Wrapped):
            jitted = self._jitted_evals.get(eval_fn)
            if jitted is None:
                if len(self._jitted_evals) >= 8:
                    # fresh closure per call defeats both this cache and
                    # jax.jit's trace cache (a new compile per epoch and an
                    # executable held alive per entry) — surface it and
                    # drop the oldest entry to bound memory
                    import warnings

                    warnings.warn(
                        "Trainer.evaluate keeps receiving NEW eval_fn "
                        "objects; pass one stable function (per-epoch "
                        "scalars go through extra_args) to avoid a "
                        "recompile per call."
                    )
                    self._jitted_evals.pop(next(iter(self._jitted_evals)))
                jitted = self._jitted_evals[eval_fn] = jax.jit(eval_fn)
            eval_fn = jitted
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        totals: Dict[str, float] = {}
        n = 0
        for batch in batches:
            metrics = eval_fn(params, self._place(batch), *extra_args)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}
