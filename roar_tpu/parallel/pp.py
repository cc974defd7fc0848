"""Pipeline parallelism: GPipe-style microbatching over a 'pipe' mesh axis.

The reference has no working pipeline parallelism — only vestigial AppState
PP fields (roar/utils/app_state.py:130-160, SURVEY.md §2.10).  This is the
TPU-native generalization: layers are stacked on a leading dim and sharded
over the mesh 'pipe' axis, every device runs the SAME program (SPMD), and
activations rotate stage-to-stage with `lax.ppermute` over ICI.  The
schedule is the classic S+M-1-tick GPipe loop expressed as `lax.scan`, so
the whole pipeline (including its bubble) is one XLA program that autodiffs
end-to-end — `jax.grad` through `ppermute` yields the reverse-direction
pipeline for the backward pass automatically.

Layout contract:
- `params`: pytree whose leaves carry a leading `n_layers` dim (n_layers
  divisible by the pipe axis size S).  Under `in_specs=P('pipe')` each
  device holds `n_layers // S` consecutive layers = one stage.
- `microbatches`: [M, mb, ...] — the batch split into M microbatches
  (shard the mb dim over 'data' for combined dp x pp).
- `stage_fn(stage_params, x) -> y`: applies one stage's layer stack to one
  microbatch activation (typically an inner `lax.scan` over the stage's
  layers); must preserve x's shape/dtype.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8: keyword-only API, replication checking renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _spmd_pipeline(
    stage_params: Any,
    microbatches: jnp.ndarray,
    *,
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    n_stages: int,
    axis_name: str,
) -> jnp.ndarray:
    """Per-device body under shard_map: the S+M-1 tick GPipe schedule.

    Every device computes `stage_fn` every tick (idle ticks are the
    pipeline bubble — the SPMD cost model); activations rotate i -> i+1
    after each tick.  Returns the [M, mb, ...] outputs, replicated across
    stages via a masked psum of the last stage's buffer.
    """
    stage = lax.axis_index(axis_name)
    n_micro = microbatches.shape[0]

    state = jnp.zeros_like(microbatches[0])
    outputs = jnp.zeros_like(microbatches)
    rotate = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (clamped once the feed runs dry);
        # later stages consume the activation rotated in last tick
        feed = microbatches[jnp.minimum(t, n_micro - 1)]
        x_in = jnp.where(stage == 0, feed, state)
        y = stage_fn(stage_params, x_in)
        # the last stage finishes microbatch t-(S-1) at tick t
        out_idx = t - (n_stages - 1)
        write = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
        updated = lax.dynamic_update_index_in_dim(
            outputs, y, jnp.maximum(out_idx, 0), axis=0
        )
        outputs = jnp.where(write, updated, outputs)
        state = lax.ppermute(y, axis_name, rotate)
        return (state, outputs), None

    (state, outputs), _ = lax.scan(
        tick, (state, outputs), jnp.arange(n_micro + n_stages - 1)
    )
    # only the last stage's buffer holds real data; the masked psum makes
    # the result genuinely replicated over 'pipe' (one all-reduce of the
    # output activations — negligible next to the pipeline compute)
    return lax.psum(
        jnp.where(stage == n_stages - 1, outputs, jnp.zeros_like(outputs)),
        axis_name,
    )


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: Any,
    microbatches: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "pipe",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Pipelined forward of a layer stack over `mesh[axis_name]`.

    params leaves: leading dim n_layers (divisible by the pipe axis size).
    microbatches: [M, mb, ...]; with `data_axis`, dim 1 (mb) is sharded over
    that mesh axis for combined dp x pp.  Returns [M, mb, ...] activations
    after all n_layers, replicated over 'pipe'.
    """
    n_stages = mesh.shape[axis_name]
    data_spec = P(None, data_axis) if data_axis else P()
    body = shard_map(
        functools.partial(
            _spmd_pipeline,
            stage_fn=stage_fn,
            n_stages=n_stages,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(axis_name), data_spec),
        out_specs=data_spec,
        check_rep=False,  # replication over 'pipe' is established by the masked psum
    )
    return body(params, microbatches)


def split_microbatches(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    """[B, ...] -> [M, B//M, ...] microbatch view (B divisible by n_micro)."""
    if x.shape[0] % n_micro:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by n_micro={n_micro}"
        )
    return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])


def stack_layer_params(per_layer: list) -> Any:
    """Stack a list of per-layer param pytrees into one pytree with a
    leading n_layers dim (the layout `pipeline_apply` shards over 'pipe')."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)


def scan_stage(apply_one: Callable[[Any, jnp.ndarray], jnp.ndarray]):
    """Build a stage_fn that lax.scans `apply_one(layer_params, x) -> x`
    over this stage's stacked layer params."""

    def stage_fn(stage_params, x):
        def body(h, layer_params):
            return apply_one(layer_params, h), None

        h, _ = lax.scan(body, x, stage_params)
        return h

    return stage_fn
