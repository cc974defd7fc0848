"""Device mesh construction and batch/param sharding.

This replaces the reference's NCCL/DDP layer (SURVEY.md §2.10, §5.8): data
parallelism is a `NamedSharding(P('data', ...))` on the batch dimension of a
('data', 'model') mesh; gradient all-reduce is emitted by XLA inside the
jitted update; the 'model' axis is reserved for tensor-parallel sharding of
the FFT/Conformer blocks (a config knob, unlike the reference's vestigial
AppState TP fields).  Multi-host initialization is `jax.distributed` +
per-host data shards via LengthBucketBatchSampler(num_shards=...).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    data=None takes all remaining devices after the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_parallel_mesh(devices=None) -> Mesh:
    return make_mesh(model=1, devices=devices)


def make_hybrid_mesh(
    num_slices: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over a multi-slice (DCN-connected) topology.

    Multi-slice TPU jobs see every chip in `jax.devices()`, but only chips
    within a slice share ICI; slices talk over the much slower DCN.  The
    scaling recipe (SURVEY.md §5.8): keep the model axis inside a slice and
    order the data axis slice-major, so XLA lowers the gradient all-reduce
    hierarchically — reduce-scatter over ICI within each slice, a small
    all-reduce over DCN between slice peers, all-gather back over ICI.
    The returned mesh keeps the same ('data', 'model') axis names as
    `make_mesh`, so every downstream `P('data')` sharding and TP rule is
    unchanged; only the device order differs.

    num_slices=None autodetects from `device.slice_index` (present on
    multi-slice TPU backends); on a single slice this degrades to
    `make_mesh` exactly.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_slices is None:
        slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
        num_slices = len(slice_ids)
    if num_slices <= 1:
        return make_mesh(model=model, devices=devices)
    if n % num_slices != 0:
        raise ValueError(f"{n} devices not divisible by {num_slices} slices")
    per_slice = n // num_slices
    if per_slice % model != 0:
        raise ValueError(
            f"model={model} must fit inside one slice ({per_slice} devices); "
            "a model axis spanning DCN would put tensor-parallel collectives "
            "on the slow cross-slice links"
        )
    if all(hasattr(d, "slice_index") for d in devices):
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (per_slice // model, model), (num_slices, 1), devices
        )
    else:
        # emulation path (CPU tests): contiguous blocks of n/num_slices
        # devices stand in for slices; slice-major data ordering
        grid = np.asarray(devices).reshape(num_slices * (per_slice // model), model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree of [B, ...] arrays with batch sharded over 'data'.

    Non-numeric leaves (e.g. the audio_filepaths list some collates carry
    for artifact logging) are dropped — they have no device representation
    and the jitted steps never read them.

    A ragged batch (B not divisible by the 'data' axis — e.g. the final
    batch of an epoch under drop_last=False) is padded by duplicating the
    last example, the same semantics as torch's DistributedSampler wrapping
    indices to make the epoch evenly divisible (the reference's DDP path).
    Duplicates slightly overweight that example in the step's mean loss;
    exact epoch metrics come from the full (non-ragged) batches."""
    n_data = mesh.shape["data"]
    if isinstance(batch, dict):
        batch = {
            k: v
            for k, v in batch.items()
            if not (
                isinstance(v, (list, tuple)) and v and isinstance(v[0], str)
            )
            and not isinstance(v, str)
            and not (
                isinstance(v, np.ndarray) and not np.issubdtype(v.dtype, np.number)
                and not np.issubdtype(v.dtype, np.bool_)
            )
        }

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_data != 0:
            pad = n_data - x.shape[0] % n_data
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
