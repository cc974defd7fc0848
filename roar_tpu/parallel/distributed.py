"""Multi-host initialization and host-level collectives.

Replaces roar/utils/distributed.py:16-41 (`initialize_distributed` NCCL TCP
init) and `gather_objects` with the JAX equivalents (SURVEY.md §5.8):
`jax.distributed.initialize` + multihost utils.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

from roar_tpu.utils.logging import get_logger


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Initialize multi-host JAX.  On TPU pods the arguments are discovered
    from the environment automatically; explicit args support other setups.

    Returns (process_index, process_count, device_count).
    """
    import jax

    explicit = (
        coordinator_address
        or num_processes
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if explicit:
        # multi-process over the CPU backend (tests, CPU clusters) needs a
        # cross-process collectives transport; gloo is XLA:CPU's built-in.
        # Must be set before backend init — harmless no-op on TPU where the
        # platform isn't cpu.
        try:
            if "cpu" in (os.environ.get("JAX_PLATFORMS") or jax.config.jax_platforms or ""):
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax without the option
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("ROAR_AUTO_DISTRIBUTED_INIT", "0") == "1":
        # opt-in: on TPU pods jax.distributed.initialize() self-discovers;
        # default off so single-host runs never probe for a coordinator
        try:
            jax.distributed.initialize()
        except Exception as e:
            get_logger().debug(f"jax.distributed.initialize skipped: {e}")
    info = (jax.process_index(), jax.process_count(), jax.device_count())
    get_logger().info(
        f"distributed: process {info[0]}/{info[1]}, {info[2]} devices total"
    )
    return info


def gather_objects(partial: List[Any], main_rank: Optional[int] = 0) -> Optional[List[Any]]:
    """All-gather a list of picklable objects across hosts
    (utils/distributed.py:44+ analogue).  Returns the concatenated list on
    every host (or only on `main_rank` if set; others get None).

    Objects travel as pickled uint8 buffers: process_allgather only moves
    arrays (jax 0.9 rejects strings/objects outright), so each host pickles
    its list, pads to the allgathered max length, and unpickles the rest —
    the torch.distributed.all_gather_object trick, XLA-transported."""
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return list(partial)
    from jax.experimental import multihost_utils

    payload = pickle.dumps(list(partial))
    n = np.asarray([len(payload)], np.int64)
    sizes = multihost_utils.process_allgather(n, tiled=False).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = multihost_utils.process_allgather(buf, tiled=False)
    out: List[Any] = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(bytes(np.asarray(bufs[i])[: int(sizes[i])])))
    if main_rank is not None and jax.process_index() != main_rank:
        return None
    return out
