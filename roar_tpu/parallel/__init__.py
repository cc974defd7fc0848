"""Device mesh + sharding helpers."""

from roar_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
