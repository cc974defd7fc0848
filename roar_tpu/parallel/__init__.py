"""Device mesh + sharding helpers."""

from roar_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
from roar_tpu.parallel.tp import (  # noqa: F401
    FFT_TP_RULES,
    GPT_TP_RULES,
    VOCODER_TP_RULES,
    shard_params,
    tp_param_shardings,
)
