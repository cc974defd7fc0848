"""Training engine: optimizers, trainer loop, experiment management,
checkpoint bundles."""

from roar_tpu.training.exp_manager import ExpManager, MetricsLogger, PreemptionHandler  # noqa: F401
from roar_tpu.training.optim import (  # noqa: F401
    build_optimizer,
    compute_max_steps,
    get_optimizer,
    get_schedule,
)
from roar_tpu.training.save_restore import restore_from, save_to  # noqa: F401
from roar_tpu.training.trainer import (  # noqa: F401
    TrainState,
    Trainer,
    create_train_state,
    make_train_step,
)
