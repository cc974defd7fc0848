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
from roar_tpu.training.convert import apply_mapped_params, map_fastpitch_state_dict  # noqa: F401
from roar_tpu.training.finetune import count_trainable, masked_optimizer, param_labels  # noqa: F401
from roar_tpu.training.gan import GANTrainState, create_gan_state, make_gan_train_step  # noqa: F401
