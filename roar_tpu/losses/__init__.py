"""Loss functions."""

from roar_tpu.losses.fastpitch_losses import (  # noqa: F401
    duration_loss,
    energy_loss,
    mel_loss,
    pitch_loss,
)
from roar_tpu.ops.forward_sum import bin_loss, forward_sum_loss  # noqa: F401
