"""Infra utilities (the reference's L0 layer, roar/utils/*)."""

from roar_tpu.utils.app_state import AppState  # noqa: F401
from roar_tpu.utils.logging import get_logger, log_once  # noqa: F401
from roar_tpu.utils.timers import NamedTimer  # noqa: F401
