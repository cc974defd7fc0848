"""Process-global run state.

Re-design of roar/utils/app_state.py:15-330 `AppState`: the reference's
vestigial NeMo TP/PP fields become real mesh facts — world size / ranks come
from jax, parallel sizes from the active Mesh (SURVEY.md §2.10 note).
"""

from __future__ import annotations

import threading
from typing import Any, Dict, Optional


class _Singleton(type):
    _instances: Dict[type, Any] = {}
    _lock = threading.Lock()

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            with cls._lock:
                if cls not in cls._instances:
                    cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


class AppState(metaclass=_Singleton):
    def __init__(self):
        self.mesh = None  # active jax.sharding.Mesh
        self.exp_dir: Optional[str] = None
        self.checkpoint_name: Optional[str] = None
        self.log_dir: Optional[str] = None

    # -- distributed facts (live from jax, not cached) -------------------
    @property
    def world_size(self) -> int:
        import jax

        return jax.process_count()

    @property
    def global_rank(self) -> int:
        import jax

        return jax.process_index()

    @property
    def device_count(self) -> int:
        import jax

        return jax.device_count()

    @property
    def local_device_count(self) -> int:
        import jax

        return jax.local_device_count()

    # -- mesh-derived parallel sizes ------------------------------------
    @property
    def data_parallel_size(self) -> Optional[int]:
        return self.mesh.shape.get("data") if self.mesh is not None else None

    @property
    def tensor_model_parallel_size(self) -> Optional[int]:
        return self.mesh.shape.get("model") if self.mesh is not None else None
