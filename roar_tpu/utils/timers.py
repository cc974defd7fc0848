"""Named wall-clock timers with optional device sync.

Re-design of roar/utils/timers.py:9-130 `NamedTimer` (used by the
exp_manager TimingCallback for train_step_timing): the CUDA-sync option
becomes a block-on-device-fetch option.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional


class NamedTimer:
    def __init__(self, reduction: str = "mean", sync_device: bool = False):
        self.reduction = reduction
        self.sync_device = sync_device
        self._starts: Dict[str, float] = {}
        self._records: Dict[str, list] = defaultdict(list)

    def _sync(self):
        if self.sync_device:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass

    def start(self, name: str = "") -> None:
        self._sync()
        self._starts[name] = time.perf_counter()

    def stop(self, name: str = "") -> float:
        self._sync()
        dt = time.perf_counter() - self._starts.pop(name)
        self._records[name].append(dt)
        return dt

    def get(self, name: str = "") -> Optional[float]:
        recs = self._records.get(name)
        if not recs:
            return None
        if self.reduction == "mean":
            return sum(recs) / len(recs)
        if self.reduction == "sum":
            return sum(recs)
        return recs[-1]

    def reset(self, name: Optional[str] = None) -> None:
        if name is None:
            self._records.clear()
        else:
            self._records.pop(name, None)

    def export(self) -> Dict[str, float]:
        return {k: self.get(k) for k in self._records}
