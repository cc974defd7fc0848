"""Local multirun launcher: sweep over override combinations.

Re-design of the reference's custom Hydra ProcessLauncher
(roar/core/utils/process_launcher/launcher.py:35-370): expands sweep
overrides (`key=a,b,c`) into jobs and runs them as local subprocesses,
optionally in parallel with per-job environment (the per-job GPU assignment
becomes per-job env, e.g. separate JAX coordinator ports).
"""

from __future__ import annotations

import itertools
import subprocess
import sys
from typing import Dict, List, Optional, Sequence, Tuple


def expand_sweep(overrides: Sequence[str]) -> List[List[str]]:
    """`["a=1,2", "b=x"]` -> [["a=1","b=x"], ["a=2","b=x"]]."""
    choices: List[List[str]] = []
    for ov in overrides:
        key, _, vals = ov.partition("=")
        choices.append([f"{key}={v}" for v in vals.split(",")])
    return [list(combo) for combo in itertools.product(*choices)]


def launch(
    script: str,
    sweep_overrides: Sequence[str],
    base_args: Sequence[str] = (),
    max_parallel: int = 1,
    env_per_job: Optional[Sequence[Dict[str, str]]] = None,
) -> List[int]:
    """Run `python script <base_args> <job overrides>` for each sweep combo.

    Returns the list of return codes (same order as jobs).
    """
    import os

    jobs = expand_sweep(sweep_overrides)
    codes: List[Optional[int]] = [None] * len(jobs)
    running: List[Tuple[int, subprocess.Popen]] = []

    def reap(block: bool):
        for idx, proc in list(running):
            rc = proc.wait() if block else proc.poll()
            if rc is not None:
                codes[idx] = rc
                running.remove((idx, proc))
        return len(running)

    for i, job in enumerate(jobs):
        while reap(False) >= max_parallel:
            reap(True)
        env = dict(os.environ)
        if env_per_job and i < len(env_per_job):
            env.update(env_per_job[i])
        cmd = [sys.executable, script, *base_args, *job]
        print(f"[multirun] job {i}: {' '.join(job)}")
        running.append((i, subprocess.Popen(cmd, env=env)))
    while reap(True):
        pass
    return [c if c is not None else -1 for c in codes]
