"""Experiment management: dirs, logging, checkpoints, resume, preemption.

Re-design of roar/utils/exp_manager.py:206-976 and the callbacks it wires:
- experiment directory layout (exp_dir/name/version)
- metric logging: JSONL always; TensorBoard/W&B when importable
  (exp_manager.py:394-418 logger fan-out)
- orbax checkpoints with top-k bookkeeping + `*last` semantics
  (utils/callbacks/roar_model_checkpoint.py:19-250)
- resume_if_exists (exp_manager.py:530-618)
- PreemptionHandler: SIGTERM -> save + graceful stop
  (utils/callbacks/preemption.py:10-90)
- wall-clock budget (StatelessTimer analogue, exp_manager.py:917-928)
"""

from __future__ import annotations

import dataclasses
import json
import signal
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class MetricsLogger:
    """JSONL metrics log + optional TensorBoard / Weights&Biases / MLflow /
    DLLogger fan-out.

    Mirrors the reference logger fan-out (exp_manager.py:394-418,758-834):
    JSONL is always on; each backend is enabled per flag and degrades to a
    no-op when its package is missing (wandb/mlflow/dllogger are not in
    this image)."""

    def __init__(
        self,
        log_dir: Path,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_kwargs: Optional[Dict] = None,
        use_mlflow: bool = False,
        mlflow_kwargs: Optional[Dict] = None,
        use_dllogger: bool = False,
        dllogger_kwargs: Optional[Dict] = None,
        use_clearml: bool = False,
        clearml_kwargs: Optional[Dict] = None,
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a", encoding="utf-8")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                kw = dict(wandb_kwargs or {})
                kw.setdefault("dir", str(self.log_dir))
                self._wandb = wandb.init(**kw)
            except Exception:
                self._wandb = None
        self._mlflow = None
        if use_mlflow:
            try:
                import mlflow  # type: ignore

                kw = dict(mlflow_kwargs or {})
                if kw.get("tracking_uri"):
                    mlflow.set_tracking_uri(kw["tracking_uri"])
                if kw.get("experiment_name"):
                    mlflow.set_experiment(kw["experiment_name"])
                mlflow.start_run(run_name=kw.get("run_name"))
                self._mlflow = mlflow
            except Exception:
                self._mlflow = None
        self._dllogger = None
        if use_dllogger:
            try:
                import dllogger  # type: ignore
                from dllogger import JSONStreamBackend, Verbosity

                kw = dict(dllogger_kwargs or {})
                path = kw.get("json_file", str(self.log_dir / "dllogger.json"))
                dllogger.init(backends=[JSONStreamBackend(Verbosity.DEFAULT, path)])
                self._dllogger = dllogger
            except Exception:
                self._dllogger = None

        self._clearml = None
        if use_clearml:
            try:
                from clearml import Task  # type: ignore

                kw = dict(clearml_kwargs or {})
                self._clearml = Task.init(
                    project_name=kw.get("project_name", "roar_tpu"),
                    task_name=kw.get("task_name", "run"),
                ).get_logger()
            except Exception:
                self._clearml = None

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()}, step=step)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {k: float(v) for k, v in metrics.items()}, step=step
            )
        if self._dllogger is not None:
            self._dllogger.log(step=step, data={k: float(v) for k, v in metrics.items()})
        if self._clearml is not None:
            for k, v in metrics.items():
                self._clearml.report_scalar(k, k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._mlflow is not None:
            self._mlflow.end_run()
        if self._dllogger is not None:
            self._dllogger.flush()


@dataclasses.dataclass
class EarlyStopping:
    """Stop training when a monitored validation metric stops improving.

    Mirrors the reference's EarlyStoppingParams defaults
    (roar/utils/exp_manager.py:125-139, wired at :434-436): monitor a
    `val_*` metric, `min`/`max` mode, `min_delta` improvement threshold,
    `patience` counted in validation rounds, and stop on non-finite values
    when `check_finite`.
    """

    monitor: str = "val_loss"
    mode: str = "min"
    min_delta: float = 0.001
    patience: int = 10
    check_finite: bool = True
    verbose: bool = True

    def __post_init__(self):
        if self.mode not in ("min", "max"):
            raise ValueError(f"EarlyStopping mode must be min|max, got {self.mode!r}")
        self.best: Optional[float] = None
        self.wait = 0
        self.stopped = False

    def update(self, metrics: Dict[str, float]) -> bool:
        """Feed one validation round's metrics; returns True to stop."""
        if self.monitor not in metrics:
            return self.stopped
        value = float(metrics[self.monitor])
        if self.check_finite and not np.isfinite(value):
            self.stopped = True
        else:
            improved = self.best is None or (
                value < self.best - self.min_delta
                if self.mode == "min"
                else value > self.best + self.min_delta
            )
            if improved:
                self.best = value
                self.wait = 0
            else:
                self.wait += 1
                if self.wait >= self.patience:
                    self.stopped = True
        if self.stopped and self.verbose:
            from roar_tpu.utils.logging import get_logger

            get_logger().info(
                f"Early stopping: {self.monitor}={value:.6g} "
                f"(best {self.best}, patience {self.wait}/{self.patience})"
            )
        return self.stopped


class PreemptionHandler:
    """SIGTERM/SIGINT -> set flag; the train loop checks it per step and
    saves before exit (preemption.py:10-90 semantics, no rank broadcast
    needed: every JAX host receives the signal from the scheduler)."""

    def __init__(self):
        self.should_stop = False
        self._orig = {}

    def install(self):
        for sig in (signal.SIGTERM,):
            self._orig[sig] = signal.signal(sig, self._handler)
        return self

    def _handler(self, signum, frame):
        self.should_stop = True

    def uninstall(self):
        for sig, h in self._orig.items():
            signal.signal(sig, h)


@dataclasses.dataclass
class ExpManager:
    """Experiment dirs + logger + checkpoint manager + resume."""

    exp_dir: str
    name: str = "default"
    version: Optional[str] = None
    resume_if_exists: bool = False
    resume_ignore_no_checkpoint: bool = True
    max_to_keep: int = 3
    use_tensorboard: bool = True
    use_wandb: bool = False
    wandb_kwargs: Optional[Dict] = None
    use_mlflow: bool = False
    mlflow_kwargs: Optional[Dict] = None
    use_dllogger: bool = False
    dllogger_kwargs: Optional[Dict] = None
    use_clearml: bool = False
    clearml_kwargs: Optional[Dict] = None
    max_time_seconds: Optional[float] = None
    early_stopping: Optional[Dict] = None  # EarlyStopping kwargs, or None
    config: Optional[Dict] = None  # full run config, snapshotted to the exp dir
    log_local: bool = True  # per-process log file (ref per-rank logs)

    def __post_init__(self):
        self.root = Path(self.exp_dir) / self.name
        if self.version:
            self.root = self.root / self.version
        self.root.mkdir(parents=True, exist_ok=True)
        self._snapshot_environment()
        self.ckpt_dir = self.root / "checkpoints"
        self.logger = MetricsLogger(
            self.root, self.use_tensorboard, self.use_wandb, self.wandb_kwargs,
            use_mlflow=self.use_mlflow, mlflow_kwargs=self.mlflow_kwargs,
            use_dllogger=self.use_dllogger, dllogger_kwargs=self.dllogger_kwargs,
            use_clearml=self.use_clearml, clearml_kwargs=self.clearml_kwargs,
        )
        self._ckpt_mgr = ocp.CheckpointManager(
            self.ckpt_dir.absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.max_to_keep, create=True
            ),
        )
        self.preemption = PreemptionHandler().install()
        self._start_time = time.monotonic()
        self.early_stopper = (
            EarlyStopping(**self.early_stopping)
            if self.early_stopping is not None
            else None
        )

    # -- provenance --------------------------------------------------------
    def _snapshot_environment(self) -> None:
        """Run-provenance capture into the experiment dir (ref
        exp_manager.py:727-757 git hash/diff + cmd-args.log, :381-390
        per-rank log files):
        - cmd-args.log: the exact command line
        - git-info.log: HEAD hash + uncommitted diff (when inside a repo)
        - config.yaml: the full run config when the caller passes one
        - log_process-N.txt: this process's log records (multi-host runs
          write one file per process instead of interleaving stdout)
        """
        import subprocess
        import sys

        # shared snapshots are process-0-only (the reference's rank-0
        # exp_manager writes); multi-host runs share one exp dir and
        # concurrent write_text calls would interleave
        is_proc0 = True
        try:
            is_proc0 = jax.process_index() == 0
        except Exception:
            pass
        if is_proc0:
            try:
                (self.root / "cmd-args.log").write_text(" ".join(sys.argv) + "\n")
            except Exception:
                pass
            try:
                head = subprocess.run(
                    ["git", "rev-parse", "HEAD"],
                    capture_output=True, text=True, timeout=10,
                )
                if head.returncode == 0:
                    diff = subprocess.run(
                        ["git", "diff"], capture_output=True, text=True, timeout=10
                    )
                    (self.root / "git-info.log").write_text(
                        f"commit: {head.stdout.strip()}\n\n{diff.stdout}"
                    )
            except Exception:
                pass
            if self.config is not None:
                try:
                    import yaml

                    (self.root / "config.yaml").write_text(
                        yaml.safe_dump(self.config, sort_keys=False)
                    )
                except Exception:
                    pass
        self._log_handler = None
        if self.log_local:
            try:
                import logging as _logging

                from roar_tpu.utils.logging import get_logger

                proc = jax.process_index()
                handler = _logging.FileHandler(
                    self.root / f"log_process-{proc}.txt"
                )
                handler.setFormatter(
                    _logging.Formatter("%(asctime)s %(levelname)s %(message)s")
                )
                get_logger().addHandler(handler)
                self._log_handler = handler
            except Exception:
                self._log_handler = None

    # -- checkpointing ---------------------------------------------------
    def save(self, state, metrics: Optional[Dict[str, float]] = None) -> None:
        """Asynchronous checkpoint save.

        The D2H fetch is synchronous (the host copy also makes the save
        immune to the train step's buffer donation), but serialization and
        the disk write run in orbax's background thread: the epoch that
        follows overlaps the write instead of stalling on it
        (CheckpointManager.save waits for a previous in-flight save, so
        back-to-back saves self-serialize).  close()/restore() wait for
        pending writes."""
        step = int(jax.device_get(state.step))
        self._ckpt_mgr.save(
            step,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def latest_step(self) -> Optional[int]:
        return self._ckpt_mgr.latest_step()

    def restore(self, abstract_state, step: Optional[int] = None):
        self._ckpt_mgr.wait_until_finished()  # a pending async save may hold the latest step
        step = step if step is not None else self.latest_step()
        if step is None:
            if self.resume_ignore_no_checkpoint:
                return None
            raise FileNotFoundError(f"No checkpoint found in {self.ckpt_dir}")
        return self._ckpt_mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def maybe_resume(self, state):
        """Return (state, start_step); restores when resume_if_exists."""
        if not self.resume_if_exists:
            return state, 0
        restored = self.restore(jax.device_get(state))
        if restored is None:
            return state, 0
        return restored, int(np.asarray(restored.step))

    # -- run control -----------------------------------------------------
    def check_early_stop(self, val_metrics: Dict[str, float]) -> bool:
        """Feed one validation round to the early stopper (no-op if
        early stopping is not configured); returns True to stop."""
        if self.early_stopper is None:
            return False
        return self.early_stopper.update(val_metrics)

    def should_stop(self) -> bool:
        if self.preemption.should_stop:
            return True
        if self.early_stopper is not None and self.early_stopper.stopped:
            return True
        if (
            self.max_time_seconds is not None
            and time.monotonic() - self._start_time > self.max_time_seconds
        ):
            return True
        return False

    def close(self):
        self.logger.close()
        self._ckpt_mgr.close()
        self.preemption.uninstall()
        if getattr(self, "_log_handler", None) is not None:
            from roar_tpu.utils.logging import get_logger

            get_logger().removeHandler(self._log_handler)
            self._log_handler.close()
            self._log_handler = None
