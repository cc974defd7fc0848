"""CLI runner: the hydra_runner analogue.

Usage, mirroring the reference entry scripts (examples/tts/fastpitch.py):

    @config_runner(config_path="configs", config_name="fastpitch_22050_align")
    def main(cfg):
        ...

    python examples/tts/fastpitch.py --config-name=fastpitch_22050_align \
        train_dataset=/data/train.json model.optim.lr=2e-3
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path
from typing import Callable, Optional

from roar_tpu.config.config import load_config


def enable_persistent_compilation_cache(
    path: Optional[str] = None, min_compile_secs: float = 2.0
) -> None:
    """Point XLA's persistent compilation cache at the framework cache dir
    so repeated runs (smoke tests, resumed jobs, sweeps) skip the 20-120 s
    first-compile.  Opt out with ROAR_XLA_CACHE=0.  The TPU analogue of the
    reference relying on torch/cuDNN kernel caches across runs."""
    import os

    env = os.environ.get("ROAR_XLA_CACHE")
    if env == "0":
        return
    try:
        import jax

        from roar_tpu.utils.misc import resolve_cache_dir

        cache = Path(env) if env else resolve_cache_dir() / "xla_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:  # cache is an optimization; never block startup on it
        pass


def config_runner(
    config_path: Optional[str] = None, config_name: Optional[str] = None
) -> Callable:
    def decorator(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(argv=None):
            parser = argparse.ArgumentParser(add_help=True)
            parser.add_argument("--config-path", default=config_path)
            parser.add_argument("--config-name", default=config_name)
            parser.add_argument(
                "overrides", nargs="*", help="dotlist overrides: a.b=c"
            )
            args = parser.parse_args(argv if argv is not None else sys.argv[1:])
            if args.config_name is None:
                raise SystemExit("--config-name is required")
            name = args.config_name
            if not name.endswith((".yaml", ".yml")):
                name = name + ".yaml"
            cfg_file = Path(args.config_path or ".") / name
            cfg = load_config(cfg_file, overrides=args.overrides)
            enable_persistent_compilation_cache()
            return fn(cfg)

        return wrapper

    return decorator
