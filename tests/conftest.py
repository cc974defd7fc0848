"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising pjit/shard_map multi-chip code
paths without hardware (SURVEY.md §4.3): force the host platform and split it
into 8 virtual devices.

Note: the environment may pre-import jax (site customization registering a
TPU plugin) before this conftest runs, so we switch platform via
jax.config.update — which works as long as no backend has been initialized —
rather than relying on JAX_PLATFORMS alone.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: the suite is compile-dominated (~16 min cold
# on a 1-CPU host), and the cache turns every repeated compile into a disk
# read (measured 11.5 s -> 0.25 s per program).  Same helper the CLIs use
# (config/cli.py:24); opt out with ROAR_XLA_CACHE=0.
from roar_tpu.config.cli import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache(min_compile_secs=0.5)


# ---------------------------------------------------------------------------
# Fast/slow test tiers.
#
# `pytest -m "not slow"` is the fast tier (target: minutes, still covering
# every op's golden parity and one train step per task); the full suite is
# the thorough tier.  Slow tests (roughly >30 s on a 1-CPU host, dominated
# by XLA compiles of full train steps) are listed in tests/slow_tests.txt as
# nodeid prefixes and marked here at collection time, so the list stays in
# one reviewable place instead of scattered decorators.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def _load_slow_list():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(path):
        return []
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


_SLOW_PREFIXES = _load_slow_list()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid
        if any(nodeid.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
