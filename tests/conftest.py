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
# `pytest -m "not slow"` is the fast tier (target: <=6 min on a 1-CPU host,
# still covering every op's golden parity and one train step per task); the
# full suite is the thorough tier.  Tier membership is a `@pytest.mark.slow`
# decorator ON the test (or `pytest.param(..., marks=pytest.mark.slow)` for
# single parametrizations) — markers move with the code when tests are
# renamed or relocated, unlike the nodeid list this replaced (VERDICT r4
# #10).  Policy: mark a test slow when its call+setup exceeds ~10 s on a
# 1-CPU host AND a faster sibling keeps the fast tier covering the same op
# parity / train-step family; find candidates with
# `pytest -m "not slow" --durations=20`.
# ---------------------------------------------------------------------------
