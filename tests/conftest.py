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
