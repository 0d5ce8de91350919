"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding is tested the idiomatic JAX way — a host platform
with xla_force_host_platform_device_count=8 — since real multi-chip TPU
hardware is not available in CI.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects its platform via
# jax.config, overriding JAX_PLATFORMS env; override it back to CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: model-zoo tests re-trace the same tiny graphs
# every run; warm runs skip the multi-second XLA compiles.
from fcd_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
