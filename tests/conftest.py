"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, and keep everything deterministic."""

import os

# Must be set before jax import (any test importing lambda_tpu device code
# will transitively import jax).
# NOTE: this environment's axon TPU plugin merges itself into JAX_PLATFORMS
# (JAX_PLATFORMS=cpu becomes "axon,cpu"); JAX_PLATFORM_NAME wins cleanly.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
