"""Test harness: force an 8-device CPU platform so sharding/mesh tests run
without TPU hardware (SURVEY.md §4)."""
import os

# Must be set before jax initializes a backend.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force the CPU backend via config: the environment's axon (TPU tunnel) site
# hook prepends itself to jax_platforms and ignores $JAX_PLATFORMS, so tests
# would otherwise silently run against the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first run pays XLA compiles, reruns are fast.
# Set via config (not env) because plugins may import jax before this file.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
