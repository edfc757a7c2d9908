"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware.

Note: this environment preloads jax via sitecustomize (axon TPU tunnel), so
plain env vars are too late — use jax.config before any device access.
Pallas kernels detect the CPU backend and run in interpreter mode.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: CPU jit compiles dominate suite wall time and
# repeat identically across runs (same TINY shapes); measured big win on the
# TPU tunnel and applies to CPU compiles too
try:
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
