"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware.

Note: this environment preloads jax via sitecustomize (axon TPU tunnel), so
plain env vars are too late — use jax.config before any device access.
Pallas kernels detect the CPU backend and run in interpreter mode.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# On a 1-core host the 8 virtual devices execute serially, so an all-reduce
# rendezvous legitimately waits minutes at full 40k-point shapes
# (test_full_shape_dryrun) — far past XLA:CPU's default collective terminate
# timeout, which aborts the process (observed SIGABRT mid-step). Not a hang:
# raise the terminate bound; keep the 20 s warn for visibility.
if "collective_call_terminate" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: CPU jit compiles dominate suite wall time and
# repeat identically across runs (same TINY shapes); measured big win on the
# TPU tunnel and applies to CPU compiles too
import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from omni_pq_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
