"""Test configuration: run everything on CPU with 8 virtual devices.

Unit tests verify numerics against the pure-numpy oracle (tests/oracle.py)
and multi-device sharding against single-device runs; neither needs the
real TPU chip, and CPU keeps the suite hermetic and parallel-safe.

MGM_TPU_FULL_TESTS=1 widens the interpret-mode Pallas matrices
(tests/test_fused.py CASES/WTA_CASES, test_sharding sharded-fused
cases) to their full cross-products — each such case costs minutes of
XLA CPU compile, so the default run keeps one case per mechanism.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by the interpreter's startup hooks with the
# TPU platform selected; the config update below still wins as long as no
# backend has been initialised yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _free_executables():
    """Drop live compiled executables between test modules: the suite
    compiles hundreds of programs and the accumulated JIT state has
    segfaulted the XLA CPU compiler late in full runs; the persistent
    disk cache keeps cross-module recompiles cheap."""
    yield
    jax.clear_caches()
