"""Test harness configuration.

Mirrors the reference's backend/device/dtype fixture matrix
(reference: tests/conftest.py:7-56) with the JAX equivalents: tests run on a
virtual 8-device CPU mesh (so multi-chip sharding code paths are exercised
without TPU hardware) with x64 enabled so complex128 golden values can be
reproduced to reference precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden under axon
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite is compile-dominated (x64 CPU
# recompiles every jitted shape each run); cached reruns are many times
# faster.  Separate dir from the TPU cache (.jax_cache) to avoid churn.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=["complex64", "complex128"], scope="session")
def cdtype(request):
    return np.dtype(request.param)


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded per test id: draws are deterministic AND
    # independent of execution order (a session-scoped generator made
    # marginal-tolerance tests fail depending on which file ran first).
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode())  # stable across runs
    return np.random.default_rng(seed)
