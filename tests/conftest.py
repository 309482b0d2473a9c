"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) so tests run anywhere; the
real-TPU path is exercised by ``bench.py`` and ``__graft_entry__.py``.
This must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: the suite is compile-bound on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var in this
# environment; only an explicit config update actually selects CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD5B)
