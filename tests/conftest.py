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
import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var in this
# environment; only an explicit config update actually selects CPU.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-bound on CPU. The env
# vars (JAX_COMPILATION_CACHE_DIR etc.) are silently ignored under the axon
# plugin — only explicit config updates take effect here. The directory is
# keyed by the host CPU's feature flags: XLA:CPU AOT cache entries built on
# a host with a different AVX-512 subset SEGFAULT when executed (the
# cpu_aot_loader warns and then hits SIGILL), and sessions migrate hosts.
from stratum_dsp_tpu.compile_cache import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD5B)
