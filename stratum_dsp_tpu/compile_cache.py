"""Persistent XLA compile cache for benches, CLIs, and perf scripts.

The axon TPU plugin ignores the ``JAX_COMPILATION_CACHE_DIR`` env var, so the
cache must be enabled with explicit ``jax.config.update`` calls *before* the
first compilation (see CLAUDE.md hard-won rules). Tests do their own setup in
``tests/conftest.py``; every other entry point calls :func:`enable` so the
20-240 s pipeline compiles are paid once per machine, not once per process.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU persists AOT executables compiled for the *build* machine's CPU
    features; loading them on a host with different features warns
    ("cpu_aot_loader ... could lead to execution errors such as SIGILL") and
    then segfaults on execute. Sessions here migrate between hosts with
    different AVX-512 subsets, so the cache path must be per-CPU-signature.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def cache_dir() -> str:
    base = os.environ.get("STRATUM_COMPILE_CACHE", "/tmp/stratum_jax_cache")
    return f"{base}-{host_fingerprint()}"


DEFAULT_DIR = cache_dir()


def enable(path: str = "") -> None:
    """Turn on the persistent compile cache (idempotent, import-time safe)."""
    import jax

    path = path or cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    honor_platform_env()


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` actually mean CPU.

    The axon TPU plugin registers itself regardless of the env var, so a user
    asking for a CPU run silently gets the tunnel chip (and its bf16 fast
    paths). An explicit config update is the only thing the plugin respects
    (CLAUDE.md hard-won rules); call before the first compilation."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want and "tpu" not in want:
        import jax

        jax.config.update("jax_platforms", want)
