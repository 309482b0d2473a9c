"""Persistent XLA compile cache for benches, CLIs, and perf scripts.

The axon TPU plugin ignores the ``JAX_COMPILATION_CACHE_DIR`` env var, so the
cache must be enabled with explicit ``jax.config.update`` calls *before* the
first compilation (see CLAUDE.md hard-won rules). Tests do their own setup in
``tests/conftest.py``; every other entry point calls :func:`enable` so the
20-240 s pipeline compiles are paid once per machine, not once per process.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("STRATUM_COMPILE_CACHE", "/tmp/stratum_jax_cache")


def enable(path: str = DEFAULT_DIR) -> None:
    """Turn on the persistent compile cache (idempotent, import-time safe)."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
