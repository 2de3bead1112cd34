"""Persistent XLA compilation cache.

TPU jit compiles of the big decode shapes take minutes (the reference-scale
window kernels compile 10-200s each); enabling JAX's persistent cache makes
every repeat run of the same shape start in seconds. Call ``enable()``
before the first jit compilation (bench.py, the CLI, and the graft entry
all do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get("SWD_JAX_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
