"""Persistent XLA compile-cache setup shared by every bench/tool entry.

Remote TPU compilation of the full pipeline takes minutes over the tunnel
transport; the persistent cache makes reruns near-instant. One helper so a
cache-dir or policy change is one edit (it was previously copy-pasted in
six scripts)."""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/blah2_tpu_jax_cache"


def enable_persistent_cache(default_dir: str = DEFAULT_DIR) -> str:
    """Point JAX at the persistent compile cache; returns the directory.
    Honors JAX_COMPILATION_CACHE_DIR; silently no-ops on jax builds
    without the flags."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
