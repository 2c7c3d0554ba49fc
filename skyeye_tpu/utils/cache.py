"""Persistent XLA compilation cache.

Compiles through this environment's remote-compile tunnel take minutes; caching the
serialized executables makes every subsequent process start instantly. Safe to call
multiple times; silently no-ops where unsupported.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(path=None) -> None:
    import jax

    cache_dir = str(path or os.environ.get("SKYEYE_JAX_CACHE", _DEFAULT))
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
