"""Persistent XLA compilation cache.

First compiles on TPU take tens of seconds; enabling JAX's persistent cache
makes CLI / bench restarts reuse compiled executables from disk.
"""

from __future__ import annotations

import os
import pathlib


def enable_persistent_cache(cache_dir: str | None = None):
    import jax

    path = pathlib.Path(cache_dir or os.environ.get(
        "VITX_COMPILE_CACHE", "~/.cache/vitx_xla")).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags — harmless
