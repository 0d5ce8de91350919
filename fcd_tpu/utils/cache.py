"""Persistent XLA compilation cache.

Remote TPU compiles of the 128^3 graphs take minutes; the persistent cache
makes every subsequent process start warm."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "FCD_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_fcd_tpu")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
