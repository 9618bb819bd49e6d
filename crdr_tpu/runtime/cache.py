"""Persistent XLA compilation cache setup.

First compiles of the flagship programs take minutes; enabling the persistent
cache makes every subsequent process (CLI runs, bench, driver re-runs) reuse
them.  Call once per entry point before building models.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "CRDR_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "crdr_jax_cache"))
    # key by backend: remote-compiled TPU entries must not be offered to the
    # host CPU backend (mismatched machine features -> potential SIGILL)
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
