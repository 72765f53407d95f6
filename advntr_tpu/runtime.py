"""Runtime initialization helpers: persistent XLA compilation cache.

Kernel compilation dominates cold-start (especially through remote-compile
TPU tunnels), so every entry point enables JAX's persistent compilation
cache: one process compiles a bucket executable once, every later run loads
it from disk.
"""

from __future__ import annotations

import os

_initialized = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _initialized
    if _initialized:
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        "ADVNTR_TPU_XLA_CACHE",
        os.path.expanduser("~/.cache/advntr_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: cold compiles only
    _initialized = True
