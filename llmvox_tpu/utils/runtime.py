"""Runtime helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: repeat server starts / bench runs
    skip recompiling the decode and synthesis programs."""
    import jax
    path = path or os.environ.get("LLMVOX_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/llmvox_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
