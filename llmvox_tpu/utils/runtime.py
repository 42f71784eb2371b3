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


def profile_trace(out_dir: str = "/tmp/llmvox_trace"):
    """Context manager around ``jax.profiler.trace``: captures a device
    trace viewable in TensorBoard/Perfetto.  The reference has no
    profiler integration at all (SURVEY §5) — its only timing signal is
    wall-clock prints in the consumer loop.

    Usage::

        with profile_trace("/tmp/trace"):
            engine.tts("hello")
    """
    import jax
    return jax.profiler.trace(out_dir, create_perfetto_link=False)


def annotate(name: str):
    """Named profiler span (shows up in traces and nsys-like timelines)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
