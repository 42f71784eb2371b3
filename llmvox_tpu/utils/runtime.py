"""Runtime helpers."""
from __future__ import annotations

import os


def _host_cache_tag() -> str:
    """Short fingerprint of the host CPU's feature set.

    XLA:CPU AOT artifacts bake in the compile machine's vector features
    and are NOT portable: loading a cache written on a different CPU
    logs `cpu_aot_loader` feature-mismatch errors and can SIGILL (seen
    when a round's persistent cache moved between hosts).  Keying the
    cache dir on the CPU flags keeps one cache per machine type; TPU
    programs are unaffected either way.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: repeat server starts / bench runs
    skip recompiling the decode and synthesis programs.  The directory is
    suffixed with a host-CPU fingerprint (see :func:`_host_cache_tag`)
    unless LLMVOX_COMPILE_CACHE pins an explicit path."""
    import jax
    path = path or os.environ.get("LLMVOX_COMPILE_CACHE")
    if path is None:
        path = os.path.expanduser(f"~/.cache/llmvox_xla-{_host_cache_tag()}")
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
