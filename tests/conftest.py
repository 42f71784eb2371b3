"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (mesh semantics are identical).

Note: the runtime image pre-imports jax at interpreter startup (an `axon`
TPU plugin hook), so JAX_PLATFORMS in os.environ is read too early to
matter — we must go through jax.config.  XLA_FLAGS still works because the
CPU client initializes lazily, after this conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _n_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


# Every compiled XLA:CPU executable holds mmap'd JIT code regions for the
# life of the process; a full-suite run accumulates ~60k+ mappings and
# SIGSEGVs when it crosses the kernel's vm.max_map_count (default 65530)
# — observed twice at the 78-93% mark, at whichever test compiled next.
# Dropping jax's executable caches when we near the limit frees the maps;
# the handful of cross-file recompiles it causes are cheap next to a
# segfaulted suite.
_MAP_BUDGET = 48_000


def pytest_runtest_teardown(item, nextitem):  # noqa: ARG001
    if _n_maps() > _MAP_BUDGET:
        import gc

        jax.clear_caches()
        gc.collect()
