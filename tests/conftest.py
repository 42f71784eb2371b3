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
