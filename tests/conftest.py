"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (mesh semantics are identical)."""
import os

# Force-override: the environment pins JAX_PLATFORMS to the TPU plugin, but
# the test suite must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
