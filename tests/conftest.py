"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU benchmark path is
exercised by bench.py, not pytest.

NB: in this environment the axon TPU plugin ignores JAX_PLATFORMS; the
legacy JAX_PLATFORM_NAME is what actually forces the CPU backend.
"""
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
