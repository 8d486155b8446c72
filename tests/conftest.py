"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU benchmark path is
exercised by bench.py, not pytest.

NB: this environment pre-imports jax via a sitecustomize hook and exports
JAX_PLATFORMS=axon (a tunneled TPU backend), so `os.environ.setdefault` is
useless — we must force-override the env var AND update the live jax config
(backend selection is lazy, so the update sticks as long as no device op has
run yet, which is the case at conftest import time).
"""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NaN tripwire for the float-trit paths (SURVEY.md section 5 sanitizer plan):
# all hot mod-3 math runs in f32 (docs/PERF.md) on the exactness argument
# that values stay small integers -- debug_nans turns any violation that
# produces a NaN into a hard error instead of silent corruption.
jax.config.update("jax_debug_nans", True)
# Cache compiled executables across test runs (the unrolled RS decoder is
# ~10 s of XLA:CPU compile per (batch, k) shape; the suite hits dozens).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
