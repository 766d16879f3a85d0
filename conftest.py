"""Test harness config: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is exercised on `xla_force_host_platform_device_count=8`
fake devices (the driver separately dry-runs `__graft_entry__.dryrun_multichip`);
numerics-validation tests use float64 on CPU. The framework itself is
dtype-polymorphic and runs bf16/f32 on real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU for the test suite (the ambient env may point JAX_PLATFORMS at a
# real TPU tunnel; tests validate numerics in f64 and sharding on fake devices).
# The axon sitecustomize imports jax before this file runs, so the env var is
# already baked — override through the config instead.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the CI/dev boxes can be tiny (2 vCPUs); XLA
# CPU compiles of the bigger jits (vmapped UGPM, e2e pipelines) dominate the
# suite wall time. Cache them across runs.
# force LOCAL compilation: with the axon sitecustomize loaded
# (PALLAS_AXON_REMOTE_COMPILE=1) even CPU-backend compiles run on a remote
# machine whose CPU features differ — executing that AOT code here warns or
# SIGILLs (observed). Tests are CPU-only, so compile locally; compilation is
# lazy, so flipping the env var before the first jit takes effect.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live XLA executables after each test module. A long single-process
    run accumulating hundreds of CPU executables has produced hard aborts
    (SIGABRT inside XLA compile) on small boxes; the persistent cache above
    makes re-jitting cheap."""
    yield
    jax.clear_caches()
