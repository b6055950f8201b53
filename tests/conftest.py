"""Test configuration: force an 8-device virtual CPU mesh.

The image's sitecustomize registers the axon TPU plugin with
JAX_PLATFORMS=axon before any test code runs, so the env var alone is too
late — jax.config.update('jax_platforms', ...) is what actually switches the
backend. XLA_FLAGS must still be set before first backend initialization.

Multi-chip sharding paths are validated on the virtual CPU devices; the
driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip.
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
jax.config.update("jax_enable_x64", False)
# This JAX build defaults matmuls to bf16-like precision even on CPU; tests
# validate algebra, so pin full fp32 matmuls. Production code opts into bf16
# explicitly on the MXU paths.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache — XLA CPU compiles dominate test wall-time otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
