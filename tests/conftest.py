"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding paths are validated on virtual CPU devices; the driver
separately dry-runs the real multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
