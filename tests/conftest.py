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

# ---------------------------------------------------------------------------
# `slow` marker: the heavy end-to-end chains (trainer fits, CLI subprocesses,
# oracle sampling chains — measured >=25 s each, ~75% of suite wall time).
# Full suite (CI/driver/judge): plain `pytest tests/`.
# Dev inner loop:               `pytest tests/ -m "not slow"`.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_FILES = {
    "test_cli_smoke.py", "test_conv_gn.py", "test_convergence.py",
    "test_finetune.py", "test_finetune_cli.py", "test_kl_ae.py",
    "test_multichip_sampling.py", "test_parity_e2e.py", "test_server.py",
    "test_serving.py", "test_tp.py", "test_trainer.py", "test_training.py",
    "test_video.py", "test_video_cli.py", "test_video_parity.py",
    "test_vqgan_trainer.py",
}
_SLOW_TESTS = {  # heavy individual tests inside otherwise-fast files
    "test_efficientnet.py::test_cls_ckpt_guidance_path",
    "test_efficientnet.py::test_enet_forward_parity[True-0.001]",
    "test_efficientnet.py::test_enet_forward_parity[False-1e-05]",
    "test_face_towers.py::test_irse_backbone_parity[ir_se-True]",
    "test_face_towers.py::test_id_loss_with_irse_tower",
    "test_models.py::test_unet_grad_flows",
    "test_models.py::test_unet_checkpoint_remat_trains",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy end-to-end chain (dev loop: -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        short = f"{base}::{item.name}"
        if base in _SLOW_FILES or short in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
