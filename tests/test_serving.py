"""jax.export serving artifacts: export → serialize → load → parity.

The exported StableHLO pipeline must produce exactly the frames the live
jitted pipeline produces (same program, ahead-of-time serialized), survive a
disk round-trip, and compose back under jit. CPU-platform artifacts carry no
Mosaic custom calls (ops/attention dispatch is XLA on cpu), so they exercise
jax.export's full portability checks.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
from test_ldm import TINY_MEAD_CFG

from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
from dsml_thesis_tpu.serving import (
    export_video_pipeline,
    load_exported,
    pipeline_arg_specs,
    save_exported,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = yaml.safe_load(TINY_MEAD_CFG)
    ldm = build_model(cfg["model"])
    B, F, w = 2, 3, 2
    init_batch = {
        "image": jnp.zeros((B, 16, 16, 3)),
        "masked_image": jnp.zeros((B, 16, 16, 3)),
        "identity": jnp.zeros((B, 16, 16, 3)),
        "class_label": jnp.array([1, 5]),
        "audio": jnp.zeros((B, 5, 32)),
    }
    params = ldm.init_params(jax.random.PRNGKey(0), init_batch)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    args = (
        jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3,  # masked frames
        jax.random.normal(ks[1], (B, F + w, 32)),           # audio feats
        jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3,     # identity
        jnp.array([1, 5], jnp.int32),                       # class labels
        jax.random.PRNGKey(7),                              # key
    )
    ddim = make_ddim_schedule(ldm.schedule, 4, eta=0.0)
    return ldm, params, ddim, w, args


def test_export_roundtrip_matches_live_pipeline(tiny_setup, tmp_path):
    ldm, params, ddim, w, args = tiny_setup
    masked, audio, identity, labels, key = args
    B, F = masked.shape[:2]

    live = jax.jit(make_video_pipeline(ldm, ddim, w, guidance_scale=2.0))(
        params, *args
    )

    exp = export_video_pipeline(
        ldm, params, ddim, w, guidance_scale=2.0,
        batch=B, frames=F, size=16, audio_seq=audio.shape[1],
        audio_dim=audio.shape[2], platforms=("cpu",),
    )
    # the artifact survives serialization to disk and back
    path = tmp_path / "pipeline.stablehlo"
    nbytes = save_exported(exp, str(path))
    assert nbytes > 0 and path.stat().st_size == nbytes
    loaded = load_exported(str(path))

    out = loaded.call(params, *args)
    assert out.shape == (B, F, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               atol=1e-5, rtol=1e-5)


def test_exported_composes_under_jit(tiny_setup, tmp_path):
    """Exported.call is a traceable callable: a downstream serving graph can
    jit around it (e.g. to fuse post-processing)."""
    ldm, params, ddim, w, args = tiny_setup
    exp = export_video_pipeline(
        ldm, params, ddim, w, guidance_scale=2.0,
        batch=2, frames=3, size=16, audio_seq=args[1].shape[1],
        audio_dim=32, platforms=("cpu",),
    )

    @jax.jit
    def serve(params, *a):
        frames = exp.call(params, *a)
        return ((frames + 1.0) * 127.5).astype(jnp.uint8)  # post-proc fused

    out = serve(params, *args)
    assert out.dtype == jnp.uint8 and out.shape == (2, 3, 16, 16, 3)


def test_export_rejects_wrong_shapes(tiny_setup):
    """Feeding a different batch shape than the exported specs must fail
    loudly, not recompile silently (static-shape serving contract)."""
    ldm, params, ddim, w, args = tiny_setup
    exp = export_video_pipeline(
        ldm, params, ddim, w, guidance_scale=2.0,
        batch=2, frames=3, size=16, audio_seq=args[1].shape[1],
        audio_dim=32, platforms=("cpu",),
    )
    bad = (jnp.zeros((1, 3, 16, 16, 3)),) + args[1:]  # batch 1 != 2
    bad = (bad[0], args[1][:1], args[2][:1], args[3][:1], args[4])
    with pytest.raises(Exception):
        exp.call(params, *bad)


def test_mesh_sharded_export(tiny_setup, tmp_path):
    """A mesh-sharded artifact (params replicated, batch over `data`) records
    nr_devices == mesh size, survives the disk round-trip, and reproduces the
    single-device frames when called with sharded inputs on the 8-dev mesh."""
    from dsml_thesis_tpu.parallel import make_mesh, replicate, shard_batch

    ldm, params, ddim, w, args = tiny_setup
    masked, audio, identity, labels, key = args
    B, F = masked.shape[:2]
    assert jax.device_count() == 8
    mesh = make_mesh()

    # tiny_setup's B=2 doesn't divide 8 — build an 8-speaker batch
    B = 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    masked = jax.random.normal(ks[0], (B, F, 16, 16, 3)) * 0.3
    audio = jax.random.normal(ks[1], (B, audio.shape[1], 32))
    identity = jax.random.normal(ks[2], (B, 16, 16, 3)) * 0.3
    labels = jnp.arange(B, dtype=jnp.int32) % 8

    live = jax.jit(make_video_pipeline(ldm, ddim, w, guidance_scale=2.0))(
        params, masked, audio, identity, labels, key
    )

    exp = export_video_pipeline(
        ldm, params, ddim, w, guidance_scale=2.0,
        batch=B, frames=F, size=16, audio_seq=audio.shape[1],
        audio_dim=32, platforms=("cpu",), mesh=mesh,
    )
    assert exp.nr_devices == 8
    path = tmp_path / "pipeline8.stablehlo"
    save_exported(exp, str(path))
    loaded = load_exported(str(path))

    rparams = replicate(mesh, params)
    sb = shard_batch(
        mesh, {"m": masked, "a": audio, "i": identity, "l": labels}
    )
    out = loaded.call(rparams, sb["m"], sb["a"], sb["i"], sb["l"],
                      jax.device_put(key, jax.sharding.NamedSharding(
                          mesh, jax.sharding.PartitionSpec())))
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               atol=2e-4, rtol=1e-3)

    # the batch-divisibility contract fails loudly at export time
    with pytest.raises(ValueError, match="does not divide"):
        export_video_pipeline(
            ldm, params, ddim, w, guidance_scale=2.0,
            batch=2, frames=F, size=16, audio_seq=audio.shape[1],
            audio_dim=32, platforms=("cpu",), mesh=mesh,
        )


@pytest.mark.slow
def test_export_cli_check(tmp_path):
    """scripts/export_pipeline.py end-to-end: random-init export + --check
    (reload and compare against the live jitted pipeline) on CPU."""
    import os
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(yaml.safe_load(TINY_MEAD_CFG), f)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_pipeline.py"),
         "--cpu", "--config", cfg_path, "--out", str(tmp_path / "p.shlo"),
         "--batch", "2", "--frames", "3", "--steps", "2", "--scale", "2.0",
         "--size", "16", "--audio-window", "2", "--check"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "check: max|exported - live|" in out.stdout
    assert (tmp_path / "p.shlo").stat().st_size > 0


def test_arg_specs_shapes():
    specs = pipeline_arg_specs(4, 8, 128, 24, 768)
    assert specs[0].shape == (4, 8, 128, 128, 3)
    assert specs[1].shape == (4, 24, 768)
    assert specs[2].shape == (4, 128, 128, 3)
    assert specs[3].shape == (4,) and specs[3].dtype == jnp.int32
    assert specs[4].shape == (2,) and specs[4].dtype == jnp.uint32


def test_export_cli_mesh_and_serve_device_count_guard(tmp_path):
    """scripts/export_pipeline.py --mesh produces an nr_devices==8 artifact
    (with --check running through the sharded call path), and scripts/serve.py
    refuses a device-count mismatch UP FRONT (an 8-device artifact served
    without --mesh) instead of 500ing per request after binding."""
    import os
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(yaml.safe_load(TINY_MEAD_CFG), f)
    art = str(tmp_path / "mesh.shlo")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_pipeline.py"),
         "--cpu", "--config", cfg_path, "--out", art, "--mesh",
         "--batch", "8", "--frames", "2", "--steps", "2", "--scale", "2.0",
         "--size", "16", "--audio-window", "2", "--check"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "nr_devices=8" in out.stdout
    assert "check: max|exported - live|" in out.stdout

    serve = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--cpu", "--config", cfg_path, "--artifact", art,
         "--batch", "8", "--frames", "2", "--steps", "2", "--size", "16",
         "--audio-window", "2", "--port", "0"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=540,
    )
    assert serve.returncode != 0
    assert "exported for 8 device(s)" in serve.stderr
