"""Subprocess smoke tests for the CLI surfaces not covered elsewhere.

Each drives the real entry point end-to-end on tiny synthetic inputs (CPU),
asserting exit code + output artifacts — the reference's scripts are its only
user interface, so every one of ours must stay runnable.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=1")

TINY_AFFECT = """
model:
  base_learning_rate: 1.0e-5
  target: ldm.models.diffusion.ddpm.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 100
    image_size: 8
    channels: 3
    first_stage_key: image
    cond_stage_key: class_label
    cond_stage_trainable: true
    conditioning_key: crossattn
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params: {image_size: 8, in_channels: 3, out_channels: 3, model_channels: 32,
               attention_resolutions: [2], num_res_blocks: 1, channel_mult: [1, 2],
               num_head_channels: 16, use_spatial_transformer: true,
               transformer_depth: 1, context_dim: 16}
    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 64
        ddconfig: {double_z: false, z_channels: 3, resolution: 16, in_channels: 3,
                   out_ch: 3, ch: 32, ch_mult: [1, 2], num_res_blocks: 1,
                   attn_resolutions: [8], dropout: 0.0}
        lossconfig: {target: torch.nn.Identity}
    cond_stage_config:
      target: ldm.modules.encoders.modules.ClassEmbedder3
      params: {embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.2}
"""


def run(args, timeout=600):
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=ENV,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r.stdout


@pytest.fixture()
def tiny_cfg(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(TINY_AFFECT)
    return str(p)


def _faces_dir(tmp_path, name, n=2, size=16, seed=0):
    from PIL import Image

    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray((rs.rand(size, size, 3) * 255).astype("uint8")).save(
            d / f"{i}_img{i}.jpg")
    return str(d)


@pytest.mark.slow
def test_compute_latents_and_tuned_manipulation(tiny_cfg, tmp_path):
    """compute_latents builds inversion caches; latent_manipulation consumes
    them via --from-latents (the 'tuned' reference path)."""
    imgs = _faces_dir(tmp_path, "faces")
    listfile = tmp_path / "list.txt"
    listfile.write_text("\n".join(
        os.path.join(imgs, f) for f in sorted(os.listdir(imgs))) + "\n")
    lat_dir = tmp_path / "latents"
    run(["scripts/compute_latents.py", "--config", tiny_cfg,
         "--list", str(listfile), "--outdir", str(lat_dir),
         "--steps", "3", "--size", "16", "--batch", "2", "--cpu"])
    files = os.listdir(lat_dir)
    assert {"latents.npy", "origin.npy", "files.npy"} <= set(files), files

    out = tmp_path / "manip"
    run(["scripts/latent_manipulation.py", "--config", tiny_cfg,
         "--from-latents", str(lat_dir / "latents.npy"), "--src-class", "0",
         "--targets", "1", "--steps", "3", "--strength", "0.5",
         "--outdir", str(out), "--size", "16", "--cpu"])
    assert any(f.endswith(".npy") for f in os.listdir(out))


def test_convert_arrays_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    arr = (rs.rand(2, 16, 16, 3) * 2 - 1).astype(np.float32)
    np.save(tmp_path / "a.npy", arr)
    run(["scripts/convert_arrays.py", "npy2img", "--input",
         str(tmp_path / "a.npy"), "--outdir", str(tmp_path / "imgs")])
    assert len(os.listdir(tmp_path / "imgs")) == 2
    run(["scripts/convert_arrays.py", "img2npy", "--indir",
         str(tmp_path / "imgs"), "--output", str(tmp_path / "b.npy")])
    b = np.load(tmp_path / "b.npy")
    assert b.shape == arr.shape
    np.testing.assert_allclose(b, arr, atol=0.02)  # 8-bit roundtrip


def test_image_metrics_cli(tmp_path):
    _faces_dir(tmp_path, "gen", seed=1)
    _faces_dir(tmp_path, "gt", seed=1)  # identical -> psnr high
    out = run(["scripts/image_metrics.py", "--gen", str(tmp_path / "gen"),
               "--gt", str(tmp_path / "gt"),
               "--log", str(tmp_path / "log.txt"), "--cpu"])
    assert os.path.exists(tmp_path / "log.txt")


def test_csim_cli_with_random_backbone(tmp_path):
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_oracle import reference_available

    if not reference_available():
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, "/root/reference/face_reenactment")
    from backbones.iresnet import iresnet18

    torch.save(iresnet18(False).state_dict(), tmp_path / "r18.pth")
    d = _faces_dir(tmp_path, "a", size=112, seed=2)
    out = run(["scripts/csim.py", "--dir-a", d, "--dir-b", d,
               "--weights", str(tmp_path / "r18.pth"),
               "--network", "iresnet18", "--cpu"])
    # identical dirs -> cosine similarity 1
    assert "CSIM" in out and "1.0000" in out


def test_emorec_cli(tmp_path):
    import torch

    class M(torch.nn.Module):
        def forward(self, x):
            out = torch.zeros(x.shape[0], 8)
            out[:, 3] = 1.0
            return out

    torch.jit.trace(M(), torch.rand(1, 3, 64, 64)).save(
        str(tmp_path / "clf.pt"))
    rs = np.random.RandomState(0)
    np.save(tmp_path / "class_3.npy",
            (rs.rand(4, 16, 16, 3) * 2 - 1).astype(np.float32))
    out = run(["scripts/emorec.py", "--samples", str(tmp_path),
               "--torch-model", str(tmp_path / "clf.pt"),
               "--input-size", "64"])
    assert "class 3: acc 1.000" in out


def test_emorec_cli_jax_enet(tmp_path):
    """Torch-free path: --enet converts the HSEmotion checkpoint to the
    in-tree Flax tower; head-order predictions remap to AffectNet labels."""
    import torch

    from dsml_thesis_tpu.models.efficientnet import EffNetConfig, affectnet_to_head
    from tests.enet_torch import EffNetTorch

    cfg = EffNetConfig(width_mult=0.35, depth_mult=0.35, num_classes=7)
    tm = EffNetTorch(cfg).eval()
    with torch.no_grad():
        # rig the head so every input lands on AffectNet class 3 (Surprise)
        tm.classifier.weight.zero_()
        tm.classifier.bias.zero_()
        tm.classifier.bias[int(affectnet_to_head(7)[3])] = 10.0
    torch.save(tm.state_dict(), str(tmp_path / "enet_b2_7.pt"))
    rs = np.random.RandomState(0)
    np.save(tmp_path / "class_3.npy",
            (rs.rand(4, 16, 16, 3) * 2 - 1).astype(np.float32))
    out = run(["scripts/emorec.py", "--samples", str(tmp_path),
               "--enet", str(tmp_path / "enet_b2_7.pt"),
               "--input-size", "66"])
    assert "class 3: acc 1.000" in out


def test_migration_doc_cites_real_scripts_and_flags():
    """Doc-rot guard: every `python <script> --flag ...` in the 'ours' column
    of docs/MIGRATION.md names a script that exists and flags its argparse
    actually accepts (asserted against the script's --help text)."""
    import re

    md = open(os.path.join(REPO, "docs", "MIGRATION.md")).read()
    cited = {}  # script -> set of --flags cited anywhere in the ours column
    for line in md.splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 4:
            continue
        ours = cells[2]
        for span in re.findall(r"`([^`]*)`", ours):
            m = re.search(r"python\s+((?:scripts/)?\w+\.py)", span)
            if not m:
                continue
            script = m.group(1)
            flags = set(re.findall(r"(--[a-z][a-z0-9-]*)", span))
            cited.setdefault(script, set()).update(flags)

    assert cited, "no commands parsed from MIGRATION.md — format changed?"
    for script, flags in sorted(cited.items()):
        path = os.path.join(REPO, script)
        assert os.path.exists(path), f"MIGRATION.md cites missing {script}"
        r = subprocess.run([sys.executable, script, "--help"], cwd=REPO,
                           env=ENV, capture_output=True, text=True,
                           timeout=120)
        assert r.returncode == 0, f"{script} --help failed: {r.stderr[-500:]}"
        for flag in sorted(flags):
            assert flag in r.stdout, (
                f"MIGRATION.md cites {script} {flag}, but its --help "
                f"does not list it")
