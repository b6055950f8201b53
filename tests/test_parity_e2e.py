"""Smoke test for scripts/parity_e2e.py — the one-command torch A/B.

Runs the tiny random-weights mode on CPU: the torch side executes the
reference's own DDIMSampler.progressive_sampling, the JAX side the converted
pipeline, on identical inputs/noise; the budget record must pass. Skips when
the reference tree is absent.
"""
import json
import os
import subprocess
import sys

import pytest

from reference_oracle import reference_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_e2e_random_weights(tmp_path):
    if not reference_available():
        pytest.skip("reference tree not mounted")
    from test_ldm import TINY_MEAD_CFG

    cfg_path = tmp_path / "tiny_mead.yaml"
    cfg_path.write_text(TINY_MEAD_CFG)
    out_path = tmp_path / "parity.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_e2e.py"),
         "--config", str(cfg_path), "--frames", "2", "--steps", "4",
         "--cpu", "--out", str(out_path)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(out_path.read_text())
    assert rec["psnr_pass"] and rec["psnr_cross_db"] > 60
    # same math at fp32 with converted weights: outputs are near-identical
    assert rec["psnr_cross_min_db"] > 60


@pytest.mark.slow
def test_parity_e2e_midsize_multilevel_attention(tmp_path):
    """Reduced variant of the flagship-geometry A/B (VERDICT r4 item 1):
    the real fullattn architecture scaled to 64px — latent 16, attention at
    EVERY level ([4,2,1] -> N=256/64/16 tokens) like the faithful config,
    bf16 compute dtype — so the resolution-dependent machinery (padding,
    attention routing, resize) is exercised beyond the 16px smoke on every
    CI run. The full-size on-chip record (45.26 dB at 256px/DDIM-50) lives
    in PROFILE.md round 5; this keeps a CPU-feasible survivor of it green.
    Channels are narrowed for runtime: resolution-dependent code paths are
    what this locks, not width."""
    if not reference_available():
        pytest.skip("reference tree not mounted")
    import yaml

    from dsml_thesis_tpu.config import load_config

    cfg = load_config([os.path.join(
        REPO, "configs/latent-diffusion/mead-256-ldm-f4-fullattn.yaml")])
    p = cfg["model"]["params"]
    up = p["unet_config"]["params"]
    up["image_size"], up["model_channels"] = 16, 64
    up["num_head_channels"] = 32
    dd = p["first_stage_config"]["params"]["ddconfig"]
    dd["resolution"], dd["ch"] = 64, 32
    p["first_stage_config"]["params"]["n_embed"] = 512
    p["cond_stage_config_2"]["params"]["subspace_dim"] = 64
    up["context_dim"] = 16 + 64  # class embed_dim + audio subspace_dim
    p["cond_stage_config_1"]["params"]["embed_dim"] = 16

    cfg_path = tmp_path / "mid_fullattn.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": cfg["model"]}))
    out_path = tmp_path / "parity_mid.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_e2e.py"),
         "--config", str(cfg_path), "--frames", "2", "--steps", "10",
         "--cpu", "--out", str(out_path)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rec = json.loads(out_path.read_text())
    # bf16 pipeline vs torch fp32: the budget is the BASELINE 40 dB bar
    assert rec["psnr_pass"], rec
    assert rec["psnr_cross_min_db"] > 40
