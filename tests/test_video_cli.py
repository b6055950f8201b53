"""End-to-end video CLI regression: progressive sampling over a synthetic
MEAD tree, then muxing and metrics (subprocess, tiny CPU config)."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

from test_ldm import TINY_MEAD_CFG

REPO = os.path.join(os.path.dirname(__file__), "..")


def _build_tree(root, n_clips=2, frames=3, size=16, adim=32):
    from PIL import Image

    rs = np.random.RandomState(0)
    tuples = []
    audio_dir = os.path.join(root, "audio")
    os.makedirs(audio_dir, exist_ok=True)
    for i in range(n_clips):
        subj, emo, lvl, nbr = "M001", "happy", "level_1", f"{i:03d}"
        clip = os.path.join(root, subj, "video", "front", emo, lvl, nbr)
        lmd = os.path.join(root, subj, "landmarks", "front", emo, lvl, nbr)
        os.makedirs(clip, exist_ok=True)
        os.makedirs(lmd, exist_ok=True)
        for k in range(frames):
            Image.fromarray(
                (rs.rand(size, size, 3) * 255).astype("uint8")
            ).save(os.path.join(clip, f"{k:03d}.jpg"))
            lm = np.zeros((68, 2), np.float32)
            lm[:, 1] = size * 0.4
            lm[48:68, 1] = size * 0.6
            with open(os.path.join(lmd, f"{k:03d}.pkl"), "wb") as f:
                pickle.dump(lm, f)
        with open(os.path.join(audio_dir, f"{subj}_{emo}_{lvl}_{nbr}.pkl"),
                  "wb") as f:
            pickle.dump(rs.randn(frames, adim).astype(np.float32), f)
        tuples.append((subj, emo, lvl, nbr))
    tuples_path = os.path.join(root, "tuples.pkl")
    with open(tuples_path, "wb") as f:
        pickle.dump(tuples, f)
    return tuples_path, audio_dir


@pytest.mark.slow
def test_progressive_and_save_videos_cli(tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(yaml.safe_load(TINY_MEAD_CFG), f)
    tuples, audio_dir = _build_tree(str(tmp_path / "mead"))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "progressive_sampling.py"),
         "--cpu", "--config", cfg_path, "--tuples", tuples,
         "--data-root", str(tmp_path / "mead"), "--audio-dir", audio_dir,
         "--outdir", str(tmp_path / "vids"), "--steps", "2", "--scale", "2.0",
         "--size", "16", "--audio-window", "2", "--clips", "1"],
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    pkls = os.listdir(tmp_path / "vids")
    assert len(pkls) == 1 and pkls[0].endswith(".pkl")

    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "save_videos.py"),
         "--indir", str(tmp_path / "vids"), "--outdir", str(tmp_path / "mp4s")],
        capture_output=True, text=True, timeout=120,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert os.listdir(tmp_path / "mp4s")


@pytest.mark.slow
def test_streaming_pipeline_cli(tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(yaml.safe_load(TINY_MEAD_CFG), f)
    tuples, audio_dir = _build_tree(str(tmp_path / "mead"), n_clips=2)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "streaming_pipeline.py"),
         "--cpu", "--config", cfg_path, "--tuples", tuples,
         "--data-root", str(tmp_path / "mead"), "--audio-dir", audio_dir,
         "--outdir", str(tmp_path / "stream"), "--batch", "2", "--frames", "3",
         "--steps", "2", "--size", "16", "--audio-window", "2", "--metrics"],
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "cumulative" in out.stdout and "psnr=" in out.stdout
    assert len(os.listdir(tmp_path / "stream")) == 2


@pytest.mark.slow
def test_fidelity_gate_cli_tiny():
    """scripts/fidelity_gate.py --tiny stays runnable (CPU smoke)."""
    import json

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fidelity_gate.py"),
         "--tiny"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "psnr_bf16flash_vs_fp32_db"
    assert np.isfinite(rec["value"])
