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
