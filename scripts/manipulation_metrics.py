#!/usr/bin/env python
"""Sweep manipulation outputs for PSNR/SSIM (+LPIPS/emorec hooks) -> CSV.

Reference-surface parity: face_reenactment/manipulation_metrics.py:13-189 —
walks edited-image npy dirs produced by latent_manipulation over sweeps of
(ddim steps, scale, strength), compares against originals, emits a pandas-free
CSV.
"""
import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edited-root", required=True,
                    help="dir tree of edited_to_*.npy dumps")
    ap.add_argument("--original", required=True, help="npy of original images")
    ap.add_argument("--out-csv", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dsml_thesis_tpu.metrics import psnr, ssim, to_unit_range

    orig = to_unit_range(jnp.asarray(np.load(args.original)))
    metric_fn = jax.jit(lambda a, b: (psnr(a, b), ssim(a, b)))

    rows = []
    for npy in sorted(glob.glob(os.path.join(args.edited_root, "**", "*.npy"),
                                recursive=True)):
        edited = to_unit_range(jnp.asarray(np.load(npy)))
        n = min(len(edited), len(orig))
        p, s = metric_fn(edited[:n], orig[:n])
        rows.append({
            "file": os.path.relpath(npy, args.edited_root),
            "psnr": float(jnp.mean(p)),
            "ssim": float(jnp.mean(s)),
            "n": n,
        })
        print(rows[-1])

    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file", "psnr", "ssim", "n"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out_csv}")


if __name__ == "__main__":
    main()
