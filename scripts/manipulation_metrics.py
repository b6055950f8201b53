#!/usr/bin/env python
"""Manipulation quality table: PSNR/SSIM/LPIPS/emorec% over sweep dirs -> CSV.

Reference-surface parity: face_reenactment/manipulation_metrics.py:143-189 —
walks edited-image dumps produced by latent_manipulation over sweeps of
(ddim steps, scale, strength, target emotion) encoded in the path
(…ddim{S}…scale{G}_strength{s}_emotion={k}…), compares each against the
originals, and emits one CSV row per sweep point with LPIPS and the
emotion-classifier agreement columns alongside PSNR/SSIM.

LPIPS: the in-framework VGG16 LPIPS with user-converted weights
(--vgg-ckpt torchvision vgg16 + --lpips-lin-ckpt taming lin heads).
emorec: a user torch emotion classifier (--emorec-model), like the
reference's pip hsemotion dependency.
"""
import argparse
import csv
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_SWEEP_RE = {
    "steps": re.compile(r"ddim(\d+)"),
    "scale": re.compile(r"scale([\d.]+)"),
    "strength": re.compile(r"strength([\d.]+)"),
    "emotion": re.compile(r"emotion=(\d+)"),
}


def parse_sweep(path: str):
    out = {}
    for key, rx in _SWEEP_RE.items():
        m = rx.search(path)
        out[key] = (float(m.group(1).rstrip(".")) if key != "emotion" else
                    int(m.group(1))) if m else None
    if out["steps"] is not None:
        out["steps"] = int(out["steps"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edited-root", required=True,
                    help="dir tree of edited_to_*.npy dumps")
    ap.add_argument("--original", required=True, help="npy of original images")
    ap.add_argument("--out-csv", required=True)
    ap.add_argument("--vgg-ckpt", default=None,
                    help="torchvision vgg16 state_dict for LPIPS")
    ap.add_argument("--lpips-lin-ckpt", default=None,
                    help="taming vgg_lpips lin-head state_dict")
    ap.add_argument("--emorec-model", default=None,
                    help="torch emotion classifier ([0,1] RGB, imagenet norm)")
    ap.add_argument("--emorec-size", type=int, default=260)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dsml_thesis_tpu.metrics import psnr, ssim, to_unit_range

    orig_m11 = jnp.asarray(np.load(args.original))
    orig = to_unit_range(orig_m11)
    metric_fn = jax.jit(lambda a, b: (psnr(a, b), ssim(a, b)))

    lpips_fn = None
    if args.vgg_ckpt and args.lpips_lin_ckpt:
        import torch

        from dsml_thesis_tpu.losses.lpips import LPIPS, convert_lpips_weights

        vgg_sd = torch.load(args.vgg_ckpt, map_location="cpu", weights_only=False)
        lin_sd = torch.load(args.lpips_lin_ckpt, map_location="cpu",
                            weights_only=False)
        lp_params = convert_lpips_weights(
            vgg_sd if isinstance(vgg_sd, dict) else vgg_sd.state_dict(),
            lin_sd if isinstance(lin_sd, dict) else lin_sd.state_dict(),
        )
        model = LPIPS()
        # weights as jit arguments (a closure embeds the VGG as HLO
        # constants — HTTP 413 on the axon remote compiler, CLAUDE.md)
        _lpips_jit = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
        lpips_fn = lambda a, b: _lpips_jit(lp_params, a, b)

    emorec_fn = None
    if args.emorec_model:
        import torch

        tm = torch.jit.load(args.emorec_model) \
            if args.emorec_model.endswith(".pt") \
            else torch.load(args.emorec_model, map_location="cpu", weights_only=False)
        tm.eval()
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def emorec_fn(imgs_m11: np.ndarray) -> np.ndarray:
            x = torch.from_numpy(((imgs_m11 + 1) / 2).transpose(0, 3, 1, 2))
            x = torch.nn.functional.interpolate(
                x, size=args.emorec_size, mode="bilinear", align_corners=False
            )
            with torch.no_grad():
                return tm((x - mean) / std).argmax(dim=1).numpy()

    fields = ["file", "steps", "scale", "strength", "emotion",
              "psnr", "ssim", "lpips", "emorec_pct", "n"]
    rows = []
    for npy in sorted(glob.glob(os.path.join(args.edited_root, "**", "*.npy"),
                                recursive=True)):
        edited_m11 = jnp.asarray(np.load(npy))
        edited = to_unit_range(edited_m11)
        n = min(len(edited), len(orig))
        p, s = metric_fn(edited[:n], orig[:n])
        row = {"file": os.path.relpath(npy, args.edited_root),
               "psnr": round(float(jnp.mean(p)), 4),
               "ssim": round(float(jnp.mean(s)), 4),
               "lpips": None, "emorec_pct": None, "n": n}
        row.update(parse_sweep(npy))
        if lpips_fn is not None:
            row["lpips"] = round(float(jnp.mean(
                lpips_fn(edited_m11[:n], orig_m11[:n]))), 5)
        if emorec_fn is not None and row["emotion"] is not None:
            preds = emorec_fn(np.asarray(edited_m11[:n]))
            row["emorec_pct"] = round(float((preds == row["emotion"]).mean()), 4)
        rows.append(row)
        print(row)

    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out_csv}")


if __name__ == "__main__":
    main()
