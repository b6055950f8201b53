#!/usr/bin/env python
"""FID / IS / KID between generated and reference image sets.

Reference-surface parity: face_reenactment/metrics.sh:7-14 (torch-fidelity
CLI over two sample dirs). Feature extractor: a user-supplied torch model
(e.g. torchvision InceptionV3 weights) or any callable producing pooled
features; torch-fidelity itself remains usable externally for exact parity.

Usage:
  python scripts/fid_metrics.py --gen out/samples --ref data/val \
      --torch-extractor inception.pt [--logits-head]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--torch-extractor", required=True,
                    help="torchscript/torch feature extractor ([0,1] RGB input)")
    ap.add_argument("--size", type=int, default=299)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--isc", action="store_true",
                    help="extractor outputs class logits; also compute IS")
    args = ap.parse_args()

    import torch

    from dsml_thesis_tpu.metrics.fid import (
        compute_features,
        fid_from_features,
        inception_score,
        kid_from_features,
    )

    model = torch.jit.load(args.torch_extractor) \
        if args.torch_extractor.endswith(".pt") \
        else torch.load(args.torch_extractor, map_location="cpu")
    model.eval()

    def extract(imgs_m11: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(((imgs_m11 + 1) / 2).transpose(0, 3, 1, 2))
        x = torch.nn.functional.interpolate(
            x, size=args.size, mode="bilinear", align_corners=False
        )
        with torch.no_grad():
            out = model(x)
        return out.numpy().reshape(len(imgs_m11), -1)

    feats_gen = compute_features(args.gen, extract, batch=args.batch,
                                 size=args.size)
    feats_ref = compute_features(args.ref, extract, batch=args.batch,
                                 size=args.size)
    print(f"FID: {fid_from_features(feats_ref, feats_gen):.4f}")
    kid_mean, kid_std = kid_from_features(feats_ref, feats_gen)
    print(f"KID: {kid_mean:.6f} ± {kid_std:.6f}")
    if args.isc:
        probs = np.exp(feats_gen) / np.exp(feats_gen).sum(axis=1, keepdims=True)
        is_mean, is_std = inception_score(probs)
        print(f"IS: {is_mean:.4f} ± {is_std:.4f}")


if __name__ == "__main__":
    main()
