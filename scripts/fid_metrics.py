#!/usr/bin/env python
"""FID / IS / KID / PRC between generated and reference image sets.

Reference-surface parity: face_reenactment/metrics.sh:7-14 (torch-fidelity
CLI over two sample dirs, --fid --isc --kid --prc). Feature extractor: the
in-framework Flax FID-InceptionV3 fed by a converted pt_inception /
torchvision checkpoint (--inception-ckpt), or any user torch extractor
(--torch-extractor) for cross-checks.

Usage:
  python scripts/fid_metrics.py --gen out/samples --ref data/val \
      --inception-ckpt pt_inception-2015-12-05-6726825d.pth [--cpu]
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
    ap.add_argument("--inception-ckpt", default=None,
                    help="pt_inception / torchvision InceptionV3 state_dict")
    ap.add_argument("--torch-extractor", default=None,
                    help="torchscript/torch feature extractor ([0,1] RGB input)")
    ap.add_argument("--size", type=int, default=299)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prc-k", type=int, default=3)
    ap.add_argument("--isc", action="store_true",
                    help="(torch extractor only) treat output as class logits")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if not args.inception_ckpt and not args.torch_extractor:
        ap.error("one of --inception-ckpt / --torch-extractor required")

    from dsml_thesis_tpu.metrics.fid import (
        compute_features,
        fid_from_features,
        inception_score,
        kid_from_features,
        precision_recall,
    )

    logits_all = None
    if args.inception_ckpt:
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        import jax.numpy as jnp
        import torch

        from dsml_thesis_tpu.metrics.inception import (
            convert_fid_inception,
            make_feature_fn,
        )

        sd = torch.load(args.inception_ckpt, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params, stats = convert_fid_inception(sd)
        # make_feature_fn jits internally with params as call arguments —
        # wrapping it in jax.jit again would close over the 24M weights
        # (HTTP 413 on the axon remote compiler, CLAUDE.md)
        feature_fn = make_feature_fn(params, stats)

        pools, logits = {}, {}

        def make_extract(tag):
            def extract(imgs_m11):
                p, l = feature_fn(jnp.asarray(imgs_m11))
                logits.setdefault(tag, []).append(np.asarray(l))
                return np.asarray(p)
            return extract

        feats_gen = compute_features(args.gen, make_extract("gen"),
                                     batch=args.batch, size=args.size)
        feats_ref = compute_features(args.ref, make_extract("ref"),
                                     batch=args.batch, size=args.size)
        logits_all = np.concatenate(logits["gen"])
    else:
        import torch

        model = torch.jit.load(args.torch_extractor) \
            if args.torch_extractor.endswith(".pt") \
            else torch.load(args.torch_extractor, map_location="cpu", weights_only=False)
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
        if args.isc:
            logits_all = feats_gen

    print(f"FID: {fid_from_features(feats_ref, feats_gen):.4f}")
    kid_mean, kid_std = kid_from_features(feats_ref, feats_gen)
    print(f"KID: {kid_mean:.6f} ± {kid_std:.6f}")
    prec, rec = precision_recall(feats_ref, feats_gen, k=args.prc_k)
    print(f"PRC: precision {prec:.4f} recall {rec:.4f}")
    if logits_all is not None:
        e = np.exp(logits_all - logits_all.max(axis=1, keepdims=True))
        is_mean, is_std = inception_score(e / e.sum(axis=1, keepdims=True))
        print(f"IS: {is_mean:.4f} ± {is_std:.4f}")


if __name__ == "__main__":
    main()
