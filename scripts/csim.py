#!/usr/bin/env python
"""CSIM: ArcFace cosine similarity between two image directories.

Reference-surface parity: face_reenactment/csim.py:17-77 — embed every image
pair with an ArcFace iResNet (112x112, [-1,1]) and average the cosine
similarity. Weights: a torch iresnet checkpoint converted on the fly.

Usage:
  python scripts/csim.py --dir-a <generated> --dir-b <source> \
      --weights backbone.pth --network iresnet18 [--batch 32]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_tower(weights: str, network: str = "iresnet18"):
    """weights + network name -> embed fn ([N,112,112,3] in [-1,1] -> [N,D]).
    Shared by the CLI below and scripts/parity_e2e.py's CSIM budget."""
    import torch

    from dsml_thesis_tpu.models import insight_face as inf
    from dsml_thesis_tpu.models.arcface import _BLOCKS, convert_iresnet, iresnet

    sd = torch.load(weights, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if network in _BLOCKS:
        params, stats = convert_iresnet(sd, _BLOCKS[network])
        model = iresnet(network)
    elif network in ("ir_se50", "ir50"):
        mode = "ir_se" if network == "ir_se50" else "ir"
        affine = "output_layer.4.weight" in sd
        params, stats = inf.convert_irse(sd, num_layers=50)
        model = inf.IRSE(num_layers=50, mode=mode, affine=affine)
    elif network in ("mbf", "mbf_large"):
        blocks = (1, 4, 6, 2) if network == "mbf" else (2, 8, 12, 4)
        scale = 2 if network == "mbf" else 4
        params, stats = inf.convert_mobilefacenet(sd, blocks=blocks)
        model = inf.MobileFaceNet(blocks=blocks, scale=scale)
    elif network in inf.FACE_VIT_FACTORIES:
        kw = inf.FACE_VIT_FACTORIES[network]
        params, stats = inf.convert_face_vit(sd, depth=kw["depth"])
        model = inf.FaceViT(**kw)
    else:
        raise SystemExit(f"unknown network {network!r}")

    # variables as jit ARGUMENTS (a closure embeds them as HLO constants —
    # HTTP 413 on the axon remote compiler, CLAUDE.md)
    embed_jit = jax.jit(lambda v, x: model.apply(v, x))
    variables = {"params": params, "batch_stats": stats}
    return lambda x: embed_jit(variables, x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir-a", required=True)
    ap.add_argument("--dir-b", required=True)
    ap.add_argument("--weights", required=True, help="torch iresnet ckpt")
    ap.add_argument(
        "--network", default="iresnet18",
        help="iresnet18/34/50/100/200, ir_se50/ir50, mbf/mbf_large, vit_t/s/b",
    )
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dsml_thesis_tpu.data import load_image
    from dsml_thesis_tpu.metrics import cosine_similarity

    embed = build_tower(args.weights, args.network)

    def list_imgs(d):
        return sorted(
            glob.glob(os.path.join(d, "*.jpg")) + glob.glob(os.path.join(d, "*.png"))
            + glob.glob(os.path.join(d, "*.npy"))
        )

    def load112(path):
        if path.endswith(".npy"):
            arr = np.load(path)
            if arr.ndim == 4:
                arr = arr[0]
            from PIL import Image

            img = Image.fromarray(((arr + 1) * 127.5).astype(np.uint8)).resize((112, 112))
            return np.asarray(img, np.float32) / 127.5 - 1.0
        return load_image(path, 112)

    paths_a, paths_b = list_imgs(args.dir_a), list_imgs(args.dir_b)
    n = min(len(paths_a), len(paths_b))
    if len(paths_a) != len(paths_b):
        print(f"note: pairing first {n} of {len(paths_a)}/{len(paths_b)} images")
    paths_a, paths_b = paths_a[:n], paths_b[:n]
    sims = []
    for s in range(0, n, args.batch):
        a = np.stack([load112(p) for p in paths_a[s:s + args.batch]])
        b = np.stack([load112(p) for p in paths_b[s:s + args.batch]])
        ea, eb = embed(jnp.asarray(a)), embed(jnp.asarray(b))
        sims.extend(np.asarray(cosine_similarity(ea, eb)).tolist())
    print(f"CSIM over {len(sims)} pairs: {np.mean(sims):.4f} ± {np.std(sims):.4f}")


if __name__ == "__main__":
    main()
