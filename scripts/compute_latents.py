#!/usr/bin/env python
"""Build the deterministic DDIM-inversion latent cache for editing/finetuning.

Reference-surface parity: face_reenactment/compute_latents.py:298-599 —
for every dataset image: VQ-encode, run the strength-scaled forward DDIM
chain under the source conditioning, optionally reconstruct, and dump
x0 / xrec / xlat / file-path npy arrays consumed by LatentTrain/LatentTest
(ldm/data/latents.py).

Usage:
  python scripts/compute_latents.py --config <cfg> --ckpt <ckpt> \
      --list train_aligned.txt --outdir latents/train --steps 40 --strength 0.5
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--list", required=True, help="image path list file")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--strength", type=float, default=0.5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--reconstruct", action="store_true",
                    help="also run the reverse chain and store xrec")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.data import load_images
    from dsml_thesis_tpu.diffusion import (
        ddim_invert,
        ddim_reverse_from,
        make_ddim_schedule,
    )
    from dsml_thesis_tpu.utils_io import load_params

    cfg = load_config([args.config])
    ldm = build_model(cfg["model"])
    example = {
        "image": jnp.zeros((1, args.size, args.size, 3)),
        "class_label": jnp.zeros((1,), jnp.int32),
    }
    params = load_params(args.ckpt, ldm, cfg["model"], example_batch=example)

    with open(args.list) as f:
        paths = [l for l in f.read().splitlines() if l]
    if args.limit:
        paths = paths[: args.limit]

    ddim = make_ddim_schedule(
        ldm.schedule, args.steps, eta=0.0,
        strength=None if args.strength >= 1.0 else args.strength,
    )

    # params as a jit ARGUMENT (closing over them embeds the weights as HLO
    # constants — HTTP 413 on the axon remote compiler, CLAUDE.md)
    @jax.jit
    def invert(params, x, labels):
        z0 = ldm.encode_first_stage(params, x)
        cond = ldm.encode_conditioning(params, {"class_label": labels})
        eps = ldm.make_eps_fn(params, cond, None, 1.0)
        x_lat = ddim_invert(ddim, eps, z0)
        if args.reconstruct:
            z_rec = ddim_reverse_from(ddim, eps, x_lat)
            xrec = jnp.clip(ldm.decode_first_stage(params, z_rec), -1, 1)
        else:
            xrec = jnp.zeros_like(x)
        return x_lat, xrec

    all_x0, all_lat, all_rec, all_fp = [], [], [], []
    for s in range(0, len(paths), args.batch):
        chunk = paths[s:s + args.batch]
        imgs = load_images(chunk, args.size)
        labels = np.array(
            [int(os.path.basename(p).split("_")[0]) for p in chunk], np.int32
        )
        pad = args.batch - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
            labels = np.concatenate([labels, np.zeros((pad,), np.int32)])
        x_lat, xrec = invert(params, jnp.asarray(imgs), jnp.asarray(labels))
        all_x0.append(((imgs[: len(chunk)] + 1) / 2))  # [0,1] like reference origin
        all_lat.append(np.asarray(x_lat)[: len(chunk)])
        if args.reconstruct:
            all_rec.append(np.asarray(xrec)[: len(chunk)])
        all_fp.extend(chunk)
        print(f"{s + len(chunk)}/{len(paths)}")

    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, "origin.npy"), np.concatenate(all_x0))
    np.save(os.path.join(args.outdir, "latents.npy"), np.concatenate(all_lat))
    if args.reconstruct:
        np.save(os.path.join(args.outdir, "recon.npy"), np.concatenate(all_rec))
    np.save(os.path.join(args.outdir, "files.npy"), np.array(all_fp))
    print(f"saved {len(all_fp)} latents to {args.outdir}")


if __name__ == "__main__":
    main()
