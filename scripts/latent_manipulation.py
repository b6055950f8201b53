#!/usr/bin/env python
"""Emotion manipulation via deterministic DDIM inversion + re-decoding.

Reference-surface parity: face_reenactment/latent_manipulation.py:421-607 —
encode an image to the VQ latent, run the forward DDIM chain conditioned on
the SOURCE emotion, then the reverse chain conditioned on each TARGET emotion.
Both chains are jitted lax.scans; strength scales the traversed sub-chain
(ddim2.py:9-29).

Usage:
  python scripts/latent_manipulation.py --config <affectnet cfg> --ckpt <ckpt> \
      --images img1.jpg img2.jpg --src-class 0 --targets 1 2 6 \
      --steps 40 --strength 0.5 --scale 1.0 --outdir out/
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
    ap.add_argument("--images", nargs="*", default=[])
    ap.add_argument("--from-latents", default=None,
                    help="npy of precomputed DDIM-inverted latents "
                         "(latent_manipulation_tuned.py path: reverse-only "
                         "decoding over a finetuned model)")
    ap.add_argument("--src-class", type=int, required=True)
    ap.add_argument("--targets", type=int, nargs="+", required=True)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--strength", type=float, default=1.0)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.data import load_image
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
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    params = cast_sampling_params(params)


    if args.from_latents:
        x_lat_cached = jnp.asarray(np.load(args.from_latents))
        b = x_lat_cached.shape[0]
        x = None
    else:
        assert args.images, "need --images or --from-latents"
        imgs = np.stack([load_image(p, args.size) for p in args.images])
        x = jnp.asarray(imgs)
        b = x.shape[0]
        x_lat_cached = None
    strength = None if args.strength >= 1.0 else args.strength
    ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0, strength=strength)

    uncond = ldm.null_conditioning(params, {"class_label": None}, batch_size=b) \
        if args.scale != 1.0 else None

    def cond_for_p(p, label):
        batch = {"class_label": jnp.full((b,), label, dtype=jnp.int32)}
        return ldm.encode_conditioning(p, batch)

    @jax.jit
    def manipulate(params, z0, src_label, trg_label):
        eps_src = ldm.make_eps_fn(params, cond_for_p(params, src_label), uncond, args.scale)
        eps_trg = ldm.make_eps_fn(params, cond_for_p(params, trg_label), uncond, args.scale)
        x_lat = ddim_invert(ddim, eps_src, z0)
        return ddim_reverse_from(ddim, eps_trg, x_lat), x_lat

    @jax.jit
    def decode_only(params, x_lat, trg_label):
        eps_trg = ldm.make_eps_fn(params, cond_for_p(params, trg_label), uncond, args.scale)
        return ddim_reverse_from(ddim, eps_trg, x_lat)

    z0 = ldm.encode_first_stage(params, x) if x is not None else None
    os.makedirs(args.outdir, exist_ok=True)
    for trg in args.targets:
        if x_lat_cached is not None:
            z_edit = decode_only(params, x_lat_cached, trg)
        else:
            z_edit, _ = manipulate(params, z0, args.src_class, trg)
        out = np.asarray(jnp.clip(ldm.decode_first_stage(params, z_edit), -1, 1))
        np.save(os.path.join(args.outdir, f"edited_to_{trg}.npy"), out)
        try:
            from PIL import Image

            row = np.concatenate(list((out + 1) * 127.5), axis=1).astype(np.uint8)
            Image.fromarray(row).save(os.path.join(args.outdir, f"edited_to_{trg}.png"))
        except Exception:
            pass
        print(f"target {trg}: saved {out.shape}")


if __name__ == "__main__":
    main()
