#!/usr/bin/env python
"""Class-conditional AffectNet sampling with classifier-free guidance.

Reference-surface parity: face_reenactment/sample_affectnet.py:59-137
(per-class DDIM-S sampling with the trainable null embedding as the CFG
unconditional branch, npy dumps per class). The S-step reverse chain here is
one jitted lax.scan.

Usage:
  python scripts/sample_affectnet.py --config configs/latent-diffusion/affectnet-128-ldm-vq-f4.yaml \
      --ckpt <torch-or-orbax ckpt> --outdir out/ --n-samples 8 --steps 50 --scale 3.0 \
      [--classes 0 1 2] [--eta 0.0] [--seed 0]
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
    ap.add_argument("--ckpt", default=None, help="torch .ckpt or orbax dir")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.0)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "plms", "dpm++", "dpm"],
                    help="ddim (reference default), plms, dpm++ (DPM-Solver++ "
                         "multistep, data prediction), dpm (eps prediction)")
    ap.add_argument("--order", type=int, default=2, choices=(1, 2, 3),
                    help="dpm/dpm++ solver order (1-3)")
    ap.add_argument("--classes", type=int, nargs="*", default=list(range(8)))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.utils_io import load_params

    cfg = load_config([args.config])
    ldm = build_model(cfg["model"])
    params = load_params(args.ckpt, ldm, cfg["model"], use_ema=not args.no_ema,
                         example_batch=_example_batch(cfg))
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    params = cast_sampling_params(params)


    os.makedirs(args.outdir, exist_ok=True)
    n = args.n_samples
    lat = cfg["model"]["params"]["image_size"]
    ch = cfg["model"]["params"]["channels"]

    @jax.jit
    def sample_class(params, label, key):
        batch = {"class_label": jnp.full((n,), label, dtype=jnp.int32)}
        cond = ldm.encode_conditioning(params, batch)
        uncond = ldm.null_conditioning(params, batch, batch_size=n)
        shape = (n, lat, lat, ch)
        if args.sampler == "ddim":
            z = ldm.sample_ddim(
                params, cond, shape, key, steps=args.steps,
                eta=args.eta, uncond=uncond, guidance_scale=args.scale,
            )
        else:
            from dsml_thesis_tpu.diffusion import (
                dpm_solver_sample_suite,
                make_ddim_schedule,
                plms_sample,
            )

            eps_fn = ldm.make_eps_fn(params, cond, uncond, args.scale)
            if args.sampler == "plms":
                ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0)
                z = plms_sample(ddim, eps_fn, shape, key)
            else:
                z = dpm_solver_sample_suite(
                    ldm.schedule, eps_fn, shape, key, steps=args.steps,
                    order=args.order, method="multistep",
                    predict_x0=(args.sampler == "dpm++"),
                )
        x = ldm.decode_first_stage(params, z)
        return jnp.clip(x, -1.0, 1.0)

    key = jax.random.PRNGKey(args.seed)
    for c in args.classes:
        key, sub = jax.random.split(key)
        imgs = np.asarray(sample_class(params, c, sub))
        np.save(os.path.join(args.outdir, f"class_{c}.npy"), imgs)
        _save_png_grid(imgs, os.path.join(args.outdir, f"class_{c}.png"))
        print(f"class {c}: saved {imgs.shape}")


def _example_batch(cfg):
    import jax.numpy as jnp

    res = cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"][
        "resolution"
    ]
    return {
        "image": jnp.zeros((1, res, res, 3)),
        "class_label": jnp.zeros((1,), jnp.int32),
    }


def _save_png_grid(imgs, path):
    try:
        from PIL import Image

        row = np.concatenate(list((imgs + 1) * 127.5), axis=1).astype(np.uint8)
        Image.fromarray(row).save(path)
    except Exception:
        pass


if __name__ == "__main__":
    main()
