#!/usr/bin/env python
"""Phase timing for the flagship sampling path: UNet eval vs VQGAN decode.

Times (a) one CFG-doubled UNet eval at the bench shape, (b) one full-clip
VQGAN decode, (c) implied totals at DDIM-S — to direct optimization effort.

CAVEAT (axon tunnel): block_until_ready may not actually block on remote
buffers, making these micro-timings unreliably fast. Trust whole-program
timings (bench.py) for decisions; use jax.profiler traces for attribution.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config

    cfg = load_config([f"configs/latent-diffusion/mead-{args.res}-ldm-f4.yaml"])
    ldm = build_model(cfg["model"])
    B, F, S = args.batch, args.frames, args.steps
    lat = args.res // 4
    batch = {
        "image": jnp.zeros((B, args.res, args.res, 3)),
        "masked_image": jnp.zeros((B, args.res, args.res, 3)),
        "identity": jnp.zeros((B, args.res, args.res, 3)),
        "class_label": jnp.zeros((B,), jnp.int32),
        "audio": jnp.zeros((B, 17, 768)),
    }
    t0 = time.time()
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    # (a) one CFG-doubled UNet eval
    x2 = jnp.zeros((2 * B, lat, lat, 3))
    t2 = jnp.zeros((2 * B,), jnp.int32)
    ctx2 = jnp.zeros((2 * B, 1, 1024))
    cc2 = jnp.zeros((2 * B, lat, lat, 6))
    unet_fn = jax.jit(
        lambda p, x, t, c, cc: ldm.apply_model(p, x, t, {"crossattn": c, "concat": cc})
    )
    dt_unet, _ = timed(unet_fn, params, x2, t2, ctx2, cc2)

    # (b) full-clip decode
    z = jnp.zeros((B * F, lat, lat, 3))
    dec_fn = jax.jit(lambda p, z: ldm.decode_first_stage(p, z))
    dt_dec, _ = timed(dec_fn, params, z, n=3)

    total_unet = S * F * dt_unet
    print(f"UNet eval (bs{2*B}, {lat}x{lat}): {dt_unet*1e3:.1f} ms "
          f"-> {S}x{F} evals = {total_unet:.2f} s")
    print(f"decode ({B*F} frames @ {args.res}px): {dt_dec:.2f} s")
    est = total_unet + dt_dec
    print(f"estimated clip total: {est:.2f} s -> {B*F/est:.2f} frames/s/chip")


if __name__ == "__main__":
    main()
