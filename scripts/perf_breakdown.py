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
    ap.add_argument("--config", default=None)
    ap.add_argument("--mfu", action="store_true",
                    help="XLA cost-analysis roofline: FLOPs + HBM bytes of "
                         "one UNet eval and the full pipeline, vs v5e peaks")
    ap.add_argument("--fps", type=float, default=None,
                    help="measured frames/s/chip from bench.py (whole-program"
                         " timing) to rate the pipeline against the roofline")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config([
        args.config
        or os.path.join(repo,
                        f"configs/latent-diffusion/mead-{args.res}-ldm-f4.yaml")
    ])
    ldm = build_model(cfg["model"])
    B, F, S = args.batch, args.frames, args.steps
    # conditioning/latent shapes from the LOADED config, not the flagship's
    # constants — --config must benchmark the model it names
    mp = cfg["model"]["params"]
    c2p = mp["cond_stage_config_2"]["params"]
    aud_seq, aud_dim = c2p["seq_len"], c2p["subspace_dim"]
    ctx_dim = mp["unet_config"]["params"]["context_dim"]
    ddc = mp["first_stage_config"]["params"]["ddconfig"]
    zc = ddc["z_channels"]
    # downsample factor from the loaded first-stage config (f = 2^(levels-1)),
    # not a hard-coded f4 — --config must benchmark the model it names
    lat = args.res // (1 << (len(ddc["ch_mult"]) - 1))
    batch = {
        "image": jnp.zeros((B, args.res, args.res, 3)),
        "masked_image": jnp.zeros((B, args.res, args.res, 3)),
        "identity": jnp.zeros((B, args.res, args.res, 3)),
        "class_label": jnp.zeros((B,), jnp.int32),
        "audio": jnp.zeros((B, aud_seq, aud_dim)),
    }
    t0 = time.time()
    # cast to the SAME bf16 sampling tree bench.py runs — fp32 params would
    # double the HBM bytes of every bandwidth-bound phase timed below
    params = cast_sampling_params(
        ldm.init_params(jax.random.PRNGKey(0), batch))
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    # (a) one CFG UNet eval, in the FORM the pipeline actually runs: with
    # the batch-pair prefix dedup on (DSML_CFG_DEDUP default), x/t/concat
    # are the B-batch halves and only the context is the 2B pair — so the
    # FLOP/byte analysis reflects the elided prefix instead of overstating
    from dsml_thesis_tpu.flags import env_flag

    dedup = env_flag("DSML_CFG_DEDUP", True)
    ctx2 = jnp.zeros((2 * B, 1, ctx_dim))
    if dedup:
        x2 = jnp.zeros((B, lat, lat, zc))
        t2 = jnp.zeros((B,), jnp.int32)
        cc2 = jnp.zeros((B, lat, lat, 2 * zc))
        unet_fn = jax.jit(
            lambda p, x, t, c, cc: ldm.apply_model(
                p, x, t, {"crossattn": c, "concat": cc}, cfg_pairs=True)
        )
    else:
        x2 = jnp.zeros((2 * B, lat, lat, zc))
        t2 = jnp.zeros((2 * B,), jnp.int32)
        cc2 = jnp.zeros((2 * B, lat, lat, 2 * zc))
        unet_fn = jax.jit(
            lambda p, x, t, c, cc: ldm.apply_model(
                p, x, t, {"crossattn": c, "concat": cc})
        )

    if args.mfu:
        # cost analysis only — skip the timed() runs below, whose results
        # report_mfu never uses (each is a compile + device runs through the
        # tunnel for nothing)
        report_mfu(ldm, cfg, params, args)
        return

    dt_unet, _ = timed(unet_fn, params, x2, t2, ctx2, cc2)

    # (b) full-clip decode
    z = jnp.zeros((B * F, lat, lat, zc))
    dec_fn = jax.jit(lambda p, z: ldm.decode_first_stage(p, z))
    dt_dec, _ = timed(dec_fn, params, z, n=3)

    total_unet = S * F * dt_unet
    print(f"UNet eval (bs{2*B}, {lat}x{lat}): {dt_unet*1e3:.1f} ms "
          f"-> {S}x{F} evals = {total_unet:.2f} s")
    print(f"decode ({B*F} frames @ {args.res}px): {dt_dec:.2f} s")
    est = total_unet + dt_dec
    print(f"estimated clip total: {est:.2f} s -> {B*F/est:.2f} frames/s/chip")


# single source of truth for the hardware peaks (bench.py emits MFU from
# the same module, so the two reports can't drift)
from dsml_thesis_tpu.roofline import V5E_HBM_BW, V5E_PEAK_BF16  # noqa: E402


def report_mfu(ldm, cfg, params, args):
    """Roofline accounting from XLA's compiled cost analysis: how much of the
    v5e's MXU and HBM the program actually uses, so 'fast' is rated against
    hardware peaks, not just the 3.125 f/s target (PROFILE.md).

    The cost assembly itself lives in dsml_thesis_tpu.roofline (one model,
    shared with bench.py's mfu/hbm_util JSON fields — this report can't
    drift from the recorded numbers). `params` arrive already cast to the
    bf16 sampling tree (main)."""
    from dsml_thesis_tpu.flags import env_flag
    from dsml_thesis_tpu.roofline import (
        component_costs, pipeline_totals, utilization)

    B, F, S = args.batch, args.frames, args.steps
    costs = component_costs(ldm, cfg, params, B, F, args.res)
    uf, ub = costs["unet"]
    ef, _ = costs["encode"]
    df, _ = costs["decode"]
    pair = " pair-dedup" if env_flag("DSML_CFG_DEDUP", True) else ""
    print(f"UNet eval (CFG bs{2*B}{pair}): {uf/1e9:.1f} GFLOP, "
          f"{ub/1e9:.2f} GB accessed")
    print(f"VQ encode ({B*F} frames): {ef/1e9:.1f} GFLOP | "
          f"decode: {df/1e9:.1f} GFLOP")

    frames = B * F
    pf, pb = pipeline_totals(costs, F, S)
    print(f"full pipeline ({frames} frames, DDIM-{S}): {pf/1e12:.1f} TFLOP, "
          f"{pb/1e12:.2f} TB accessed "
          f"({pf/frames/1e9:.0f} GFLOP/frame, {pb/frames/1e9:.1f} GB/frame)")

    if args.fps:
        t_iter = frames / args.fps
        mfu, hbm = utilization(pf, pb, frames, args.fps)
        print(f"at {args.fps} frames/s/chip ({t_iter:.1f} s/iter):")
        print(f"  MFU  = {100*mfu:.1f}% of v5e bf16 peak "
              f"({V5E_PEAK_BF16/1e12:.0f} TFLOP/s)")
        print(f"  HBM  = {100*hbm:.1f}% of v5e bandwidth "
              f"({V5E_HBM_BW/1e9:.0f} GB/s)")
        print(f"  speed-of-light iter: max(compute {pf/V5E_PEAK_BF16:.2f}s, "
              f"memory {pb/V5E_HBM_BW:.2f}s) vs measured {t_iter:.1f}s")


if __name__ == "__main__":
    main()
