#!/usr/bin/env python
"""Flagship benchmark: talking-face video synthesis throughput, FULL pipeline.

Measures frames/sec/chip for the north-star path (BASELINE.json): MEAD-style
progressive frame-autoregressive sampling at 256px (f4 VQGAN -> 64x64x3
latents), DDIM-50 with CFG. The timed region is everything the reference does
per frame (progressive_sampling_difftalk.py:245-319): per-frame masked-frame
VQ encodes, identity encode, audio-window conditioning encoder, class + CFG
null embeddings, the DDIM reverse chain, and the per-frame VQGAN decode to
pixels — compiled as one program (diffusion.video.make_video_pipeline).

Prints one JSON line per measured config. The default (driver) invocation
measures BOTH the headline config and the reference-faithful [4,2,1]
attention config (mead-256-ldm-f4-fullattn.yaml), so the round record
documents the faithful number the 3.125 target is judged on:
  {"metric": "frames_per_sec_per_chip_ddim50_256px", "value": N,
   "unit": "frames/s/chip", "vs_baseline": N, "faithful_value": M}
  {"metric": "frames_per_sec_per_chip_ddim50_256px_faithful", "value": M, ...}

vs_baseline: BASELINE.json's target is >=25 frames/s on a v5e-8 => 3.125
frames/s/chip. vs_baseline = value / 3.125.

Flags: --tiny (CPU smoke), --steps, --frames, --batch, --res, --no-faithful
(skip the second config), --hot-only (legacy pre-encoded-latents timing,
round-1 comparable).
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.cli import add_sampler_args

REPO = os.path.dirname(os.path.abspath(__file__))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--hot-only", action="store_true",
                    help="time only the scan over pre-encoded latents "
                         "(round-1 metric; excludes cond/VQ encodes)")
    ap.add_argument("--config", default=None,
                    help="override the model yaml (e.g. the reference-faithful "
                         "mead-256-ldm-f4-fullattn.yaml)")
    ap.add_argument("--no-faithful", action="store_true",
                    help="headline invocations only: skip the second, "
                         "reference-faithful [4,2,1] measurement")
    add_sampler_args(ap, note="non-headline metric")
    return ap.parse_args()


def _probe_backend_with_retry():
    from dsml_thesis_tpu.utils_io import probe_backend_with_retry

    probe_backend_with_retry()


def measure(args, cfg, lat):
    """Build the model from cfg and time the full pipeline; returns f/s/chip."""
    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.diffusion import (
        make_ddim_schedule,
        make_video_pipeline,
        progressive_video_sample,
    )

    ldm = build_model(cfg["model"])
    ctx_dim = cfg["model"]["params"]["unet_config"]["params"]["context_dim"]
    c2p = cfg["model"]["params"]["cond_stage_config_2"]["params"]
    seq_len, adim = c2p["seq_len"], c2p["subspace_dim"]
    audio_window = (seq_len - 1) // 2

    B, F, S = args.batch, args.frames, args.steps
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.zeros((B, args.res, args.res, 3)),
        "masked_image": jnp.zeros((B, args.res, args.res, 3)),
        "identity": jnp.zeros((B, args.res, args.res, 3)),
        "class_label": jnp.zeros((B,), jnp.int32),
        "audio": jnp.zeros((B, seq_len, adim)),
    }
    t0 = time.time()
    params = ldm.init_params(rng, batch)
    if not args.tiny:
        from dsml_thesis_tpu.utils_io import cast_sampling_params

        params = cast_sampling_params(params)  # halve weight HBM traffic
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    ddim = make_ddim_schedule(ldm.schedule, S, eta=0.0)

    # raw pipeline inputs (synthetic data; compute is data-independent)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)

    if args.hot_only:
        masked_lat = jax.random.normal(ks[0], (B, F, lat, lat, 3))
        ctxs = jax.random.normal(ks[1], (B, F, 1, ctx_dim))
        uctxs = jax.random.normal(ks[3], (B, F, 1, ctx_dim))
        z_id0 = jax.random.normal(ks[2], (B, lat, lat, 3))

        def synth(params, key, m_lat, c, uc, zid):
            # all tensors as jit ARGUMENTS (closures would embed them as HLO
            # constants, which the axon remote compiler rejects)
            apply_fn = lambda x, t, ctx, cc: ldm.apply_model(
                params, x, t, {"crossattn": ctx, "concat": cc}
            )
            frames = progressive_video_sample(
                ddim, apply_fn, m_lat, c, zid, key,
                uncond_contexts=uc, guidance_scale=args.guidance,
                sampler=args.sampler, sched=ldm.schedule,
                sampler_steps=args.sampler_steps,
                sampler_order=args.sampler_order,
            )
            if args.no_decode:
                return frames
            dec = lambda z: ldm.decode_first_stage(params, z)
            return jnp.clip(jax.vmap(dec, in_axes=1, out_axes=1)(frames), -1, 1)

        inputs = (masked_lat, ctxs, uctxs, z_id0)
    else:
        masked = jax.random.normal(ks[0], (B, F, args.res, args.res, 3)) * 0.5
        audio_feats = jax.random.normal(ks[1], (B, F, adim))
        identity = jax.random.normal(ks[2], (B, args.res, args.res, 3)) * 0.5
        labels = jnp.zeros((B,), jnp.int32)
        pipeline = make_video_pipeline(
            ldm, ddim, audio_window,
            guidance_scale=args.guidance, decode=not args.no_decode,
            sampler=args.sampler, sampler_steps=args.sampler_steps,
            sampler_order=args.sampler_order,
        )

        def synth(params, key, m, a, idn, lab):
            # params as explicit args: closing over them would embed 157M+
            # weights as HLO constants (the axon remote compiler rejects them)
            return pipeline(params, m, a, idn, lab, key)

        inputs = (masked, audio_feats, identity, labels)

    n_chips = jax.device_count()
    if n_chips > 1:
        # speakers shard over the data mesh: sampling is embarrassingly
        # parallel across chips (no ICI traffic in the scan)
        from dsml_thesis_tpu.parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        params = replicate(mesh, params)
        sh = shard_batch(mesh, {str(i): v for i, v in enumerate(inputs)})
        inputs = tuple(sh[str(i)] for i in range(len(inputs)))

    synth_j = jax.jit(synth)
    t0 = time.time()
    out = jax.block_until_ready(synth_j(params, jax.random.PRNGKey(10), *inputs))
    compile_s = time.time() - t0
    print(f"# compile+first run {compile_s:.1f}s out {out.shape}", file=sys.stderr)

    n_rep = 1 if args.tiny else 3
    t0 = time.time()
    for i in range(n_rep):
        out = jax.block_until_ready(
            synth_j(params, jax.random.PRNGKey(11 + i), *inputs)
        )
    dt = (time.time() - t0) / n_rep
    fps = B * F / dt

    # roofline utilization at the measured whole-program fps (VERDICT r4
    # item 4: BENCH records track MFU, not just fps). Only where the
    # S*F-UNet-evals cost model holds: full DDIM pipeline, single chip.
    util = None
    from dsml_thesis_tpu.flags import env_flag

    if (not args.tiny and not args.hot_only and not args.no_decode
            and args.sampler == "ddim" and n_chips == 1
            and env_flag("DSML_BENCH_MFU", True)):
        try:
            from dsml_thesis_tpu.roofline import (
                component_costs, pipeline_totals, utilization)

            costs = component_costs(ldm, cfg, params, B, F, args.res,
                                    guidance=args.guidance)
            pf, pb = pipeline_totals(costs, F, S)
            util = utilization(pf, pb, B * F, fps)
            print(f"# roofline: {pf/1e12:.2f} TFLOP {pb/1e12:.3f} TB -> "
                  f"MFU {100*util[0]:.1f}% HBM {100*util[1]:.1f}%",
                  file=sys.stderr)
        except Exception as e:  # cost_analysis availability varies by backend
            print(f"# roofline unavailable: {e}", file=sys.stderr)
    return fps / n_chips, util


def main():
    args = parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        _probe_backend_with_retry()

    from dsml_thesis_tpu.config import load_config

    if args.tiny:
        import yaml

        sys.path.insert(0, os.path.join(REPO, "tests"))
        from test_ldm import TINY_MEAD_CFG

        cfg = yaml.safe_load(TINY_MEAD_CFG)
        args.res, args.batch, args.frames, args.steps = 16, 1, 2, 4
        lat = 8
    else:
        cfg = load_config([
            args.config or os.path.join(
                REPO, f"configs/latent-diffusion/mead-{args.res}-ldm-f4.yaml"
            )
        ])
        lat = args.res // 4

    fps_chip, util = measure(args, cfg, lat)

    # metric name reflects what was actually measured; vs_baseline (the
    # 3.125 full-pipeline target) applies to the headline + faithful configs
    S = args.steps
    chain = ("ddim" + str(S) if args.sampler == "ddim"
             else f"dpm{args.sampler_steps}o{args.sampler_order}")
    metric = f"frames_per_sec_per_chip_{chain}_{args.res}px"
    headline = (S == 50 and args.res == 256 and not args.tiny
                and not args.hot_only and not args.no_decode
                and args.config is None and args.sampler == "ddim")
    if args.hot_only:
        metric += "_hotonly"
    if args.no_decode:
        metric += "_nodecode"
    if args.config:
        metric += "_customcfg"
    rec = {"metric": metric, "value": round(fps_chip, 3),
           "unit": "frames/s/chip",
           "vs_baseline": round(fps_chip / 3.125, 3) if headline else None}
    if util is not None:
        rec["mfu"] = round(util[0], 4)
        rec["hbm_util"] = round(util[1], 4)

    if headline and not args.no_faithful:
        # second measurement on the reference-faithful [4,2,1] attention
        # config, so the round record documents the number the 3.125
        # north-star is judged on (VERDICT r3 weak #2)
        faithful_cfg = load_config([os.path.join(
            REPO, "configs/latent-diffusion/mead-256-ldm-f4-fullattn.yaml")])
        faithful_fps, f_util = measure(args, faithful_cfg, lat)
        rec["faithful_value"] = round(faithful_fps, 3)
        print(json.dumps(rec))
        frec = {
            "metric": f"frames_per_sec_per_chip_{chain}_{args.res}px_faithful",
            "value": round(faithful_fps, 3), "unit": "frames/s/chip",
            "vs_baseline": round(faithful_fps / 3.125, 3)}
        if f_util is not None:
            frec["mfu"] = round(f_util[0], 4)
            frec["hbm_util"] = round(f_util[1], 4)
        print(json.dumps(frec))
    else:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
