#!/usr/bin/env python
"""Training-throughput benchmark: img/s/chip on the MEAD 4-cond LDM.

Times the jitted, donated train step (bf16 UNet, flash attention fwd+bwd)
over synthetic batches at the real config shapes. The timed region is N
dispatched steps closed by a device_get of the final loss — per-step
block_until_ready is unreliable through the axon tunnel (CLAUDE.md), so only
the whole-loop wall time is reported.

Reference equivalent: the per-epoch seconds the CUDACallback prints
(main.py:404-424); the recorded round-2 number is 223.6 img/s/chip at
bs16/128px (PROFILE.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/latent-diffusion/mead-128-ldm-f4.yaml")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--audio-window", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU smoke (4 steps, 32px)")
    ap.add_argument("--profile", metavar="OUTDIR", default=None,
                    help="wrap the timed steps in jax.profiler.trace and "
                         "print the leaf-op attribution (profile_bench "
                         "parser) — the training-side device profile")
    ap.add_argument("--mfu", action="store_true",
                    help="XLA cost-analysis roofline of the compiled train "
                         "step (FLOP + HBM-byte utilization vs v5e peaks, "
                         "rated at the measured ms/step)")
    args = ap.parse_args()

    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config([os.path.join(repo, args.config)])
    if args.tiny:
        args.batch, args.res, args.steps, args.warmup = 2, 32, 4, 1
        up = cfg["model"]["params"]["unet_config"]["params"]
        up["model_channels"] = 32
        cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"][
            "resolution"] = args.res

    ldm = build_model(cfg["model"])
    c2p = cfg["model"]["params"]["cond_stage_config_2"]["params"]
    ctx_w, aud_dim = c2p["seq_len"], c2p["subspace_dim"]
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(args.batch, args.res, args.res, 3),
                             jnp.float32) * 0.3,
        "masked_image": jnp.zeros((args.batch, args.res, args.res, 3)),
        "identity": jnp.zeros((args.batch, args.res, args.res, 3)),
        "class_label": jnp.zeros((args.batch,), jnp.int32),
        "audio": jnp.asarray(rng.randn(args.batch, ctx_w, aud_dim),
                             jnp.float32),
    }

    t0 = time.time()
    params = ldm.init_params(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(ldm, params, base_lr=1e-4)
    state = create_train_state(ldm, params, tx)
    step_fn = jax.jit(make_train_step(ldm, tx), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    print(f"# init {time.time() - t0:.1f}s")

    t0 = time.time()
    metrics = None
    for i in range(args.warmup):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
    if metrics is not None:  # --warmup 0: first compile lands in the timing
        jax.device_get(metrics)
    print(f"# compile+warmup {time.time() - t0:.1f}s")

    import contextlib

    trace_cm = (jax.profiler.trace(args.profile) if args.profile
                else contextlib.nullcontext())

    # t0/t1 sit INSIDE the trace context: start_trace setup and stop_trace's
    # multi-MB serialization must not contaminate the reported img/s (the
    # metric line looks identical with/without --profile, so it must mean
    # the same thing)
    with trace_cm:
        t0 = time.time()
        for i in range(args.steps):
            state, metrics = step_fn(state, batch,
                                     jax.random.fold_in(key, 100 + i))
        loss = float(jax.device_get(
            metrics.get("train/loss", list(metrics.values())[0])))
        dt = time.time() - t0
    img_s = args.batch * args.steps / dt
    print(f"# {args.steps} steps in {dt:.2f}s, loss {loss:.4f}")
    print({"metric": "train_img_per_sec_per_chip",
           "value": round(img_s, 1), "unit": "img/s/chip",
           "ms_per_step": round(1000 * dt / args.steps, 1)})

    if args.mfu:
        # roofline of the exact compiled step (fwd+bwd+optimizer): cost
        # analysis of the jitted function, rated at the measured step time
        ca = step_fn.lower(state, batch, jax.random.fold_in(key, 0)) \
                    .compile().cost_analysis()
        fl, by = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        t_step = dt / args.steps
        from perf_breakdown import V5E_HBM_BW, V5E_PEAK_BF16

        peak_f, peak_b = V5E_PEAK_BF16, V5E_HBM_BW
        print(f"# train step: {fl/1e9:.1f} GFLOP, {by/1e9:.2f} GB accessed")
        print(f"# at {t_step*1e3:.1f} ms/step: FLOP util "
              f"{100*fl/t_step/peak_f:.1f}%, HBM util "
              f"{100*by/t_step/peak_b:.1f}% "
              f"(SOL step: max({fl/peak_f*1e3:.1f}, {by/peak_b*1e3:.1f}) ms)")

    if args.profile:
        from profile_bench import newest_trace, parse_trace

        res = parse_trace(args.profile, top=15)
        if res:
            total, ranked = res
            print(f"# device LEAF-op time over {args.steps} steps: "
                  f"{total / 1e6:.3f} s ({total / 1e6 / args.steps * 1000:.1f} "
                  f"ms/step; trace: {newest_trace(args.profile)})")
            for name, dur in ranked:
                print(f"  {dur / 1e6:8.3f}s {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
