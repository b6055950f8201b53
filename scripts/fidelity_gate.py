#!/usr/bin/env python
"""Fidelity gate for the flagship bf16+flash sampling path.

Runs the 256px progressive sampler twice on IDENTICAL weights and noise:
  A) reference numerics: fp32 params, XLA attention (DSML_FLASH_ATTN=0)
  B) flagship numerics: bf16-cast params, Pallas flash attention
and reports PSNR(B vs A) over the decoded frames — the recorded fidelity of
every numerical shortcut the benchmark takes (BASELINE budget: within 0.5 dB
of reference numerics). Optionally also isolates the flash kernel alone
(fp32 params, flash on) with --isolate-flash.

Random-init weights make this conservative: an untrained UNet's reverse chain
amplifies rounding differences more than a trained, smooth model would.

Usage: python scripts/fidelity_gate.py [--res 256 --steps 50 --frames 4
       --batch 2] [--config path.yaml] [--isolate-flash] [--tiny]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--isolate-flash", action="store_true")
    ap.add_argument("--ab-env", default=None, metavar="KEY=VALUE",
                    help="env var applied ONLY to the flagship (B) run — "
                         "gates opt-in levers, e.g. DSML_ATTN_PACKED=1 or "
                         "DSML_GN_EPILOGUE=res, against reference numerics")
    ap.add_argument("--csim", action="store_true",
                    help="also report ΔCSIM between the two runs' frames "
                         "(BASELINE.json budget: ≤0.01) through an "
                         "iresnet18 identity backbone")
    ap.add_argument("--csim-weights", default=None,
                    help="torch iresnet18 ckpt for --csim; without it a "
                         "random-init backbone is used (conservative: an "
                         "untrained net amplifies input differences)")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
    from dsml_thesis_tpu.metrics import psnr, to_unit_range
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    if args.tiny:
        import yaml

        sys.path.insert(0, "tests")
        from test_ldm import TINY_MEAD_CFG

        cfg = yaml.safe_load(TINY_MEAD_CFG)
        args.res, args.batch, args.frames, args.steps = 16, 1, 2, 4
    else:
        path = args.config or f"configs/latent-diffusion/mead-{args.res}-ldm-f4.yaml"
        cfg = load_config([path])

    def build(dtype):
        c = json.loads(json.dumps(cfg))  # deep copy
        p = c["model"]["params"]
        p["unet_config"]["params"]["dtype"] = dtype
        if "dtype" in p.get("first_stage_config", {}).get("params", {}):
            p["first_stage_config"]["params"]["dtype"] = dtype
        return build_model(c["model"])

    ldm32 = build("float32")
    ldm16 = build("bfloat16") if not args.tiny else ldm32

    c2p = cfg["model"]["params"].get("cond_stage_config_2", {}).get(
        "params", {"seq_len": 5, "subspace_dim": 32})
    w = (c2p["seq_len"] - 1) // 2
    B, F, S = args.batch, args.frames, args.steps
    batch = {
        "image": jnp.zeros((B, args.res, args.res, 3)),
        "masked_image": jnp.zeros((B, args.res, args.res, 3)),
        "identity": jnp.zeros((B, args.res, args.res, 3)),
        "class_label": jnp.zeros((B,), jnp.int32),
        "audio": jnp.zeros((B, c2p["seq_len"], c2p["subspace_dim"])),
    }
    params32 = ldm32.init_params(jax.random.PRNGKey(0), batch)
    params16 = cast_sampling_params(params32)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    masked = jax.random.normal(ks[0], (B, F, args.res, args.res, 3)) * 0.5
    audio = jax.random.normal(ks[1], (B, F, c2p["subspace_dim"]))
    ident = jax.random.normal(ks[2], (B, args.res, args.res, 3)) * 0.5
    labels = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(7)
    ddim = make_ddim_schedule(ldm32.schedule, S, eta=0.0)

    ab_key = ab_val = None
    if args.ab_env:
        ab_key, _, ab_val = args.ab_env.partition("=")
        os.environ.pop(ab_key, None)

    def run(ldm, params, flash: bool, ab: bool = False):
        os.environ["DSML_FLASH_ATTN"] = "1" if flash else "0"
        if ab_key:
            if ab:
                os.environ[ab_key] = ab_val
            else:
                os.environ.pop(ab_key, None)
        pipe = make_video_pipeline(ldm, ddim, w, guidance_scale=args.guidance)
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(
            lambda p, k: pipe(p, masked, audio, ident, labels, k)
        )(params, key))
        print(f"# flash={flash} dtype={ldm.unet.dtype if hasattr(ldm.unet, 'dtype') else '?'} "
              f"compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        return out

    ref = run(ldm32, params32, flash=False)
    flag = run(ldm16, params16, flash=True, ab=True)
    p_flag = float(jnp.mean(psnr(to_unit_range(flag), to_unit_range(ref))))
    result = {"metric": "psnr_bf16flash_vs_fp32_db", "value": round(p_flag, 2),
              "steps": S, "frames": F, "res": args.res}
    if args.ab_env:
        result["ab_env"] = args.ab_env
    if args.isolate_flash:
        mid = run(ldm32, params32, flash=True)
        result["psnr_flash_only_db"] = round(float(jnp.mean(
            psnr(to_unit_range(mid), to_unit_range(ref)))), 2)
        result["psnr_bf16_given_flash_db"] = round(float(jnp.mean(
            psnr(to_unit_range(flag), to_unit_range(mid)))), 2)
    if args.csim:
        # BASELINE.json's ΔCSIM ≤ 0.01 budget: identity-embedding cosine
        # between the reference-numerics and flagship-numerics frames. With
        # --csim-weights the real converted backbone scores; random-init is
        # the conservative fallback (an untrained net amplifies pixel
        # differences rather than smoothing them).
        from dsml_thesis_tpu.metrics import cosine_similarity
        from dsml_thesis_tpu.models.arcface import (_BLOCKS, convert_iresnet,
                                                    iresnet)

        model = iresnet("iresnet18")
        if args.csim_weights:
            import torch

            sd = torch.load(args.csim_weights, map_location="cpu",
                            weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            p_bb, st_bb = convert_iresnet(sd, _BLOCKS["iresnet18"])
            variables = {"params": p_bb, "batch_stats": st_bb}
        else:
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 112, 112, 3)))

        apply_jit = jax.jit(model.apply)  # one trace/compile for both embeds

        def embed(frames):
            x = to_unit_range(frames).reshape((-1,) + frames.shape[-3:])
            x = jax.image.resize(x, (x.shape[0], 112, 112, 3), "bilinear")
            return apply_jit(variables, x * 2.0 - 1.0)

        cs = cosine_similarity(embed(flag), embed(ref))
        result["csim_flag_vs_ref"] = round(float(jnp.mean(cs)), 4)
        result["csim_delta"] = round(float(1.0 - jnp.mean(cs)), 4)
        result["csim_backbone"] = (args.csim_weights
                                   or "random-init iresnet18")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
