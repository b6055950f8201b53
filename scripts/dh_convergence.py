#!/usr/bin/env python
"""Controlled head-width convergence pair: do the dh64 record configs TRAIN?

The 7.87 (dh64) / 4.97 (fullattn-dh64) f/s/chip records are for configs
whose only delta vs the flagship is `num_head_channels: 64` — the reference
head-width knob (face_reenactment/ldm/modules/diffusionmodules/
openaimodel.py:443-468). Head width changes NO parameter shapes (qkv/out
projections stay [C, C]; num_heads = C/dh only changes the attention
reshape), so this runs the SAME training recipe at dh=32 and dh=64 on
identical synthetic data/seeds and records both loss curves — evidence the
wider-head variant optimizes comparably, not just samples faster.

Scaled-down model (same MEAD 4-cond family, attention where the head knob
bites); run on-chip or --cpu. Output: one JSON line per width with the
loss curve, plus a side-by-side summary.

Usage:
  python scripts/dh_convergence.py [--steps 300 --res 64 --batch 8]
      [--widths 32 64] [--cpu] [--out /tmp/dh_convergence.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def model_cfg(dh: int, res: int):
    """MEAD-family 4-cond LDM scaled to `res` px (f4 latent), attention at
    ds=2 (channels 2*mc — divisible by 64), head width = dh."""
    mc = 128
    return {
        "target": "ldm.models.diffusion.ddpm2cond.LatentDiffusion",
        "params": {
            "linear_start": 0.0015, "linear_end": 0.0205, "timesteps": 1000,
            "image_size": res // 4, "channels": 3,
            "first_stage_key": "image",
            "cond_stage_key_1": "class_label", "cond_stage_key_2": "audio",
            "cond_stage_trainable": True, "conditioning_key": "crossattn",
            "scale_factor": 1.0,
            "scheduler_config": {
                "target": "ldm.lr_scheduler.LambdaLinearScheduler",
                "params": {"warm_up_steps": [50], "cycle_lengths": [10000000],
                           "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0]},
            },
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {
                    "image_size": res // 4, "in_channels": 9,
                    "out_channels": 3, "model_channels": mc,
                    "attention_resolutions": [2], "num_res_blocks": 1,
                    "channel_mult": [1, 2], "num_head_channels": dh,
                    "use_spatial_transformer": True, "transformer_depth": 1,
                    "context_dim": 80,
                },
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {
                    "embed_dim": 3, "n_embed": 512,
                    "ddconfig": {
                        "double_z": False, "z_channels": 3, "resolution": res,
                        "in_channels": 3, "out_ch": 3, "ch": 32,
                        "ch_mult": [1, 2, 2], "num_res_blocks": 1,
                        "attn_resolutions": [], "dropout": 0.0,
                    },
                    "lossconfig": {"target": "torch.nn.Identity"},
                },
            },
            "cond_stage_config_1": {
                "target": "ldm.modules.encoders.modules.ClassEmbedder",
                "params": {"embed_dim": 16, "n_classes": 8,
                           "key": "class_label"},
            },
            "cond_stage_config_2": {
                "target": "ldm.modules.encoders.modules.Conv1DTemporalAttention",
                "params": {"seq_len": 5, "subspace_dim": 64,
                           "subspace2hidden": False},
            },
        },
    }


def run_width(dh, args):
    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.training.train_state import (
        create_train_state, make_eval_step, make_optimizer, make_train_step)

    cfg = model_cfg(dh, args.res)
    ldm = build_model(cfg)
    B, res = args.batch, args.res
    c2p = cfg["params"]["cond_stage_config_2"]["params"]

    def make_batch(rs):
        img = rs.rand(B, res, res, 3).astype(np.float32) * 2 - 1
        # masked_image = the target with its lower half zeroed: the concat
        # conditioning is informative, so the loss has real signal to mine
        masked = img.copy()
        masked[:, res // 2:] = 0.0
        return {
            "image": jnp.asarray(img),
            "masked_image": jnp.asarray(masked),
            "identity": jnp.asarray(
                rs.rand(B, res, res, 3).astype(np.float32) * 2 - 1),
            "class_label": jnp.asarray(rs.randint(0, 8, (B,))),
            "audio": jnp.asarray(
                rs.randn(B, c2p["seq_len"], c2p["subspace_dim"])
                .astype(np.float32)),
        }

    rs = np.random.RandomState(0)  # SAME data stream for every width
    batches = [make_batch(rs) for _ in range(16)]
    val_batch = make_batch(np.random.RandomState(99))

    params = ldm.init_params(jax.random.PRNGKey(args.seed), batches[0])
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(params)) / 1e6
    tx = make_optimizer(ldm, params, args.lr,
                        scheduler_config=cfg["params"]["scheduler_config"])
    state = create_train_state(ldm, params, tx)
    train_step = jax.jit(make_train_step(ldm, tx))
    eval_step = jax.jit(make_eval_step(ldm))

    rng = jax.random.PRNGKey(1)
    losses, vals = [], []
    t0 = time.time()
    for i in range(args.steps):
        state, m = train_step(state, batches[i % len(batches)], rng)
        losses.append(float(m.get("train/loss", m.get("train/loss_simple"))))
        if i % args.val_every == 0 or i == args.steps - 1:
            ev = eval_step(state, val_batch, jax.random.PRNGKey(2))
            vals.append((i, float(ev["val_loss"]), float(ev["val_loss_ema"])))
            print(f"dh{dh} step {i}: train {losses[-1]:.4f} "
                  f"val {vals[-1][1]:.4f} val_ema {vals[-1][2]:.4f}",
                  file=sys.stderr, flush=True)
    dt = time.time() - t0

    k = max(1, args.steps // 10)
    rec = {
        "dh": dh, "params_M": round(n_params, 2), "steps": args.steps,
        "lr": args.lr, "batch": B, "res": res,
        "loss_first10": round(float(np.mean(losses[:k])), 4),
        "loss_last10pct": round(float(np.mean(losses[-k:])), 4),
        "val": [(i, round(v, 4), round(e, 4)) for i, v, e in vals],
        "train_s": round(dt, 1),
        "losses_every5": [round(float(x), 4) for x in losses[::5]],
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    recs = [run_width(dh, args) for dh in args.widths]
    for r in recs:
        print(json.dumps(r))
    if len(recs) >= 2:
        a, b = recs[0], recs[1]
        print(f"# dh{a['dh']}: {a['loss_first10']} -> {a['loss_last10pct']}"
              f" | dh{b['dh']}: {b['loss_first10']} -> {b['loss_last10pct']}")
        # how far the two curves separate: attention is zero-init
        # (proj_out), so the widths only diverge once training has moved
        # proj_out — near-zero separation on a LONG run would mean the
        # head knob never became material and the run proves nothing
        d = np.abs(np.asarray(a["losses_every5"])
                   - np.asarray(b["losses_every5"]))
        print(f"# curve separation: max {d.max():.4f} "
              f"(late-half max {d[len(d)//2:].max():.4f})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(recs, f, indent=1)


if __name__ == "__main__":
    main()
