#!/usr/bin/env python
"""Single-frame MEAD talking-face sampling (BASELINE config 3).

Given a mouth-masked frame, an identity frame, an emotion label and a
wav2vec2 audio window, denoise one frame with the 4-cond LDM (class⊕audio
cross-attention, masked+identity channel concat) — the single-frame unit of
the progressive sampler, exposed directly.

Usage:
  python scripts/sample_mead_frame.py --config configs/latent-diffusion/mead-128-ldm-f4.yaml \
      --ckpt <ckpt> --masked masked.jpg --identity id.jpg --audio-pkl feats.pkl \
      --frame-idx 10 --class-label 1 --steps 50 --scale 2.0 --out frame.png
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--masked", required=True)
    ap.add_argument("--identity", required=True)
    ap.add_argument("--audio-pkl", required=True)
    ap.add_argument("--frame-idx", type=int, default=0)
    ap.add_argument("--class-label", type=int, default=0)
    ap.add_argument("--audio-window", type=int, default=None,
                    help="defaults to (config seq_len - 1) // 2; other values"
                         " would mismatch the audio encoder's seq_len reshape")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.data import load_image
    from dsml_thesis_tpu.utils_io import cast_sampling_params, load_params

    cfg = load_config([args.config])
    ldm = build_model(cfg["model"])
    seq_len = cfg["model"]["params"]["cond_stage_config_2"]["params"]["seq_len"]
    adim = cfg["model"]["params"]["cond_stage_config_2"]["params"]["subspace_dim"]
    example = {
        "image": jnp.zeros((1, args.size, args.size, 3)),
        "masked_image": jnp.zeros((1, args.size, args.size, 3)),
        "identity": jnp.zeros((1, args.size, args.size, 3)),
        "class_label": jnp.zeros((1,), jnp.int32),
        "audio": jnp.zeros((1, seq_len, adim)),
    }
    params = cast_sampling_params(
        load_params(args.ckpt, ldm, cfg["model"], example_batch=example)
    )

    with open(args.audio_pkl, "rb") as f:
        audio = np.asarray(pickle.load(f), np.float32)
    # the encoder hard-reshapes its input to seq_len rows (encoders.py):
    # the window must be (seq_len - 1) / 2 for the model's config
    w = ((seq_len - 1) // 2 if args.audio_window is None
         else args.audio_window)
    if 2 * w + 1 != seq_len:
        raise SystemExit(
            f"--audio-window {w} gives {2 * w + 1} rows but the config's "
            f"audio encoder expects seq_len={seq_len}"
        )
    t = args.frame_idx
    window = audio[[min(max(t + i, 0), len(audio) - 1) for i in range(-w, w + 1)]]

    batch = {
        "image": jnp.zeros((1, args.size, args.size, 3)),
        "masked_image": jnp.asarray(load_image(args.masked, args.size))[None],
        "identity": jnp.asarray(load_image(args.identity, args.size))[None],
        "class_label": jnp.asarray([args.class_label], jnp.int32),
        "audio": jnp.asarray(window)[None],
    }
    cond = ldm.encode_conditioning(params, batch)
    uncond = ldm.null_conditioning(params, batch, batch_size=1)
    ch_mult = cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"][
        "ch_mult"
    ]
    lat = args.size // (2 ** (len(ch_mult) - 1))
    z = ldm.sample_ddim(
        params, cond, (1, lat, lat, 3), jax.random.PRNGKey(args.seed),
        steps=args.steps, uncond=uncond, guidance_scale=args.scale,
    )
    img = np.asarray(jnp.clip(ldm.decode_first_stage(params, z), -1, 1))[0]
    from PIL import Image

    Image.fromarray(((img + 1) * 127.5).astype(np.uint8)).save(args.out)
    np.save(os.path.splitext(args.out)[0] + ".npy", img)
    print(f"saved {args.out} {img.shape}")


if __name__ == "__main__":
    main()
