#!/usr/bin/env python
"""Frame-autoregressive talking-face video synthesis CLI.

Reference-surface parity: talking_face/progressive_sampling_difftalk.py:245-439
— per clip: all masked frames + full audio from the dataset's 'sample' mode,
progressive DDIM generation where each generated latent conditions the next
frame, CFG over the class⊕audio context, pickle dump for save_videos.py.

TPU-first: all VQ encodes + audio-window encodings hoisted before one nested
lax.scan (frames ⊃ ddim steps). Clips run one at a time here; for
speaker-batched throughput use scripts/streaming_pipeline.py. Pass --frames
to pin the compiled shape — without it every distinct clip length is a fresh
compile (10-25 min each through the axon tunnel, CLAUDE.md).

Usage:
  python scripts/progressive_sampling.py --config <mead cfg> --ckpt <ckpt> \
      --tuples val.pkl --data-root <MEAD_v2> --audio-dir <precomputed_audio> \
      --outdir out/ --steps 50 --scale 2.0 [--clips 4] [--frames 96]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.cli import add_sampler_args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tuples", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--steps", type=int, default=50)
    add_sampler_args(ap)
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--clips", type=int, default=None, help="limit #clips")
    ap.add_argument("--frames", type=int, default=None,
                    help="pad/trim every clip to this many frames (enables batching)")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--audio-window", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.data import MEADTalkingFace
    from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
    from dsml_thesis_tpu.utils_io import load_params

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
    params = load_params(args.ckpt, ldm, cfg["model"], example_batch=example)
    from dsml_thesis_tpu.utils_io import cast_sampling_params

    params = cast_sampling_params(params)


    ds = MEADTalkingFace(
        args.tuples, args.data_root, args.audio_dir,
        audio_window=args.audio_window, size=args.size, mode="sample",
    )
    n_clips = min(args.clips or len(ds), len(ds))
    ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0)

    # the FULL pipeline (VQ encodes + cond encoders + nested scan + decode)
    # is one compiled program — no per-frame host round-trips
    pipeline = jax.jit(make_video_pipeline(
        ldm, ddim, args.audio_window, guidance_scale=args.scale,
        sampler=args.sampler, sampler_steps=args.sampler_steps,
        sampler_order=args.sampler_order,
    ))

    os.makedirs(args.outdir, exist_ok=True)
    for ci in range(n_clips):
        ex = ds[ci]
        F = int(ex["num_frames"]) if args.frames is None else args.frames
        masked = ex["masked_image"][:F]
        if masked.shape[0] < F:  # pad by repeating last frame
            rep = F - masked.shape[0]
            masked = np.concatenate([masked, np.repeat(masked[-1:], rep, 0)])
        # keep F + window audio frames: the last frames' windows reach t + w
        # into real future audio (reference clamps at the true clip length,
        # custom.py:394-396); pad-by-repeat beyond the clip end is equivalent
        # to that clamp
        w = args.audio_window
        audio = np.asarray(ex["audio"], np.float32)[: F + w]
        if audio.shape[0] < F + w:
            audio = np.concatenate(
                [audio, np.repeat(audio[-1:], F + w - audio.shape[0], 0)]
            )
        label = jnp.asarray([ex["class_label"]], jnp.int32)

        vid = np.asarray(pipeline(
            params, jnp.asarray(masked)[None], jnp.asarray(audio)[None],
            jnp.asarray(ex["identity"])[None], label, jax.random.PRNGKey(ci),
        ))[0]
        name = f"{ex['subj']}_{ex['human_label']}_{ex['lvl']}_{ex['nbr']}"
        with open(os.path.join(args.outdir, f"{name}.pkl"), "wb") as f:
            pickle.dump({
                "video": vid, "identity": np.asarray(ex["identity"]),
                "info": {k: ex[k] for k in ("subj", "human_label", "lvl", "nbr")},
            }, f)
        print(f"[{ci + 1}/{n_clips}] {name}: {vid.shape}")


if __name__ == "__main__":
    main()
