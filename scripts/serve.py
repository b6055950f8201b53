#!/usr/bin/env python
"""Online talking-face synthesis server (micro-batching HTTP front end).

The deployment-facing counterpart of scripts/streaming_pipeline.py (offline
clip lists) and scripts/export_pipeline.py (AOT artifacts): concurrent
single-clip requests are micro-batched into the pipeline's compiled static
batch tier and dispatched as one device program per batch
(dsml_thesis_tpu/server.py). The reference has no online serving path; its
closest surface is the batch sampler script
(talking_face/scripts/progressive_sampling_difftalk.py).

Usage:
  python scripts/serve.py --config configs/latent-diffusion/mead-256-ldm-f4.yaml \
      [--ckpt last.ckpt] [--artifact pipeline.stablehlo] \
      [--batch 8 --frames 8 --steps 50 --scale 2.0 --size 256] \
      [--port 8000 --max-wait-ms 50] [--cpu]

Client contract (npz in, npz out — see dsml_thesis_tpu/server.py):
  POST /synthesize  npz{masked_frames[F,H,W,3], audio[T,D], identity[H,W,3],
                        class_label ()}  ->  npz{frames[F,H,W,3]}
  GET /healthz, GET /stats
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dsml_thesis_tpu.cli import add_sampler_args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--artifact", default=None,
                    help="serve a scripts/export_pipeline.py StableHLO "
                         "artifact instead of live-jitting (shape args below "
                         "must match how it was exported)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    add_sampler_args(ap, note="ignored with --artifact (the artifact's "
                              "baked-in chain is served)")
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--audio-window", type=int, default=8)
    ap.add_argument("--audio-seq", type=int, default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=50.0,
                    help="batching window after the first pending request")
    ap.add_argument("--seed", type=int, default=0,
                    help="server PRNG seed; batch i samples with "
                         "batch_key(seed, i) — fully reproducible")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the compile warmup batch before binding")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="admission cap on queued requests; beyond it new "
                         "requests get 503 immediately (load shedding) "
                         "instead of queueing toward a 504")
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel serving: replicate params and shard "
                         "each request batch over all devices (batch tier "
                         "must divide the device count)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
    from dsml_thesis_tpu.server import (
        MicroBatcher, PipelineServer, make_pipeline_runner,
    )
    from dsml_thesis_tpu.utils_io import cast_sampling_params, load_params

    cfg = load_config([args.config])
    ldm = build_model(cfg["model"])
    c2 = cfg["model"]["params"]["cond_stage_config_2"]["params"]
    seq_len, adim = c2["seq_len"], c2["subspace_dim"]
    audio_seq = args.audio_seq or (args.frames + args.audio_window)
    example = {
        "image": np.zeros((1, args.size, args.size, 3), np.float32),
        "masked_image": np.zeros((1, args.size, args.size, 3), np.float32),
        "identity": np.zeros((1, args.size, args.size, 3), np.float32),
        "class_label": np.zeros((1,), np.int32),
        "audio": np.zeros((1, seq_len, adim), np.float32),
    }
    params = cast_sampling_params(
        load_params(args.ckpt, ldm, cfg["model"], example_batch=example)
    )

    if args.artifact and args.sampler != "ddim":
        # the chain is baked into the artifact at export time; silently
        # serving a different one than requested would go unnoticed
        ap.error("--sampler cannot be changed when serving an --artifact; "
                 "re-export with scripts/export_pipeline.py --sampler "
                 f"{args.sampler}")

    if args.artifact:
        from dsml_thesis_tpu.serving import load_exported

        exported = load_exported(args.artifact)
        pipeline_fn = exported.call
        print(f"# serving exported artifact {args.artifact} "
              f"(exported for {exported.nr_devices} device(s))")
    else:
        ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0)
        pipeline_fn = jax.jit(make_video_pipeline(
            ldm, ddim, args.audio_window, guidance_scale=args.scale,
            sampler=args.sampler, sampler_steps=args.sampler_steps,
            sampler_order=args.sampler_order,
        ))
        chain = (f"{args.steps} DDIM steps" if args.sampler == "ddim" else
                 f"DPM-Solver++ o{args.sampler_order} "
                 f"{args.sampler_steps} evals")
        print(f"# serving live-jitted pipeline ({chain}, cfg {args.scale})")

    mesh = None
    if args.mesh:
        from dsml_thesis_tpu.parallel import make_mesh

        mesh = make_mesh()
        if args.batch % mesh.shape["data"]:
            ap.error(f"--batch {args.batch} must divide over the "
                     f"{mesh.shape['data']}-device data mesh")
        print(f"# data-parallel serving over {mesh.shape['data']} devices")
    if args.artifact:
        # an Exported is compiled for a FIXED device count; a mismatch would
        # otherwise surface as an opaque per-request error after binding
        want_devices = mesh.size if mesh is not None else 1
        if exported.nr_devices != want_devices:
            ap.error(
                f"artifact was exported for {exported.nr_devices} device(s) "
                f"but this serving layout uses {want_devices} "
                f"({'--mesh' if mesh is not None else 'single-device'}); "
                "re-export with the matching scripts/export_pipeline.py "
                "--mesh setting")
    runner = make_pipeline_runner(pipeline_fn, params, seed=args.seed,
                                  mesh=mesh)
    clip_shapes = {
        "masked_frames": (args.frames, args.size, args.size, 3),
        "audio": (audio_seq, adim),
        "identity": (args.size, args.size, 3),
        "class_label": (),
    }

    if not args.no_warmup:
        import time

        t0 = time.monotonic()
        dummy = {
            k: np.zeros((args.batch,) + tuple(s), np.float32)
            for k, s in clip_shapes.items()
        }
        dummy["class_label"] = dummy["class_label"].astype(np.int32)
        np.asarray(runner(dummy, 0))
        print(f"# warmup compile+run {time.monotonic() - t0:.1f}s")

    batcher = MicroBatcher(runner, args.batch, max_wait_ms=args.max_wait_ms,
                           max_queue=args.max_queue)
    server = PipelineServer(batcher, clip_shapes)
    print(f"# listening on {args.host}:{args.port} "
          f"(batch tier {args.batch}, window {args.max_wait_ms}ms)")
    server.serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
