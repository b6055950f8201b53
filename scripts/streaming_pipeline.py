#!/usr/bin/env python
"""Batched multi-speaker streaming synthesis pipeline (serving-style).

BASELINE.json config 5: "audio featurize → denoise → VQGAN decode → metrics"
as a continuously-fed pipeline: host threads prepare the next batch of clips
(image/audio loading + VQ-encode conditioning) while the device runs the
current batch's denoise+decode; per-batch throughput and optional PSNR/SSIM
against ground truth are reported as each batch drains.

Clips are padded to --frames so every batch reuses one compiled program.
"""
import argparse
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dsml_thesis_tpu.cli import add_sampler_args


class _SyntheticClips:
    """In-memory random clips with the MEADTalkingFace sample-mode field
    surface — lets the streaming pipeline run as a pure device/host-overlap
    bench on hosts without the dataset."""

    def __init__(self, n, size, frames, window, adim, prep_delay=0.0):
        self.n, self.size = n, size
        self.frames, self.window, self.adim = frames, window, adim
        self.prep_delay = prep_delay
        self._rs = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.prep_delay:
            time.sleep(self.prep_delay)
        F, w, s = self.frames, self.window, self.size
        return {
            "masked_image": self._rs.rand(F, s, s, 3).astype(np.float32) - .5,
            "identity": self._rs.rand(s, s, 3).astype(np.float32) - .5,
            "class_label": i % 8,
            "audio": self._rs.randn(F + w, self.adim).astype(np.float32),
            "subj": f"synth{i}", "human_label": "neutral",
            "lvl": "level_1", "nbr": "001",
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tuples", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--audio-dir", default=None)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="bench mode: N random in-memory clips instead of a "
                         "dataset (no --tuples/--outdir needed); reports the "
                         "same cumulative frames/s so the host-overlap path "
                         "can be compared against bench.py's static number")
    ap.add_argument("--prep-delay", type=float, default=0.0,
                    help="with --synthetic: artificial host-prep seconds per "
                         "batch, emulating file IO to probe when the "
                         "producer thread starts starving the device")
    ap.add_argument("--batch", type=int, default=4, help="speakers per batch")
    ap.add_argument("--frames", type=int, default=32, help="frames per clip (pad/trim)")
    ap.add_argument("--steps", type=int, default=50)
    add_sampler_args(ap)
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--audio-window", type=int, default=8)
    ap.add_argument("--metrics", action="store_true",
                    help="PSNR/SSIM of generated vs ground-truth frames")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from dsml_thesis_tpu.config import build_model, load_config
    from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_video_pipeline
    from dsml_thesis_tpu.data import MEADTalkingFace
    from dsml_thesis_tpu.metrics import psnr, ssim, to_unit_range
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
    if args.synthetic:
        if args.metrics:
            ap.error("--synthetic clips have no ground truth; "
                     "--metrics needs the real-dataset mode")
        ds = _SyntheticClips(args.synthetic, args.size, args.frames,
                             args.audio_window, adim, args.prep_delay)
    else:
        if not (args.tuples and args.data_root and args.audio_dir
                and args.outdir):
            ap.error("--tuples/--data-root/--audio-dir/--outdir are required "
                     "without --synthetic")
        ds = MEADTalkingFace(args.tuples, args.data_root, args.audio_dir,
                             audio_window=args.audio_window, size=args.size,
                             mode="sample")
    ddim = make_ddim_schedule(ldm.schedule, args.steps, eta=0.0)
    B, F, w = args.batch, args.frames, args.audio_window

    def prepare(idx_list):
        """Host side: file IO only — all encodes run inside the compiled
        pipeline on-device (overlapped with the previous batch's synthesis)."""
        ms, ids, labels, feats, gts, names = [], [], [], [], [], []
        for ci in idx_list:
            ex = ds[ci]
            masked = ex["masked_image"][:F]
            gt_frames = None
            if args.metrics:
                clip_dir = ds._clip_dir(ex["subj"], ex["human_label"], ex["lvl"],
                                        ex["nbr"])
                from dsml_thesis_tpu.data import load_images

                frames = sorted(os.listdir(clip_dir))[:F]
                gt_frames = load_images(
                    [os.path.join(clip_dir, f) for f in frames], args.size
                )
            if masked.shape[0] < F:
                masked = np.concatenate(
                    [masked, np.repeat(masked[-1:], F - masked.shape[0], 0)]
                )
            # F + window frames: tail windows reach real future audio
            # (pad-by-repeat == the reference's end-of-clip clamp)
            audio = np.asarray(ex["audio"], np.float32)[: F + w]
            if audio.shape[0] < F + w:
                audio = np.concatenate(
                    [audio, np.repeat(audio[-1:], F + w - audio.shape[0], 0)]
                )
            ms.append(masked)
            ids.append(ex["identity"])
            labels.append(ex["class_label"])
            feats.append(audio)
            gts.append(gt_frames)
            names.append(f"{ex['subj']}_{ex['human_label']}_{ex['lvl']}_{ex['nbr']}")
        return (jnp.asarray(np.stack(ms)), jnp.asarray(np.stack(feats)),
                jnp.asarray(np.stack(ids)), jnp.asarray(labels, jnp.int32),
                names, gts)

    synth = jax.jit(make_video_pipeline(
        ldm, ddim, w, guidance_scale=args.scale,
        sampler=args.sampler, sampler_steps=args.sampler_steps,
        sampler_order=args.sampler_order,
    ))

    # pipeline: host prep thread feeds a queue; device consumes
    batches = [list(range(s, min(s + B, len(ds))))
               for s in range(0, len(ds), B)]
    if batches and len(batches[-1]) < B:
        # pad the ragged tail by repeating the last clip (static shapes);
        # padded slots are dropped at write time via the names list
        tail = batches[-1]
        pad = B - len(tail)
        print(f"note: final batch padded with {pad} repeated clip(s)")
        batches[-1] = tail + [tail[-1]] * pad
        n_real_last = len(tail)
    else:
        n_real_last = B
    q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        try:
            for bi, idxs in enumerate(batches):
                q.put((bi, prepare(idxs)))
        except BaseException as e:  # surface to the consumer — a dead
            q.put(e)                # producer would hang q.get() forever
            return
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
    t0 = time.time()
    steady_t0 = steady_base = None  # set after batch 0 (compile) drains
    stats = {"done_frames": 0}

    def drain(pending):
        """Materialize + write a finished batch. Called AFTER the next
        batch's synth has been dispatched, so the device→host copy (25 MB
        per 8-clip batch — seconds through the axon tunnel) and file
        writes overlap the device computing the next batch instead of
        stalling it (measured on-chip: sync drain cost ~11% steady-state
        throughput vs bench.py's static number)."""
        nonlocal steady_t0, steady_base
        bi, names, gts, out = pending
        vids = np.asarray(out)
        stats["done_frames"] += len(names) * vids.shape[1]
        line = f"batch {bi}: {vids.shape}"
        if args.metrics and gts[0] is not None:
            a = to_unit_range(jnp.asarray(vids[0][: len(gts[0])]))
            b = to_unit_range(jnp.asarray(gts[0]))
            line += (f" psnr={float(jnp.mean(psnr(a, b))):.2f}"
                     f" ssim={float(jnp.mean(ssim(a, b))):.3f}")
        if args.outdir:
            for i, name in enumerate(names):
                np.save(os.path.join(args.outdir, f"{name}.npy"), vids[i])
        elapsed = time.time() - t0
        line += f" | cumulative {stats['done_frames'] / elapsed:.2f} frames/s"
        # steady-state excludes batch 0's compile: THIS is the number to
        # hold against bench.py's warm static-batch fps
        if steady_t0 is None:
            steady_t0, steady_base = time.time(), stats["done_frames"]
        else:
            ss = ((stats["done_frames"] - steady_base)
                  / (time.time() - steady_t0))
            line += f" | steady {ss:.2f} frames/s"
        print(line, flush=True)

    pending = None
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        bi, (masked, feats, ids, labels, names, gts) = item
        if bi == len(batches) - 1 and n_real_last < B:
            names = names[:n_real_last]  # drop padded duplicates at write
        # --metrics runs jnp PSNR/SSIM inside drain(): those device programs
        # would enqueue BEHIND a just-dispatched synth and stall a whole
        # batch (plus re-upload ~25 MB through the tunnel mid-flight), so
        # the metrics path keeps the drain-before-dispatch order; the
        # throughput path dispatches first and drains under the device
        if args.metrics and pending is not None:
            drain(pending)
            pending = None
        # dispatch is async: the device starts this batch now...
        out = synth(params, masked, feats, ids, labels, jax.random.PRNGKey(bi))
        # ...while the host drains the PREVIOUS batch under it
        if pending is not None:
            drain(pending)
        # padded duplicate clips in the final batch do not count as output
        pending = (bi, names, gts, out)
    if pending is not None:
        drain(pending)


if __name__ == "__main__":
    main()
