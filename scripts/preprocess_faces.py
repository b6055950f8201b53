#!/usr/bin/env python
"""Offline face preprocessing: align / mask / mouth-crop from landmark pkls.

Reference-surface parity:
  - face_reenactment/align/align.py:220-313 (crop_align_affectnet: aligned
    224px crops named `<label>_<origname>.jpg`)
  - talking_face/scripts/mask.py (mouth-masked frames)
  - talking_face/scripts/crop_mouth.py / crop_mouth_gt.py (mouth ROI crops)

Landmark detection is external (FAN/dlib/MTCNN); this consumes per-image
68-point landmark pkls: <name>.pkl next to or mirroring each image.
"""
import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from dsml_thesis_tpu.data.align import align_face, crop_mouth_roi, mask_mouth_region


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["align", "mask", "mouth"], required=True)
    ap.add_argument("--images", required=True, help="dir of jpg/png frames")
    ap.add_argument("--landmarks", required=True,
                    help="dir of <name>.pkl 68-point landmark files")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--label", type=int, default=None,
                    help="emotion label prefix for aligned AffectNet naming")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    paths = sorted(
        glob.glob(os.path.join(args.images, "*.jpg"))
        + glob.glob(os.path.join(args.images, "*.png"))
    )
    done = 0
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        lm_path = os.path.join(args.landmarks, name + ".pkl")
        if not os.path.exists(lm_path):
            continue
        with open(lm_path, "rb") as f:
            lm = np.asarray(pickle.load(f), dtype=np.float32)
        img = np.asarray(Image.open(p).convert("RGB"))

        if args.mode == "align":
            out = align_face(img, lm, output_size=args.size)
            prefix = f"{args.label}_" if args.label is not None else ""
            Image.fromarray(out).save(
                os.path.join(args.outdir, f"{prefix}{name}.jpg")
            )
        elif args.mode == "mask":
            m11 = img.astype(np.float32) / 127.5 - 1.0
            out = mask_mouth_region(m11, lm)
            Image.fromarray(((out + 1) * 127.5).astype(np.uint8)).save(
                os.path.join(args.outdir, f"{name}.jpg")
            )
        else:
            out = crop_mouth_roi(img, lm, crop=min(args.size, 96))
            Image.fromarray(out).save(os.path.join(args.outdir, f"{name}.jpg"))
        done += 1
    print(f"{args.mode}: processed {done}/{len(paths)} images -> {args.outdir}")


if __name__ == "__main__":
    main()
