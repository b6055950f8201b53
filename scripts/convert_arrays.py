#!/usr/bin/env python
"""Array/image conversion utilities.

Reference-surface parity: face_reenactment/utils/{npy2img,npy2img_v2,npz2img,
npy2npz,resize_imgdir}.py — convert sample npy/npz dumps to image files and
back, and batch-resize image directories.

Usage:
  python scripts/convert_arrays.py npy2img --input class_0.npy --outdir imgs/
  python scripts/convert_arrays.py img2npy --indir imgs/ --output stack.npy [--size 128]
  python scripts/convert_arrays.py resize --indir imgs/ --outdir small/ --size 128
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def to_uint8(arr: np.ndarray) -> np.ndarray:
    """[-1,1] or [0,1] float -> uint8."""
    if arr.dtype == np.uint8:
        return arr
    if arr.min() < -0.01:
        arr = (arr + 1.0) / 2.0
    return (np.clip(arr, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["npy2img", "img2npy", "resize"])
    ap.add_argument("--input", default=None, help="npy/npz file")
    ap.add_argument("--indir", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--key", default=None, help="array key inside an npz")
    args = ap.parse_args()

    if args.mode == "npy2img":
        assert args.input and args.outdir
        if args.input.endswith(".npz"):
            data = np.load(args.input)
            arr = data[args.key or list(data.keys())[0]]
        else:
            arr = np.load(args.input)
        if arr.ndim == 3:
            arr = arr[None]
        os.makedirs(args.outdir, exist_ok=True)
        base = os.path.splitext(os.path.basename(args.input))[0]
        for i, img in enumerate(to_uint8(arr)):
            im = Image.fromarray(img)
            if args.size:
                im = im.resize((args.size, args.size), Image.BICUBIC)
            im.save(os.path.join(args.outdir, f"{base}_{i:05d}.png"))
        print(f"wrote {len(arr)} images to {args.outdir}")

    elif args.mode == "img2npy":
        assert args.indir and args.output
        from dsml_thesis_tpu.data import load_image

        paths = sorted(glob.glob(os.path.join(args.indir, "*.jpg"))
                       + glob.glob(os.path.join(args.indir, "*.png")))
        arr = np.stack([load_image(p, args.size) for p in paths])
        np.save(args.output, arr)
        print(f"stacked {len(paths)} images -> {args.output} {arr.shape}")

    else:  # resize
        assert args.indir and args.outdir and args.size
        os.makedirs(args.outdir, exist_ok=True)
        paths = sorted(glob.glob(os.path.join(args.indir, "*.jpg"))
                       + glob.glob(os.path.join(args.indir, "*.png")))
        for p in paths:
            img = Image.open(p).convert("RGB")
            img = img.resize((args.size, args.size), Image.BICUBIC)
            img.save(os.path.join(args.outdir, os.path.basename(p)))
        print(f"resized {len(paths)} images -> {args.outdir}")


if __name__ == "__main__":
    main()
