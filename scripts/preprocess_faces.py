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


def run_affectnet_csv(args):
    """crop_align_affectnet (align/align.py:220-313): CSV-driven AffectNet
    pipeline — resize 256, detector bbox squared crop (fallback: the CSV's
    face box), resize to --size, re-detect landmarks, reference eye rotation,
    save as `<label>_<name>` for labels 0..7."""
    import csv

    from dsml_thesis_tpu.data.align import (
        affectnet_square_crop,
        reference_eye_rotation,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from preprocess_mead import make_fan_detector

    detect = make_fan_detector(args.device)
    os.makedirs(args.outdir, exist_ok=True)

    def resize(img, s):
        return np.asarray(Image.fromarray(img).resize((s, s), Image.BILINEAR))

    n = 0
    with open(args.csv) as f:
        for row in csv.DictReader(f):
            label = int(row["expression"])
            if not 0 <= label <= 7:  # skip None/Uncertain/No-Face
                continue
            path = os.path.join(args.images, row["subDirectory_filePath"])
            if not os.path.exists(path):
                continue
            name = os.path.basename(row["subDirectory_filePath"])
            save = os.path.join(args.outdir, f"{label}_{name}")
            if os.path.exists(save):
                continue
            img = np.asarray(Image.open(path).convert("RGB"))
            img256 = resize(img, 256)
            lm = detect(img256)
            if lm is not None:
                bbox = (lm[:, 0].min(), lm[:, 1].min(),
                        lm[:, 0].max(), lm[:, 1].max())
                img_ = affectnet_square_crop(img256, bbox)
            else:
                x, y, w, h = (int(row["face_x"]), int(row["face_y"]),
                              int(row["face_width"]), int(row["face_height"]))
                # the reference's fallback indexes rows by x / cols by y
                # (align.py:288) and asserts x==y, w==h upfront (:252) —
                # quirks kept/dropped respectively: the crop is replicated
                # verbatim, the data-dependent assert is not
                img_ = img[x:x + w, y:y + h]
            img_ = resize(img_, args.size)
            lm2 = detect(img_)
            if lm2 is not None:
                img_ = reference_eye_rotation(img_, lm2).astype(np.uint8)
            Image.fromarray(img_).save(save)
            n += 1
    print(f"affectnet-csv: saved {n} aligned crops -> {args.outdir}")


def run_detect_crop(args):
    """face_detection.py equivalent: detector bounding-box crops of the
    AffectNet CSV rows, saved as `<label>_<origname>` (reference
    face_reenactment/scripts/face_detection.py:15-26). The detector is
    external as upstream (MTCNN there); uses the `mtcnn` package when
    importable, else the FAN landmark bbox."""
    import csv

    detect_box = None
    try:
        from mtcnn import MTCNN  # optional, as upstream

        det = MTCNN()

        def detect_box(img):
            d = det.detect_faces(img)
            return d[0]["box"] if d else None
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from preprocess_mead import make_fan_detector

        fan = make_fan_detector(args.device)

        def detect_box(img):
            lm = fan(img)
            if lm is None:
                return None
            x0, y0 = lm[:, 0].min(), lm[:, 1].min()
            return [int(x0), int(y0), int(lm[:, 0].max() - x0),
                    int(lm[:, 1].max() - y0)]

    os.makedirs(args.outdir, exist_ok=True)
    n = 0
    with open(args.csv) as f:
        for row in csv.DictReader(f):
            label = int(row["expression"])
            if not 0 <= label <= 7:
                continue
            path = os.path.join(args.images, row["subDirectory_filePath"])
            if not os.path.exists(path):
                continue
            img = np.asarray(Image.open(path).convert("RGB"))
            box = detect_box(img)
            if box is None:
                continue
            x, y, w, h = box
            # detectors return negative coords near image edges; clamp so the
            # slice can't wrap around or come out empty
            x0, y0 = max(int(x), 0), max(int(y), 0)
            x1 = min(int(x) + int(w), img.shape[1])
            y1 = min(int(y) + int(h), img.shape[0])
            if x1 <= x0 or y1 <= y0:
                continue
            name = os.path.basename(row["subDirectory_filePath"])
            Image.fromarray(img[y0:y1, x0:x1]).save(
                os.path.join(args.outdir, f"{label}_{name}")
            )
            n += 1
    print(f"detect-crop: saved {n} face crops -> {args.outdir}")


def run_openface(args):
    """affectnet_openface.py equivalent: run the OpenFace FaceLandmarkImg
    binary (AU extraction + 128px sim-aligned crops) over the CSV rows
    (reference face_reenactment/scripts/affectnet_openface.py:12-22)."""
    import csv
    import subprocess

    os.makedirs(args.outdir, exist_ok=True)
    n = 0
    with open(args.csv) as f:
        for row in csv.DictReader(f):
            if not 0 <= int(row["expression"]) <= 7:
                continue
            path = os.path.join(args.images, row["subDirectory_filePath"])
            if not os.path.exists(path):
                continue
            # argv list, not str.split: paths may contain spaces
            subprocess.run(
                [args.openface_bin, "-f", path, "-out_dir", args.outdir,
                 "-aus", "-simalign", "-au_static", "-nobadaligned",
                 "-simsize", "128", "-format_aligned", "jpg", "-nomask"],
                check=False,
            )
            n += 1
    print(f"openface: processed {n} images -> {args.outdir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["align", "mask", "mouth", "affectnet-csv",
                                       "detect-crop", "openface"],
                    required=True)
    ap.add_argument("--images", required=True, help="dir of jpg/png frames")
    ap.add_argument("--landmarks", default=None,
                    help="dir of <name>.pkl 68-point landmark files")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--label", type=int, default=None,
                    help="emotion label prefix for aligned AffectNet naming")
    ap.add_argument("--csv", default=None,
                    help="AffectNet Manually_Annotated file list (affectnet-csv)")
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--openface-bin", default="FaceLandmarkImg",
                    help="OpenFace FaceLandmarkImg binary (openface mode)")
    args = ap.parse_args()
    if args.mode in ("affectnet-csv", "detect-crop", "openface"):
        assert args.csv, f"--csv required for {args.mode}"
        return {"affectnet-csv": run_affectnet_csv,
                "detect-crop": run_detect_crop,
                "openface": run_openface}[args.mode](args)
    assert args.landmarks, "--landmarks required"

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
            out = crop_mouth_roi(img, lm, crop=min(args.size, 72))
            Image.fromarray(out).save(os.path.join(args.outdir, f"{name}.jpg"))
        done += 1
    print(f"{args.mode}: processed {done}/{len(paths)} images -> {args.outdir}")


if __name__ == "__main__":
    main()
