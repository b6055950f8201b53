#!/usr/bin/env python
"""MEAD offline preprocessing: clip crops, landmark pkls, mouth-ROI videos.

Reference-surface parity (talking_face/scripts/, ~550 LoC across 4 scripts):
  - crop:      mead_crop.py — per clip, resize raw frames to 216x384, detect
               the face box once (first detectable frame), pad +10px, square
               it, crop EVERY frame of the clip to that fixed box, resize to
               224px, write the MEAD_v2 tree (subj/video/front/emo/lvl/nbr).
  - landmarks: mask.py — per cropped frame, SmallestMaxSize(128) + CenterCrop
               (the dataset's own preprocessing) then 68-point detection;
               one pkl per frame under subj/landmarks/front/..., empty pkl on
               failure (the dataset's mean-landmark fallback consumes those).
  - mouth:     crop_mouth.py / crop_mouth_gt.py — 72px mouth crops around the
               per-frame mouth-landmark centroid (bias threshold 5px),
               resized to 88px, written as mp4 (or npy) per clip for the
               AV-HuBERT lip-reading eval.

The 68-point detector is an external dependency upstream too (face_alignment
FAN + sfd); it is imported lazily, and every geometric stage below is
detector-independent and testable with synthetic landmarks.
"""
import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def load_pickle(path):
    if os.path.getsize(path) > 0:
        with open(path, "rb") as f:
            return pickle.load(f)
    return None


def make_fan_detector(device="cpu", threshold=0.8):
    """face_alignment FAN with the sfd detector (mask.py:23-34)."""
    import face_alignment

    model = face_alignment.FaceAlignment(
        face_alignment.LandmarksType._2D, device=device, flip_input=False,
        face_detector="sfd", face_detector_kwargs={"filter_threshold": threshold},
    )

    def detect(image_uint8):
        out = model.get_landmarks(image_uint8)
        return None if not out else np.asarray(out[0], np.float32)

    return detect


def square_bbox(kpt: np.ndarray, margin: int = 10):
    """Landmark extremes -> padded, squared (x1, y1, x2, y2)
    (mead_crop.py:104-121)."""
    x1 = int(np.min(kpt[:, 0])) - margin
    y1 = int(np.min(kpt[:, 1])) - margin
    x2 = int(np.max(kpt[:, 0])) + margin
    y2 = int(np.max(kpt[:, 1])) + margin
    x1, y1 = max(x1, 0), max(y1, 0)
    w, h = x2 - x1, y2 - y1
    offset = (max(w, h) - min(w, h)) // 2
    if w < h:
        x1, x2 = max(x1 - offset, 0), x2 + offset
    elif w > h:
        y1, y2 = max(y1 - offset, 0), y2 + offset
    return x1, y1, x2, y2


def smallest_max_center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """albumentations SmallestMaxSize(size) + CenterCrop(size) equivalent."""
    h, w = img.shape[:2]
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    img = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    top, left = (nh - size) // 2, (nw - size) // 2
    return img[top:top + size, left:left + size]


def cut_mouth_sequence(
    frames: np.ndarray, landmarks: np.ndarray,
    crop: int = 72, out_size: int = 88, threshold: int = 5,
) -> np.ndarray:
    """Per-frame mouth-centroid crops (crop_mouth.py:38-84): center from the
    current frame's landmarks[48:68], clamped to bounds with a max bias of
    `threshold` px, then resized to out_size."""
    import cv2

    h, w = frames.shape[1:3]
    half = crop // 2
    out = []
    for i, frame in enumerate(frames):
        cx, cy = np.mean(landmarks[i][48:68], axis=0).round().astype(int)
        for c, lim, name in ((cy, h, "height"), (cx, w, "width")):
            if c - half < -threshold or c + half > lim + threshold:
                raise ValueError(f"too much bias in {name} (frame {i})")
        cy = min(max(cy, half), h - half)
        cx = min(max(cx, half), w - half)
        m = frame[cy - half:cy + half, cx - half:cx + half]
        out.append(cv2.resize(m, (out_size, out_size)))
    return np.stack(out)


def run_crop(args):
    """mead_crop.py: fixed per-clip square crop -> 224px frames."""
    detect = make_fan_detector(args.device)
    clips = sorted(
        d for d in glob.glob(os.path.join(args.src, "*", "video", "*", "*",
                                          "*", "[0-9]" * 3))
        if os.path.isdir(d)
    )
    skip = set()
    for src_dir in clips:
        rel = os.path.relpath(src_dir, args.src)
        res_dir = os.path.join(args.out, rel)  # output mirrors the source tree
        os.makedirs(res_dir, exist_ok=True)
        frames = sorted(os.listdir(src_dir))
        bbox = None
        for frame in frames:  # first detectable frame fixes the clip's box
            img = np.asarray(Image.open(os.path.join(src_dir, frame)).convert("RGB"))
            small = np.asarray(
                Image.fromarray(img).resize((384, 216), Image.BILINEAR))
            kpt = detect(small)
            if kpt is not None:
                bbox = square_bbox(kpt)
                break
        if bbox is None:
            skip.add(src_dir)
            continue
        x1, y1, x2, y2 = bbox
        for frame in frames:
            img = np.asarray(Image.open(os.path.join(src_dir, frame)).convert("RGB"))
            small = np.asarray(
                Image.fromarray(img).resize((384, 216), Image.BILINEAR))
            crop = small[y1:y2, x1:x2]
            res = np.asarray(Image.fromarray(crop).resize(
                (args.size, args.size), Image.BILINEAR))
            Image.fromarray(res).save(os.path.join(res_dir, frame))
    if skip:
        with open(os.path.join(args.out, "crop_skip.pkl"), "wb") as f:
            pickle.dump(skip, f)
    print(f"cropped {len(clips) - len(skip)}/{len(clips)} clips")


def run_landmarks(args):
    """mask.py: 128px-preprocessed frame -> 68-pt landmark pkl per frame."""
    detect = make_fan_detector(args.device)
    frames = sorted(glob.glob(os.path.join(
        args.src, "*", "video", "*", "*", "*", "[0-9]" * 3, "*.jpg")))
    n_ok = 0
    for path in frames:
        save_path = path.replace(f"{os.sep}video{os.sep}",
                                 f"{os.sep}landmarks{os.sep}")
        save_path = os.path.splitext(save_path)[0] + ".pkl"
        if os.path.isfile(save_path) and os.path.getsize(save_path) > 0:
            n_ok += 1
            continue
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        img = np.asarray(Image.open(path).convert("RGB"))
        img = smallest_max_center_crop(img, args.size)
        kpt = detect(img)
        if kpt is None:
            open(save_path, "w").close()  # empty pkl = dataset mean fallback
            continue
        with open(save_path, "wb") as f:
            pickle.dump(kpt, f, protocol=pickle.HIGHEST_PROTOCOL)
        n_ok += 1
    print(f"landmarks for {n_ok}/{len(frames)} frames")


def run_mouth(args):
    """crop_mouth.py: generated video pkls + GT landmark tree -> 88px mouth
    videos (mp4 when cv2 has codecs, plus npy)."""
    import cv2

    os.makedirs(args.out, exist_ok=True)
    for vid_pkl in sorted(glob.glob(args.videos)):
        data = load_pickle(vid_pkl)
        vid = np.asarray(data["video"])  # [F, H, W, 3] in [-1, 1]
        info = data["info"]
        lm_dir = os.path.join(args.src, info["subj"], "landmarks", "front",
                              info["human_label"], info["lvl"], info["nbr"])
        mean_p = os.path.join(args.src, "mean_landmarks.pkl")
        mean_lm = (np.asarray(load_pickle(mean_p), np.float32)
                   if os.path.exists(mean_p) else
                   np.full((68, 2), vid.shape[1] / 2, np.float32))
        lms = []
        for k, p in enumerate(sorted(glob.glob(os.path.join(lm_dir, "*.pkl")))):
            if k >= len(vid):
                break
            lm = load_pickle(p)  # empty pkl (detection failure) -> None
            lms.append(np.asarray(lm, np.float32) if lm is not None else mean_lm)
        lms = np.stack(lms)
        frames = ((vid[: len(lms)] + 1) * 127.5).astype(np.uint8)
        mouths = cut_mouth_sequence(frames, lms, crop=args.crop,
                                    out_size=args.mouth_size)
        name = (f"subj={info['subj']}_emo={info['human_label']}"
                f"_lvl={info['lvl']}_nbr={info['nbr']}")
        np.save(os.path.join(args.out, name + ".npy"), mouths)
        try:
            vw = cv2.VideoWriter(
                os.path.join(args.out, name + ".mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), 30,
                (args.mouth_size, args.mouth_size),
            )
            for fr in mouths:
                vw.write(fr[:, :, ::-1])
            vw.release()
        except Exception as e:  # codec-less cv2 builds: npy is authoritative
            print(f"mp4 mux skipped ({e})")
        print(f"{name}: {mouths.shape}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)

    c = sub.add_parser("crop", help="per-clip fixed-box face crops (mead_crop)")
    c.add_argument("--src", required=True, help="raw MEAD root")
    c.add_argument("--out", required=True, help="MEAD_v2-style output root")
    c.add_argument("--size", type=int, default=224)
    c.add_argument("--device", default="cpu")

    l = sub.add_parser("landmarks", help="per-frame landmark pkls (mask.py)")
    l.add_argument("--src", required=True, help="cropped MEAD_v2 root")
    l.add_argument("--size", type=int, default=128)
    l.add_argument("--device", default="cpu")

    m = sub.add_parser("mouth", help="mouth-ROI eval crops (crop_mouth)")
    m.add_argument("--videos", required=True, help="glob of generated video pkls")
    m.add_argument("--src", required=True, help="MEAD_v2 root (landmark tree)")
    m.add_argument("--out", required=True)
    m.add_argument("--crop", type=int, default=72)
    m.add_argument("--mouth-size", type=int, default=88)

    args = ap.parse_args()
    {"crop": run_crop, "landmarks": run_landmarks, "mouth": run_mouth}[args.mode](args)


if __name__ == "__main__":
    main()
