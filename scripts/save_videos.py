#!/usr/bin/env python
"""Mux generated frame pickles into mp4 (+ optional source audio).

Reference-surface parity: talking_face/save_videos.py:12-116 (cv2 VideoWriter
at 30 fps + moviepy audio mux + frame grids). cv2/moviepy are not in this
image; ffmpeg is used when present, with an imageio fallback, else frames are
dumped as pngs.
"""
import argparse
import glob
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np


def frames_to_mp4(frames_u8, path, fps=30, audio=None):
    if shutil.which("ffmpeg"):
        tmp = path + ".frames"
        os.makedirs(tmp, exist_ok=True)
        from PIL import Image

        for i, fr in enumerate(frames_u8):
            Image.fromarray(fr).save(os.path.join(tmp, f"{i:05d}.png"))
        cmd = ["ffmpeg", "-y", "-framerate", str(fps),
               "-i", os.path.join(tmp, "%05d.png")]
        if audio:
            cmd += ["-i", audio, "-c:a", "aac", "-shortest"]
        cmd += ["-pix_fmt", "yuv420p", path]
        subprocess.run(cmd, check=True, capture_output=True)
        shutil.rmtree(tmp)
        return True
    try:
        import imageio

        imageio.mimwrite(path, list(frames_u8), fps=fps)
        return True
    except Exception:
        outdir = os.path.splitext(path)[0]
        os.makedirs(outdir, exist_ok=True)
        from PIL import Image

        for i, fr in enumerate(frames_u8):
            Image.fromarray(fr).save(os.path.join(outdir, f"{i:05d}.png"))
        print(f"no ffmpeg/imageio: dumped frames to {outdir}/")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--indir", required=True, help="dir of progressive_sampling pkls")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--audio-root", default=None,
                    help="optional dir of <name>.wav files to mux")
    ap.add_argument("--grid", type=int, default=0,
                    help="also save an N-column frame grid png per video")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    for pkl_path in sorted(glob.glob(os.path.join(args.indir, "*.pkl"))):
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        vid = data["video"]  # [F, H, W, 3] in [-1, 1]
        u8 = ((np.clip(vid, -1, 1) + 1) * 127.5).astype(np.uint8)
        name = os.path.splitext(os.path.basename(pkl_path))[0]
        audio = None
        if args.audio_root:
            cand = os.path.join(args.audio_root, name + ".wav")
            audio = cand if os.path.exists(cand) else None
        out = os.path.join(args.outdir, name + ".mp4")
        frames_to_mp4(u8, out, fps=args.fps, audio=audio)
        if args.grid:
            from PIL import Image

            idx = np.linspace(0, len(u8) - 1, min(args.grid, len(u8))).astype(int)
            row = np.concatenate([u8[i] for i in idx], axis=1)
            Image.fromarray(row).save(os.path.join(args.outdir, name + "_grid.png"))
        print(f"{name}: {len(u8)} frames -> {out}")


if __name__ == "__main__":
    main()
