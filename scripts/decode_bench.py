"""Input-pipeline benchmark: PIL vs the native decode library.

Synthesizes a working set of JPEGs at a typical source resolution, then
measures images/s through `load_image` (the single chokepoint every
dataset and CLI uses) for both backends, single- and multi-threaded —
the multi-threaded row is the one that matters for the DataLoader, whose
worker threads contend on the GIL with PIL but run fully parallel through
the native library (ctypes releases the GIL per call).

Prints one JSON line per configuration. CPU-only; runs anywhere.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_images(n: int, w: int, h: int, quality: int) -> list:
    from PIL import Image

    rs = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="decode_bench_")
    paths = []
    base = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    # real photos are smooth; raw noise JPEGs decode unrepresentatively
    # (same-size resize is a PIL no-op, so go down 2x and back up)
    small = Image.fromarray(base).resize((w // 2, h // 2), Image.BILINEAR)
    base = np.asarray(small.resize((w, h), Image.BILINEAR))
    for i in range(n):
        # cheap per-image variation (roll) so the decoder can't share work
        arr = np.roll(base, shift=i * 7, axis=1)
        p = os.path.join(tmp, f"f{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=quality)
        paths.append(p)
    return paths


def run(paths, size, threads, repeats) -> float:
    """images/s through load_image with a loader-style thread pool."""
    from dsml_thesis_tpu.data.datasets import load_image

    def one(p):
        return load_image(p, size)

    # warmup (builds the .so on the native path, touches page cache)
    one(paths[0])
    t0 = time.perf_counter()
    done = 0
    for _ in range(repeats):
        if threads <= 1:
            for p in paths:
                one(p)
        else:
            with ThreadPoolExecutor(threads) as pool:
                list(pool.map(one, paths))
        done += len(paths)
    return done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="working-set images")
    ap.add_argument("--src", type=int, nargs=2, default=(640, 480),
                    help="source resolution (w h)")
    ap.add_argument("--size", type=int, default=256, help="target crop size")
    ap.add_argument("--quality", type=int, default=92)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    paths = synth_images(args.n, *args.src, args.quality)
    from dsml_thesis_tpu.data import native_image

    rows = []
    for backend, env in (("pil", "0"), ("native", "1")):
        if backend == "native" and not native_image.available():
            print(json.dumps({"backend": "native", "error": "unavailable"}))
            continue
        os.environ["DSML_NATIVE_IMAGE"] = env
        for threads in (1, args.threads):
            ips = run(paths, args.size, threads, args.repeats)
            row = {"metric": "decode_img_per_sec", "backend": backend,
                   "threads": threads, "value": round(ips, 1),
                   "src": list(args.src), "size": args.size}
            rows.append(row)
            print(json.dumps(row), flush=True)
    by = {(r["backend"], r["threads"]): r["value"] for r in rows}
    if ("pil", args.threads) in by and ("native", args.threads) in by:
        print(json.dumps({
            "metric": "native_speedup_threaded",
            "value": round(by[("native", args.threads)]
                           / by[("pil", args.threads)], 2),
            "unit": "x", "threads": args.threads,
        }))


if __name__ == "__main__":
    main()
