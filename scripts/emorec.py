#!/usr/bin/env python
"""Emotion-recognition agreement of generated samples with their target class.

Reference-surface parity: face_reenactment/emorec.py:9-60 — run a frozen
emotion classifier (the reference uses HSEmotion EfficientNet-B2 at 260px)
over generated sample dirs/arrays and report accuracy against the intended
emotion label.

The classifier is pluggable: --torch-model loads any torchscript/torch module
the user supplies (e.g. their HSEmotion checkpoint); zero-egress image ships
no weights.
"""
import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", required=True,
                    help="dir of class_<k>.npy dumps or per-class subdirs")
    ap.add_argument("--torch-model", required=True,
                    help="torchscript/torch emotion classifier (RGB [0,1] input)")
    ap.add_argument("--input-size", type=int, default=260)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import torch

    model = torch.jit.load(args.torch_model) if args.torch_model.endswith(".pt") \
        else torch.load(args.torch_model, map_location="cpu", weights_only=False)
    model.eval()

    def classify(imgs_m11: np.ndarray) -> np.ndarray:
        """[-1,1] NHWC -> predicted labels."""
        x = (imgs_m11 + 1.0) / 2.0
        x = torch.from_numpy(x.transpose(0, 3, 1, 2))
        x = torch.nn.functional.interpolate(
            x, size=args.input_size, mode="bilinear", align_corners=False
        )
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        with torch.no_grad():
            logits = model((x - mean) / std)
        return logits.argmax(dim=1).numpy()

    correct, total = 0, 0
    per_class = {}
    for npy in sorted(glob.glob(os.path.join(args.samples, "class_*.npy"))):
        label = int(re.search(r"class_(\d+)", os.path.basename(npy)).group(1))
        imgs = np.load(npy)
        preds = []
        for s in range(0, len(imgs), args.batch):
            preds.extend(classify(imgs[s:s + args.batch]).tolist())
        acc = float(np.mean(np.asarray(preds) == label))
        per_class[label] = acc
        correct += int(np.sum(np.asarray(preds) == label))
        total += len(preds)
        print(f"class {label}: acc {acc:.3f} over {len(preds)}")
    if total:
        print(f"overall emotion agreement: {correct / total:.4f} ({total} samples)")


if __name__ == "__main__":
    main()
