#!/usr/bin/env python
"""Emotion-recognition agreement of generated samples with their target class.

Reference-surface parity: face_reenactment/emorec.py:9-60 — run the frozen
HSEmotion EfficientNet-B2 (enet_b2_7/8, 260px) over generated sample
dirs/arrays and report accuracy against the intended emotion label (AffectNet
ordering, emorec.py:23-24).

Two classifier backends:
  --enet <path>        TORCH-FREE default: an HSEmotion checkpoint (pickled
                       timm model or state_dict) converted to the in-tree
                       Flax tower (models/efficientnet.py) and run on the
                       JAX backend; predictions are remapped from the model's
                       alphabetical head order to AffectNet labels the way
                       the reference's IDX_TO_CLASS tables do.
  --torch-model <path> any user torchscript/torch module whose argmax is
                       already an AffectNet label (legacy escape hatch).
Zero-egress image ships no weights.
"""
import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _jax_classifier(path: str, input_size: int, pad_same: bool, bn_eps: float):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dsml_thesis_tpu.models import efficientnet as enet

    cfg, variables = enet.load_enet_checkpoint(path)
    cfg = dataclasses.replace(cfg, input_size=input_size, pad_same=pad_same,
                              bn_eps=bn_eps)
    logits_fn = jax.jit(enet.make_enet_logits_apply(cfg))
    to_affectnet = enet.head_to_affectnet(cfg.num_classes)

    def classify(imgs_m11: np.ndarray) -> np.ndarray:
        logits = logits_fn(variables, jnp.asarray(imgs_m11, jnp.float32))
        return to_affectnet[np.asarray(jnp.argmax(logits, axis=-1))]

    return classify


def _torch_classifier(path: str, input_size: int):
    import torch

    model = torch.jit.load(path) if path.endswith(".pt") \
        else torch.load(path, map_location="cpu", weights_only=False)
    model.eval()

    def classify(imgs_m11: np.ndarray) -> np.ndarray:
        x = (imgs_m11 + 1.0) / 2.0
        x = torch.from_numpy(x.transpose(0, 3, 1, 2))
        x = torch.nn.functional.interpolate(
            x, size=input_size, mode="bilinear", align_corners=False
        )
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        with torch.no_grad():
            logits = model((x - mean) / std)
        return logits.argmax(dim=1).numpy()

    return classify


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", required=True,
                    help="dir of class_<k>.npy dumps or per-class subdirs")
    ap.add_argument("--enet",
                    help="HSEmotion enet_b2_7/8 checkpoint -> in-tree JAX "
                         "tower (torch-free path)")
    ap.add_argument("--torch-model",
                    help="torchscript/torch emotion classifier (RGB [0,1] "
                         "input, AffectNet-ordered head)")
    ap.add_argument("--input-size", type=int, default=260)
    ap.add_argument("--pad-same", type=int, default=1,
                    help="1 = tf_ lineage SAME padding (HSEmotion default)")
    ap.add_argument("--bn-eps", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    if bool(args.enet) == bool(args.torch_model):
        ap.error("give exactly one of --enet (JAX) or --torch-model")
    classify = (_jax_classifier(args.enet, args.input_size,
                                bool(args.pad_same), args.bn_eps)
                if args.enet else
                _torch_classifier(args.torch_model, args.input_size))

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
