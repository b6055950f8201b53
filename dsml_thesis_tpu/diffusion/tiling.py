"""Split-input fold/unfold tiling (reference ddpm.py:565-664, 707-755, 826-864, 893-1013).

The reference's config-gated ``split_input_params`` path runs the UNet and the
first-stage codecs over overlapping spatial patches (torch ``nn.Unfold`` /
``nn.Fold``), blends the per-patch outputs with a border-distance weighting,
and divides out the accumulated overlap (``fold(w * o) / fold(w)``). No shipped
YAML sets it (PARITY.md), but it is part of the reference model surface, so it
is reproduced here.

TPU-first redesign instead of a torch translation:

- Patch geometry (kernel, stride, patch count L) is static at trace time, so
  ``unfold`` is a stack of L static slices and ``fold`` is a static
  scatter-add — no gather/scatter with dynamic indices, XLA fuses both.
- The border weighting and the overlap normalization are pure numpy constants
  computed at trace time (the reference rebuilds them on device every call,
  ddpm.py:602 "todo load once not every time").
- The reference loops the model over patches in Python
  (``[self.model(z_list[i], ...) for i in range(L)]``, ddpm.py:981); here the
  L patches fold into the BATCH dim and the model runs once — one big MXU
  batch instead of L small launches.

Layout is NHWC (the engine's native layout); the reference is NCHW. Patch
order matches torch ``nn.Unfold`` (row-major: ``l = iy * Lx + ix``), which the
tie-breaker weighting depends on.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import jax.numpy as jnp

# Upstream CompVis defaults for the weighting knobs (the reference reads them
# from split_input_params without defaults; these are the values its notebooks
# ship). Any key present in the config overrides.
DEFAULT_PARAMS = {
    "patch_distributed_vq": True,
    "tie_braker": False,
    "clip_max_weight": 0.5,
    "clip_min_weight": 0.01,
    "clip_max_tie_weight": 0.5,
    "clip_min_tie_weight": 0.01,
}


def _delta_border(h: int, w: int) -> np.ndarray:
    """Normalized distance to the nearest image border: 0 at the border,
    0.5 at the center (reference ddpm.py:572-585), shape [h, w]."""
    y = np.arange(h, dtype=np.float64)[:, None] / max(h - 1, 1)
    x = np.arange(w, dtype=np.float64)[None, :] / max(w - 1, 1)
    dist_lu = np.minimum(np.broadcast_to(y, (h, w)), np.broadcast_to(x, (h, w)))
    dist_rd = np.minimum(np.broadcast_to(1 - y, (h, w)),
                         np.broadcast_to(1 - x, (h, w)))
    return np.minimum(dist_lu, dist_rd)


def patch_grid(hw: Tuple[int, int], ks: Tuple[int, int],
               stride: Tuple[int, int]) -> Tuple[int, int]:
    """Number of patches per axis, torch Unfold semantics (no padding)."""
    return ((hw[0] - ks[0]) // stride[0] + 1,
            (hw[1] - ks[1]) // stride[1] + 1)


def clamp_kernel(hw: Tuple[int, int], ks: Tuple[int, int],
                 stride: Tuple[int, int]):
    """Reference's "reducing Kernel/stride" clamp for small inputs
    (ddpm.py:835-841)."""
    ks = (min(ks[0], hw[0]), min(ks[1], hw[1]))
    stride = (min(stride[0], hw[0]), min(stride[1], hw[1]))
    return ks, stride


def tile_weighting(ks: Tuple[int, int], Ly: int, Lx: int,
                   params: Dict) -> np.ndarray:
    """Per-patch blend weights [L, ks0, ks1, 1] (reference get_weighting,
    ddpm.py:586-601): clipped border distance of the patch, optionally
    tie-broken by the border distance of the patch's position in the L-grid."""
    p = {**DEFAULT_PARAMS, **params}
    w = np.clip(_delta_border(*ks), p["clip_min_weight"], p["clip_max_weight"])
    w = np.broadcast_to(w[None], (Ly * Lx, ks[0], ks[1])).copy()
    if p["tie_braker"]:
        lw = np.clip(_delta_border(Ly, Lx),
                     p["clip_min_tie_weight"], p["clip_max_tie_weight"])
        w *= lw.reshape(Ly * Lx, 1, 1)
    return w[..., None].astype(np.float32)


def unfold(x: jnp.ndarray, ks: Tuple[int, int],
           stride: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B, L, ks0, ks1, C], torch-Unfold patch order."""
    Ly, Lx = patch_grid(x.shape[1:3], ks, stride)
    rows = []
    for iy in range(Ly):
        for ix in range(Lx):
            y0, x0 = iy * stride[0], ix * stride[1]
            rows.append(x[:, y0:y0 + ks[0], x0:x0 + ks[1], :])
    return jnp.stack(rows, axis=1)


def fold(patches: jnp.ndarray, out_hw: Tuple[int, int],
         stride: Tuple[int, int]) -> jnp.ndarray:
    """[B, L, ks0, ks1, C] -> [B, H, W, C] by scatter-add of static slices
    (torch nn.Fold: overlaps sum)."""
    b, L, kh, kw, c = patches.shape
    Ly, Lx = patch_grid(out_hw, (kh, kw), stride)
    assert Ly * Lx == L, (Ly, Lx, L)
    out = jnp.zeros((b, out_hw[0], out_hw[1], c), patches.dtype)
    for iy in range(Ly):
        for ix in range(Lx):
            y0, x0 = iy * stride[0], ix * stride[1]
            out = out.at[:, y0:y0 + kh, x0:x0 + kw, :].add(
                patches[:, iy * Lx + ix]
            )
    return out


def overlap_normalization(out_hw: Tuple[int, int], ks: Tuple[int, int],
                          stride: Tuple[int, int],
                          params: Dict) -> np.ndarray:
    """fold(weighting): the [H, W, 1] divisor for the blended canvas —
    a trace-time numpy constant (reference recomputes it on device)."""
    Ly, Lx = patch_grid(out_hw, ks, stride)
    w = tile_weighting(ks, Ly, Lx, params)
    out = np.zeros((out_hw[0], out_hw[1], 1), np.float32)
    for iy in range(Ly):
        for ix in range(Lx):
            y0, x0 = iy * stride[0], ix * stride[1]
            out[y0:y0 + ks[0], x0:x0 + ks[1], :] += w[iy * Lx + ix]
    return out


def tiled_apply(fn: Callable[[jnp.ndarray, int], jnp.ndarray], x: jnp.ndarray,
                params: Dict, uf: int = 1, df: int = 1) -> jnp.ndarray:
    """Run `fn` over overlapping patches of x and blend (the whole
    unfold -> batched model -> weight -> fold -> normalize chain of reference
    apply_model/encode_first_stage/decode_first_stage).

    fn(z, L) maps z [B*L, kh, kw, C] -> [B*L, kh*uf//df, kw*uf//df, C'] (uf:
    decoder upsample, df: encoder downsample; reference get_fold_unfold uf/df
    branches, ddpm.py:602-654). Patches ride the batch dim — batch-major
    ordering, so per-sample side inputs (t, context) replicate with
    ``jnp.repeat(v, L, axis=0)``. The L patches run in ONE batched call where
    the reference loops the model L times.
    """
    assert uf == 1 or df == 1, "reference supports uf>1 xor df>1"
    b = x.shape[0]
    hw = tuple(x.shape[1:3])
    ks, stride = clamp_kernel(hw, tuple(params["ks"]), tuple(params["stride"]))
    Ly, Lx = patch_grid(hw, ks, stride)
    L = Ly * Lx

    z = unfold(x, ks, stride)                      # [B, L, kh, kw, C]
    z = z.reshape((b * L,) + z.shape[2:])
    o = fn(z, L)                                   # [B*L, kh', kw', C']
    ks_out = (ks[0] * uf // df, ks[1] * uf // df)
    stride_out = (stride[0] * uf // df, stride[1] * uf // df)
    hw_out = (hw[0] * uf // df, hw[1] * uf // df)
    assert o.shape[1:3] == ks_out, (o.shape, ks_out)

    w = jnp.asarray(tile_weighting(ks_out, Ly, Lx, params), o.dtype)
    o = o.reshape((b, L) + o.shape[1:]) * w[None]
    canvas = fold(o, hw_out, stride_out)
    norm = jnp.asarray(
        overlap_normalization(hw_out, ks_out, stride_out, params), o.dtype
    )
    return canvas / norm[None]
