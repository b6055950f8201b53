"""FID InceptionV3 (Flax) — the standard feature extractor for FID/IS/KID/PRC.

Parity target: the torch-fidelity / pytorch-fid InceptionV3 the reference's
metrics.sh drives (face_reenactment/metrics.sh:7-14). That network is
torchvision InceptionV3 (aux_logits head unused at eval) with the published
FID modifications: average pools inside Inception blocks use
count_include_pad=False, and the last InceptionE (Mixed_7c) uses a MAX pool
branch. Weights: the user-supplied `pt_inception-2015-12-05-*.pth` checkpoint
(zero-egress environment) via convert_fid_inception(); the converter consumes
the torchvision key layout that checkpoint uses.

Features: 2048-d pool3 (FID/KID/PRC) and 1008-d logits (IS).
Input: [-1, 1] RGB NHWC at 299x299 (use preprocess() from any size).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bn(self: nn.Module, x, name: str, eps: float = 1e-3):
    c = x.shape[-1]
    scale = self.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,))
    mean = self.variable("batch_stats", f"{name}_mean", lambda: jnp.zeros((c,)))
    var = self.variable("batch_stats", f"{name}_var", lambda: jnp.ones((c,)))
    return (x - mean.value) * jax.lax.rsqrt(var.value + eps) * scale + bias


class BasicConv2d(nn.Module):
    """conv(no bias) -> BN(eps 1e-3) -> relu."""

    out_c: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_c, self.kernel, strides=(self.stride,) * 2,
                    padding=self.padding, use_bias=False, name="conv")(x)
        return nn.relu(_bn(self, x, "bn"))


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def _avg_pool_nocount(x):
    """3x3 stride-1 avg pool, count_include_pad=False (FID modification)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, name="branch1x1")(x)
        b5 = BasicConv2d(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, name="branch_pool")(
            _avg_pool_nocount(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        mp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, mp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, name="branch1x1")(x)
        b7 = BasicConv2d(c7, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_nocount(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        mp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, mp], axis=-1)


class InceptionE(nn.Module):
    max_pool_branch: bool = False  # Mixed_7c (FIDInceptionE_2) uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, name="branch1x1")(x)
        b3 = BasicConv2d(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.max_pool_branch:
            pool = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            pool = _avg_pool_nocount(x)
        bp = BasicConv2d(192, name="branch_pool")(pool)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """299x299 [-1,1] NHWC -> (pool 2048, logits 1008)."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(max_pool_branch=True, name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))  # global average pool -> 2048
        logits = nn.Dense(self.num_classes, name="fc")(pool)
        return pool, logits


def preprocess(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[-1,1] NHWC any size -> 299x299 bilinear (pytorch-fid resizes in
    [0,1] with bilinear; equivalent up to the affine range map)."""
    if images.shape[1] != size or images.shape[2] != size:
        # antialias=False: pytorch-fid resizes with plain F.interpolate
        # (bilinear, no antialiasing); jax's default antialias=True would
        # shift features — and FID — whenever inputs DOWNSCALE to 299
        images = jax.image.resize(
            images, (images.shape[0], size, size, images.shape[3]),
            "bilinear", antialias=False,
        )
    return images


def convert_fid_inception(sd: Dict):
    """pt_inception / torchvision InceptionV3 state_dict -> (params, stats)."""
    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def basic(t):
        p = {"conv": {"kernel": np32(f"{t}.conv.weight").transpose(2, 3, 1, 0)},
             "bn_scale": np32(f"{t}.bn.weight"),
             "bn_bias": np32(f"{t}.bn.bias")}
        s = {"bn_mean": np32(f"{t}.bn.running_mean"),
             "bn_var": np32(f"{t}.bn.running_var")}
        return p, s

    params: Dict = {}
    stats: Dict = {}

    def block(tname, fname, branches):
        bp: Dict = {}
        bs: Dict = {}
        for br in branches:
            bp[br], bs[br] = basic(f"{tname}.{br}")
        params[fname], stats[fname] = bp, bs

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[stem], stats[stem] = basic(stem)
    a_br = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
            "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        block(m, m, a_br)
    block("Mixed_6a", "Mixed_6a",
          ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"])
    c_br = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
            "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
            "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        block(m, m, c_br)
    block("Mixed_7a", "Mixed_7a",
          ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
           "branch7x7x3_3", "branch7x7x3_4"])
    e_br = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
            "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
            "branch3x3dbl_3b", "branch_pool"]
    for m in ("Mixed_7b", "Mixed_7c"):
        block(m, m, e_br)
    params["fc"] = {"kernel": np32("fc.weight").transpose(1, 0),
                    "bias": np32("fc.bias")}
    return params, stats


def make_feature_fn(params: Dict, stats: Dict, num_classes: int = 1008):
    """images [-1,1] NHWC -> (pool 2048, logits).

    The returned fn is already jitted with the 24M-param variables passed as
    ARGUMENTS — callers must not wrap it in jax.jit themselves (closing over
    the weights embeds them as HLO constants, which the axon remote compiler
    rejects; see CLAUDE.md)."""
    import jax

    model = FIDInceptionV3(num_classes=num_classes)
    apply_jit = jax.jit(
        lambda v, images: model.apply(v, preprocess(images))
    )
    variables = {"params": params, "batch_stats": stats}

    def fn(images):
        return apply_jit(variables, images)

    return fn
