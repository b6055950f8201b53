"""ArcFace iResNet identity backbones (for the CSIM metric and the ID loss).

Parity targets: face_reenactment/backbones/iresnet.py (iresnet18/34/50/100/200,
IBasicBlock = BN-Conv-BN-PReLU-Conv-BN + 1x1-BN downsample, 512-d embedding)
and ldm/models/insight_face/model_irse.py (the IR-SE50 used by IDLoss).

Inference-only (eval mode: BatchNorm running statistics). Pretrained weights
are converted from the torch checkpoints the user already has via
convert_iresnet(); no weights ship with this repo (zero-egress environment).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_BLOCKS = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
    "iresnet200": (6, 26, 60, 6),
}


class PReLU(nn.Module):
    """Per-channel PReLU (torch semantics)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class _BN(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        inv = jnp.reciprocal(jnp.sqrt(var.value + self.eps))
        return (x - mean.value) * inv * scale + bias


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _BN(eps=1e-5, name="bn1")(x)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv1")(out)
        out = _BN(name="bn2")(out)
        out = PReLU(name="prelu")(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                      use_bias=False, name="conv2")(out)
        out = _BN(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="ds_conv")(x)
            identity = _BN(name="ds_bn")(identity)
        return out + identity


class IResNet(nn.Module):
    """112x112 RGB in [-1,1] -> 512-d identity embedding."""

    layers: Sequence[int]
    embed_dim: int = 512

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        h = _BN(name="bn1")(h)
        h = PReLU(name="prelu")(h)
        planes = (64, 128, 256, 512)
        for li, (n_blocks, p) in enumerate(zip(self.layers, planes)):
            for bi in range(n_blocks):
                stride = 2 if bi == 0 else 1
                h = IBasicBlock(
                    p, stride=stride, downsample=(bi == 0),
                    name=f"layer{li + 1}_{bi}",
                )(h)
        h = _BN(name="bn2")(h)
        # flatten in torch NCHW (C-major) order so converted fc weights apply
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.Dense(self.embed_dim, name="fc")(h)
        # `features` BatchNorm1d (affine, eps 1e-5)
        c = h.shape[-1]
        scale = self.param("features_scale", nn.initializers.ones, (c,))
        bias = self.param("features_bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "features_mean", lambda: jnp.zeros((c,)))
        var = self.variable("batch_stats", "features_var", lambda: jnp.ones((c,)))
        return (h - mean.value) * jnp.reciprocal(
            jnp.sqrt(var.value + 1e-5)
        ) * scale + bias


def iresnet(name: str, **kw) -> IResNet:
    return IResNet(layers=_BLOCKS[name], **kw)


def convert_iresnet(sd: Dict, layers: Sequence[int]):
    """torch iresnet state_dict -> (params, batch_stats) for IResNet."""
    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Dict = {}
    stats: Dict = {}

    def bn(tname, fname):
        params[fname] = {"scale": np32(f"{tname}.weight"),
                         "bias": np32(f"{tname}.bias")}
        stats[fname] = {"mean": np32(f"{tname}.running_mean"),
                        "var": np32(f"{tname}.running_var")}

    def conv(tname, fname):
        params[fname] = {
            "kernel": np32(f"{tname}.weight").transpose(2, 3, 1, 0)
        }

    conv("conv1", "conv1")
    bn("bn1", "bn1")
    params["prelu"] = {"alpha": np32("prelu.weight")}
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for bn_name in ("bn1", "bn2", "bn3"):
                blk_p[bn_name] = {"scale": np32(f"{t}.{bn_name}.weight"),
                                  "bias": np32(f"{t}.{bn_name}.bias")}
                blk_s[bn_name] = {"mean": np32(f"{t}.{bn_name}.running_mean"),
                                  "var": np32(f"{t}.{bn_name}.running_var")}
            blk_p["conv1"] = {"kernel": np32(f"{t}.conv1.weight").transpose(2, 3, 1, 0)}
            blk_p["conv2"] = {"kernel": np32(f"{t}.conv2.weight").transpose(2, 3, 1, 0)}
            blk_p["prelu"] = {"alpha": np32(f"{t}.prelu.weight")}
            if f"{t}.downsample.0.weight" in sd:
                blk_p["ds_conv"] = {
                    "kernel": np32(f"{t}.downsample.0.weight").transpose(2, 3, 1, 0)
                }
                blk_p["ds_bn"] = {"scale": np32(f"{t}.downsample.1.weight"),
                                  "bias": np32(f"{t}.downsample.1.bias")}
                blk_s["ds_bn"] = {
                    "mean": np32(f"{t}.downsample.1.running_mean"),
                    "var": np32(f"{t}.downsample.1.running_var"),
                }
            params[f] = blk_p
            stats[f] = blk_s
    bn("bn2", "bn2")
    params["fc"] = {"kernel": np32("fc.weight").transpose(1, 0),
                    "bias": np32("fc.bias")}
    params["features_scale"] = np32("features.weight")
    params["features_bias"] = np32("features.bias")
    stats["features_mean"] = np32("features.running_mean")
    stats["features_var"] = np32("features.running_var")
    return params, stats
