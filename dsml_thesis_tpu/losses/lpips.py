"""LPIPS perceptual loss (VGG16 features + learned linear heads) in Flax.

Parity target: taming/modules/losses/lpips.py (LPIPS, ScalingLayer, NetLinLayer,
vgg16 slices at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3).

Pretrained weights cannot be downloaded in this environment (zero egress);
`convert_lpips_weights` maps a locally provided torch checkpoint
(torchvision vgg16 state_dict + taming `vgg.pth` linear heads) into the Flax
param tree. Without real weights the module still runs (tests use random
init), but perceptual values are only meaningful with converted weights.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# channel counts of the five tapped VGG16 stages
_STAGE_CHANNELS = (64, 128, 256, 512, 512)
# convs per stage in VGG16: (2, 2, 3, 3, 3)
_STAGE_CONVS = (2, 2, 3, 3, 3)

# ImageNet scaling (taming lpips.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk, returning the five relu taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for s, (n_convs, ch) in enumerate(zip(_STAGE_CONVS, _STAGE_CHANNELS)):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{s}_{i}")(x)
                x = nn.relu(x)
            taps.append(x)
            if s < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _norm_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(a, b) with a, b in [-1, 1] NHWC; returns per-image [B] distance."""

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = 0.0
        for s, (xa, xb) in enumerate(zip(fa, fb)):
            diff = (_norm_tensor(xa) - _norm_tensor(xb)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{s}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def convert_lpips_weights(vgg_sd: Dict, lin_sd: Dict) -> Dict:
    """torchvision vgg16 `features` state_dict + taming lin heads -> flax params.

    vgg_sd keys: 'features.<idx>.weight/bias' (torchvision numbering);
    lin_sd keys: 'lin<k>.model.1.weight' (taming NetLinLayer).
    """
    def np32(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    # torchvision vgg16 conv indices per stage
    tv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    params: Dict = {"vgg": {}}
    for s, idxs in enumerate(tv_idx):
        for i, t in enumerate(idxs):
            w = np32(vgg_sd[f"features.{t}.weight"]).transpose(2, 3, 1, 0)
            b = np32(vgg_sd[f"features.{t}.bias"])
            params["vgg"][f"conv{s}_{i}"] = {"kernel": w, "bias": b}
    for s in range(5):
        w = np32(lin_sd[f"lin{s}.model.1.weight"]).transpose(2, 3, 1, 0)
        params[f"lin{s}"] = {"kernel": w}
    return params
