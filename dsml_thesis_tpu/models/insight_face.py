"""Face-identity towers used by the ID loss and the CSIM metric.

Parity targets (torch, inference only):
  - IR-SE Backbone: face_reenactment/ldm/models/insight_face/model_irse.py:47-86
    + helpers.py (bottleneck_IR/bottleneck_IR_SE/SEModule, get_blocks).
    This is the backbone the DiffusionCLIP ID loss loads `model_ir_se50.pth`
    into (ldm/modules/losses/idloss.py:11-26).
  - MobileFaceNet (cavaface variant): face_reenactment/backbones/mobilefacenet.py
    (get_mbf / get_mbf_large), selectable in csim.py via --network mbf.
  - Face VisionTransformer: face_reenactment/backbones/vit.py:135-280
    (vit_t/vit_s/vit_b WebFace towers, csim.py --network vit_*).

All run in eval mode (BatchNorm running stats, dropout/drop-path off, no
masking). Weights are converted from the user's torch checkpoints via the
convert_* helpers; nothing ships in-repo (zero-egress environment).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .arcface import PReLU, _BN


def _l2_norm(x, axis=-1):
    """torch l2_norm (helpers.py:72-75): divide by norm, no epsilon."""
    return x / jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)


def _bn1d(self: nn.Module, h, prefix: str, affine: bool = True, eps: float = 1e-5):
    """Inference BatchNorm1d as explicit params/batch_stats on a 2D tensor."""
    c = h.shape[-1]
    mean = self.variable("batch_stats", f"{prefix}_mean", lambda: jnp.zeros((c,)))
    var = self.variable("batch_stats", f"{prefix}_var", lambda: jnp.ones((c,)))
    h = (h - mean.value) * jnp.reciprocal(jnp.sqrt(var.value + eps))
    if affine:
        scale = self.param(f"{prefix}_scale", nn.initializers.ones, (c,))
        bias = self.param(f"{prefix}_bias", nn.initializers.zeros, (c,))
        h = h * scale + bias
    return h


# ---------------------------------------------------------------------------
# IR / IR-SE Backbone (model_irse.py)
# ---------------------------------------------------------------------------

def _irse_stages(num_layers: int) -> List[Tuple[int, int, int]]:
    """Flat (in_channel, depth, stride) list mirroring helpers.get_blocks."""
    units = {50: (3, 4, 14, 3), 100: (3, 13, 30, 3), 152: (3, 8, 36, 3)}[num_layers]
    blocks: List[Tuple[int, int, int]] = []
    in_ch = 64
    for depth, n in zip((64, 128, 256, 512), units):
        blocks.append((in_ch, depth, 2))
        blocks.extend((depth, depth, 1) for _ in range(n - 1))
        in_ch = depth
    return blocks


class SEModule(nn.Module):
    """Squeeze-excite (helpers.py:113-129): GAP -> 1x1 -> ReLU -> 1x1 -> sigmoid."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIR(nn.Module):
    """helpers.bottleneck_IR / bottleneck_IR_SE (se flag)."""

    in_channel: int
    depth: int
    stride: int
    se: bool

    @nn.compact
    def __call__(self, x):
        if self.in_channel == self.depth:
            # MaxPool2d(kernel=1, stride) == strided subsample
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="short_conv")(x)
            shortcut = _BN(name="short_bn")(shortcut)
        res = _BN(name="bn0")(x)
        res = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False,
                      name="conv1")(res)
        res = PReLU(name="prelu")(res)
        res = nn.Conv(self.depth, (3, 3), strides=(self.stride,) * 2, padding=1,
                      use_bias=False, name="conv2")(res)
        res = _BN(name="bn1")(res)
        if self.se:
            res = SEModule(name="se")(res)
        return res + shortcut


class IRSE(nn.Module):
    """model_irse.Backbone: 112/224px RGB in [-1,1] -> l2-normed 512-d embedding.

    mode='ir_se', num_layers=50 is the IDLoss backbone (idloss.py:15, which
    uses the torch default affine=True on the final BatchNorm1d; the IR_SE_50
    factory at model_irse.py:107-110 uses affine=False).
    """

    num_layers: int = 50
    mode: str = "ir_se"
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        se = self.mode == "ir_se"
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        h = _BN(name="input_bn")(h)
        h = PReLU(name="input_prelu")(h)
        for i, (in_ch, depth, stride) in enumerate(_irse_stages(self.num_layers)):
            h = BottleneckIR(in_ch, depth, stride, se, name=f"body_{i}")(h)
        h = _BN(name="output_bn")(h)
        # Dropout is identity at inference; flatten in torch NCHW (C-major) order
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.Dense(512, name="output_fc")(h)
        h = _bn1d(self, h, "output", affine=self.affine)
        return _l2_norm(h)


def convert_irse(sd: Dict, num_layers: int = 50):
    """torch Backbone state_dict -> (params, batch_stats) for IRSE.

    Detects final-BN affine from the presence of output_layer.4.weight; the
    caller must construct IRSE(affine=...) to match.
    """
    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def conv(t):
        return {"kernel": np32(f"{t}.weight").transpose(2, 3, 1, 0)}

    def bn(t, p, s):
        p["scale"] = np32(f"{t}.weight")
        p["bias"] = np32(f"{t}.bias")
        s["mean"] = np32(f"{t}.running_mean")
        s["var"] = np32(f"{t}.running_var")

    params: Dict = {"input_conv": conv("input_layer.0"),
                    "input_prelu": {"alpha": np32("input_layer.2.weight")}}
    stats: Dict = {}
    p, s = {}, {}
    bn("input_layer.1", p, s)
    params["input_bn"], stats["input_bn"] = p, s

    for i, (in_ch, depth, _) in enumerate(_irse_stages(num_layers)):
        t = f"body.{i}"
        bp: Dict = {}
        bs: Dict = {}
        if in_ch != depth:
            bp["short_conv"] = conv(f"{t}.shortcut_layer.0")
            q, r = {}, {}
            bn(f"{t}.shortcut_layer.1", q, r)
            bp["short_bn"], bs["short_bn"] = q, r
        q, r = {}, {}
        bn(f"{t}.res_layer.0", q, r)
        bp["bn0"], bs["bn0"] = q, r
        bp["conv1"] = conv(f"{t}.res_layer.1")
        bp["prelu"] = {"alpha": np32(f"{t}.res_layer.2.weight")}
        bp["conv2"] = conv(f"{t}.res_layer.3")
        q, r = {}, {}
        bn(f"{t}.res_layer.4", q, r)
        bp["bn1"], bs["bn1"] = q, r
        if f"{t}.res_layer.5.fc1.weight" in sd:
            bp["se"] = {"fc1": conv(f"{t}.res_layer.5.fc1"),
                        "fc2": conv(f"{t}.res_layer.5.fc2")}
        params[f"body_{i}"], stats[f"body_{i}"] = bp, bs

    q, r = {}, {}
    bn("output_layer.0", q, r)
    params["output_bn"], stats["output_bn"] = q, r
    params["output_fc"] = {"kernel": np32("output_layer.3.weight").transpose(1, 0),
                           "bias": np32("output_layer.3.bias")}
    if "output_layer.4.weight" in sd:
        params["output_scale"] = np32("output_layer.4.weight")
        params["output_bias"] = np32("output_layer.4.bias")
    stats["output_mean"] = np32("output_layer.4.running_mean")
    stats["output_var"] = np32("output_layer.4.running_var")
    return params, stats


# ---------------------------------------------------------------------------
# MobileFaceNet (backbones/mobilefacenet.py, cavaface variant)
# ---------------------------------------------------------------------------

class MbfConvBlock(nn.Module):
    """ConvBlock: conv(nobias)-BN-PReLU."""

    out_c: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    groups: int = 1
    prelu: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_c, self.kernel, strides=self.stride,
                    padding=self.padding, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        h = _BN(name="bn")(h)
        if self.prelu:
            h = PReLU(name="prelu")(h)
        return h


class MbfDepthWise(nn.Module):
    """DepthWise: 1x1 expand -> depthwise kxk -> 1x1 project (+residual)."""

    out_c: int
    groups: int
    stride: Tuple[int, int] = (2, 2)
    residual: bool = False

    @nn.compact
    def __call__(self, x):
        h = MbfConvBlock(self.groups, name="expand")(x)
        h = MbfConvBlock(self.groups, kernel=(3, 3), stride=self.stride,
                         padding=1, groups=self.groups, name="dw")(h)
        h = MbfConvBlock(self.out_c, prelu=False, name="project")(h)
        return x + h if self.residual else h


class MobileFaceNet(nn.Module):
    """get_mbf (blocks=(1,4,6,2), scale=2) / get_mbf_large ((2,8,12,4), 4).

    112px RGB in [-1,1] -> num_features-d embedding (unnormalized, matching
    the torch forward, mobilefacenet.py:134-140).
    """

    num_features: int = 512
    blocks: Sequence[int] = (1, 4, 6, 2)
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        c = 64 * self.scale
        h = MbfConvBlock(c, kernel=(3, 3), stride=(2, 2), padding=1,
                         name="stem")(x)
        if self.blocks[0] == 1:
            h = MbfConvBlock(c, kernel=(3, 3), padding=1, groups=64,
                             name="stem_dw")(h)
        else:
            for i in range(self.blocks[0]):
                h = MbfDepthWise(c, groups=128, stride=(1, 1), residual=True,
                                 name=f"res0_{i}")(h)
        stages = [(c, c, 128, 128, self.blocks[1]),
                  (c, 2 * c, 256, 256, self.blocks[2]),
                  (2 * c, 2 * c, 512, 256, self.blocks[3])]
        for si, (in_c, out_c, down_g, res_g, n) in enumerate(stages):
            h = MbfDepthWise(out_c, groups=down_g, name=f"down{si}")(h)
            for i in range(n):
                h = MbfDepthWise(out_c, groups=res_g, stride=(1, 1),
                                 residual=True, name=f"res{si + 1}_{i}")(h)
        h = MbfConvBlock(512, name="conv_sep")(h)
        # GDC: 7x7 depthwise linear block -> flatten(512x1x1) -> linear -> BN1d
        h = MbfConvBlock(512, kernel=(7, 7), groups=512, prelu=False,
                         name="gdc_dw")(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.num_features, use_bias=False, name="gdc_fc")(h)
        return _bn1d(self, h, "gdc")


def convert_mobilefacenet(sd: Dict, blocks: Sequence[int] = (1, 4, 6, 2)):
    """torch MobileFaceNet state_dict -> (params, batch_stats)."""
    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Dict = {}
    stats: Dict = {}

    def convblock(t, f, prelu=True):
        p = {"conv": {"kernel": np32(f"{t}.layers.0.weight").transpose(2, 3, 1, 0)},
             "bn": {"scale": np32(f"{t}.layers.1.weight"),
                    "bias": np32(f"{t}.layers.1.bias")}}
        s = {"bn": {"mean": np32(f"{t}.layers.1.running_mean"),
                    "var": np32(f"{t}.layers.1.running_var")}}
        if prelu:
            p["prelu"] = {"alpha": np32(f"{t}.layers.2.weight")}
        params[f] = p
        stats[f] = s

    def depthwise(t, f):
        convblock(f"{t}.layers.0", "__tmp__")
        p = {"expand": params.pop("__tmp__")}
        s = {"expand": stats.pop("__tmp__")}
        convblock(f"{t}.layers.1", "__tmp__")
        p["dw"], s["dw"] = params.pop("__tmp__"), stats.pop("__tmp__")
        convblock(f"{t}.layers.2", "__tmp__", prelu=False)
        p["project"], s["project"] = params.pop("__tmp__"), stats.pop("__tmp__")
        params[f], stats[f] = p, s

    convblock("layers.0", "stem")
    if blocks[0] == 1:
        convblock("layers.1", "stem_dw")
    else:
        for i in range(blocks[0]):
            depthwise(f"layers.1.layers.{i}", f"res0_{i}")
    li = 2
    for si, n in enumerate(blocks[1:]):
        depthwise(f"layers.{li}", f"down{si}")
        for i in range(n):
            depthwise(f"layers.{li + 1}.layers.{i}", f"res{si + 1}_{i}")
        li += 2
    convblock("conv_sep", "conv_sep")
    convblock("features.layers.0", "gdc_dw", prelu=False)
    params["gdc_fc"] = {"kernel": np32("features.layers.2.weight").transpose(1, 0)}
    params["gdc_scale"] = np32("features.layers.3.weight")
    params["gdc_bias"] = np32("features.layers.3.bias")
    stats["gdc_mean"] = np32("features.layers.3.running_mean")
    stats["gdc_var"] = np32("features.layers.3.running_var")
    return params, stats


# ---------------------------------------------------------------------------
# Face VisionTransformer (backbones/vit.py)
# ---------------------------------------------------------------------------

class FaceViTBlock(nn.Module):
    """pre-LN attn + ReLU6 MLP block (vit.py:73-111), eval (no drop-path)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        hd = d // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, name="qkv")(h)
        qkv = qkv.reshape(b, l, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5, axis=-1
        )
        h = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        h = h.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(d, name="proj")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), name="fc1")(h)
        h = jnp.minimum(nn.relu(h), 6.0)  # ReLU6
        return x + nn.Dense(d, name="fc2")(h)


class FaceViT(nn.Module):
    """vit.VisionTransformer at eval: patchify -> blocks -> LN -> feature head.

    Factory hyperparams (backbones/__init__.py:32-82): img 112, patch 9,
    heads 8; vit_t embed 256 depth 12; vit_s 512x12; vit_b 512x24.
    """

    img_size: int = 112
    patch_size: int = 9
    embed_dim: int = 512
    depth: int = 12
    num_heads: int = 8
    num_classes: int = 512
    mlp_ratio: float = 4.0
    qkv_bias: bool = False  # must match the checkpoint (converter emits
    # qkv biases when present; without this plumb they could not load)

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_proj")(x)
        h = h.reshape(b, -1, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, h.shape[1], self.embed_dim))
        h = h + pos
        for i in range(self.depth):
            h = FaceViTBlock(self.num_heads, self.mlp_ratio,
                             qkv_bias=self.qkv_bias, name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        h = h.reshape(b, -1)  # (B, L*D), token-major == torch reshape
        h = nn.Dense(self.embed_dim, use_bias=False, name="feature_fc1")(h)
        h = _bn1d(self, h, "feat1", eps=2e-5)
        h = nn.Dense(self.num_classes, use_bias=False, name="feature_fc2")(h)
        return _bn1d(self, h, "feat2", eps=2e-5)


FACE_VIT_FACTORIES = {
    "vit_t": dict(embed_dim=256, depth=12),
    "vit_s": dict(embed_dim=512, depth=12),
    "vit_b": dict(embed_dim=512, depth=24),
}


def convert_face_vit(sd: Dict, depth: int = 12):
    """torch VisionTransformer state_dict -> (params, batch_stats)."""
    def np32(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def dense(t, bias=True):
        d = {"kernel": np32(f"{t}.weight").transpose(1, 0)}
        if bias:
            d["bias"] = np32(f"{t}.bias")
        return d

    def ln(t):
        return {"scale": np32(f"{t}.weight"), "bias": np32(f"{t}.bias")}

    params: Dict = {
        "patch_proj": {"kernel": np32("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                       "bias": np32("patch_embed.proj.bias")},
        "pos_embed": np32("pos_embed"),
        "norm": ln("norm"),
        "feature_fc1": dense("feature.0", bias=False),
        "feat1_scale": np32("feature.1.weight"),
        "feat1_bias": np32("feature.1.bias"),
        "feature_fc2": dense("feature.2", bias=False),
        "feat2_scale": np32("feature.3.weight"),
        "feat2_bias": np32("feature.3.bias"),
    }
    stats: Dict = {
        "feat1_mean": np32("feature.1.running_mean"),
        "feat1_var": np32("feature.1.running_var"),
        "feat2_mean": np32("feature.3.running_mean"),
        "feat2_var": np32("feature.3.running_var"),
    }
    for i in range(depth):
        t = f"blocks.{i}"
        blk = {"norm1": ln(f"{t}.norm1"), "norm2": ln(f"{t}.norm2"),
               "qkv": dense(f"{t}.attn.qkv", bias=f"{t}.attn.qkv.bias" in sd),
               "proj": dense(f"{t}.attn.proj"),
               "fc1": dense(f"{t}.mlp.fc1"), "fc2": dense(f"{t}.mlp.fc2")}
        params[f"block_{i}"] = blk
    return params, stats


def make_embed_fn(model: nn.Module, params: Dict, stats: Dict):
    """Bind a tower into an `images -> embeddings` callable (for IDLoss/CSIM)."""
    def fn(images):
        return model.apply({"params": params, "batch_stats": stats}, images)
    return fn


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d semantics on NHWC (exact bin boundaries)."""
    oh, ow = out_hw if isinstance(out_hw, (tuple, list)) else (out_hw, out_hw)

    def pool_axis(arr, out, axis):
        size = arr.shape[axis]
        if size == out:
            return arr
        starts = np.floor(np.arange(out) * size / out).astype(np.int32)
        ends = np.ceil((np.arange(out) + 1) * size / out).astype(np.int32)
        cs = jnp.cumsum(arr, axis=axis)
        zero = jnp.zeros_like(jnp.take(cs, jnp.array([0]), axis=axis))
        cs = jnp.concatenate([zero, cs], axis=axis)
        tot = jnp.take(cs, jnp.asarray(ends), axis=axis) - jnp.take(
            cs, jnp.asarray(starts), axis=axis
        )
        shape = [1] * arr.ndim
        shape[axis] = out
        return tot / jnp.asarray(ends - starts, arr.dtype).reshape(shape)

    return pool_axis(pool_axis(x, oh, 1), ow, 2)


def make_id_embed_fn(params: Dict, stats: Dict, model: Optional[nn.Module] = None):
    """IDLoss.extract_feats equivalent (idloss.py:28-45). Closes over the
    weights — for host-side metric use; jitted losses use
    make_id_embed_apply (weights as jit arguments, CLAUDE.md)."""
    apply_fn = make_id_embed_apply(model)
    variables = {"params": params, "batch_stats": stats}
    return lambda images: apply_fn(variables, images)


def make_id_embed_apply(model: Optional[nn.Module] = None):
    """Param-taking variant: fn(variables, images) with
    variables = {'params': ..., 'batch_stats': ...}. [-1,1] images at any
    size -> clamp -> adaptive pool to 112 -> IR-SE50 embedding. The
    reference's clamp((y+1)/2, 0, 1) then Normalize(0.5, 0.5) round-trip is
    exactly clip(y, -1, 1)."""
    tower = model if model is not None else IRSE()

    def fn(variables, images):
        x = jnp.clip(images, -1.0, 1.0)
        x = adaptive_avg_pool2d(x, (112, 112))
        return tower.apply(variables, x)

    return fn
