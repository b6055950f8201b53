"""HSEmotion EfficientNet-B2 emotion classifier (the frozen CLS-loss tower).

Parity targets (architecture, not code):
  - face_reenactment/ldm/modules/losses/clsloss.py:80-114 — CLSLoss loads the
    HSEmotion `enet_b2_7`/`enet_b2_8` checkpoint (a pickled timm EfficientNet),
    maps images [-1,1] -> [0,1] -> bilinear 260px -> ImageNet-normalize, and
    takes cross-entropy toward the target class REMAPPED through the model's
    own alphabetical head order (clsloss.py:11-15, the IDX_TO_CLASS tables).
  - face_reenactment/emorec.py:9-43 — the emotion-agreement metric over the
    same frozen tower.

The tower itself is timm's EfficientNet-B2 (width 1.1 / depth 1.2 over the B0
base, stem 32, head 1408, SiLU, SE ratio 0.25 of block input). HSEmotion's
published checkpoints descend from `tf_efficientnet_b2_ns`, i.e. TF "SAME"
asymmetric padding and BN eps 1e-3 — both configurable here (`pad_same`,
`bn_eps`) so plain `efficientnet_b2` state_dicts convert too.

Inference-only (eval mode: BN running stats, stochastic depth off). Weights
convert from the user's torch checkpoint via convert_enet /
load_enet_checkpoint; nothing ships in-repo (zero-egress environment).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .arcface import _BN

# B0 base stage specs: (block, kernel, stride, expand_ratio, out_ch, repeats)
_B0_STAGES: Tuple[Tuple[str, int, int, int, int, int], ...] = (
    ("ds", 3, 1, 1, 16, 1),
    ("ir", 3, 2, 6, 24, 2),
    ("ir", 5, 2, 6, 40, 2),
    ("ir", 3, 2, 6, 80, 3),
    ("ir", 5, 1, 6, 112, 3),
    ("ir", 5, 2, 6, 192, 4),
    ("ir", 3, 1, 6, 320, 1),
)

# AffectNet label order (emorec.py:23-24 / clsloss.py:11-15) vs the model's
# alphabetical head order. affectnet_to_head[affectnet_idx] = model head idx.
CLASS_NAMES_7 = ("Anger", "Disgust", "Fear", "Happiness", "Neutral",
                 "Sadness", "Surprise")
CLASS_NAMES_8 = ("Anger", "Contempt", "Disgust", "Fear", "Happiness",
                 "Neutral", "Sadness", "Surprise")
AFFECTNET_NAMES_7 = ("Neutral", "Happiness", "Sadness", "Surprise", "Fear",
                     "Disgust", "Anger")
AFFECTNET_NAMES_8 = AFFECTNET_NAMES_7 + ("Contempt",)


def affectnet_to_head(num_classes: int) -> np.ndarray:
    """AffectNet label -> classifier-head index (clsloss.py target remap)."""
    if num_classes not in (7, 8):
        raise ValueError(
            f"affectnet_to_head: only the published 7/8-class HSEmotion "
            f"heads have a known label order, got num_classes={num_classes}")
    heads = CLASS_NAMES_7 if num_classes == 7 else CLASS_NAMES_8
    affect = AFFECTNET_NAMES_7 if num_classes == 7 else AFFECTNET_NAMES_8
    return np.asarray([heads.index(n) for n in affect], dtype=np.int32)


def head_to_affectnet(num_classes: int) -> np.ndarray:
    """Classifier-head index -> AffectNet label (emorec prediction remap)."""
    fwd = affectnet_to_head(num_classes)
    inv = np.empty_like(fwd)
    inv[fwd] = np.arange(len(fwd), dtype=np.int32)
    return inv


def _make_divisible(v: float, divisor: int = 8) -> int:
    """timm round_channels semantics (make_divisible with the 0.9 floor)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(r * depth_mult))


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    width_mult: float = 1.1          # B2
    depth_mult: float = 1.2          # B2
    num_classes: int = 7             # enet_b2_7; 8 for enet_b2_8
    stem_ch: int = 32
    head_ch: int = 1280
    se_ratio: float = 0.25
    bn_eps: float = 1e-3             # tf_ lineage; 1e-5 for plain timm b2
    pad_same: bool = True            # TF asymmetric SAME; False = k//2 static
    input_size: int = 260            # b2 resolution (clsloss.py:108)
    # explicit layout (as inferred from a checkpoint by convert_enet);
    # overrides the multiplier-derived plan when set
    stages_override: Optional[Tuple[Tuple[str, int, int, int, int, int], ...]] = None
    stem_override: Optional[int] = None
    head_override: Optional[int] = None

    def stages(self) -> List[Tuple[str, int, int, int, int, int]]:
        if self.stages_override is not None:
            return list(self.stages_override)
        out = []
        for blk, k, s, e, c, r in _B0_STAGES:
            out.append((blk, k, s, e,
                        _make_divisible(c * self.width_mult),
                        _round_repeats(r, self.depth_mult)))
        return out

    @property
    def stem(self) -> int:
        if self.stem_override is not None:
            return self.stem_override
        return _make_divisible(self.stem_ch * self.width_mult)

    @property
    def head(self) -> int:
        if self.head_override is not None:
            return self.head_override
        return _make_divisible(self.head_ch * self.width_mult)


def _pad(cfg: EffNetConfig, k: int):
    return "SAME" if cfg.pad_same else [(k // 2, k // 2)] * 2


class _SE(nn.Module):
    """timm SqueezeExcite: GAP -> 1x1 (bias) -> SiLU -> 1x1 (bias) -> sigmoid;
    reduced channels come from the BLOCK INPUT, not the expanded width."""

    rd_ch: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_ch, (1, 1), name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(c, (1, 1), name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class _DSConv(nn.Module):
    """timm DepthwiseSeparableConv: dw -> bn1 -> act -> se -> pw -> bn2."""

    cfg: EffNetConfig
    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.Conv(c_in, (self.kernel,) * 2, strides=self.stride,
                    padding=_pad(self.cfg, self.kernel),
                    feature_group_count=c_in, use_bias=False,
                    name="conv_dw")(x)
        h = nn.silu(_BN(eps=self.cfg.bn_eps, name="bn1")(h))
        h = _SE(rd_ch=max(1, round(c_in * self.cfg.se_ratio)), name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pw")(h)
        h = _BN(eps=self.cfg.bn_eps, name="bn2")(h)  # no pw act (timm default)
        if self.stride == 1 and c_in == self.out_ch:
            h = h + x
        return h


class _IRBlock(nn.Module):
    """timm InvertedResidual: pw-expand -> dw -> se -> pw-linear (+residual)."""

    cfg: EffNetConfig
    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = _make_divisible(c_in * self.expand)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        h = nn.silu(_BN(eps=self.cfg.bn_eps, name="bn1")(h))
        h = nn.Conv(mid, (self.kernel,) * 2, strides=self.stride,
                    padding=_pad(self.cfg, self.kernel),
                    feature_group_count=mid, use_bias=False,
                    name="conv_dw")(h)
        h = nn.silu(_BN(eps=self.cfg.bn_eps, name="bn2")(h))
        h = _SE(rd_ch=max(1, round(c_in * self.cfg.se_ratio)), name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pwl")(h)
        h = _BN(eps=self.cfg.bn_eps, name="bn3")(h)
        if self.stride == 1 and c_in == self.out_ch:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """timm-layout EfficientNet classifier, NHWC, eval-mode only."""

    cfg: EffNetConfig = EffNetConfig()

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        cfg = self.cfg
        h = nn.Conv(cfg.stem, (3, 3), strides=2, padding=_pad(cfg, 3),
                    use_bias=False, name="conv_stem")(x)
        h = nn.silu(_BN(eps=cfg.bn_eps, name="bn1")(h))
        for si, (blk, k, s, e, c, r) in enumerate(cfg.stages()):
            for bi in range(r):
                stride = s if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if blk == "ds":
                    h = _DSConv(cfg=cfg, out_ch=c, kernel=k, stride=stride,
                                name=name)(h)
                else:
                    h = _IRBlock(cfg=cfg, out_ch=c, kernel=k, stride=stride,
                                 expand=e, name=name)(h)
        h = nn.Conv(cfg.head, (1, 1), use_bias=False, name="conv_head")(h)
        h = nn.silu(_BN(eps=cfg.bn_eps, name="bn2")(h))
        h = jnp.mean(h, axis=(1, 2))
        if features_only:
            return h
        return nn.Dense(cfg.num_classes, name="classifier")(h)


# ---------------------------------------------------------------------------
# Weight conversion (timm state_dict -> Flax params/batch_stats)
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return np.asarray(getattr(t, "detach", lambda: t)().numpy()
                      if hasattr(t, "numpy") else t, dtype=np.float32)


def _conv(sd: Dict, key: str, depthwise: bool = False) -> Dict:
    w = _np(sd[f"{key}.weight"])
    if depthwise:  # torch [C,1,kh,kw] -> flax [kh,kw,1,C]
        w = w.transpose(2, 3, 1, 0)
    else:          # torch [O,I,kh,kw] -> flax [kh,kw,I,O]
        w = w.transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd: Dict, key: str) -> Tuple[Dict, Dict]:
    return ({"scale": _np(sd[f"{key}.weight"]),
             "bias": _np(sd[f"{key}.bias"])},
            {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])})


def infer_enet_config(sd: Dict, cls_key: str = "classifier") -> EffNetConfig:
    """Read the stage layout straight off a timm state_dict: block type from
    the key set, kernel/width/expansion from weight shapes; strides are the
    architectural constants of the 7-stage EfficientNet family."""
    import re

    n_stage = 1 + max(int(m.group(1)) for k in sd
                      if (m := re.match(r"blocks\.(\d+)\.", k)))
    if n_stage != len(_B0_STAGES):
        raise ValueError(f"expected a 7-stage EfficientNet, got {n_stage}")
    stages = []
    for si, (_, _, stride, _, _, _) in enumerate(_B0_STAGES):
        reps = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(rf"blocks\.{si}\.(\d+)\.", k)))
        is_ir = f"blocks.{si}.0.conv_pwl.weight" in sd
        kernel = int(_np(sd[f"blocks.{si}.0.conv_dw.weight"]).shape[-1])
        if is_ir:
            cin = int(_np(sd[f"blocks.{si}.0.conv_pw.weight"]).shape[1])
            mid = int(_np(sd[f"blocks.{si}.0.conv_pw.weight"]).shape[0])
            out = int(_np(sd[f"blocks.{si}.0.conv_pwl.weight"]).shape[0])
            expand = max(1, round(mid / cin))
            if _make_divisible(cin * expand) != mid:
                raise ValueError(
                    f"stage {si}: expansion {mid}/{cin} is not a clean ratio")
            stages.append(("ir", kernel, stride, expand, out, reps))
        else:
            out = int(_np(sd[f"blocks.{si}.0.conv_pw.weight"]).shape[0])
            stages.append(("ds", kernel, stride, 1, out, reps))
    return EffNetConfig(
        num_classes=int(_np(sd[f"{cls_key}.weight"]).shape[0]),
        stages_override=tuple(stages),
        stem_override=int(_np(sd["conv_stem.weight"]).shape[0]),
        head_override=int(_np(sd["conv_head.weight"]).shape[0]),
    )


def convert_enet(sd: Dict, cfg: Optional[EffNetConfig] = None
                 ) -> Tuple[EffNetConfig, Dict, Dict]:
    """timm EfficientNet state_dict -> (cfg, params, batch_stats).

    num_classes is inferred from the classifier head. Accepts both
    `classifier.weight` and HSEmotion's occasional `classifier.1.weight`
    (Dropout+Linear Sequential) layouts.
    """
    cls_key = ("classifier" if "classifier.weight" in sd else
               "classifier.1" if "classifier.1.weight" in sd else None)
    if cls_key is None:
        raise ValueError("no classifier head found in state_dict")
    if cfg is None:
        cfg = infer_enet_config(sd, cls_key)
    params: Dict = {}
    stats: Dict = {}

    def put(name: str, p: Dict, s: Optional[Dict] = None):
        params[name] = p
        if s is not None:
            stats[name] = s

    put("conv_stem", _conv(sd, "conv_stem"))
    put("bn1", *_bn(sd, "bn1"))
    for si, (blk, k, s, e, c, r) in enumerate(cfg.stages()):
        for bi in range(r):
            t = f"blocks.{si}.{bi}"
            f = f"blocks_{si}_{bi}"
            if blk == "ds":
                put(f, {
                    "conv_dw": _conv(sd, f"{t}.conv_dw", depthwise=True),
                    "conv_pw": _conv(sd, f"{t}.conv_pw"),
                    "se": {"conv_reduce": _conv(sd, f"{t}.se.conv_reduce"),
                           "conv_expand": _conv(sd, f"{t}.se.conv_expand")},
                })
                bn1p, bn1s = _bn(sd, f"{t}.bn1")
                bn2p, bn2s = _bn(sd, f"{t}.bn2")
                params[f].update(bn1=bn1p, bn2=bn2p)
                stats[f] = {"bn1": bn1s, "bn2": bn2s}
            else:
                put(f, {
                    "conv_pw": _conv(sd, f"{t}.conv_pw"),
                    "conv_dw": _conv(sd, f"{t}.conv_dw", depthwise=True),
                    "conv_pwl": _conv(sd, f"{t}.conv_pwl"),
                    "se": {"conv_reduce": _conv(sd, f"{t}.se.conv_reduce"),
                           "conv_expand": _conv(sd, f"{t}.se.conv_expand")},
                })
                bns = {}
                for bn_name in ("bn1", "bn2", "bn3"):
                    p, st = _bn(sd, f"{t}.{bn_name}")
                    params[f][bn_name] = p
                    bns[bn_name] = st
                stats[f] = bns
    put("conv_head", _conv(sd, "conv_head"))
    put("bn2", *_bn(sd, "bn2"))
    params["classifier"] = {
        "kernel": _np(sd[f"{cls_key}.weight"]).T,
        "bias": _np(sd[f"{cls_key}.bias"]),
    }
    return cfg, params, stats


# ---------------------------------------------------------------------------
# Checkpoint loading (handles HSEmotion's pickled-whole-model .pt files)
# ---------------------------------------------------------------------------

def _extract_module_state(obj, prefix: str = "") -> Dict:
    """Walk a stub-unpickled nn.Module attribute tree into a flat state_dict."""
    sd: Dict = {}
    d = getattr(obj, "__dict__", None) or {}
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            sd[prefix + k] = v
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None and not k.startswith("num_batches"):
            sd[prefix + k] = v
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            sd.update(_extract_module_state(v, f"{prefix}{k}."))
    return sd


def load_enet_state_dict(path: str) -> Dict:
    """Load a state_dict from either a plain state_dict file or HSEmotion's
    pickled-whole-timm-model .pt — WITHOUT requiring timm: unknown classes
    unpickle as attribute-bag stubs and the parameter tree is walked manually.
    """
    import pickle
    import types

    import torch

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                stub = type(name, (), {"__module__": module})
                return stub

    shim = types.ModuleType("dsml_stub_pickle")
    shim.Unpickler = _StubUnpickler
    shim.load, shim.dump, shim.Pickler = pickle.load, pickle.dump, pickle.Pickler
    obj = torch.load(path, map_location="cpu", weights_only=False,
                     pickle_module=shim)
    if isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    elif hasattr(obj, "state_dict") and isinstance(obj, torch.nn.Module):
        sd = obj.state_dict()
    else:  # stub-unpickled module tree
        sd = _extract_module_state(obj)
    return {k: (v.detach() if hasattr(v, "detach") else v)
            for k, v in sd.items() if not k.endswith("num_batches_tracked")}


def load_enet_checkpoint(path: str, cfg: Optional[EffNetConfig] = None
                         ) -> Tuple[EffNetConfig, Dict]:
    """Path -> (cfg, {'params':..., 'batch_stats':...}) ready for .apply()."""
    cfg, params, stats = convert_enet(load_enet_state_dict(path), cfg)
    return cfg, {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}


def preprocess_enet(images_m11: jnp.ndarray, input_size: int = 260
                    ) -> jnp.ndarray:
    """clsloss.py:105-110: [-1,1] NHWC -> clamp [0,1] -> bilinear resize to
    input_size -> ImageNet norm. antialias=False matches torch
    F.interpolate's plain bilinear taps on DOWNSCALES too (jax's default
    antialias=True widens the kernel when minifying; align_corners=False
    half-pixel sampling matches either way)."""
    x = jnp.clip((images_m11 + 1.0) * 0.5, 0.0, 1.0)
    b, _, _, c = x.shape
    x = jax.image.resize(x, (b, input_size, input_size, c),
                         method="bilinear", antialias=False)
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    return (x - mean) / std


def make_enet_logits_apply(cfg: EffNetConfig):
    """Param-taking logits fn ([-1,1] NHWC images -> head logits); weights
    ride the params tree so jitted losses receive them as ARGUMENTS (axon
    rejects closure constants, CLAUDE.md)."""
    model = EfficientNet(cfg=cfg)

    def logits_fn(variables: Dict, images_m11: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, preprocess_enet(images_m11,
                                                      cfg.input_size))

    return logits_fn
