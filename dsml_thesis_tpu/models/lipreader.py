"""Lipreader visual frontend (Conv3D stem + ResNet-18 trunk) for the
talking-face lipread finetune.

Parity targets (architecture, not code):
  - talking_face/ldm/models/diffusion/ddpm2condtune.py:498-535 loads the
    "Visual Speech Recognition for Multiple Languages" LRS3 model
    (configs/lipread_config.ini -> data/LRS3_V_WER32.3/model.pth) and calls
    `lip_reader.model.encoder(mouths, None, extract_resnet_feats=True)`
    (:1065-1077) — i.e. ONLY the visual frontend runs for the loss: a
    Conv3d(1→64, k=(5,7,7), s=(1,2,2)) + BN + swish + MaxPool3d((1,3,3),
    s=(1,2,2)) stem followed by a per-frame 2D ResNet-18 trunk
    (BasicBlock [2,2,2,2], 64→512, swish activations, adaptive avg-pool),
    giving [B, T, 512] features. The upstream submodule
    (external/Visual_Speech_Recognition_for_Multiple_Languages) is not
    checked out in the reference tree; this rebuilds the published
    espnet-backbone architecture (conv3d_extractor.py / resnet.py of
    mpc001/Visual_Speech_Recognition_for_Multiple_Languages).

TPU-first: NTHWC layout, the trunk runs framewise as one [B*T] batch (MXU
batching instead of a Python frame loop). Inference-only (BN running stats).
Weights convert from the user's LRS3 `model.pth` via convert_lipreader /
load_lipreader_checkpoint; nothing ships in-repo (zero-egress environment).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .arcface import _BN
from .efficientnet import _np  # shared torch->numpy helper

_RESNET18_LAYERS = (2, 2, 2, 2)
_RESNET18_PLANES = (64, 128, 256, 512)


def _act(relu_type: str):
    if relu_type == "swish":
        return nn.silu
    if relu_type == "relu":
        return nn.relu
    # 'prelu' exists in the upstream zoo but no published VSR checkpoint
    # ships it and convert_lipreader has no mapping for its per-block
    # weights — refuse loudly rather than half-initialize
    raise ValueError(f"unsupported relu_type {relu_type!r} (swish/relu)")


class _BasicBlock(nn.Module):
    """mpc001 resnet.py BasicBlock: conv3x3-bn-act-conv3x3-bn (+1x1-bn
    downsample) with the activation after the residual add."""

    planes: int
    stride: int = 1
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x):
        act = _act(self.relu_type)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = act(_BN(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _BN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, name="ds_conv")(x)
            x = _BN(name="ds_bn")(x)
        return act(h + x)


class LipreaderFrontend(nn.Module):
    """Conv3dResNet visual frontend, [B, T, H, W, 1] -> [B, T, 512]."""

    relu_type: str = "swish"

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        b, t = video.shape[:2]
        h = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    name="frontend3d")(video)
        h = _act(self.relu_type)(_BN(name="frontend_bn")(h))
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        # framewise 2D trunk as one big batch (B*T) — MXU-friendly
        h = h.reshape((b * t,) + h.shape[2:])
        for li, (planes, reps) in enumerate(
                zip(_RESNET18_PLANES, _RESNET18_LAYERS)):
            for bi in range(reps):
                stride = 2 if (bi == 0 and li > 0) else 1
                h = _BasicBlock(planes=planes, stride=stride,
                                relu_type=self.relu_type,
                                name=f"layer{li + 1}_{bi}")(h)
        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return h.reshape(b, t, h.shape[-1])


# ---------------------------------------------------------------------------
# Weight conversion (espnet E2E state_dict -> Flax params/batch_stats)
# ---------------------------------------------------------------------------

def _bn(sd: Dict, key: str) -> Tuple[Dict, Dict]:
    return ({"scale": _np(sd[f"{key}.weight"]),
             "bias": _np(sd[f"{key}.bias"])},
            {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])})


def detect_frontend_prefix(sd: Dict) -> str:
    """Locate the visual frontend inside an arbitrary checkpoint: the full
    espnet E2E model keys it 'encoder.frontend.', a bare Conv3dResNet ''."""
    for k in sd:
        if k.endswith("frontend3D.0.weight"):
            return k[: -len("frontend3D.0.weight")]
    raise ValueError("no Conv3dResNet frontend (frontend3D.0.weight) found")


def convert_lipreader(sd: Dict, prefix: Optional[str] = None
                      ) -> Tuple[Dict, Dict]:
    """torch state_dict (full E2E model or bare frontend) -> (params, stats)."""
    if prefix is None:
        prefix = detect_frontend_prefix(sd)
    params: Dict = {}
    stats: Dict = {}
    # stem: torch conv3d [64,1,5,7,7] -> flax [5,7,7,1,64]
    params["frontend3d"] = {
        "kernel": _np(sd[f"{prefix}frontend3D.0.weight"]).transpose(2, 3, 4, 1, 0)}
    params["frontend_bn"], stats["frontend_bn"] = _bn(sd, f"{prefix}frontend3D.1")
    for li, reps in enumerate(_RESNET18_LAYERS):
        for bi in range(reps):
            t = f"{prefix}trunk.layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            p: Dict = {
                "conv1": {"kernel": _np(sd[f"{t}.conv1.weight"]).transpose(2, 3, 1, 0)},
                "conv2": {"kernel": _np(sd[f"{t}.conv2.weight"]).transpose(2, 3, 1, 0)},
            }
            s: Dict = {}
            p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
            p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                p["ds_conv"] = {"kernel": _np(
                    sd[f"{t}.downsample.0.weight"]).transpose(2, 3, 1, 0)}
                p["ds_bn"], s["ds_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = p
            stats[f] = s
    return params, stats


def load_lipreader_checkpoint(path: str) -> Dict:
    """model.pth -> {'params':..., 'batch_stats':...} ready for .apply()."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    params, stats = convert_lipreader(sd)
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}


def make_lipreader_apply(relu_type: str = "swish"):
    """Param-taking frame-feature fn for LipreadFinetune: (variables,
    mouths [B, 88, 88, 1]) -> [B, 512]. Frames run as T=1 sequences, exactly
    like the reference's `.unsqueeze(1)` call (ddpm2condtune.py:1063-1070);
    with zero temporal padding the 5-tap stem reduces to its center slice."""
    model = LipreaderFrontend(relu_type=relu_type)

    def features_fn(variables: Dict, mouths: jnp.ndarray) -> jnp.ndarray:
        feats = model.apply(variables, mouths[:, None])  # [B,1,88,88,1]
        return feats[:, 0]

    return features_fn


def make_lipreader_video_apply(relu_type: str = "swish"):
    """(variables, video [B, T, H, W, 1]) -> [B, T, 512] — the true temporal
    form (5-frame receptive field) for sequence-level evaluation."""
    model = LipreaderFrontend(relu_type=relu_type)

    def features_fn(variables: Dict, video: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, video)

    return features_fn
