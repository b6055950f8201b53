"""Vendored timm-layout EfficientNet (torch) — the random-init parity oracle
for dsml_thesis_tpu.models.efficientnet.

timm itself is not in this image, so the oracle reimplements the eval-mode
forward with timm's exact module/state_dict naming (conv_stem, bn1,
blocks.{stage}.{idx}.{conv_dw,bn1,se.conv_reduce,...}, conv_head, bn2,
classifier) and TF-"SAME" asymmetric padding for the tf_ lineage
(HSEmotion enet_b2_7/8). The published-spec pin is separate:
test_efficientnet.py asserts the B2 param count against the known 9,109,994.
"""
import math

import torch
import torch.nn.functional as F
from torch import nn

from dsml_thesis_tpu.models.efficientnet import EffNetConfig, _make_divisible


class Conv2dSame(nn.Conv2d):
    """TF-style dynamic SAME padding (timm layers/conv2d_same.py semantics)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + (kh - 1) * self.dilation[0] + 1 - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + (kw - 1) * self.dilation[1] + 1 - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _conv(cfg, cin, cout, k, stride=1, groups=1):
    if cfg.pad_same:
        return Conv2dSame(cin, cout, k, stride=stride, groups=groups, bias=False)
    return nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                     groups=groups, bias=False)


class SqueezeExcite(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class DepthwiseSeparableConv(nn.Module):
    def __init__(self, cfg, cin, cout, k, stride):
        super().__init__()
        self.has_residual = stride == 1 and cin == cout
        self.conv_dw = _conv(cfg, cin, cin, k, stride, groups=cin)
        self.bn1 = nn.BatchNorm2d(cin, eps=cfg.bn_eps)
        self.se = SqueezeExcite(cin, max(1, round(cin * cfg.se_ratio)))
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout, eps=cfg.bn_eps)

    def forward(self, x):
        h = self.se(F.silu(self.bn1(self.conv_dw(x))))
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_residual else h


class InvertedResidual(nn.Module):
    def __init__(self, cfg, cin, cout, k, stride, expand):
        super().__init__()
        self.has_residual = stride == 1 and cin == cout
        mid = _make_divisible(cin * expand)
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=cfg.bn_eps)
        self.conv_dw = _conv(cfg, mid, mid, k, stride, groups=mid)
        self.bn2 = nn.BatchNorm2d(mid, eps=cfg.bn_eps)
        self.se = SqueezeExcite(mid, max(1, round(cin * cfg.se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, eps=cfg.bn_eps)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(self.se(h)))
        return h + x if self.has_residual else h


class EffNetTorch(nn.Module):
    def __init__(self, cfg: EffNetConfig):
        super().__init__()
        self.conv_stem = _conv(cfg, 3, cfg.stem, 3, stride=2)
        self.bn1 = nn.BatchNorm2d(cfg.stem, eps=cfg.bn_eps)
        stages = []
        cin = cfg.stem
        for blk, k, s, e, c, r in cfg.stages():
            mods = []
            for bi in range(r):
                stride = s if bi == 0 else 1
                cls = DepthwiseSeparableConv if blk == "ds" else InvertedResidual
                args = (cfg, cin, c, k, stride) if blk == "ds" else \
                       (cfg, cin, c, k, stride, e)
                mods.append(cls(*args))
                cin = c
            stages.append(nn.Sequential(*mods))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(cin, cfg.head, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cfg.head, eps=cfg.bn_eps)
        self.classifier = nn.Linear(cfg.head, cfg.num_classes)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_stem(x)))
        h = self.blocks(h)
        h = F.silu(self.bn2(self.conv_head(h)))
        return self.classifier(h.mean((2, 3)))
