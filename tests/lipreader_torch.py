"""Vendored torch Conv3dResNet — the random-init parity oracle for
dsml_thesis_tpu.models.lipreader.

The upstream submodule (mpc001/Visual_Speech_Recognition_for_Multiple_
Languages) is not checked out in the reference tree; this reimplements the
published espnet-backbone visual frontend with its exact state_dict naming
(frontend3D.0/1, trunk.layer{1..4}.{0,1}.{conv1,bn1,conv2,bn2,downsample.0/1})
so the converter mapping is exercised key for key.
"""
import torch
import torch.nn.functional as F
from torch import nn


def _act(relu_type):
    return nn.SiLU() if relu_type == "swish" else nn.ReLU()


class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, relu_type="swish"):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = _act(relu_type)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        residual = self.downsample(x) if self.downsample else x
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu(h + residual)


class ResNetTrunk(nn.Module):
    def __init__(self, layers=(2, 2, 2, 2), relu_type="swish"):
        super().__init__()
        inplanes = 64
        for li, (planes, reps) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for bi in range(reps):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(BasicBlock(inplanes, planes, stride, relu_type))
                inplanes = planes
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return self.avgpool(x).flatten(1)


class Conv3dResNet(nn.Module):
    """[B, T, H, W] grayscale -> [B, T, 512]."""

    def __init__(self, relu_type="swish"):
        super().__init__()
        self.frontend3D = nn.Sequential(
            nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            nn.BatchNorm3d(64),
            _act(relu_type),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))
        self.trunk = ResNetTrunk(relu_type=relu_type)

    def forward(self, xs):
        b = xs.shape[0]
        h = self.frontend3D(xs.unsqueeze(1))  # [B,1,T,H,W] -> [B,64,T,h,w]
        tnew = h.shape[2]
        h = h.transpose(1, 2).reshape(b * tnew, 64, h.shape[3], h.shape[4])
        h = self.trunk(h)
        return h.view(b, tnew, -1)
