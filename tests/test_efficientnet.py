"""Parity of the HSEmotion EfficientNet-B2 tower vs a timm-layout torch oracle.

Covers: forward parity for both pad lineages (tf SAME / static), the published
B2 param-count pin, the AffectNet<->head label maps vs the reference tables
(clsloss.py:11-15), the stub unpickler for pickled-whole-timm-model .pt files,
and the config-built cls_ckpt guidance path end to end.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dsml_thesis_tpu.models import efficientnet as enet
from tests.enet_torch import EffNetTorch


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.2 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.2 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(1.0 + 0.5 * torch.rand(m.running_var.shape, generator=g))
            elif isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
                m.weight.copy_(0.1 * torch.randn(m.weight.shape, generator=g))
                if m.bias is not None:
                    m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
    return module


def _small_cfg(**kw):
    """Tiny multipliers keep CPU time low while exercising every stage."""
    return enet.EffNetConfig(width_mult=0.35, depth_mult=0.35, num_classes=7,
                             input_size=66, **kw)


@pytest.mark.parametrize("pad_same,bn_eps", [(True, 1e-3), (False, 1e-5)])
def test_enet_forward_parity(pad_same, bn_eps):
    cfg = _small_cfg(pad_same=pad_same, bn_eps=bn_eps)
    tm = _randomize(EffNetTorch(cfg), seed=0).eval()
    # even spatial size so SAME padding goes asymmetric at the stride-2 convs
    x = np.random.RandomState(1).randn(2, 66, 66, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    _, params, stats = enet.convert_enet(tm.state_dict(), cfg)
    got = enet.EfficientNet(cfg=cfg).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_b2_param_count_matches_published():
    """Pin the B2 channel/depth math to the published spec: timm/torchvision
    efficientnet_b2 has 9,109,994 params with a 1000-class head."""
    cfg = enet.EffNetConfig(num_classes=1000)
    tm = EffNetTorch(cfg)
    assert sum(p.numel() for p in tm.parameters()) == 9_109_994
    # and the stage plan is the documented B2 layout
    assert [(c, r) for _, _, _, _, c, r in cfg.stages()] == [
        (16, 2), (24, 3), (48, 3), (88, 4), (120, 4), (208, 5), (352, 2)]
    assert cfg.stem == 32 and cfg.head == 1408


def test_label_maps_match_reference_tables():
    """clsloss.py:11-15 tables, composed the way CLSLoss.forward does."""
    idx_to_class_7 = {6: "Anger", 5: "Disgust", 4: "Fear", 1: "Happiness",
                      0: "Neutral", 2: "Sadness", 3: "Surprise"}
    class_to_idx_7 = {"Anger": 0, "Disgust": 1, "Fear": 2, "Happiness": 3,
                      "Neutral": 4, "Sadness": 5, "Surprise": 6}
    idx_to_class_8 = {6: "Anger", 7: "Contempt", 5: "Disgust", 4: "Fear",
                      1: "Happiness", 0: "Neutral", 2: "Sadness", 3: "Surprise"}
    class_to_idx_8 = {"Anger": 0, "Contempt": 1, "Disgust": 2, "Fear": 3,
                      "Happiness": 4, "Neutral": 5, "Sadness": 6, "Surprise": 7}
    got7 = enet.affectnet_to_head(7)
    got8 = enet.affectnet_to_head(8)
    for i in range(7):
        assert got7[i] == class_to_idx_7[idx_to_class_7[i]]
    for i in range(8):
        assert got8[i] == class_to_idx_8[idx_to_class_8[i]]
    # inverse map round-trips
    assert (enet.head_to_affectnet(7)[got7] == np.arange(7)).all()
    assert (enet.head_to_affectnet(8)[got8] == np.arange(8)).all()
    # only the published 7/8-class heads have a known label order: any other
    # head size must refuse loudly instead of silently applying the 8-class
    # permutation (advisor round-4)
    with pytest.raises(ValueError, match="affectnet_to_head"):
        enet.affectnet_to_head(5)


def test_stub_unpickle_whole_model(tmp_path):
    """HSEmotion ships pickled WHOLE timm models; load_enet_state_dict must
    recover the state_dict without timm installed (stub unpickling)."""
    cfg = _small_cfg()
    tm = _randomize(EffNetTorch(cfg), seed=3).eval()
    want = {k: v.numpy() for k, v in tm.state_dict().items()}

    # masquerade the vendored classes as timm's (save-by-reference needs the
    # fake module importable at dump time, then we remove it again)
    import types

    import tests.enet_torch as et
    timm_mod = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    fake = types.ModuleType("timm.models.efficientnet")
    timm_mod.models = timm_models
    timm_models.efficientnet = fake
    names = {}
    for cls in (et.EffNetTorch, et.InvertedResidual, et.DepthwiseSeparableConv,
                et.SqueezeExcite, et.Conv2dSame):
        sub = type(cls.__name__, (cls,), {"__module__": "timm.models.efficientnet"})
        setattr(fake, cls.__name__, sub)
        names[cls.__name__] = sub
    sys.modules["timm"] = timm_mod
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.efficientnet"] = fake
    try:
        fake_model = names["EffNetTorch"](cfg)
        fake_model.load_state_dict(tm.state_dict())
        path = tmp_path / "enet_b2_7.pt"
        torch.save(fake_model, str(path))
    finally:
        for m in ("timm.models.efficientnet", "timm.models", "timm"):
            del sys.modules[m]

    sd = enet.load_enet_state_dict(str(path))
    assert set(sd) == set(k for k in want if "num_batches" not in k)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), want[k])


def test_cls_ckpt_guidance_path(tmp_path):
    """build_guidance_encoders(cls_ckpt=...) reproduces the reference CLSLoss:
    CE over remapped targets (clsloss.py:111-113) == our CE over
    AffectNet-reordered logits."""
    import torch.nn.functional as F

    from dsml_thesis_tpu.config import build_guidance_encoders
    from dsml_thesis_tpu.losses.guidance import cls_loss

    cfg = _small_cfg()
    tm = _randomize(EffNetTorch(cfg), seed=5).eval()
    path = tmp_path / "enet_sd.pt"
    torch.save(tm.state_dict(), str(path))

    out = build_guidance_encoders({
        "cls_ckpt": str(path), "cls_input_size": cfg.input_size,
        "cls_pad_same": cfg.pad_same, "cls_bn_eps": cfg.bn_eps,
    })
    logits_fn = out["classifier_logits"]
    frozen = out["frozen_params"]["classifier"]

    imgs = np.random.RandomState(7).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    target_affectnet = np.asarray([0, 4, 6], dtype=np.int32)

    got = cls_loss(lambda x: logits_fn(frozen, x), jnp.asarray(imgs),
                   jnp.asarray(target_affectnet))

    # reference math on the torch side
    x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    x = torch.clamp((x + 1) * 0.5, 0, 1)
    x = F.interpolate(x, (cfg.input_size,) * 2, mode="bilinear")
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        ref_logits = tm((x - mean) / std)
    remap = enet.affectnet_to_head(7)
    ref = F.cross_entropy(ref_logits,
                          torch.from_numpy(remap[target_affectnet]).long())
    np.testing.assert_allclose(float(got), float(ref), atol=5e-5, rtol=5e-5)


def test_preprocess_downscale_matches_torch_antialias_off():
    """jax.image.resize defaults to antialias=True on MINIFICATION, which the
    reference's F.interpolate never does (clsloss.py:108) — the preprocess
    must match torch's plain bilinear taps when downscaling big samples."""
    import torch.nn.functional as F

    rs = np.random.RandomState(11)
    imgs = rs.uniform(-1, 1, (2, 120, 120, 3)).astype(np.float32)
    got = np.asarray(enet.preprocess_enet(jnp.asarray(imgs), input_size=48))

    x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    x = torch.clamp((x + 1) * 0.5, 0, 1)
    x = F.interpolate(x, (48, 48), mode="bilinear")
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    want = ((x - mean) / std).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
