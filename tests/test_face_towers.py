"""Forward parity of the face-identity towers vs the torch reference.

Covers the IR-SE50 backbone (IDLoss, ldm/models/insight_face/model_irse.py),
the CSIM backbones (backbones/{iresnet,mobilefacenet,vit}.py), driven with
randomized weights + running statistics so BatchNorm/flatten-order bugs show.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from reference_oracle import reference_available, install_reference_path
from dsml_thesis_tpu.models import arcface
from dsml_thesis_tpu.models import insight_face as inf

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


def _stub_timm():
    """backbones/vit.py imports timm layer helpers; stub the three it uses."""
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):  # eval-mode identity
            return x

    layers.DropPath = DropPath
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _randomize(module, seed):
    """Perturb weights AND running stats around stable defaults.

    Every converted tensor moves off its init (so conversion bugs show), but
    activations stay O(1) through deep stacks — aggressive randn-overwrites
    make activations grow exponentially and drown parity in fp32 drift.
    """
    g = torch.Generator().manual_seed(seed)

    def _n(t, std):
        return std * torch.randn(t.shape, generator=g)

    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                if m.weight is not None:
                    m.weight.add_(_n(m.weight, 0.2))
                    m.bias.add_(_n(m.bias, 0.1))
                m.running_mean.add_(_n(m.running_mean, 0.1))
                m.running_var.copy_(
                    1.0 + 0.5 * torch.rand(m.running_var.shape, generator=g)
                )
            elif isinstance(m, torch.nn.PReLU):
                m.weight.add_(_n(m.weight, 0.1))
            elif isinstance(m, torch.nn.LayerNorm):
                m.weight.add_(_n(m.weight, 0.2))
                m.bias.add_(_n(m.bias, 0.1))
            elif isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
                # unit-gain re-init (std 1/sqrt(fan_in)) keeps activations O(1)
                fan_in = m.weight[0].numel()
                m.weight.copy_(_n(m.weight, fan_in ** -0.5))
                if m.bias is not None:
                    m.bias.copy_(_n(m.bias, 0.02))


def _faces(seed, n=2, size=112):
    rs = np.random.RandomState(seed)
    return (rs.rand(n, 3, size, size).astype(np.float32) * 2 - 1)


@pytest.mark.parametrize("mode,affine", [("ir_se", True), ("ir", False)])
def test_irse_backbone_parity(mode, affine):
    install_reference_path()
    from ldm.models.insight_face.model_irse import Backbone

    tm = Backbone(input_size=112, num_layers=50, mode=mode, affine=affine).eval()
    _randomize(tm, 10)
    x = _faces(11)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = inf.convert_irse(tm.state_dict(), num_layers=50)
    jm = inf.IRSE(num_layers=50, mode=mode, affine=affine)
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_iresnet_parity():
    install_reference_path()
    sys.path.insert(0, "/root/reference/face_reenactment")
    from backbones.iresnet import iresnet18

    tm = iresnet18(False).eval()
    _randomize(tm, 12)
    x = _faces(13)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = arcface.convert_iresnet(tm.state_dict(), layers=(2, 2, 2, 2))
    jm = arcface.iresnet("iresnet18")
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_mobilefacenet_parity():
    install_reference_path()
    sys.path.insert(0, "/root/reference/face_reenactment")
    from backbones.mobilefacenet import get_mbf

    tm = get_mbf(fp16=False, num_features=512).eval()
    _randomize(tm, 14)
    x = _faces(15)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = inf.convert_mobilefacenet(tm.state_dict())
    jm = inf.MobileFaceNet()
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_face_vit_parity():
    install_reference_path()
    _stub_timm()
    sys.path.insert(0, "/root/reference/face_reenactment")
    from backbones.vit import VisionTransformer

    tm = VisionTransformer(
        img_size=112, patch_size=9, num_classes=512, embed_dim=256, depth=12,
        num_heads=8, drop_path_rate=0.05, norm_layer="ln", mask_ratio=0.0,
    ).eval()
    _randomize(tm, 16)
    x = _faces(17)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = inf.convert_face_vit(tm.state_dict(), depth=12)
    jm = inf.FaceViT(num_classes=512, **inf.FACE_VIT_FACTORIES["vit_t"])
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


def test_id_loss_with_irse_tower():
    """End-to-end: IDLoss math (guidance.id_loss) over the converted IR-SE50."""
    install_reference_path()
    from ldm.models.insight_face.model_irse import Backbone

    from dsml_thesis_tpu.losses.guidance import id_loss

    tm = Backbone(input_size=112, num_layers=50, mode="ir_se").eval()
    _randomize(tm, 18)
    params, stats = inf.convert_irse(tm.state_dict())
    embed = inf.make_embed_fn(inf.IRSE(), params, stats)

    src = jnp.asarray(_faces(19).transpose(0, 2, 3, 1))
    loss_same = id_loss(embed, src, src)
    assert float(loss_same) == pytest.approx(0.0, abs=1e-5)
    edit = jnp.asarray(_faces(20).transpose(0, 2, 3, 1))
    assert float(id_loss(embed, src, edit)) > 0.01
