"""Numerical parity vs the torch reference (used as a read-only test oracle).

Small configs keep CPU compile times tolerable; the architecture code paths
exercised are identical to the full-size configs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import reference_available, install_reference_path
from dsml_thesis_tpu import convert
from dsml_thesis_tpu.models import (
    UNetModel,
    VQModel,
    ClassEmbedder,
    Conv1DTemporalAttention,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


UNET_KW = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    use_spatial_transformer=True, transformer_depth=1, context_dim=24,
)


def test_unet_forward_parity():
    install_reference_path()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, **{**UNET_KW,
                                     "attention_resolutions": [2, 1],
                                     "channel_mult": [1, 2]}).eval()
    sd = tm.state_dict()

    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([7, 345], dtype=np.int64)
    ctx = rs.randn(2, 5, 24).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()

    params = convert.convert_unet(
        sd, num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2, 1)
    )
    jm = UNetModel(**UNET_KW)
    out = jm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(ctx),
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


DD = dict(
    double_z=False, z_channels=3, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), dropout=0.0,
)


def test_vqgan_roundtrip_parity():
    install_reference_path()
    from ldm.models.autoencoder import VQModelInterface as TorchVQ

    torch.manual_seed(1)
    tdd = {**DD, "ch_mult": [1, 2], "attn_resolutions": [16]}
    tm = TorchVQ(ddconfig=tdd, lossconfig={"target": "torch.nn.Identity"},
                 n_embed=64, embed_dim=3).eval()
    sd = tm.state_dict()

    rs = np.random.RandomState(1)
    img = rs.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        z_ref = tm.encode(torch.from_numpy(img)).numpy()
        rec_ref = tm.decode(torch.from_numpy(z_ref)).numpy()

    params = convert.convert_vqmodel(sd, DD)
    jm = VQModel(ddconfig=DD, n_embed=64, embed_dim=3)
    z = jm.apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
                 method="encode")
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref, atol=2e-4, rtol=1e-3
    )
    rec = jm.apply({"params": params}, z, method="decode")
    np.testing.assert_allclose(
        np.asarray(rec).transpose(0, 3, 1, 2), rec_ref, atol=5e-4, rtol=1e-3
    )


def test_class_embedder_parity():
    install_reference_path()
    import importlib
    mod = importlib.import_module("ldm.modules.encoders.modules")

    torch.manual_seed(2)
    tm = mod.ClassEmbedder3(embed_dim=16, n_classes=8).eval()
    sd = tm.state_dict()
    labels = np.array([0, 3, 7])
    with torch.no_grad():
        ref = tm(
            {"class_label": torch.from_numpy(labels)}, training=False
        ).numpy()

    jm = ClassEmbedder(embed_dim=16, n_classes=8, p_uncond=0.2, null_mode="separate")
    params = convert.convert_class_embedder(sd, null_mode="separate")
    out = jm.apply({"params": params}, jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_conv1d_temporal_attention_parity():
    install_reference_path(root="/root/reference/talking_face")
    import importlib
    import sys
    # talking_face has its own ldm package; force a fresh import
    for k in [k for k in sys.modules if k.startswith(("ldm", "taming"))]:
        del sys.modules[k]
    sys.path.insert(0, "/root/reference/talking_face")
    mod = importlib.import_module("ldm.modules.encoders.modules")

    torch.manual_seed(3)
    tm = mod.Conv1DTemporalAttention(seq_len=9, subspace_dim=32).eval()
    sd = tm.state_dict()
    rs = np.random.RandomState(3)
    x = rs.randn(2, 9, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    jm = Conv1DTemporalAttention(seq_len=9, subspace_dim=32)
    params = convert.convert_conv1d_temporal_attention(sd)
    out = jm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_landmark_encoder_parity():
    """5-layer MLP (96->128->256->512->256->out) vs the reference
    LandmarkEncoder (talking_face modules.py:331-348), converted weights."""
    install_reference_path(root="/root/reference/talking_face")
    import importlib
    import sys
    for k in [k for k in sys.modules if k.startswith(("ldm", "taming"))]:
        del sys.modules[k]
    sys.path.insert(0, "/root/reference/talking_face")
    mod = importlib.import_module("ldm.modules.encoders.modules")

    from dsml_thesis_tpu.models.encoders import LandmarkEncoder

    torch.manual_seed(5)
    tm = mod.LandmarkEncoder(input_dim=96, output_dim=128).eval()
    rs = np.random.RandomState(6)
    x = rs.randn(3, 96).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    jm = LandmarkEncoder(output_dim=128)
    params = convert.convert_landmark_encoder(tm.state_dict())
    out = jm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (3, 1, 128)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)
