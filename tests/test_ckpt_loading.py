"""Reference-checkpoint loading: Lightning layout, EMA remap, end-to-end use."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import yaml

from reference_oracle import reference_available, install_reference_path
from dsml_thesis_tpu.config import build_model
from dsml_thesis_tpu.convert import load_reference_ldm_checkpoint_from_sd
from dsml_thesis_tpu.utils_io import load_params

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

TINY_CFG = """
model:
  target: ldm.models.diffusion.ddpm.LatentDiffusion
  params:
    linear_start: 0.0015
    linear_end: 0.0205
    timesteps: 100
    image_size: 8
    channels: 3
    first_stage_key: image
    cond_stage_key: class_label
    cond_stage_trainable: true
    conditioning_key: crossattn
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 8
        in_channels: 3
        out_channels: 3
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 16
    first_stage_config:
      target: ldm.models.autoencoder.VQModelInterface
      params:
        embed_dim: 3
        n_embed: 64
        ddconfig:
          double_z: false
          z_channels: 3
          resolution: 16
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
          attn_resolutions: [8]
          dropout: 0.0
        lossconfig: {target: torch.nn.Identity}
    cond_stage_config:
      target: ldm.modules.encoders.modules.ClassEmbedder3
      params: {embed_dim: 16, n_classes: 8, key: class_label, p_uncond: 0.2}
"""


def _fabricate_lightning_sd():
    """Build a torch state_dict with the reference Lightning layout."""
    install_reference_path()
    from ldm.models.autoencoder import VQModelInterface as TorchVQ
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(0)
    unet = TorchUNet(image_size=8, in_channels=3, out_channels=3,
                     model_channels=32, attention_resolutions=[2],
                     num_res_blocks=1, channel_mult=[1, 2], num_head_channels=16,
                     use_spatial_transformer=True, transformer_depth=1,
                     context_dim=16)
    vq = TorchVQ(ddconfig=dict(double_z=False, z_channels=3, resolution=16,
                               in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                               num_res_blocks=1, attn_resolutions=[8],
                               dropout=0.0),
                 lossconfig={"target": "torch.nn.Identity"}, n_embed=64,
                 embed_dim=3)
    class_emb = torch.nn.Embedding(8, 16)
    uncond_emb = torch.nn.Embedding(1, 16)

    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
        # EMA shadows: name without dots, distinct values
        sd["model_ema." + f"diffusion_model.{k}".replace(".", "")] = v + 0.5
    for k, v in vq.state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    sd["cond_stage_model.embedding.weight"] = class_emb.weight.data
    sd["cond_stage_model.uncond_embedding.weight"] = uncond_emb.weight.data
    return sd, unet


def test_lightning_layout_and_ema_remap():
    cfg = yaml.safe_load(TINY_CFG)
    ldm = build_model(cfg["model"])
    sd, unet = _fabricate_lightning_sd()

    raw = load_reference_ldm_checkpoint_from_sd(sd, ldm, cfg["model"])
    assert set(raw) == {"unet", "first_stage", "cond/class_label"}
    # raw weights match the torch module (spot check the input conv)
    w_torch = unet.state_dict()["input_blocks.0.0.weight"].numpy()
    np.testing.assert_allclose(
        raw["unet"]["conv_in"]["kernel"], w_torch.transpose(2, 3, 1, 0)
    )


def test_ema_preference_via_load_params(tmp_path):
    cfg = yaml.safe_load(TINY_CFG)
    ldm = build_model(cfg["model"])
    sd, unet = _fabricate_lightning_sd()
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    p_ema = load_params(ckpt_path, ldm, cfg["model"], use_ema=True)
    p_raw = load_params(ckpt_path, ldm, cfg["model"], use_ema=False)
    w_raw = np.asarray(p_raw["unet"]["conv_in"]["kernel"])
    w_ema = np.asarray(p_ema["unet"]["conv_in"]["kernel"])
    np.testing.assert_allclose(w_ema, w_raw + 0.5, atol=1e-6)

    # loaded params drive the full sampling path
    batch = {"class_label": jnp.array([1, 3])}
    cond = ldm.encode_conditioning(p_ema, batch)
    z = ldm.sample_ddim(p_ema, cond, (2, 8, 8, 3), jax.random.PRNGKey(0), steps=3)
    img = ldm.decode_first_stage(p_ema, z)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_first_stage_ckpt_path_loads_pretrained_vqgan(tmp_path):
    """first_stage_config.params.ckpt_path (reference
    affectnet-128-ldm-vq-f4.yaml:47) loads the pretrained frozen VQGAN at
    trainer init instead of being silently ignored."""
    import numpy as np
    import yaml

    from dsml_thesis_tpu.convert import load_first_stage_checkpoint

    sd, _ = _fabricate_lightning_sd()
    # bare taming layout (no first_stage_model. prefix)
    bare = {k[len("first_stage_model."):]: v for k, v in sd.items()
            if k.startswith("first_stage_model.")}
    ckpt = tmp_path / "vq.ckpt"
    torch.save({"state_dict": bare}, str(ckpt))

    dd = dict(double_z=False, z_channels=3, resolution=16, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[8], dropout=0.0)
    params = load_first_stage_checkpoint(str(ckpt), dd)
    ref = np.asarray(bare["encoder.conv_in.weight"]).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["conv_in"]["kernel"]), ref, atol=1e-6)

    # end to end through the Trainer
    from dsml_thesis_tpu.training.trainer import Trainer

    cfg = yaml.safe_load(TINY_CFG)
    cfg["model"]["params"]["first_stage_config"]["params"]["ckpt_path"] = str(ckpt)
    cfg["data"] = {"params": {
        "batch_size": 8, "num_workers": 1,
        "train": {"target": "dsml_thesis_tpu.data.SyntheticDataset",
                  "params": {"spec": {"image": [[16, 16, 3], "float32"],
                                      "class_label": [[], "int32"]},
                             "length": 8}},
    }}
    t = Trainer(cfg, str(tmp_path / "run"), seed=0, max_steps=1)
    first = next(iter(t.train_data))
    state = t.init_state(first)
    np.testing.assert_allclose(
        np.asarray(state.params["first_stage"]["encoder"]["conv_in"]["kernel"]),
        ref, atol=1e-6)


def test_cond_stage_key_null_falls_back():
    """The verbatim reference clip-ldm yaml sets `cond_stage_key: null`;
    building it must fall back to class_label, not CondSpec(key=None)."""
    import yaml

    from dsml_thesis_tpu.config import build_model

    cfg = yaml.safe_load(TINY_CFG)
    cfg["model"]["params"]["cond_stage_key"] = None
    ldm = build_model(cfg["model"])
    assert [s.key for s in ldm.cond_specs] == ["class_label"]


def test_lightning_ckpt_with_pickled_extras_loads(tmp_path):
    """Real Lightning .ckpt files carry non-tensor pickled extras
    (hyper_parameters, callbacks); torch>=2.6 defaults weights_only=True
    which rejects them — the loaders must pass weights_only=False."""
    import argparse
    import os
    import sys

    import torch
    import yaml

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ldm import TINY_MEAD_CFG

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.convert import load_ema_or_raw

    cfg = yaml.safe_load(TINY_MEAD_CFG)["model"]
    ldm = build_model(cfg)
    # no real reference sd needed: an empty state_dict raises KeyError in
    # conversion, which proves torch.load got PAST the weights_only gate —
    # with weights_only=True the Namespace raises UnpicklingError first
    ckpt = {"state_dict": {}, "hyper_parameters": argparse.Namespace(lr=1.0)}
    p = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, p)
    with pytest.raises(KeyError):
        load_ema_or_raw(p, ldm, cfg)
