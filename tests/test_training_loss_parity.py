"""Training-loss parity: our training_loss math vs the reference
LatentDiffusion.p_losses on converted weights.

Instantiates the reference 1-cond LatentDiffusion (ddpm.py:423) from a tiny
config via its own instantiate_from_config, converts its state_dict with our
checkpoint loader, and compares the full loss chain — VQ first-stage encode,
q_sample at fixed t/noise, UNet eval, l_simple + logvar weighting + VLB term
(ddpm.py:1014-1045) — to fp32 tolerance.
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import install_reference_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

TINY_MODEL_CFG = {
    "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
    "params": {
        "linear_start": 0.0015,
        "linear_end": 0.0205,
        "timesteps": 100,
        "image_size": 8,
        "channels": 3,
        "first_stage_key": "image",
        "cond_stage_key": "class_label",
        "cond_stage_trainable": True,
        "conditioning_key": "crossattn",
        "scale_factor": 1.0,
        "unet_config": {
            "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": {
                "image_size": 8, "in_channels": 3, "out_channels": 3,
                "model_channels": 32, "attention_resolutions": [2],
                "num_res_blocks": 1, "channel_mult": [1, 2],
                "num_head_channels": 16, "use_spatial_transformer": True,
                "transformer_depth": 1, "context_dim": 16,
            },
        },
        "first_stage_config": {
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 3, "n_embed": 64,
                "ddconfig": {
                    "double_z": False, "z_channels": 3, "resolution": 16,
                    "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 1,
                    "attn_resolutions": [8], "dropout": 0.0,
                },
                "lossconfig": {"target": "torch.nn.Identity"},
            },
        },
        "cond_stage_config": {
            "target": "ldm.modules.encoders.modules.ClassEmbedder3",
            "params": {"embed_dim": 16, "n_classes": 8, "key": "class_label",
                       "p_uncond": 0.2},
        },
    },
}


def _stub_modules():
    install_reference_path()  # installs/completes all optional-dep stubs


def test_training_loss_matches_reference_p_losses():
    _stub_modules()
    from ldm.util import instantiate_from_config

    torch.manual_seed(0)
    ref = instantiate_from_config(TINY_MODEL_CFG).eval()
    ref.device = torch.device("cpu")

    rs = np.random.RandomState(1)
    x = rs.randn(2, 16, 16, 3).astype(np.float32) * 0.3
    labels = np.array([1, 4])
    t_np = np.array([7, 63], np.int64)
    noise = rs.randn(2, 3, 8, 8).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        z = ref.get_first_stage_encoding(ref.encode_first_stage(xt))
        c = ref.cond_stage_model({"class_label": torch.from_numpy(labels)},
                                 training=False)
        loss_ref, ld = ref.p_losses(z, c, torch.from_numpy(t_np),
                                    noise=torch.from_numpy(noise))
    loss_ref = float(loss_ref)
    loss_simple_ref = float(ld["val_loss_simple"])

    # ours: converted weights, identical (z-space) chain
    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.convert import load_reference_ldm_checkpoint_from_sd
    from dsml_thesis_tpu.diffusion import p_losses, q_sample

    sd = ref.state_dict()
    cfg = {"target": TINY_MODEL_CFG["target"],
           "params": TINY_MODEL_CFG["params"]}
    ldm = build_model(cfg)
    params = load_reference_ldm_checkpoint_from_sd(sd, ldm, cfg)

    z_j = ldm.encode_first_stage(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(z_j).transpose(0, 3, 1, 2), z.numpy(), atol=2e-4, rtol=1e-3
    )
    cond = ldm.encode_conditioning(
        params, {"class_label": jnp.asarray(labels)}, training=False
    )
    np.testing.assert_allclose(
        np.asarray(cond["crossattn"]), c.numpy(), atol=1e-5
    )

    t_j = jnp.asarray(t_np, jnp.int32)
    noise_j = jnp.asarray(noise.transpose(0, 2, 3, 1))
    x_t = q_sample(ldm.schedule, z_j, t_j, noise_j)
    eps = ldm.apply_model(params, x_t, t_j, cond)
    loss, aux = p_losses(
        ldm.schedule, eps, z_j, noise_j, t_j,
        parameterization=ldm.parameterization,
        loss_type=ldm.loss_type,
        l_simple_weight=ldm.l_simple_weight,
        original_elbo_weight=ldm.original_elbo_weight,
    )
    assert float(aux["loss_simple"]) == pytest.approx(loss_simple_ref,
                                                      rel=2e-3)
    assert float(loss) == pytest.approx(loss_ref, rel=2e-3)


MEAD_MODEL_CFG = {
    "target": "ldm.models.diffusion.ddpm2cond.LatentDiffusion",
    "params": {
        "linear_start": 0.0015,
        "linear_end": 0.0205,
        "timesteps": 100,
        "image_size": 8,
        "channels": 3,
        "first_stage_key": "image",
        "cond_stage_key_1": "class_label",
        "cond_stage_key_2": "audio",
        "cond_stage_trainable": True,
        "conditioning_key": "crossattn",
        "scale_factor": 1.0,
        "unet_config": {
            "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": {
                "image_size": 8, "in_channels": 9, "out_channels": 3,
                "model_channels": 32, "attention_resolutions": [2],
                "num_res_blocks": 1, "channel_mult": [1, 2],
                "num_head_channels": 16, "use_spatial_transformer": True,
                "transformer_depth": 1, "context_dim": 48,
            },
        },
        "first_stage_config": {
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 3, "n_embed": 64,
                "ddconfig": {
                    "double_z": False, "z_channels": 3, "resolution": 16,
                    "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 1,
                    "attn_resolutions": [8], "dropout": 0.0,
                },
                "lossconfig": {"target": "torch.nn.Identity"},
            },
        },
        "cond_stage_config_1": {
            "target": "ldm.modules.encoders.modules.ClassEmbedder",
            "params": {"embed_dim": 16, "n_classes": 8, "key": "class_label",
                       "p_uncond": 0.2},
        },
        "cond_stage_config_2": {
            "target": "ldm.modules.encoders.modules.Conv1DTemporalAttention",
            "params": {"seq_len": 5, "subspace_dim": 32,
                       "subspace2hidden": False},
        },
    },
}


def test_mead_4cond_training_loss_matches_reference():
    """4-cond (talking_face) train loss: class+audio crossattn feature-concat
    and masked+identity latent channel-concat routing (ddpm2cond.py:886-899)
    through the full p_losses chain, on converted weights."""
    _stub_modules()
    import importlib

    for k in [k for k in sys.modules if k.startswith(("ldm", "taming"))]:
        del sys.modules[k]
    sys.path.insert(0, "/root/reference/talking_face")
    util = importlib.import_module("ldm.util")

    torch.manual_seed(2)
    ref = util.instantiate_from_config(MEAD_MODEL_CFG).eval()
    ref.device = torch.device("cpu")

    rs = np.random.RandomState(3)
    x = rs.randn(2, 16, 16, 3).astype(np.float32) * 0.3
    masked = rs.randn(2, 16, 16, 3).astype(np.float32) * 0.3
    ident = rs.randn(2, 16, 16, 3).astype(np.float32) * 0.3
    audio = rs.randn(2, 5, 32).astype(np.float32)
    labels = np.array([2, 6])
    t_np = np.array([11, 80], np.int64)
    noise = rs.randn(2, 3, 8, 8).astype(np.float32)

    nchw = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
    with torch.no_grad():
        z = ref.get_first_stage_encoding(ref.encode_first_stage(nchw(x)))
        c1 = ref.cond_stage_model_1(
            {"class_label": torch.from_numpy(labels)}, training=False)
        c2 = ref.cond_stage_model_2(torch.from_numpy(audio))
        c12 = torch.cat([c1, c2], dim=2)
        c3 = ref.encode_first_stage(nchw(masked))
        c4 = ref.encode_first_stage(nchw(ident))
        c34 = torch.cat([c3, c4], dim=1)
        loss_ref, ld = ref.p_losses(z, c12, c34, torch.from_numpy(t_np),
                                    noise=torch.from_numpy(noise))
    loss_ref = float(loss_ref)

    from dsml_thesis_tpu.config import build_model
    from dsml_thesis_tpu.convert import load_reference_ldm_checkpoint_from_sd
    from dsml_thesis_tpu.diffusion import p_losses, q_sample

    cfg = {"target": MEAD_MODEL_CFG["target"],
           "params": MEAD_MODEL_CFG["params"]}
    ldm = build_model(cfg)
    params = load_reference_ldm_checkpoint_from_sd(ref.state_dict(), ldm, cfg)

    batch = {
        "image": jnp.asarray(x),
        "masked_image": jnp.asarray(masked),
        "identity": jnp.asarray(ident),
        "class_label": jnp.asarray(labels),
        "audio": jnp.asarray(audio),
    }
    z_j = ldm.encode_first_stage(params, batch["image"])
    cond = ldm.encode_conditioning(params, batch, training=False)
    np.testing.assert_allclose(np.asarray(cond["crossattn"]), c12.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(cond["concat"]).transpose(0, 3, 1, 2), c34.numpy(),
        atol=2e-4, rtol=1e-3)

    t_j = jnp.asarray(t_np, jnp.int32)
    noise_j = jnp.asarray(noise.transpose(0, 2, 3, 1))
    x_t = q_sample(ldm.schedule, z_j, t_j, noise_j)
    eps = ldm.apply_model(params, x_t, t_j, cond)
    loss, _ = p_losses(
        ldm.schedule, eps, z_j, noise_j, t_j,
        parameterization=ldm.parameterization,
        loss_type=ldm.loss_type,
        l_simple_weight=ldm.l_simple_weight,
        original_elbo_weight=ldm.original_elbo_weight,
    )
    assert float(loss) == pytest.approx(loss_ref, rel=2e-3)


def test_ddpm_ancestral_loop_matches_reference():
    """Pixel-space DDPM ancestral sampling (reference DDPM.p_sample_loop,
    ddpm.py:243-262) vs our ddpm_p_sample_loop on converted weights with
    injected per-step noise."""
    _stub_modules()
    from ldm.util import instantiate_from_config

    ddpm_cfg = {
        "target": "ldm.models.diffusion.ddpm.DDPM",
        "params": {
            "linear_start": 0.0015, "linear_end": 0.0205, "timesteps": 10,
            "image_size": 8, "channels": 3, "clip_denoised": True,
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {
                    "image_size": 8, "in_channels": 3, "out_channels": 3,
                    "model_channels": 32, "attention_resolutions": [],
                    "num_res_blocks": 1, "channel_mult": [1, 2],
                    "num_head_channels": 16,
                },
            },
        },
    }
    torch.manual_seed(4)
    ref = instantiate_from_config(ddpm_cfg).eval()
    ref.device = torch.device("cpu")

    T = 10
    rs = np.random.RandomState(5)
    x_T = rs.randn(2, 3, 8, 8).astype(np.float32)
    step_noise = rs.randn(T, 2, 3, 8, 8).astype(np.float32)

    # inject: draw order is [initial img, then one noise_like per step]
    seq = [torch.from_numpy(x_T)] + [torch.from_numpy(n) for n in step_noise]
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: seq.pop(0)
    try:
        with torch.no_grad():
            out_ref = ref.p_sample_loop((2, 3, 8, 8))
    finally:
        torch.randn = orig_randn
    assert not seq

    from dsml_thesis_tpu.convert import convert_unet
    from dsml_thesis_tpu.diffusion import make_schedule
    from dsml_thesis_tpu.diffusion.gaussian import ddpm_p_sample_loop
    from dsml_thesis_tpu.models import UNetModel

    sched = make_schedule("linear", T, 0.0015, 0.0205)
    params = convert_unet(
        ref.model.diffusion_model.state_dict(), num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(),
        use_spatial_transformer=False, num_head_channels=16,
        model_channels=32,
    )
    jm = UNetModel(in_channels=3, out_channels=3, model_channels=32,
                   num_res_blocks=1, attention_resolutions=(),
                   channel_mult=(1, 2), num_head_channels=16,
                   use_spatial_transformer=False)
    out = ddpm_p_sample_loop(
        sched, lambda x, t: jm.apply({"params": params}, x, t, None),
        (2, 8, 8, 3), jax.random.PRNGKey(0),
        x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)),
        noise_seq=jnp.asarray(step_noise.transpose(0, 1, 3, 4, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref.numpy(),
        atol=5e-3, rtol=1e-3,
    )
