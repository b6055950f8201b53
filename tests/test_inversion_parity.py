"""DDIM-inversion (compute_latents) chain parity vs the reference script.

Drives the reference compute_latents.py private sampler — the strength-scaled
linspace timestep subsequence, the forward q_sample_ddim inversion chain, and
the reverse reconstruction — on a tiny torch UNet, then our
make_ddim_schedule(strength)/ddim_invert/ddim_reverse_from on converted
weights. This is the latent-cache builder for the whole DiffusionCLIP editing
stack (reference compute_latents.py:298-407), CFG included.
"""
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import (
    REFERENCE_ROOT,
    install_reference_path,
    reference_available,
)
from dsml_thesis_tpu import convert
from dsml_thesis_tpu.diffusion import (
    cfg_eps_fn,
    ddim_invert,
    ddim_reverse_from,
    make_ddim_schedule,
    make_schedule,
    make_strength_ddim_timesteps,
)
from dsml_thesis_tpu.models import UNetModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

UNET_KW = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
    use_spatial_transformer=True, transformer_depth=1, context_dim=24,
)


def _load_reference_script():
    install_reference_path(root=REFERENCE_ROOT)
    for name in ("albumentations", "librosa", "cv2"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    spec = importlib.util.spec_from_file_location(
        "compute_latents_ref",
        os.path.join(REFERENCE_ROOT, "compute_latents.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _OracleModel:
    parameterization = "eps"

    def __init__(self, unet, sched):
        self.unet = unet
        self.num_timesteps = sched.num_timesteps
        t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
        self.betas = t(sched.betas)
        self.alphas_cumprod = t(sched.alphas_cumprod)
        self.alphas_cumprod_prev = t(sched.alphas_cumprod_prev)
        self.sqrt_one_minus_alphas_cumprod = t(sched.sqrt_one_minus_alphas_cumprod)
        self.device = torch.device("cpu")

    def apply_model(self, x, t, c):
        return self.unet(x, t, c)


def test_strength_timesteps_match_reference_linspace():
    mod = _load_reference_script()
    for S, T, strength in ((6, 1000, 0.5), (5, 100, 0.5), (8, 1000, 0.3),
                           (4, 100, 1.0)):
        ref = mod.make_ddim_timesteps("uniform", S, T, strength=strength,
                                      verbose=False)
        ours = make_strength_ddim_timesteps(S, T, strength)
        np.testing.assert_array_equal(ours, np.asarray(ref))


def test_latent_manipulation_matches_reference():
    """Emotion-edit chain (latent_manipulation.py:421-489): forward inversion
    under the SOURCE conditioning, reverse under the TARGET conditioning,
    CFG on both passes."""
    install_reference_path(root=REFERENCE_ROOT)
    for name in ("albumentations", "librosa", "cv2"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    spec = importlib.util.spec_from_file_location(
        "latent_manipulation_ref",
        os.path.join(REFERENCE_ROOT, "latent_manipulation.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.path.insert(0, REFERENCE_ROOT)
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from dsml_thesis_tpu.diffusion import latent_manipulation

    mod.DDIMSampler.register_buffer = (
        lambda self, name, attr: setattr(self, name, attr)
    )
    torch.manual_seed(4)
    tm = TorchUNet(image_size=16, **{**UNET_KW,
                                     "attention_resolutions": [2],
                                     "channel_mult": [1, 2]}).eval()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    sampler = mod.DDIMSampler(_OracleModel(tm, sched))

    rs = np.random.RandomState(5)
    x0 = rs.randn(2, 3, 16, 16).astype(np.float32) * 0.3
    c_src = rs.randn(2, 1, 24).astype(np.float32)
    c_trg = rs.randn(2, 1, 24).astype(np.float32)
    uc = rs.randn(2, 1, 24).astype(np.float32)
    S, strength, scale = 4, 0.5, 2.0

    with torch.no_grad():
        edited, _, _ = sampler.latent_manipulation(
            c_src=torch.from_numpy(c_src), c_trg=torch.from_numpy(c_trg),
            S=S, batch_size=2, shape=(3, 16, 16),
            x0=torch.from_numpy(x0), eta=0.0, strength=strength,
            verbose=False, unconditional_guidance_scale=scale,
            unconditional_conditioning=torch.from_numpy(uc),
        )
    ref = edited.numpy()

    params = convert.convert_unet(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,),
    )
    jm = UNetModel(**UNET_KW)
    apply_fn = lambda x, t, c: jm.apply({"params": params}, x, t, c)
    eps_src = cfg_eps_fn(apply_fn, jnp.asarray(c_src), jnp.asarray(uc), scale)
    eps_trg = cfg_eps_fn(apply_fn, jnp.asarray(c_trg), jnp.asarray(uc), scale)
    ddim = make_ddim_schedule(sched, S, eta=0.0, strength=strength)
    out, _ = latent_manipulation(ddim, eps_src, eps_trg,
                                 jnp.asarray(x0.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("scale", [1.0, 2.5])
def test_inversion_chain_matches_reference(scale):
    mod = _load_reference_script()
    sys.path.insert(0, REFERENCE_ROOT)
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    mod.DDIMSampler.register_buffer = (
        lambda self, name, attr: setattr(self, name, attr)
    )

    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, **{**UNET_KW,
                                     "attention_resolutions": [2],
                                     "channel_mult": [1, 2]}).eval()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    sampler = mod.DDIMSampler(_OracleModel(tm, sched))

    rs = np.random.RandomState(1)
    x0 = rs.randn(2, 3, 16, 16).astype(np.float32) * 0.3
    ctx = rs.randn(2, 1, 24).astype(np.float32)
    uc = rs.randn(2, 1, 24).astype(np.float32)
    S, strength = 5, 0.5

    with torch.no_grad():
        rec, x_lat, _ = sampler.compute_latents(
            S, batch_size=2, shape=(3, 16, 16),
            conditioning=torch.from_numpy(ctx),
            x0=torch.from_numpy(x0), eta=0.0, strength=strength,
            verbose=False,
            unconditional_guidance_scale=scale,
            unconditional_conditioning=(
                torch.from_numpy(uc) if scale != 1 else None),
        )
    ref_lat, ref_rec = x_lat.numpy(), rec.numpy()

    params = convert.convert_unet(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,),
    )
    jm = UNetModel(**UNET_KW)
    apply_fn = lambda x, t, c: jm.apply({"params": params}, x, t, c)
    eps_fn = cfg_eps_fn(
        apply_fn, jnp.asarray(ctx),
        jnp.asarray(uc) if scale != 1 else None, scale,
    )
    ddim = make_ddim_schedule(sched, S, eta=0.0, strength=strength)
    out_lat = ddim_invert(ddim, eps_fn,
                          jnp.asarray(x0.transpose(0, 2, 3, 1)))
    out_rec = ddim_reverse_from(ddim, eps_fn, out_lat)
    np.testing.assert_allclose(
        np.asarray(out_lat).transpose(0, 3, 1, 2), ref_lat,
        atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_rec).transpose(0, 3, 1, 2), ref_rec,
        atol=5e-3, rtol=1e-3)
