"""End-to-end sampler parity: our scan DDIM vs the reference DDIMSampler.

Runs the reference's own sampling loop (ddim.py) on a tiny torch UNet with
fixed noise, then our jitted lax.scan chain on the converted weights — the
full inference path (timestep subsequence, alpha gathers, CFG batch-doubling,
update algebra, UNet forward) must agree to fp32 tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import reference_available, install_reference_path
from dsml_thesis_tpu import convert
from dsml_thesis_tpu.diffusion import (
    cfg_eps_fn,
    ddim_sample,
    make_ddim_schedule,
    make_schedule,
)
from dsml_thesis_tpu.models import UNetModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

UNET_KW = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    use_spatial_transformer=True, transformer_depth=1, context_dim=24,
)


class _OracleModel:
    """Minimal stand-in for the reference's LatentDiffusion as seen by
    DDIMSampler (schedule buffers + apply_model)."""

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


@pytest.mark.parametrize("scale", [1.0, 2.5])
def test_ddim_chain_matches_reference_sampler(scale):
    install_reference_path()
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    # neutralize the reference's hard .cuda() buffer cast
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)

    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, **{**UNET_KW,
                                     "attention_resolutions": [2, 1],
                                     "channel_mult": [1, 2]}).eval()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    oracle = _OracleModel(tm, sched)
    sampler = DDIMSampler(oracle)

    rs = np.random.RandomState(1)
    x_T = rs.randn(2, 3, 16, 16).astype(np.float32)
    ctx = rs.randn(2, 1, 24).astype(np.float32)
    uc = rs.randn(2, 1, 24).astype(np.float32)
    S = 5

    with torch.no_grad():
        ref, _ = sampler.sample(
            S, batch_size=2, shape=(3, 16, 16),
            conditioning=torch.from_numpy(ctx),
            eta=0.0, x_T=torch.from_numpy(x_T), verbose=False,
            unconditional_guidance_scale=scale,
            unconditional_conditioning=torch.from_numpy(uc) if scale != 1 else None,
        )
    ref = ref.numpy()

    params = convert.convert_unet(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2, 1),
    )
    jm = UNetModel(**UNET_KW)
    apply_fn = lambda x, t, c: jm.apply({"params": params}, x, t, c)
    eps_fn = cfg_eps_fn(
        apply_fn, jnp.asarray(ctx),
        jnp.asarray(uc) if scale != 1 else None, scale,
    )
    ddim = make_ddim_schedule(sched, S, eta=0.0)
    out = ddim_sample(
        ddim, sched, eps_fn, (2, 16, 16, 3), jax.random.PRNGKey(0),
        x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)), eta_noise=False,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("scale", [1.0, 2.0])
def test_plms_chain_matches_reference_sampler(scale):
    """Full PLMS multistep chain vs the reference PLMSSampler (plms.py)."""
    install_reference_path()
    from ldm.models.diffusion.plms import PLMSSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from dsml_thesis_tpu.diffusion import plms_sample

    PLMSSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)

    torch.manual_seed(2)
    tm = TorchUNet(image_size=16, **{**UNET_KW,
                                     "attention_resolutions": [2, 1],
                                     "channel_mult": [1, 2]}).eval()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    oracle = _OracleModel(tm, sched)
    sampler = PLMSSampler(oracle)

    rs = np.random.RandomState(3)
    x_T = rs.randn(2, 3, 16, 16).astype(np.float32)
    ctx = rs.randn(2, 1, 24).astype(np.float32)
    uc = rs.randn(2, 1, 24).astype(np.float32)
    S = 6

    with torch.no_grad():
        ref, _ = sampler.sample(
            S, batch_size=2, shape=(3, 16, 16),
            conditioning=torch.from_numpy(ctx),
            eta=0.0, x_T=torch.from_numpy(x_T), verbose=False,
            unconditional_guidance_scale=scale,
            unconditional_conditioning=torch.from_numpy(uc) if scale != 1 else None,
        )
    ref = ref.numpy()

    params = convert.convert_unet(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2, 1),
    )
    jm = UNetModel(**UNET_KW)
    apply_fn = lambda x, t, c: jm.apply({"params": params}, x, t, c)
    eps_fn = cfg_eps_fn(
        apply_fn, jnp.asarray(ctx),
        jnp.asarray(uc) if scale != 1 else None, scale,
    )
    ddim = make_ddim_schedule(sched, S, eta=0.0)
    out = plms_sample(
        ddim, eps_fn, (2, 16, 16, 3), jax.random.PRNGKey(0),
        x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)),
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)
