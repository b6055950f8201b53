"""Progressive video sampler parity vs the reference script's own loop.

Drives the reference progressive_sampling (talking_face/
progressive_sampling_difftalk.py:245-319) — per-frame audio windows through
cond_stage_model_2, c12/c34 assembly, the full DDIM reverse chain, and the
autoregressive zid <- generated-latent update — on a tiny torch 2-cond model
with injected per-frame noise, then our progressive_video_sample on the
converted weights. The whole multi-frame chain must agree to fp32 tolerance.

The reference's CFG branch is unreachable (torch.cat(..., dim=21) at :301
raises — a latent upstream bug, like the DPM suite's, documented here), so
parity runs unguided; our CFG math is oracle-tested in test_sampler_parity.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import TALKING_ROOT, install_reference_path, reference_available
from dsml_thesis_tpu import convert
from dsml_thesis_tpu.diffusion import make_ddim_schedule, make_schedule
from dsml_thesis_tpu.diffusion.video import audio_windows, progressive_video_sample
from dsml_thesis_tpu.models import UNetModel
from dsml_thesis_tpu.models.encoders import Conv1DTemporalAttention

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

LAT_C, RES, CTX = 2, 8, 16  # latent channels, latent hw, c2 token dim
UNET_KW = dict(
    in_channels=3 * LAT_C, out_channels=LAT_C, model_channels=32,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_head_channels=16, use_spatial_transformer=True, transformer_depth=1,
    context_dim=CTX,
)


def _load_reference_script():
    install_reference_path(root=TALKING_ROOT)
    for name in ("albumentations", "librosa", "cv2"):  # module-level deps
        if name not in sys.modules:
            m = types.ModuleType(name)
            # a real __spec__ keeps importlib.util.find_spec(name) working
            # (transformers probes cv2 availability that way)
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    spec = importlib.util.spec_from_file_location(
        "progressive_sampling_difftalk",
        os.path.join(TALKING_ROOT, "progressive_sampling_difftalk.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Oracle2Cond:
    """The reference LatentDiffusion surface its sampler touches: schedule
    buffers, the 2-cond apply_model (DiffusionWrapper, ddpm2cond.py:1307-1315:
    UNet(cat[x, c34], t, context=c12)), the audio cond stage, and a first
    stage (identity here — the test feeds latents directly)."""

    parameterization = "eps"

    def __init__(self, unet, sched, cond2):
        self.unet = unet
        self.cond_stage_model_2 = cond2
        self.num_timesteps = sched.num_timesteps
        t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
        self.betas = t(sched.betas)
        self.alphas_cumprod = t(sched.alphas_cumprod)
        self.alphas_cumprod_prev = t(sched.alphas_cumprod_prev)
        self.sqrt_one_minus_alphas_cumprod = t(sched.sqrt_one_minus_alphas_cumprod)
        self.device = torch.device("cpu")

    def encode_first_stage(self, x):
        return x

    def apply_model(self, x, t, c12, c34):
        return self.unet(torch.cat([x, c34], dim=1), t, c12)


def test_progressive_chain_matches_reference():
    mod = _load_reference_script()
    sys.path.insert(0, TALKING_ROOT)
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from ldm.modules.encoders.modules import (
        Conv1DTemporalAttention as TorchConv1D,
    )

    mod.DDIMSampler.register_buffer = (
        lambda self, name, attr: setattr(self, name, attr)
    )

    torch.manual_seed(0)
    tm = TorchUNet(image_size=RES, **{**UNET_KW,
                                      "attention_resolutions": [2],
                                      "channel_mult": [1, 2]}).eval()
    window = 2
    seq_len = 2 * window + 1
    tc2 = TorchConv1D(seq_len=seq_len, subspace_dim=CTX).eval()
    sched = make_schedule("linear", 100, 0.0015, 0.0205)
    oracle = _Oracle2Cond(tm, sched, tc2)
    sampler = mod.DDIMSampler(oracle)

    F, S = 3, 4
    rs = np.random.RandomState(1)
    c1 = rs.randn(1, 1, 0).astype(np.float32)  # class branch folded into c2
    audio_feats = rs.randn(F, CTX).astype(np.float32)
    xmasks = rs.randn(F, LAT_C, RES, RES).astype(np.float32) * 0.3
    xid = rs.randn(1, LAT_C, RES, RES).astype(np.float32) * 0.3
    frame_noise = rs.randn(F, 1, LAT_C, RES, RES).astype(np.float32)

    # the reference draws torch.randn once per frame for the init noise
    # (:306) plus once per DDIM step inside noise_like (multiplied by
    # sigma=0 at eta=0, value irrelevant); inject ours at the init positions
    noises = [torch.from_numpy(n) for n in frame_noise]
    orig_randn = torch.randn
    calls = {"i": 0}

    def fake_randn(*a, **k):
        i = calls["i"]
        calls["i"] += 1
        if i % (S + 1) == 0:  # frame-init draw
            return noises[i // (S + 1)]
        return torch.zeros(*a, **k)

    torch.randn = fake_randn
    try:
        with torch.no_grad():
            ref_latents, _ = sampler.progressive_sampling(
                c1=torch.from_numpy(c1),
                xid=torch.from_numpy(xid),
                xmasks=torch.from_numpy(xmasks),
                audio_feats=torch.from_numpy(audio_feats),
                S=S, batch_size=1, num_frames=F,
                shape=(LAT_C, RES, RES), audio_window=window,
                eta=0.0, verbose=False,
            )
    finally:
        torch.randn = orig_randn
    assert calls["i"] == F * (S + 1)  # init + S step draws per frame
    ref = np.stack([r.numpy() for r in ref_latents])[:, 0]  # [F, C, H, W]

    # ours: converted UNet + converted audio encoder, same windows/noise
    params = convert.convert_unet(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,),
    )
    jm = UNetModel(**UNET_KW)
    jc2 = Conv1DTemporalAttention(seq_len=seq_len, subspace_dim=CTX)
    c2_params = convert.convert_conv1d_temporal_attention(tc2.state_dict())

    wins = audio_windows(jnp.asarray(audio_feats)[None], F, window)  # [1,F,L,D]
    ctxs = jc2.apply({"params": c2_params},
                     wins.reshape((F, seq_len, CTX))).reshape((1, F, 1, CTX))

    apply_fn = lambda x, t, c, cc: jm.apply(
        {"params": params}, jnp.concatenate([x, cc], axis=-1), t, c
    )
    ddim = make_ddim_schedule(sched, S, eta=0.0)
    out = progressive_video_sample(
        ddim, apply_fn,
        jnp.asarray(xmasks.transpose(0, 2, 3, 1))[None],
        ctxs,
        jnp.asarray(xid.transpose(0, 2, 3, 1)),
        jax.random.PRNGKey(0),
        x_T=jnp.asarray(frame_noise[:, 0].transpose(0, 2, 3, 1))[None],
    )
    out = np.asarray(out[0]).transpose(0, 3, 1, 2)  # [F, C, H, W]
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)
