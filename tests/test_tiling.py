"""Split-input fold/unfold tiling (diffusion/tiling.py).

Unit tests for the static-slice unfold/fold and border weighting, plus oracle
parity that drives the reference's get_fold_unfold / get_weighting
(ddpm.py:565-664) on a stub carrying split_input_params and compares the full
unfold -> patch fn -> weight -> fold -> normalize chain.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dsml_thesis_tpu.diffusion import tiling

from reference_oracle import reference_available


def test_unfold_fold_roundtrip_nonoverlapping():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                    jnp.float32)
    p = tiling.unfold(x, (4, 4), (4, 4))
    assert p.shape == (2, 4, 4, 4, 3)
    y = tiling.fold(p, (8, 8), (4, 4))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)


def test_fold_sums_overlaps():
    ones = jnp.ones((1, 6, 6, 1))
    p = tiling.unfold(ones, (4, 4), (2, 2))  # 2x2 grid, 2px overlap
    y = np.asarray(tiling.fold(p, (6, 6), (2, 2)))[0, :, :, 0]
    # center rows/cols covered by 2 patches per axis -> count in {1, 2, 4}
    assert y[0, 0] == 1 and y[0, 2] == 2 and y[2, 2] == 4


def test_tiled_apply_identity_is_weighted_blend_identity():
    # fn = identity: blend of identical overlapping patches == input exactly
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, 12, 4)),
                    jnp.float32)
    sp = {"ks": (8, 8), "stride": (4, 4)}
    y = tiling.tiled_apply(lambda v, L: v, x, sp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_tiled_apply_clamps_small_inputs():
    # kernel larger than the input -> clamp (reference ddpm.py:835-841),
    # single patch, fn applied once
    x = jnp.ones((1, 4, 4, 2))
    sp = {"ks": (16, 16), "stride": (8, 8)}
    y = tiling.tiled_apply(lambda v, L: v * 2.0, x, sp)
    np.testing.assert_allclose(np.asarray(y), 2.0, atol=1e-6)


def test_tiled_apply_uf_df():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 2)),
                    jnp.float32)
    sp = {"ks": (4, 4), "stride": (2, 2)}
    # decoder-style 2x upsample via nearest repeat
    up = lambda v, L: jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    y = tiling.tiled_apply(up, x, sp, uf=2)
    assert y.shape == (1, 16, 16, 2)
    # encoder-style 2x downsample via average pool
    dn = lambda v, L: v.reshape(v.shape[0], 2, 2, 2, 2, 2).mean((2, 4))
    z = tiling.tiled_apply(dn, x, sp, df=2)
    assert z.shape == (1, 4, 4, 2)


# ---------------------------------------------------------------- oracle


def _reference_stub(split_input_params):
    """Reference LatentDiffusion methods bound to a bare stub carrying only
    split_input_params (get_weighting/get_fold_unfold touch nothing else)."""
    from reference_oracle import install_reference_path

    install_reference_path()
    from ldm.models.diffusion.ddpm import LatentDiffusion as RefLDM

    class Stub:
        pass

    s = Stub()
    s.split_input_params = dict(split_input_params)
    s.meshgrid = RefLDM.meshgrid.__get__(s)
    s.delta_border = RefLDM.delta_border.__get__(s)
    s.get_weighting = RefLDM.get_weighting.__get__(s)
    s.get_fold_unfold = RefLDM.get_fold_unfold.__get__(s)
    return s


SP = {
    "ks": (8, 8), "stride": (4, 4), "vqf": 2,
    "patch_distributed_vq": True, "tie_braker": True,
    "clip_max_weight": 0.5, "clip_min_weight": 0.01,
    "clip_max_tie_weight": 0.5, "clip_min_tie_weight": 0.01,
}


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_weighting_matches_reference():
    torch = pytest.importorskip("torch")
    s = _reference_stub(SP)
    Ly, Lx = 3, 3
    ref = s.get_weighting(8, 8, Ly, Lx, torch.device("cpu"))  # [1, h*w, L]
    ref = ref.view(8, 8, Ly * Lx).permute(2, 0, 1).numpy()    # [L, h, w]
    ours = tiling.tile_weighting((8, 8), Ly, Lx, SP)[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("uf,df", [(1, 1), (2, 1), (1, 2)])
def test_full_chain_matches_reference(uf, df):
    """unfold -> per-patch fn -> weight -> fold -> / normalization, against
    the reference's torch Unfold/Fold chain (apply_model split path,
    ddpm.py:956-1013), for the plain / decoder-uf / encoder-df geometries."""
    torch = pytest.importorskip("torch")
    s = _reference_stub(SP)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 12, 12)).astype(np.float32)  # NCHW

    def fn_t(v):  # per-patch op with spatial coupling, exact in both
        if uf == 2:
            return torch.repeat_interleave(
                torch.repeat_interleave(v * 0.5 + 1.0, 2, dim=2), 2, dim=3)
        if df == 2:
            return torch.nn.functional.avg_pool2d(v * 0.5 + 1.0, 2)
        return v * 0.5 + 1.0

    def fn_j(v, L):  # NHWC twin
        v = v * 0.5 + 1.0
        if uf == 2:
            return jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        if df == 2:
            b, h, w, c = v.shape
            return v.reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))
        return v

    xt = torch.from_numpy(x)
    ks, stride = SP["ks"], SP["stride"]
    fold, unfold, normalization, weighting = s.get_fold_unfold(
        xt, ks, stride, uf=uf, df=df)
    z = unfold(xt)  # [B, C*prod(ks), L]
    L = z.shape[-1]
    z = z.view(2, 3, ks[0], ks[1], L)
    outs = [fn_t(z[:, :, :, :, i]) for i in range(L)]
    o = torch.stack(outs, axis=-1) * weighting
    o = o.view(2, -1, L)  # fold input: [B, C*prod(ks_out), L]
    ref = (fold(o) / normalization).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours = tiling.tiled_apply(fn_j, x_nhwc, SP, uf=uf, df=df)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_ldm_apply_model_split_path():
    """LatentDiffusion.apply_model with split_input_params routes through the
    tiling and matches the untiled model when patches are the full frame."""
    import jax
    from dsml_thesis_tpu.config import build_model

    p = {
        "image_size": 8, "channels": 3, "timesteps": 10,
        "cond_stage_config": "__is_unconditional__",
        "unet_config": {"target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                        "params": {"image_size": 8, "in_channels": 3,
                                   "out_channels": 3, "model_channels": 32,
                                   "num_res_blocks": 1, "channel_mult": [1],
                                   "attention_resolutions": [],
                                   "use_spatial_transformer": False,
                                   "num_heads": 1}},
        "split_input_params": {"ks": [8, 8], "stride": [8, 8], "vqf": 1},
    }
    target = "ldm.models.diffusion.ddpm.LatentDiffusion"
    m = build_model({"target": target, "params": p})
    assert m.split_input_params is not None
    batch = {"image": jnp.zeros((2, 8, 8, 3))}
    params = m.init_params(jax.random.PRNGKey(0), batch)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 8, 8, 3)),
                    jnp.float32)
    t = jnp.array([3, 7])
    eps_tiled = m.apply_model(params, x, t, {"concat": None, "crossattn": None})
    m2 = build_model({"target": target,
                      "params": {**p, "split_input_params": None}})
    eps_plain = m2.apply_model(params, x, t, {"concat": None, "crossattn": None})
    np.testing.assert_allclose(np.asarray(eps_tiled), np.asarray(eps_plain),
                               rtol=1e-5, atol=1e-5)
